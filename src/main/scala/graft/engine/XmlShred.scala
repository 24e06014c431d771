package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** XML demographic shredding — the reference parses an XML-in-string
  * column with an explicit struct schema and flattens the fields
  * (`dags/customer_pipeline.py:64-109`, `from_xml` at `:90`).
  *
  * The fixtures carry no XML column, so the round-trip is exercised by
  * rendering customer attributes to an XML document column first, then
  * shredding it back with Spark 4's built-in `from_xml` — schema-on-read
  * with an explicit `StructType`, exactly the reference pattern. */
object XmlShred {

  val demographicsSchema: StructType = StructType(Seq(
    StructField("Segment", StringType),
    StructField("Nation", IntegerType),
    StructField("BalCents", LongType)))

  /** Render a deterministic XML document per customer (stand-in for
    * `Person.Person.Demographics`). Money is encoded as integer cents —
    * double→string rendering is not engine-portable. */
  def withDemographicsXml(customer: DataFrame): DataFrame =
    customer.withColumn("demographics_xml", concat(
      lit("<Demographics><Segment>"), col("c_mktsegment"),
      lit("</Segment><Nation>"), col("c_nationkey"),
      lit("</Nation><BalCents>"),
      floor(col("c_acctbal") * 100 + lit(0.5)).cast("long"),
      lit("</BalCents></Demographics>")))

  /** Shred + flatten (reference `dags/customer_pipeline.py:90-107`):
    * `from_xml` with explicit schema, then struct-field projection. */
  def shred(spark: SparkSession, dir: String): DataFrame = {
    val c = withDemographicsXml(Tables.customer(spark, dir))
    c.withColumn("parsed", from_xml(col("demographics_xml"), demographicsSchema))
      .select(
        col("c_custkey").as("customer_key"),
        col("parsed.Segment").as("segment"),
        col("parsed.Nation").as("nation_key"),
        col("parsed.BalCents").as("bal_cents"))
      .orderBy(col("customer_key"))
  }
}
