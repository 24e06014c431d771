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

  /** Full parity with the reference's 13-field demographics struct
    * (`dags/customer_pipeline.py:74-88`) — but TYPED where the reference
    * keeps strings: a double (TotalPurchaseYTD), two dates
    * (DateFirstPurchase/BirthDate), four ints, and a missing-element case
    * (CommuteDistance omitted for every 7th customer → null after parse). */
  val demographicsFullSchema: StructType = StructType(Seq(
    StructField("TotalPurchaseYTD", DoubleType),
    StructField("DateFirstPurchase", DateType),
    StructField("BirthDate", DateType),
    StructField("MaritalStatus", StringType),
    StructField("YearlyIncome", StringType),
    StructField("Gender", StringType),
    StructField("TotalChildren", IntegerType),
    StructField("NumberChildrenAtHome", IntegerType),
    StructField("Education", StringType),
    StructField("Occupation", StringType),
    StructField("HomeOwnerFlag", IntegerType),
    StructField("NumberCarsOwned", IntegerType),
    StructField("CommuteDistance", StringType)))

  /** Render the 13-field XML deterministically from customer attributes.
    * Doubles ride through as Spark's shortest-round-trip rendering (the
    * parse returns the identical double, and the oracle reads the raw
    * column); dates as ISO `yyyy-MM-dd`. */
  def withDemographicsFullXml(customer: DataFrame): DataFrame = {
    val k = col("c_custkey")
    val tag = (name: String, v: org.apache.spark.sql.Column) =>
      concat(lit(s"<$name>"), v.cast("string"), lit(s"</$name>"))
    customer.withColumn("demographics_xml", concat(
      lit("<Demographics>"),
      tag("TotalPurchaseYTD", col("c_acctbal")),
      tag("DateFirstPurchase",
        date_add(lit("1995-01-01").cast("date"), (k % 1000).cast("int"))),
      tag("BirthDate",
        date_add(lit("1960-01-01").cast("date"), ((k * 7) % 15000).cast("int"))),
      tag("MaritalStatus", when(k % 2 === 0, "M").otherwise("S")),
      tag("YearlyIncome",
        when(k % 3 === 0, "0-25000").when(k % 3 === 1, "25001-50000")
          .otherwise("greater than 50000")),
      tag("Gender", when(k % 2 === 0, "F").otherwise("M")),
      tag("TotalChildren", (k % 6).cast("int")),
      tag("NumberChildrenAtHome", (k % 4).cast("int")),
      tag("Education", col("c_mktsegment")),
      tag("Occupation", substring(col("c_name"), 1, 8)),
      tag("HomeOwnerFlag", (k % 2).cast("int")),
      tag("NumberCarsOwned", (k % 5).cast("int")),
      // missing-element case: every 7th customer has NO CommuteDistance
      when(k % 7 === 0, lit("")).otherwise(
        tag("CommuteDistance",
          when(col("c_nationkey") % 3 === 0, "0-1 Miles")
            .when(col("c_nationkey") % 3 === 1, "5-10 Miles")
            .otherwise("10+ Miles"))),
      lit("</Demographics>")))
  }

  /** 13-field shred + flatten, typed — the reference flow at full width
    * (`dags/customer_pipeline.py:90-107`). */
  def shredFull(spark: SparkSession, dir: String): DataFrame = {
    val c = withDemographicsFullXml(Tables.customer(spark, dir))
    c.withColumn("parsed", from_xml(col("demographics_xml"), demographicsFullSchema))
      .select(
        col("c_custkey").as("customer_key"),
        col("parsed.TotalPurchaseYTD").as("total_purchase_ytd"),
        col("parsed.DateFirstPurchase").as("date_first_purchase"),
        col("parsed.BirthDate").as("birth_date"),
        col("parsed.MaritalStatus").as("marital_status"),
        col("parsed.YearlyIncome").as("yearly_income"),
        col("parsed.Gender").as("gender"),
        col("parsed.TotalChildren").as("total_children"),
        col("parsed.NumberChildrenAtHome").as("children_at_home"),
        col("parsed.Education").as("education"),
        col("parsed.Occupation").as("occupation"),
        col("parsed.HomeOwnerFlag").as("home_owner_flag"),
        col("parsed.NumberCarsOwned").as("cars_owned"),
        col("parsed.CommuteDistance").as("commute_distance"))
      .orderBy(col("customer_key"))
  }
}
