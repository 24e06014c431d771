package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Ingestion robustness: malformed-record handling and catalog
  * statistics — the operational edges a production lakehouse hits that
  * clean fixtures never exercise. */
class RobustnessSpec extends SparkSpec {

  test("PERMISSIVE json read quarantines corrupt lines instead of failing the load") {
    val tmp = Files.createTempDirectory("bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$tmp/part.json"),
      """{"id": 1, "v": 10.0}
        |not json at all
        |{"id": 2, "v": "not-a-number"}
        |{"id": 3, "v": 30.0}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt_record", org.apache.spark.sql.types.StringType)))
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(tmp).cache()
    // materialize BEFORE the column-subset filters: scans that read only
    // _corrupt_record re-parse and misreport (the quirk that makes Spark
    // forbid corrupt-column-only queries on the raw relation)
    assert(df.count() == 4)
    // the non-JSON line AND the type-mismatch row are quarantined; the
    // mismatch row still keeps its parseable fields (id=2, v nulled) —
    // loads never fail and nothing is silently lost
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNull).count() == 2)
    assert(df.filter(col("id") === 2 &&
      col("v").isNull && col("_corrupt_record").isNotNull).count() == 1)
    // DROPMALFORMED drops only the syntactically unparseable line; the
    // type-mismatch row stays (bad field nulled)
    val dropped = spark.read
      .schema(org.apache.spark.sql.types.StructType(schema.fields.take(2)))
      .option("mode", "DROPMALFORMED").json(tmp)
    assert(dropped.count() == 3)
    df.unpersist()
  }

  test("ANALYZE TABLE statistics feed the optimizer's size estimates") {
    Layers.createAll(spark)
    spark.sql("DROP TABLE IF EXISTS bronze.orders_stats")
    val orphan = new java.io.File("spark-warehouse/bronze.db/orders_stats")
    if (orphan.exists()) org.apache.commons.io.FileUtils.deleteDirectory(orphan)
    Tables.orders(spark, sf).write.mode("overwrite")
      .format("parquet").saveAsTable("bronze.orders_stats")
    spark.sql("ANALYZE TABLE bronze.orders_stats COMPUTE STATISTICS")
    // catalog stats (plan-level rowCount needs spark.sql.cbo.enabled)
    val statLine = spark.sql("DESCRIBE EXTENDED bronze.orders_stats")
      .filter(col("col_name") === "Statistics")
      .collect().map(_.getString(1)).headOption.getOrElse("")
    assert(statLine.contains(s"${Tables.orders(spark, sf).count()} rows"), statLine)
    spark.sql("ANALYZE TABLE bronze.orders_stats COMPUTE STATISTICS FOR COLUMNS o_custkey")
    val cat = spark.sql("DESCRIBE EXTENDED bronze.orders_stats o_custkey")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(cat("distinct_count").toLong > 0)
    spark.sql("DROP TABLE bronze.orders_stats")
  }

  private def Layers = graft.engine.Layers
}
