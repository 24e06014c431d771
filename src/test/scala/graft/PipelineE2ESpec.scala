package graft

import org.apache.spark.sql.functions._
import graft.engine.{ExtractLoad, Layers, Scd2}
import graft.queries.{Marts, Scd2Queries}
import java.nio.file.Files

/** End-to-end medallion pipeline (SURVEY.md §5.4): raw fixtures → bronze
  * (incremental extract) → silver (conformed) → gold (fact + SCD2 dim) →
  * mart (top-K), asserting the mart output equals the direct query. */
class PipelineE2ESpec extends SparkSpec {

  test("bronze → silver → gold → mart round trip") {
    val tmp = Files.createTempDirectory("e2e").toString
    Layers.createAll(spark)
    try {
      // bronze: watermark extract of events + raw table copies
      val n = ExtractLoad.run(spark, Tables.events(spark, sf), "events",
        "event_id", "ts", s"$tmp/ckpt", s"$tmp/bronze_events", "2024-03-01")
      assert(n == Tables.events(spark, sf).count())
      Layers.overwrite(Tables.lineitem(spark, sf), "bronze.lineitem_t")
      Layers.overwrite(Tables.orders(spark, sf), "bronze.orders_t")
      Layers.overwrite(Tables.part(spark, sf), "bronze.part_t")

      // silver: conformed product source
      Layers.overwrite(Scd2Queries.partSource(spark, sf), "silver.part_conformed")

      // gold: fact + SCD2 product dimension
      Layers.overwrite(Marts.factSales(spark, sf), "gold.fact_sales_t")
      Layers.overwrite(
        Scd2.initialLoad(Layers.table(spark, "silver.part_conformed"),
          Scd2Queries.cfg, "2024-01-01"),
        "gold.dim_product_t")

      // mart: top products from gold tables only
      val mart = spark.sql("""
        SELECT d.part_key, sum(f.net_revenue) AS revenue
        FROM gold.fact_sales_t f
        JOIN gold.dim_product_t d ON f.part_key = d.part_key AND d.is_current
        GROUP BY d.part_key ORDER BY revenue DESC, part_key LIMIT 10
      """).collect().map(_.getLong(0))

      // reference: straight off the fixtures
      val direct = Marts.factSales(spark, sf)
        .groupBy(col("part_key")).agg(sum(col("net_revenue")).as("revenue"))
        .orderBy(col("revenue").desc, col("part_key")).limit(10)
        .collect().map(_.getLong(0))

      assert(mart.sameElements(direct))
      assert(Layers.table(spark, "gold.fact_sales_t").count() ==
        Tables.lineitem(spark, sf).count())
    } finally {
      Seq("bronze.lineitem_t", "bronze.orders_t", "bronze.part_t",
        "silver.part_conformed", "gold.fact_sales_t", "gold.dim_product_t")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }
}
