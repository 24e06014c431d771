package graft

import graft.queries.Marts
import graft.engine.DimDate

class MartsSpec extends SparkSpec {

  test("top_products: 10 rows, revenue descending, keys from part") {
    val rows = Marts.topProducts(spark, sf).collect()
    assert(rows.length == 10)
    val revs = rows.map(_.getAs[Double]("total_revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
    assert(rows.forall(_.getAs[Long]("order_count") > 0))
  }

  test("fact_sales: grain = lineitem, date keys are yyyyMMdd ints") {
    val df = Marts.factSales(spark, sf)
    assert(df.count() == Tables.lineitem(spark, sf).count())
    val r = df.limit(5).collect()
    assert(r.forall { row =>
      val k = row.getAs[Int]("ship_date_key")
      k >= 19900101 && k <= 21001231
    })
  }

  test("dim_customer: one row per customer, all geo fields resolved") {
    val df = Marts.dimCustomer(spark, sf)
    assert(df.count() == Tables.customer(spark, sf).count())
    assert(df.filter("nation_name IS NULL OR region_name IS NULL").count() == 0)
  }

  test("latest_ship: one row per part, date is the max per part") {
    val df = Marts.latestShipmentPerPart(spark, sf)
    val perPart = Tables.lineitem(spark, sf)
      .groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.date_format(
          org.apache.spark.sql.functions.col("l_shipdate"), "yyyyMMdd")
          .cast("int")).as("max_key"))
    val joined = df.join(perPart, df("part_key") === perPart("l_partkey"))
    assert(joined.filter("ship_date_key <> max_key").count() == 0)
    assert(df.count() == perPart.count())
  }

  test("dim_date: 7305 days, ISO weekday, fiscal July start") {
    val rows = DimDate.generate(spark).collect()
    assert(rows.length == 7305)
    val jan1 = rows.find(_.getAs[Int]("date_key") == 20100101).get
    assert(jan1.getAs[Int]("day_of_week_iso") == 5) // 2010-01-01 was a Friday
    assert(jan1.getAs[Int]("fiscal_year") == 2010)
    val jul1 = rows.find(_.getAs[Int]("date_key") == 20100701).get
    assert(jul1.getAs[Int]("fiscal_year") == 2011)
    assert(jul1.getAs[Int]("fiscal_quarter") == 1)
    assert(jul1.getAs[Int]("fiscal_month") == 1)
  }

  test("sales_summary groups are unique on the 6 keys") {
    val df = Marts.salesSummary(spark, sf)
    val n = df.count()
    val distinct = df.select("region_name", "nation_name", "mktsegment",
      "brand", "order_year", "order_quarter").distinct().count()
    assert(n == distinct)
  }
}
