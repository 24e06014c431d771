package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Fns, Tables}

/** Star-schema mart queries + dimension/fact builds — Spark-first re-design
  * of the reference's gold/mart layer:
  *
  *  - top products: reference `trino_scripts/top_product.sql:1-14`
  *  - sales summary: reference `trino_scripts/business_sales_summary.sql:1-33`
  *  - fact build with date keys: reference `dags/sales.py:62-106`
  *  - 3-way dim joins: reference `dags/address_pipeline.py:83-87`,
  *    `dags/customer_pipeline.py:138-143`
  *  - 4-way enrichment join: reference `dags/product.py:105-111`
  *  - dedup-latest window: reference `dags/product.py:174-177`
  *  - latest-partition scalar subquery: reference
  *    `trino_scripts/business_sales_summary.sql:31`
  *
  * Scale notes (100 TB): `broadcast()` hints appear ONLY on relations
  * whose size is bounded by the domain, not the scale factor — nation
  * (25 rows), region (5), and the generated dim_date (~7.3k). The
  * SF-scaled relations (orders, part, customer, supplier) carry NO hint:
  * an explicit `broadcast()` hint overrides `autoBroadcastJoinThreshold`
  * unconditionally — the driver would collect the relation whatever its
  * size — so hinting them would be a scale-killer at 100 TB (orders alone
  * is ~¼ of the fact). Un-hinted, Catalyst/AQE picks broadcast-hash at
  * fixture scale (they fit under the threshold) and sort-merge — or the
  * bucketed-table co-location below — at cluster scale. The only
  * guaranteed shuffles are the final hash aggregations on the (small)
  * grouped key space, which Catalyst runs as partial (map-side) + final.
  * Double-valued aggregates are rounded at the output boundary so results
  * are stable across partition orderings.
  */
object Marts {

  private def revenue: Column = col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Top-K products by revenue — flagship query (SURVEY.md §7.4).
    * lineitem ⋈ part (un-hinted: part grows with SF — AQE broadcasts it
    * while it fits, sort-merges past the threshold) → hash agg →
    * TakeOrderedAndProject. */
  def topProducts(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_partkey"), col("p_name"), col("p_brand"))
      .agg(
        Fns.money(Fns.sumMoney(revenue)).as("total_revenue"),
        Fns.money(Fns.sumMoney(col("l_quantity"))).as("total_qty"),
        countDistinct(col("l_orderkey")).as("order_count"))
      .orderBy(col("total_revenue").desc, col("p_partkey"))
      .limit(k)
  }

  /** Star join + multi-key grouped aggregates — the reference's
    * business_sales_summary mart. Bounded dims (nation, region) are
    * hint-broadcast; the SF-scaled sides (orders, part, customer) are
    * left to Catalyst/AQE — broadcast while small, sort-merge (or the
    * bucketed co-location, [[bucketedCustomerJoin]]) at cluster scale. */
  def salesSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val p  = Tables.part(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(
        col("r_name").as("region_name"),
        col("n_name").as("nation_name"),
        col("c_mktsegment").as("mktsegment"),
        col("p_brand").as("brand"),
        year(col("o_orderdate")).as("order_year"),
        quarter(col("o_orderdate")).as("order_quarter"))
      .agg(
        Fns.money(Fns.sumMoney(revenue)).as("total_revenue"),
        Fns.money(Fns.sumMoney(col("l_quantity"))).as("total_qty"),
        Fns.money(Fns.sumMoney(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        Fns.money(Fns.sumMoney(col("l_extendedprice") * col("l_discount"))).as("total_discount"),
        countDistinct(col("l_orderkey")).as("order_count"),
        count(lit(1)).as("line_count"))
      .orderBy(col("region_name"), col("nation_name"), col("mktsegment"),
        col("brand"), col("order_year"), col("order_quarter"))
  }

  /** Fact assembly: detail LEFT JOIN header + yyyyMMdd int date keys
    * (reference `dags/sales.py:82-97`). The header side carries NO
    * broadcast hint: orders grows with the scale factor (~¼ of the fact
    * at 100 TB), and a forced hint never size-falls-back — Catalyst
    * collects the relation unconditionally. Un-hinted, AQE broadcasts it
    * while it fits and shuffle-joins on the co-partitioned orderkey past
    * the threshold. */
  def factSales(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
      .select(
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_number"),
        col("l_partkey").as("part_key"),
        col("l_suppkey").as("supp_key"),
        col("o_custkey").as("cust_key"),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int").as("order_date_key"),
        date_format(col("l_shipdate"), "yyyyMMdd").cast("int").as("ship_date_key"),
        col("l_quantity").as("quantity"),
        Fns.money(revenue).as("net_revenue"),
        col("o_orderstatus").as("order_status"))
      .orderBy(col("order_key"), col("line_number"))
  }

  /** 3-way dim join: customer ⋈ nation ⋈ region — mirror of the
    * reference's dim_customers / dim_address builds. */
  def dimCustomer(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey").as("customer_key"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("mktsegment"),
        col("n_name").as("nation_name"),
        col("r_name").as("region_name"),
        col("c_acctbal").as("acctbal"))
      .orderBy(col("customer_key"))
  }

  /** 4-way inner join enrichment (reference `dags/product.py:105-111`):
    * lineitem ⋈ part ⋈ supplier ⋈ nation, rolled up per part × supplier
    * nation. */
  def productEnriched(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val p  = Tables.part(spark, dir)
    val s  = Tables.supplier(spark, dir)
    val n  = Tables.nation(spark, dir)
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(
        col("p_partkey").as("part_key"),
        col("p_brand").as("brand"),
        col("p_type").as("part_type"),
        col("n_name").as("supplier_nation"))
      .agg(
        Fns.money(Fns.sumMoney(col("l_quantity"))).as("total_qty"),
        Fns.money(Fns.sumMoney(revenue)).as("total_revenue"),
        count(lit(1)).as("line_count"))
      .orderBy(col("part_key"), col("supplier_nation"))
  }

  /** Window-rank dedup — keep the latest shipment per part
    * (reference `dags/product.py:174-177` keeps the latest product
    * version per business key). Shuffles once on the partition key;
    * ties broken deterministically for the oracle. */
  def latestShipmentPerPart(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey").desc, col("l_linenumber").desc)
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        col("l_partkey").as("part_key"),
        col("l_orderkey").as("order_key"),
        col("l_linenumber").as("line_number"),
        date_format(col("l_shipdate"), "yyyyMMdd").cast("int").as("ship_date_key"),
        col("l_quantity").as("quantity"))
      .orderBy(col("part_key"))
  }

  /** AGGREGATE twin of [[latestShipmentPerPart]] — same result through
    * `max_by` over a unique ordering struct instead of a window rank.
    * The window form shuffles and SORTS every lineitem row per part; the
    * aggregate form gets map-side partial aggregation (one surviving row
    * per part per map task reaches the shuffle) and never sorts — the
    * shape to prefer when only the top-1 row is wanted and the group
    * count is huge. Both are kept: W1 coverage needs the window form. */
  def latestShipmentPerPartAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_partkey").as("part_key"))
      .agg(max_by(
        struct(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"), col("l_quantity")),
        struct(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))).as("top"))
      .select(
        col("part_key"),
        col("top.l_orderkey").as("order_key"),
        col("top.l_linenumber").as("line_number"),
        date_format(col("top.l_shipdate"), "yyyyMMdd").cast("int").as("ship_date_key"),
        col("top.l_quantity").as("quantity"))
      .orderBy(col("part_key"))
  }

  /** The reference's FULL 18-key calendar mart
    * (`trino_scripts/business_sales_summary.sql:1-33`): fact ⋈ generated
    * dim_date on the yyyyMMdd key, grouped by calendar attributes
    * (month_name, week_of_year, day_of_month, is_weekend, is_holiday …)
    * plus product- and geography-hierarchy levels. This is the mart
    * pattern [[salesSummary]] abbreviates: the date dimension is JOINED,
    * not re-derived per row, so calendar semantics (ISO weeks, fiscal
    * rules, future holiday feeds) live in ONE generated table.
    *
    * Scale shape: the bounded dims — generated dim_date (7,305 rows),
    * nation, region — are hint-broadcast; orders/part/customer are
    * SF-scaled, so they carry no hint and Catalyst/AQE picks broadcast
    * at fixture scale, sort-merge at cluster scale. One exchange for the
    * final 18-key hash aggregate (partial map-side combine first).
    * Day×brand×geo grouping keys give ~|days|×|brands|×|nations|
    * groups — dimension-bounded, not fact-bounded, so the agg output
    * stays small at any fact scale. */
  def salesSummaryCalendar(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val p  = Tables.part(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = Tables.nation(spark, dir)
    val r  = Tables.region(spark, dir)
    // calendar generated over the fact's date span (the fixture's orders
    // run 1995–2001; the reference hardcodes its own 2010–2029 span)
    val dd = graft.engine.DimDate.generate(spark, "1995-01-01", 2557)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dd),
        date_format(col("o_orderdate"), "yyyyMMdd").cast("int") === col("date_key"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(
        col("date_key"), col("full_date"), col("year"), col("quarter"),
        col("month"), col("month_name"), col("week_of_year"),
        col("day_of_month"), col("is_weekend"), col("is_holiday"),
        col("p_brand").as("brand"), col("p_type").as("part_type"),
        col("p_size").as("part_size"),
        col("r_name").as("region_name"), col("n_name").as("nation_name"),
        col("c_mktsegment").as("mktsegment"),
        col("o_orderpriority").as("priority"))
      .agg(
        countDistinct(col("l_orderkey")).as("order_count"),
        Fns.money(Fns.sumMoney(revenue)).as("revenue"),
        Fns.money(Fns.sumMoney(col("l_quantity"))).as("quantity_sold"),
        Fns.money(Fns.sumMoney(col("l_extendedprice")) / count(lit(1))).as("avg_unit_price"),
        Fns.money(Fns.sumMoney(col("l_extendedprice") * col("l_discount"))).as("total_discount"))
      .orderBy(
        col("date_key"), col("brand"), col("part_type"), col("part_size"),
        col("region_name"), col("nation_name"), col("mktsegment"), col("priority"))
  }

  /** Co-located join via BUCKETED tables — the standing answer to "this
    * big⋈big join shuffles both sides every night": write both relations
    * `bucketBy(N, key).sortBy(key)` once, and every subsequent equi-join
    * on the key is shuffle-free (scans expose the bucket hash
    * partitioning; sorted buckets make it merge-ready). At 100 TB this
    * converts the nightly orders⋈customer co-location from a 2-sided
    * exchange of the full data into zero network movement — the single
    * biggest repeatable shuffle saving Spark offers for stable join
    * keys. Bucket counts must match on both sides (Spark also accepts
    * multiples); pick N so a bucket ≈ one task's worth of data at
    * target scale.
    *
    * The table write happens inside the query (scratch-named per
    * JVM+fixture) so the query is self-contained for the harness; a
    * production deployment writes the bucketed tables once in the load
    * job and amortizes across every downstream join. Plan pin:
    * [[graft.PlanQualitySpec]] asserts no Exchange feeds the join. */
  def bucketedCustomerJoin(spark: SparkSession, dir: String, buckets: Int = 16): DataFrame = {
    val tag = s"${dir.hashCode & 0x7fffffff}_${graft.engine.Fs.runToken}"
    val (to, tc) = (s"orders_bkt_$tag", s"customer_bkt_$tag")
    graft.engine.Layers.writeBucketed(
      Tables.orders(spark, dir)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"), col("o_totalprice")),
      to, "o_custkey", buckets)
    graft.engine.Layers.writeBucketed(
      Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment")),
      tc, "c_custkey", buckets)
    bucketedJoinPlan(spark, to, tc)
  }

  /** The join-over-bucketed-tables plan itself (split out so the spec
    * can pin the no-exchange shape on tables it just wrote). */
  private[graft] def bucketedJoinPlan(spark: SparkSession, ordersTable: String,
      customerTable: String): DataFrame =
    spark.table(ordersTable)
      .join(spark.table(customerTable), col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderpriority").as("priority"), col("c_mktsegment").as("mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        Fns.money(Fns.sumMoney(col("o_totalprice"))).as("total_price"))
      .orderBy(col("priority"), col("mktsegment"))

  /** Latest-partition filter via scalar subquery (reference
    * `business_sales_summary.sql:31` — `WHERE ingestion_date =
    * (SELECT MAX(...))`). Catalyst rewrites the scalar subquery to a
    * broadcast join; with a date-partitioned table this prunes to the
    * newest partition only. */
  def latestMonthOrderSummary(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    spark.sql("""
      SELECT o_orderpriority AS priority,
             COUNT(*) AS order_count,
             floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_price
      FROM orders
      WHERE date_trunc('month', o_orderdate) =
            (SELECT MAX(date_trunc('month', o_orderdate)) FROM orders)
      GROUP BY o_orderpriority
      ORDER BY priority
    """)
  }
}
