package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.{DimDate, XmlShred}
import graft.queries.{Events, Marts, Scd2Queries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 gets a named entry in
  * [[queries]]; where the semantics are SQL-expressible, [[oracleSql]]
  * carries the DuckDB-dialect equivalent the driver hash-compares against.
  * Column names and deterministic ORDER BY are kept identical on both
  * sides; double aggregates are rounded at the output boundary so results
  * are invariant to partition/accumulation order.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Marts.topProducts(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "top_products"       -> ((s, d) => Marts.topProducts(s, d)),
    "sales_summary"      -> ((s, d) => Marts.salesSummary(s, d)),
    "fact_sales"         -> ((s, d) => Marts.factSales(s, d)),
    "dim_customer"       -> ((s, d) => Marts.dimCustomer(s, d)),
    "product_enriched"   -> ((s, d) => Marts.productEnriched(s, d)),
    "latest_ship"        -> ((s, d) => Marts.latestShipmentPerPart(s, d)),
    "latest_month_orders"-> ((s, d) => Marts.latestMonthOrderSummary(s, d)),
    "dim_date"           -> ((s, _) => DimDate.generate(s)),
    "scd2_initial"       -> ((s, d) => Scd2Queries.initial(s, d)),
    "scd2_upsert"        -> ((s, d) => Scd2Queries.upsert(s, d)),
    "xml_shred"          -> ((s, d) => XmlShred.shred(s, d)),
    "incremental_extract"-> ((s, d) => Events.incrementalExtract(s, d)),
    "json_props"         -> ((s, d) => Events.jsonProps(s, d)),
    "events_by_type"     -> ((s, d) => Events.byType(s, d)),
    "events_hourly"      -> ((s, d) => Events.hourly(s, d)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "top_products" -> """
      SELECT p_partkey, p_name, p_brand,
             floor((CAST(sum(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_revenue,
             floor((CAST(sum(CAST((l_quantity) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_qty,
             count(DISTINCT l_orderkey) AS order_count
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1, 2, 3
      ORDER BY total_revenue DESC, p_partkey
      LIMIT 10
    """,
    "sales_summary" -> """
      SELECT r_name AS region_name, n_name AS nation_name,
             c_mktsegment AS mktsegment, p_brand AS brand,
             CAST(year(o_orderdate) AS INT) AS order_year,
             CAST(quarter(o_orderdate) AS INT) AS order_quarter,
             floor((CAST(sum(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_revenue,
             floor((CAST(sum(CAST((l_quantity) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_qty,
             floor((CAST(sum(CAST((l_extendedprice) AS DECIMAL(38,8))) AS DOUBLE) / count(*)) * 10000 + 0.5) / 10000 AS avg_price,
             floor((CAST(sum(CAST((l_extendedprice * l_discount) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_discount,
             count(DISTINCT l_orderkey) AS order_count,
             count(*) AS line_count
      FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN part     ON l_partkey = p_partkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
      GROUP BY 1, 2, 3, 4, 5, 6
      ORDER BY region_name, nation_name, mktsegment, brand, order_year, order_quarter
    """,
    "fact_sales" -> """
      SELECT l_orderkey AS order_key, l_linenumber AS line_number,
             l_partkey AS part_key, l_suppkey AS supp_key,
             o_custkey AS cust_key,
             CAST(strftime(o_orderdate, '%Y%m%d') AS INT) AS order_date_key,
             CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS ship_date_key,
             l_quantity AS quantity,
             floor((l_extendedprice * (1.0 - l_discount)) * 10000 + 0.5) / 10000 AS net_revenue,
             o_orderstatus AS order_status
      FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
      ORDER BY order_key, line_number
    """,
    "dim_customer" -> """
      SELECT c_custkey AS customer_key, c_name AS customer_name,
             c_mktsegment AS mktsegment, n_name AS nation_name,
             r_name AS region_name, c_acctbal AS acctbal
      FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      ORDER BY customer_key
    """,
    "product_enriched" -> """
      SELECT p_partkey AS part_key, p_brand AS brand, p_type AS part_type,
             n_name AS supplier_nation,
             floor((CAST(sum(CAST((l_quantity) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_qty,
             floor((CAST(sum(CAST((l_extendedprice * (1.0 - l_discount)) AS DECIMAL(38,8))) AS DOUBLE)) * 10000 + 0.5) / 10000 AS total_revenue,
             count(*) AS line_count
      FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
      GROUP BY 1, 2, 3, 4
      ORDER BY part_key, supplier_nation
    """,
    "latest_ship" -> """
      SELECT l_partkey AS part_key, l_orderkey AS order_key,
             l_linenumber AS line_number,
             CAST(strftime(l_shipdate, '%Y%m%d') AS INT) AS ship_date_key,
             l_quantity AS quantity
      FROM lineitem
      QUALIFY row_number() OVER (
        PARTITION BY l_partkey
        ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC) = 1
      ORDER BY part_key
    """,
    "latest_month_orders" -> """
      SELECT o_orderpriority AS priority,
             COUNT(*) AS order_count,
             floor(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,8))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_price
      FROM orders
      WHERE date_trunc('month', o_orderdate) =
            (SELECT MAX(date_trunc('month', o_orderdate)) FROM orders)
      GROUP BY o_orderpriority
      ORDER BY priority
    """,
    "dim_date" -> DimDate.oracleSql(),
    "scd2_initial" -> """
      SELECT row_number() OVER (ORDER BY p_partkey) AS surrogate_key,
             p_partkey AS part_key, p_name, p_brand, p_type, p_size,
             CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents,
             md5(concat_ws('|', p_name, p_brand, p_type,
                 CAST(p_size AS VARCHAR),
                 CAST(CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS VARCHAR))) AS attr_hash,
             DATE '2024-01-01' AS effective_date,
             CAST(NULL AS DATE) AS expiry_date,
             TRUE AS is_current
      FROM part
      ORDER BY surrogate_key
    """,
    "scd2_upsert" -> """
      WITH base AS (
        SELECT p_partkey AS part_key, p_name, p_brand, p_type, p_size,
               CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
        FROM part),
      dim0 AS (
        SELECT row_number() OVER (ORDER BY part_key) AS surrogate_key, base.*,
               md5(concat_ws('|', p_name, p_brand, p_type,
                   CAST(p_size AS VARCHAR), CAST(price_cents AS VARCHAR))) AS attr_hash
        FROM base),
      src AS (
        SELECT part_key, p_name, p_brand, p_type, p_size,
               CASE WHEN part_key % 7 = 0 THEN price_cents + 100 ELSE price_cents END AS price_cents
        FROM base
        UNION ALL
        SELECT part_key + 1000000, p_name || '_v2', p_brand, p_type, p_size, price_cents
        FROM base WHERE part_key % 50 = 0),
      srch AS (
        SELECT src.*, md5(concat_ws('|', p_name, p_brand, p_type,
                   CAST(p_size AS VARCHAR), CAST(price_cents AS VARCHAR))) AS attr_hash
        FROM src),
      changed AS (
        SELECT s.* FROM srch s LEFT JOIN dim0 d USING (part_key)
        WHERE d.part_key IS NULL OR d.attr_hash <> s.attr_hash),
      old_rows AS (
        SELECT d.part_key, d.p_name, d.p_brand, d.p_type, d.p_size,
               d.price_cents, d.attr_hash, d.surrogate_key,
               DATE '2024-01-01' AS effective_date,
               CASE WHEN c.part_key IS NOT NULL THEN DATE '2024-06-01'
                    ELSE CAST(NULL AS DATE) END AS expiry_date,
               c.part_key IS NULL AS is_current
        FROM dim0 d LEFT JOIN (SELECT DISTINCT part_key FROM changed) c USING (part_key)),
      new_rows AS (
        SELECT part_key, p_name, p_brand, p_type, p_size, price_cents, attr_hash,
               (SELECT count(*) FROM dim0) + row_number() OVER (ORDER BY part_key) AS surrogate_key,
               DATE '2024-06-01' AS effective_date,
               CAST(NULL AS DATE) AS expiry_date,
               TRUE AS is_current
        FROM changed)
      SELECT * FROM old_rows UNION ALL SELECT * FROM new_rows ORDER BY surrogate_key
    """,
    "xml_shred" -> """
      SELECT c_custkey AS customer_key, c_mktsegment AS segment,
             c_nationkey AS nation_key,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      FROM customer
      ORDER BY customer_key
    """,
    "incremental_extract" -> """
      SELECT event_id, ts::TIMESTAMP AS ts, user_id, event_type,
             floor(value * 10000 + 0.5) / 10000 AS value4
      FROM events
      WHERE ts::TIMESTAMP > TIMESTAMP '2024-01-05 00:00:00'
      ORDER BY event_id
    """,
    "json_props" -> """
      SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
      FROM events
      ORDER BY event_id
    """,
    "events_by_type" -> """
      SELECT event_type, count(*) AS n_events,
             count(DISTINCT user_id) AS n_users,
             floor(CAST(sum(CAST((floor(value * 10000 + 0.5) / 10000) AS DECIMAL(38,8))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_value,
             floor(CAST(sum(CAST(CAST(json_extract_string(props, '$.k') AS INT) AS DECIMAL(38,8))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_k
      FROM events
      GROUP BY event_type
      ORDER BY event_type
    """,
    "events_hourly" -> """
      SELECT time_bucket(INTERVAL '1 hour', ts::TIMESTAMP) AS window_start,
             event_type, count(*) AS n_events,
             floor(CAST(sum(CAST((floor(value * 10000 + 0.5) / 10000) AS DECIMAL(38,8))) AS DOUBLE) * 10000 + 0.5) / 10000 AS total_value
      FROM events
      GROUP BY 1, 2
      ORDER BY window_start, event_type
    """,
  )
}
