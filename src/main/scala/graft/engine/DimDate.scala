package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Date-dimension generator — Spark-native redesign of the reference's
  * Trino generator (`trino_scripts/create_dim_date.sql:24-58`): integer
  * sequence → date arithmetic → calendar + fiscal (July-start) columns.
  *
  * Uses `spark.range` (parallel, no data read) instead of Trino's
  * `sequence`+`UNNEST`. Trino↔Spark function skew handled per SURVEY.md
  * §7.5.4: Trino `day_of_week` is ISO (1=Mon) while Spark `dayofweek` is
  * 1=Sun, so ISO day-of-week is `weekday()+1`; Trino `%B/%b/%A/%a`
  * formats map to `MMMM/MMM/EEEE/EEE`.
  */
object DimDate {

  /** Generate one row per day in [start, start+days). Default mirrors the
    * reference: 2010-01-01 through 2029-12-31 (7,305 days). */
  def generate(spark: SparkSession, start: String = "2010-01-01", days: Int = 7305): DataFrame = {
    val d = to_date(lit(start))
    spark.range(days.toLong)
      .select(date_add(d, col("id").cast("int")).as("full_date"))
      .select(
        date_format(col("full_date"), "yyyyMMdd").cast("int").as("date_key"),
        col("full_date"),
        year(col("full_date")).as("year"),
        quarter(col("full_date")).as("quarter"),
        month(col("full_date")).as("month"),
        date_format(col("full_date"), "MMMM").as("month_name"),
        date_format(col("full_date"), "MMM").as("month_abbr"),
        dayofmonth(col("full_date")).as("day_of_month"),
        (weekday(col("full_date")) + 1).as("day_of_week_iso"),
        date_format(col("full_date"), "EEEE").as("day_name"),
        date_format(col("full_date"), "EEE").as("day_abbr"),
        weekofyear(col("full_date")).as("week_of_year"),
        (weekday(col("full_date")) >= 5).as("is_weekend"),
        // reference create_dim_date.sql:39 hardcodes false (no holiday feed)
        lit(false).as("is_holiday"),
        // Fiscal calendar starting July 1 (reference create_dim_date.sql:38-54)
        (year(col("full_date")) + when(month(col("full_date")) >= 7, 1).otherwise(0)).as("fiscal_year"),
        (floor(((month(col("full_date")) + 5) % 12) / 3) + 1).cast("int").as("fiscal_quarter"),
        ((month(col("full_date")) + 5) % 12 + 1).as("fiscal_month"))
      .orderBy(col("full_date"))
  }

  /** DuckDB-dialect oracle for [[generate]] with the same column set. */
  def oracleSql(start: String = "2010-01-01", days: Int = 7305): String = s"""
    SELECT CAST(strftime(full_date, '%Y%m%d') AS INT) AS date_key,
           full_date,
           CAST(year(full_date) AS INT) AS year,
           CAST(quarter(full_date) AS INT) AS quarter,
           CAST(month(full_date) AS INT) AS month,
           strftime(full_date, '%B') AS month_name,
           strftime(full_date, '%b') AS month_abbr,
           CAST(day(full_date) AS INT) AS day_of_month,
           CAST(isodow(full_date) AS INT) AS day_of_week_iso,
           strftime(full_date, '%A') AS day_name,
           strftime(full_date, '%a') AS day_abbr,
           CAST(week(full_date) AS INT) AS week_of_year,
           isodow(full_date) >= 6 AS is_weekend,
           false AS is_holiday,
           CAST(year(full_date) + (CASE WHEN month(full_date) >= 7 THEN 1 ELSE 0 END) AS INT) AS fiscal_year,
           CAST(((month(full_date) + 5) % 12) // 3 + 1 AS INT) AS fiscal_quarter,
           CAST((month(full_date) + 5) % 12 + 1 AS INT) AS fiscal_month
    FROM (SELECT (DATE '$start' + INTERVAL (g.x) DAY)::DATE AS full_date
          FROM generate_series(0, ${days - 1}) g(x))
    ORDER BY full_date
  """
}
