package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Fns, Tables}

/** Event sequence analytics: gap-based sessionization and running
  * (frame-spec) window aggregates — per-key window work, one shuffle on
  * the partition key. */
object EventSequences {

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapMinutes`. Emits one row per session
    * with bounds and totals. lag → gap flag → cumulative sum = session
    * index (the standard composable form). */
  def sessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapMinutes * 60L)
          .cast("int"))
      .withColumn("session_idx",
        sum(col("new_session")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        Fns.money(Fns.sumMoney(Fns.money(col("value")))).as("session_value"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** Running daily revenue per order priority — explicit ROWS frame
    * (unbounded preceding → current), the frame-spec window class the
    * reference never exercises. */
  def runningDailyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("order_date"))
      .agg(Fns.money(Fns.sumMoney(col("o_totalprice"))).as("day_revenue"))
    val w = Window.partitionBy(col("priority")).orderBy(col("order_date"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("running_revenue", Fns.money(sum(col("day_revenue")).over(w)))
      .orderBy(col("priority"), col("order_date"))
  }
}
