package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over partial-aggregate
  * state — the refresh pattern behind the reference's gold summaries
  * (`trino_scripts/business_sales_summary.sql:1` rebuilds the whole
  * CTAS every run; at 100 TB a full rescan per refresh is the cost this
  * replaces with a merge of yesterday's state and today's delta).
  *
  * State rows carry MERGEABLE partials, never finished values: COUNT and
  * a DECIMAL(38,8) SUM — a commutative monoid, so merging is
  * re-aggregation and is associative, order-independent and exactly
  * reproducible (the reason the sums are decimal, not double: double
  * partials would make the refresh result depend on merge order —
  * [[graft.Fns.sumMoney]] discipline). AVG-style measures are derived at
  * [[serve]] time from (sum, count); MIN/MAX would merge the same way;
  * non-mergeable forms (DISTINCT, percentiles) need sketch state
  * (see the HLL rollup spec) and are deliberately not here.
  *
  * Composes with [[Manifest]]: persist the state table with
  * `Manifest.replacePartitions` keyed by the delta's partitions and the
  * refresh inherits snapshot isolation + at-least-once→exactly-once
  * (spec'd in MvSpec). Scale shape: a delta-sized shuffle per refresh
  * (state is already one row per group; the delta aggregates map-side
  * before the merge shuffle).
  */
object Mv {

  /** Partial-aggregate state of `measure` grouped by `keys`:
    * (keys…, mv_count, mv_sum). */
  def state(df: DataFrame, keys: Seq[String], measure: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("mv_count"),
        sum(measure.cast("decimal(38,8)")).as("mv_sum"))

  /** Merge any number of state tables into one — re-aggregate the
    * partials. `sum` over DECIMAL is exact and order-independent, so
    * merge(merge(a,b),c) == merge(a,merge(b,c)) == a fresh full build. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("mv_count")).as("mv_count"),
        sum(col("mv_sum")).as("mv_sum"))

  /** Render state for consumers: finished, money-rounded measures. The
    * decimal partials drop to double only HERE, at the output boundary
    * (double division mirrors the oracle's `CAST(sum AS DOUBLE)/count`
    * bit-for-bit; dividing the decimals would round differently). */
  def serve(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(
      keys.map(col) ++ Seq(
        col("mv_count").as("n_rows"),
        graft.Fns.money(col("mv_sum").cast("double")).as("total"),
        graft.Fns.money(col("mv_sum").cast("double") /
          col("mv_count").cast("double")).as("mean")): _*)
}
