package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-hitter keys: two-phase salted aggregation.
  *
  * A plain `groupBy(key).agg(sum)` sends every row of a hot key to one
  * reducer. Salting splits each key into `salt` sub-groups (phase 1,
  * map-side-combinable like any hash agg), then merges the partials
  * (phase 2, at most `salt` rows per key). AQE's skew-join handling
  * covers joins; this covers aggregations.
  *
  * The salt is derived deterministically from stable row content so
  * results are reproducible run to run.
  */
object Skew {

  /** Salted sum/count aggregation: `agg` over `groupBy(keys)` semantics,
    * resistant to key skew. `saltSource` must be a stable per-row column
    * (e.g. a line number or id) used only to spread rows. */
  def saltedSumCount(df: DataFrame, key: Column, value: Column,
      saltSource: Column, salt: Int = 16): DataFrame = {
    df.select(key.as("k"), value.as("v"),
        pmod(hash(saltSource), lit(salt)).as("__salt"))
      .groupBy(col("k"), col("__salt"))
      .agg(sum(col("v")).as("partial_sum"), count(lit(1)).as("partial_n"))
      .groupBy(col("k"))
      .agg(sum(col("partial_sum")).as("total"), sum(col("partial_n")).as("n"))
  }
}
