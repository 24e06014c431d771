package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed build keys — the manual remedy when one
  * join key holds a disproportionate share of the fact rows (a "null
  * island" geo bucket, a default tenant id, a bot user). A plain shuffle
  * join sends every row of the hot key to ONE reducer; that task runs
  * for hours while 999 executors idle, or OOMs outright.
  *
  * Mechanics: the skewed (large) side gets a deterministic salt in
  * [0, salts) derived from a row-unique column, widening each hot key
  * into `salts` shuffle keys; the small side is replicated once per salt
  * value. The join on (key, salt) then spreads each hot key over `salts`
  * reducers. Result set is provably identical to the unsalted join —
  * every (left row, right row) match pairs exactly once, under the
  * salt value the left row drew ([[graft.SparkEntry.oracleSql]] replays
  * the UNSALTED join as the oracle for `events_salted_join`).
  *
  * When to reach for it at 100 TB: AQE's skew-join handling
  * (`spark.sql.adaptive.skewJoin.enabled`) already splits oversized
  * SHUFFLE PARTITIONS at runtime and is the first tool to try; salting
  * remains necessary when a SINGLE KEY exceeds what one task can hold
  * (AQE cannot split one key's hash bucket across joins that need
  * co-location), for aggregate-under-join shapes, and on engines/paths
  * where AQE is off. `salts` trades replication of the small side
  * (× salts rows) against per-reducer bucket size — 8-32 covers most
  * real skew; beyond that the small side's replication starts to cost.
  *
  * The salt must come from a ROW-UNIQUE left column (not the join key —
  * salting by the key would put the whole hot key back in one bucket).
  * Sibling: [[graft.engine.Skew.saltedSumCount]] applies the same
  * two-phase salting to AGGREGATIONS.
  */
object SkewJoin {

  /** Inner equi-join of `left` (large, skewed on `key`) with `right`
    * (small) on `key`, spread over `salts` buckets. `saltBy` must be
    * row-unique on the left (e.g. the event/row id). */
  def salted(left: DataFrame, right: DataFrame, key: String,
      saltBy: Column, salts: Int = 8): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    val l = left.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    // replicate the small side once per salt value — a narrow explode,
    // broadcast-sized as long as |right| × salts stays dim-sized
    // sequence of int literals yields array<int>, matching pmod's int
    val r = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${salts - 1})")))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
