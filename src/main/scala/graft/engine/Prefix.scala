package graft.engine

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Distributed EXCLUSIVE prefix sum over a long column in `orderCol`
  * order — semantically `sum(value) OVER (ORDER BY ord ROWS BETWEEN
  * UNBOUNDED PRECEDING AND 1 PRECEDING)`, but without the global-window
  * trap: an unpartitioned WindowExec moves the entire dataset through ONE
  * task (Spark itself warns), which is exactly what dies at 100 TB.
  *
  * Two-pass scheme (the classic parallel scan, same family as
  * [[Scd2.assignIds]]): range-partition by the order column and sort
  * within partitions; pass 1 reduces each partition to its local sum
  * (numPartitions longs to the driver); pass 2 re-walks each partition
  * adding its broadcast base offset. The sorted RDD is persisted
  * (spill-safe) between the passes so both walk identical partitions.
  *
  * PRECONDITIONS:
  *  - `orderCol` values must be UNIQUE. Rows tying on the order key get
  *    an arbitrary within-partition relative order, so their individual
  *    offsets would vary across runs/cluster sizes (offsets of all
  *    non-tied rows are unaffected — a tie only permutes the same
  *    partial sums among the tied rows). Callers needing ties must
  *    append a deterministic tiebreak column to the sort.
  *  - `valueCol` must be a NON-NULL `LongType` column. The type is
  *    validated up front (an `IntegerType` would otherwise throw a
  *    bare ClassCastException mid-job — cast in the caller's plan); a
  *    null value fails the first pass with a named error, not an NPE. */
object Prefix {

  def exclusiveScan(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame =
    exclusiveScanOp(df, orderCol, valueCol, outCol, 0L, _ + _)

  /** Exclusive prefix MAX — same two-pass scheme with the (Long.MinValue,
    * max) monoid: `outCol` = max of all values STRICTLY BEFORE the row in
    * `orderCol` order (`Long.MinValue` for the first row). The building
    * block for order-dependent dominance tests (e.g. Pareto frontiers)
    * without an unpartitioned global window. */
  def exclusiveScanMax(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String): DataFrame =
    exclusiveScanOp(df, orderCol, valueCol, outCol, Long.MinValue, math.max)

  /** The scan core, parameterized by any commutative-enough monoid over
    * Long — `op` must be associative with identity `zero` (sum and max
    * here; min/bitwise-or would slot in identically). */
  private def exclusiveScanOp(df: DataFrame, orderCol: String, valueCol: String,
      outCol: String, zero: Long, op: (Long, Long) => Long): DataFrame = {
    val spark = df.sparkSession
    require(df.schema(valueCol).dataType == LongType,
      s"exclusiveScan: valueCol '$valueCol' must be LongType, got " +
        s"${df.schema(valueCol).dataType.simpleString} — cast it in the caller's plan")
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd.persist(StorageLevel.MEMORY_AND_DISK)
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      var s = zero
      it.foreach { r =>
        // pass 2 walks the same persisted rows, so validating here covers both
        if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
          s"exclusiveScan: null in value column (non-null required; coalesce in the caller's plan)")
        s = op(s, r.getLong(vIdx))
      }
      Iterator((i, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(zero)(op) // offsets(i) = fold of all before partition i
    val bc = spark.sparkContext.broadcast(offsets)
    val schema = sorted.schema.add(outCol, LongType, nullable = false)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var run = bc.value(i)
      it.map { r =>
        val row = Row.fromSeq(r.toSeq :+ run)
        run = op(run, r.getLong(vIdx))
        row
      }
    }
    // materialize the result before releasing the inter-pass persist:
    // unpersisting first would recompute (and re-range-partition) the
    // input lazily, and leaving it pinned leaks a full corpus copy per
    // call (clearCache() only drops Dataset caches, not raw RDD persists)
    val result = spark.createDataFrame(out, schema).localCheckpoint(true)
    rdd.unpersist()
    result
  }
}
