package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range (interval) join: left rows carrying a point column
  * joined to right rows carrying `[start, end]` intervals, ON
  * `point BETWEEN start AND end`.
  *
  * Spark has no shuffle-friendly physical strategy for a pure range
  * predicate — the planner falls back to BroadcastNestedLoopJoin (or a
  * cartesian product), O(|L|·|R|) comparisons, which is the operator that
  * dies first at 100 TB. This re-expresses the range join as an EQUI
  * join Catalyst can hash-partition:
  *
  *  1. pick a bucket width `W` (same unit as the point column);
  *  2. each left point maps to bucket `point div W` — exactly one bucket;
  *  3. each right interval EXPLODES to every bucket it overlaps
  *     (`sequence(start div W, end div W)` — ~len/W + 1 replicas);
  *  4. equi-join on the bucket id (ONE hash shuffle, AQE-skew-splittable);
  *  5. re-apply the exact BETWEEN as a post-filter.
  *
  * Each matching (point, interval) pair is emitted exactly once — the
  * point lives in exactly one bucket, so no dedup pass is needed. Choose
  * `W` near the median interval length: replicas/interval stay ≤ ~2 while
  * buckets stay selective. Degenerate intervals (end < start) match
  * nothing and are dropped up front (`sequence` would otherwise step
  * BACKWARD and fabricate buckets).
  *
  * Point/start/end must be integral and non-negative (epoch days, epoch
  * micros…) — `DIV` truncates toward zero, so negative values would
  * land one bucket high.
  */
object RangeJoin {

  def bucketed(left: DataFrame, pointCol: String,
      right: DataFrame, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val l = left.withColumn("__bucket", expr(s"$pointCol DIV $bucketWidth"))
    val r = right
      .filter(col(endCol) >= col(startCol))
      .withColumn("__bucket",
        explode(expr(s"sequence($startCol DIV $bucketWidth, $endCol DIV $bucketWidth)")))
    l.join(r, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval × interval OVERLAP join (`aStart <= bEnd AND bStart <=
    * aEnd`) — the two-sided sibling of [[bucketed]]: both sides explode
    * to the buckets their interval covers, equi-join on the bucket, then
    * the exact overlap refilter. Because an overlapping pair shares
    * EVERY bucket of its overlap region, naive emission duplicates;
    * instead each pair is emitted only in the overlap's FIRST bucket
    * (`greatest(aStart, bStart) DIV W`) — both sides provably cover that
    * bucket iff they overlap, so emission is exactly-once with NO
    * distinct pass (a distinct would shuffle the full pair set again).
    *
    * Column names of the two sides must be disjoint (rename before
    * calling). Bounds must be integral and non-negative, same unit as
    * `bucketWidth`; pick W near the median interval length. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val ae = a.filter(col(aEnd) >= col(aStart)).withColumn("__bucket",
      explode(expr(s"sequence($aStart DIV $bucketWidth, $aEnd DIV $bucketWidth)")))
    val be = b.filter(col(bEnd) >= col(bStart)).withColumn("__bucket",
      explode(expr(s"sequence($bStart DIV $bucketWidth, $bEnd DIV $bucketWidth)")))
    ae.join(be, Seq("__bucket"))
      .filter(col(aStart) <= col(bEnd) && col(bStart) <= col(aEnd))
      .filter(col("__bucket") === expr(s"greatest($aStart, $bStart) DIV $bucketWidth"))
      .drop("__bucket")
  }
}
