package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def events = Tables.events(spark, sf)
    .select(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
      .cast("long").as("d"), col("event_id"))

  private def windows = {
    val base = datediff(lit("2024-01-01").cast("date"), lit("1970-01-01").cast("date")).cast("long")
    spark.range(0, 40).select(col("id").as("window_id"),
      (base + col("id") * 3).as("start_day"),
      (base + col("id") * 3 + 9).as("end_day"))
  }

  test("bucketed range join equals the naive non-equi join, for several widths") {
    val naive = events.join(windows,
        col("d") >= col("start_day") && col("d") <= col("end_day"))
      .select(col("event_id"), col("window_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 5L, 7L, 100L)) {
      val fast = RangeJoin.bucketed(events, "d", windows, "start_day", "end_day", w)
        .select(col("event_id"), col("window_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == naive, s"width=$w: ${fast.size} vs ${naive.size}")
    }
  }

  test("plans as a hash equi-join, never a nested loop") {
    val fast = RangeJoin.bucketed(events, "d", windows, "start_day", "end_day", 7L)
    val plan = fast.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    // the naive form really does fall back to a nested loop — the thing
    // this operator exists to avoid
    val naive = events.join(windows,
      col("d") >= col("start_day") && col("d") <= col("end_day"))
    assert(naive.queryExecution.executedPlan.toString.contains("BroadcastNestedLoopJoin"))
  }

  test("inclusive bounds, exactly-once emission, degenerate intervals dropped") {
    val pts = Seq(0L, 5L, 10L, 15L).toDF("p")
    val ivs = Seq(
      (1L, 0L, 10L),   // includes both endpoints
      (2L, 10L, 10L),  // single-point interval
      (3L, 9L, 2L)     // degenerate: end < start → matches nothing
    ).toDF("iv_id", "s", "e")
    val out = RangeJoin.bucketed(pts, "p", ivs, "s", "e", 4L)
      .select(col("p"), col("iv_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((0L, 1L), (5L, 1L), (10L, 1L), (10L, 2L)))
  }

  test("intervalOverlap: equals the naive non-equi join, each pair emitted once") {
    // intervals spanning multiple shared buckets (W=4) — the duplication
    // trap the first-bucket emission rule exists for
    val a = Seq((1L, 0L, 11L), (2L, 6L, 7L), (3L, 20L, 21L))
      .toDF("a_id", "a_s", "a_e")
    val b = Seq((10L, 2L, 9L), (11L, 11L, 19L), (12L, 22L, 30L))
      .toDF("b_id", "b_s", "b_e")
    val fast = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 4L)
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val naive = a.join(b, col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select(col("a_id"), col("b_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // same multiset: no duplicates from multi-bucket overlaps, no losses
    assert(fast.sorted == naive.sorted && fast.nonEmpty)
    // and it stays a hash join, not a nested loop
    val plan = RangeJoin.intervalOverlap(a, "a_s", "a_e", b, "b_s", "b_e", 4L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }
}
