package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch: the frequency sibling of the HLL rollup — mergeable
  * per-partition heavy-hitter state in sublinear memory. The pipeline
  * shape at 100 TB: build one sketch per day/shard with
  * `count_min_sketch(...)` (map-side mergeable like any agg), merge
  * sketches for any ad-hoc range, and probe hot keys — no raw rescan,
  * bounded state, one-sided error (estimates never undercount).
  */
class CountMinSpec extends SparkSpec {

  private def sketchOf(df: org.apache.spark.sql.DataFrame): CountMinSketch = {
    val bytes = df
      .agg(expr("count_min_sketch(user_id, CAST(0.001 AS DOUBLE), CAST(0.99 AS DOUBLE), 42)"))
      .head().getAs[Array[Byte]](0)
    CountMinSketch.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  test("estimates never undercount, and are exact for the fixture's key counts") {
    val ev = Tables.events(spark, sf).select(col("user_id"))
    val cms = sketchOf(ev)
    val truth = ev.groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(truth.nonEmpty)
    truth.foreach { case (uid, n) =>
      val est = cms.estimateCount(uid)
      assert(est >= n, s"user $uid: estimate $est undercounts true $n")
      // eps=0.001 over this corpus: error bound eps*N is < 1 count
      assert(est <= n + (0.001 * cms.totalCount()).toLong + 1,
        s"user $uid: estimate $est exceeds error bound (true $n)")
    }
  }

  test("per-shard sketches merge to the whole-corpus sketch (mergeable partials)") {
    val ev = Tables.events(spark, sf).select(col("user_id"), col("event_id"))
    val whole = sketchOf(ev)
    val a = sketchOf(ev.filter(pmod(col("event_id"), lit(2)) === 0))
    val b = sketchOf(ev.filter(pmod(col("event_id"), lit(2)) === 1))
    a.mergeInPlace(b)
    val someUsers = ev.select(col("user_id")).distinct().limit(20)
      .collect().map(_.getLong(0))
    someUsers.foreach { uid =>
      assert(a.estimateCount(uid) == whole.estimateCount(uid),
        s"user $uid: merged ${a.estimateCount(uid)} != whole ${whole.estimateCount(uid)}")
    }
  }
}
