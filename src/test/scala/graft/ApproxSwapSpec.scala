package graft

import org.apache.spark.sql.functions._
import graft.text.TextAnalysis

/** Several operators document the same 100 TB swap: the exact
  * per-group `percentile` (which buffers every group member on one
  * reducer) is replaced by `approx_percentile` (bounded mergeable
  * sketch state) at cluster scale, "same gate semantics to within the
  * sketch's rank error at the boundary" —
  * [[graft.text.TextAnalysis.qualityGatePerLang]],
  * [[graft.text.TextAnalysis.perplexityGate]],
  * [[graft.text.TextAnalysis.dsirWeights]]. This spec PINS that claim:
  * the swapped plan must produce near-identical thresholds and a
  * near-identical kept set on the fixture, so the documented
  * deployment path is tested, not aspirational. */
class ApproxSwapSpec extends SparkSpec {

  test("quality gate: approx_percentile(p75) threshold ≈ exact, kept sets near-identical") {
    val scored = TextAnalysis.quality(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
    val exact = scored.groupBy(col("lang"))
      .agg(Fns.money(expr("percentile(quality_score, 0.75)")).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val approx = scored.groupBy(col("lang"))
      .agg(Fns.money(expr("approx_percentile(quality_score, 0.75, 10000)")).as("t"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(exact.keySet == approx.keySet)
    val rows = scored.select(col("doc_id"), col("lang"), col("quality_score")).collect()
    for (lang <- exact.keySet) {
      val scores = rows.filter(_.getString(1) == lang).map(_.getDouble(2))
      val keptExact = scores.count(_ >= exact(lang))
      val keptApprox = scores.count(_ >= approx(lang))
      // rank error at accuracy 10000 is far under 1% of any fixture group;
      // allow a whisker for boundary ties
      assert(math.abs(keptExact - keptApprox) <= math.max(1, scores.length / 100),
        s"$lang: exact=${exact(lang)} kept $keptExact, approx=${approx(lang)} kept $keptApprox")
    }
  }

  test("perplexity gate: approx tercile thresholds reproduce the ntile buckets") {
    val gated = TextAnalysis.perplexityGate(spark, sf)
      .select(col("doc_id"), col("lang"), col("bits_per_token"), col("bucket")).collect()
    val th = TextAnalysis.lmPerplexity(spark, sf)
      .join(Tables.documents(spark, sf).select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(expr("approx_percentile(bits_per_token, array(CAST(1.0/3 AS DOUBLE), CAST(2.0/3 AS DOUBLE)), 10000)").as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    var disagree = 0
    for (r <- gated) {
      val Seq(t1, t2) = th(r.getString(1)).toSeq
      val b = r.getDouble(2)
      val approxBucket = if (b <= t1) "head" else if (b <= t2) "middle" else "tail"
      if (approxBucket != r.getString(3)) disagree += 1
    }
    // only boundary docs (score ties straddling a tercile cut) may flip
    assert(disagree <= math.max(2, gated.length / 20),
      s"$disagree of ${gated.length} docs change bucket under the approx swap")
  }
}
