package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Invariant specs for the round-7 eval operators: DoReMi domain
  * weights, Matryoshka truncation recall, IVF balance audit, and the
  * dedup threshold curve. The oracle rows prove cross-engine equality;
  * these pin the MATHEMATICAL invariants a refactor could silently
  * break while staying self-consistent on both engines. */
class EvalOpsSpec extends SparkSpec {

  test("doremi_weights: weights are a probability simplex and upweight only above-average sources") {
    val rows = TextAnalysis.doremiWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val wsum = rows.map(_.getAs[Double]("weight")).sum
    // money-rounded per-source weights: sum within grid slack of 1
    assert(math.abs(wsum - 1.0) <= rows.length * 1e-4 + 1e-9, s"sum=$wsum")
    rows.foreach { r =>
      val excess = r.getAs[Double]("excess_bits")
      assert(excess >= 0.0, s"excess must be clipped at 0: $r")
      val (w, share) = (r.getAs[Double]("weight"), r.getAs[Double]("base_share"))
      // 2^excess >= 1, so pre-normalization mass >= share; after
      // normalizing, a zero-excess source can only LOSE weight
      if (excess == 0.0) assert(w <= share + 1e-4, s"zero-excess source gained: $r")
    }
    // the update must actually move something on this fixture
    assert(rows.exists(r => r.getAs[Double]("excess_bits") > 0.0))
  }

  test("matryoshka_recall: recall in [0,1], k pinned, and full-dim self-eval is perfect") {
    val rows = Similarity.matryoshkaRecall(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nHit, k, recall) =
        (r.getAs[Long]("n_hit"), r.getAs[Long]("k"), r.getAs[Double]("recall"))
      assert(k == 5L && nHit >= 0L && nHit <= k)
      assert(math.abs(recall - nHit.toDouble / k) < 1e-9)
    }
    // dims=64 truncation is the identity: recall@k must be exactly 1
    val full = Similarity.matryoshkaRecall(spark, sf, dims = 64).collect()
    assert(full.forall(_.getAs[Double]("recall") == 1.0),
      "full-width truncation must reproduce the ground truth exactly")
  }

  test("ivf_balance: shares sum to 1, load factors average 1, sizes cover the corpus") {
    val rows = Similarity.ivfBalance(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val total = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total,
      "every vector lands in exactly one list")
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) <= rows.length * 1e-4 + 1e-9)
    rows.foreach { r =>
      val (nv, sh, lf) = (r.getAs[Long]("n_vecs"), r.getAs[Double]("share"),
        r.getAs[Double]("load_factor"))
      assert(nv > 0L)
      // load_factor = share * nClusters on the money grid
      assert(math.abs(lf - sh * 10.0) <= 2e-3, s"$r")
    }
  }

  test("dedup_threshold_curve: buckets in [0.5,0.9], cumulative monotone from the strict end") {
    val rows = Dedup.dedupThresholdCurve(spark, sf)
      .orderBy(col("threshold_lo").desc).collect()
    assert(rows.nonEmpty)
    var cum = 0L
    rows.foreach { r =>
      val lo = r.getAs[Double]("threshold_lo")
      assert(lo >= 0.5 - 1e-9 && lo <= 0.9 + 1e-9, s"bucket out of range: $r")
      val (np, nd) = (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_docs"))
      assert(np > 0L && nd >= 2L)
      // a pair touches exactly 2 docs, so docs <= 2*pairs
      assert(nd <= 2L * np, s"$r")
      cum += np
      assert(r.getAs[Long]("cum_pairs") == cum,
        s"cum_pairs must accumulate from the strict end: $r (expect $cum)")
    }
  }

  test("dq_checks: every expectation passes on the clean fixture, one row per check") {
    val rows = graft.queries.DataQuality.dqChecks(spark, sf).collect()
    assert(rows.length == 10, rows.mkString("\n"))
    rows.foreach { r =>
      assert(r.getAs[String]("status") == "pass" && r.getAs[Long]("n_violations") == 0L,
        s"fixture must be clean: $r")
    }
    assert(rows.map(_.getAs[String]("table_name")).toSet ==
      Set("orders", "lineitem", "customer", "documents"))
  }

  test("epoch_shards: each (doc, epoch) once, contiguous positions, epochs permute differently") {
    val rows = TextAnalysis.epochShards(spark, sf).collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.length == 3 * nDocs)
    // exactly one assignment per (doc, epoch)
    assert(rows.map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("epoch"))).distinct.length ==
      rows.length)
    // positions are 1..n within each (epoch, shard)
    rows.groupBy(r => (r.getAs[Int]("epoch"), r.getAs[Int]("shard"))).foreach {
      case (_, g) =>
        val ps = g.map(_.getAs[Int]("position")).sorted.toList
        assert(ps == (1 to g.length).toList,
          s"positions not contiguous: ${ps.take(5)}")
    }
    // the permutation really changes between epochs: some doc moves shard
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.exists(g => g.map(_.getAs[Int]("shard")).distinct.length > 1))
  }

  test("dedup_threshold_curve: group-contracted counts equal the doc-level pair expansion") {
    // the production path never materializes doc pairs; this replays the
    // doc-level definition through minhashPairs itself and compares
    val docLevel = Dedup.minhashPairs(spark, sf, threshold = 0.5,
        bandSubset = Some(Seq(0)))
      .withColumn("threshold_lo",
        Fns.money(least(floor(col("jaccard") * 10) / 10, lit(0.9))))
      .groupBy(col("threshold_lo"))
      .agg(count(lit(1)).as("n_pairs"))
      .collect().map(r => r.getAs[Double]("threshold_lo") -> r.getAs[Long]("n_pairs"))
      .toMap
    val got = Dedup.dedupThresholdCurve(spark, sf).collect()
      .map(r => r.getAs[Double]("threshold_lo") -> r.getAs[Long]("n_pairs")).toMap
    assert(got == docLevel, s"contracted=$got doc-level=$docLevel")
  }
}
