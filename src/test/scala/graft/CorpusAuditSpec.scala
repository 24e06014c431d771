package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.queries.Events
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Invariants of the corpus-audit operators (cross-source overlap,
  * ANN recall eval, tokenizer coverage) that the oracle diff cannot
  * see: sketch-vs-exact fidelity, recall bounds, and mass conservation.
  */
class CorpusAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("sourceOverlap: all pairs present, exact Jaccard bounded, sketch tracks truth") {
    val rows = Dedup.sourceOverlap(spark, dir).collect()
    val nSources = Tables.documents(spark, dir)
      .select(countDistinct(col("source"))).head().getLong(0).toInt
    assert(rows.length == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val (common, union, j, est) =
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))
      assert(common <= union && union > 0)
      assert(j >= 0.0 && j <= 1.0 && est >= 0.0 && est <= 1.0)
      assert(math.abs(j - common.toDouble / union) < 1e-4)
    }
    // union-MinHash with K=16 has σ ≈ 0.125 per pair; the MEAN absolute
    // error across 190 pairs must be well inside that band
    val mae = rows.map(r => math.abs(r.getDouble(4) - r.getDouble(5))).sum / rows.length
    assert(mae < 0.2, s"sketch mean abs error $mae")
  }

  test("docSpanDupRatio: coherent with spanDedup — removals are a subset of duplicated chunks") {
    val report = TextAnalysis.docSpanDupRatio(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val dedup = TextAnalysis.spanDedup(spark, dir).collect()
    dedup.foreach { r =>
      val (nChunks, dupChunks) = report(r.getLong(0))
      assert(nChunks == r.getLong(1))
      // every chunk the dedup removed is multi-occurrence, so
      // removed ≤ duplicated; a doc with zero dup chunks keeps all
      assert(r.getLong(1) - r.getLong(2) <= dupChunks)
      if (dupChunks == 0) assert(r.getLong(2) == r.getLong(1))
    }
  }

  test("sourceFolds: folds partition sources and docs; assignment is source-stable") {
    val rows = TextAnalysis.sourceFolds(spark, dir).collect()
    val nSources = Tables.documents(spark, dir)
      .select(countDistinct(col("source"))).head().getLong(0)
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nSources)
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach(r => assert(r.getInt(0) >= 0 && r.getInt(0) < 4))
  }

  test("sourceDupRatio: partitions the corpus; ratios consistent with the cluster relation") {
    val rows = Dedup.sourceDupRatio(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nDocs)
    val dupDocs = Dedup.nearDupClusters(spark, dir)
      .filter(col("cluster_size") > 1)
      .join(Tables.documents(spark, dir).select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) == dupDocs.getOrElse(r.getString(0), 0L))
      assert(math.abs(r.getDouble(3) -
        math.floor(r.getLong(2).toDouble / r.getLong(1) * 10000 + 0.5) / 10000) < 1e-9)
    }
  }

  test("vocabCoverageCurve: coverage monotone in vocab size, saturating at full vocab") {
    val rows = TextAnalysis.vocabCoverageCurve(spark, dir).collect()
      .sortBy(_.getInt(0))
    val total = Tables.documents(spark, dir)
      .select(sum(expr("size(split(text, ' '))"))).head().getLong(0)
    val vocab = Tables.documents(spark, dir)
      .select(explode(expr("split(text, ' ')")).as("t"))
      .select(countDistinct(col("t"))).head().getLong(0)
    val covs = rows.map(_.getDouble(2))
    assert(covs.zip(covs.tail).forall { case (a, b) => a <= b })
    rows.foreach(r => assert(r.getLong(1) <= total))
    // a size ≥ the whole vocabulary must cover every occurrence
    rows.filter(_.getInt(0) >= vocab).foreach { r =>
      assert(r.getLong(1) == total && r.getDouble(2) == 1.0)
    }
  }

  test("eventDebounce: matches a driver-side gap replay per event type") {
    val rows = Events.eventDebounce(spark, dir).collect()
    val events = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        col("ts").cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val expected = events.groupBy(_._2).map { case (t, es) =>
      val kept = es.groupBy(_._1).map { case (_, ue) =>
        val sorted = ue.sortBy(e => (e._4, e._3))
        1 + sorted.zip(sorted.tail).count { case (a, b) => b._4 - a._4 > 300 }
      }.sum
      t -> (es.length.toLong, kept.toLong)
    }
    rows.foreach { r =>
      val (n, k) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == k,
        s"${r.getString(0)}: got (${r.getLong(1)},${r.getLong(2)}) want ($n,$k)")
    }
  }

  test("embeddingOutliers: per-cluster ranks contiguous, cosines ascending from the bottom") {
    val rows = Similarity.embeddingOutliers(spark, dir).collect()
    val byCid = rows.groupBy(_.getInt(0))
    byCid.values.foreach { cs =>
      val sorted = cs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.length <= 3)
      // rank 1 is the FARTHEST (lowest cosine); ascending down the list
      val cos = sorted.map(_.getDouble(3))
      assert(cos.zip(cos.tail).forall { case (a, b) => a <= b })
    }
    // outliers are distinct docs
    assert(rows.map(_.getLong(2)).distinct.length == rows.length)
  }

  test("sourceDrift: all pairs present; cosine matches a driver-side centroid replay") {
    val rows = Similarity.sourceDrift(spark, dir).collect()
    val data = Tables.embeddings(spark, dir)
      .join(Tables.documents(spark, dir)
        .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
      .select(col("source"), expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1)))
    def money(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val centroids = data.groupBy(_._1).map { case (s, vs) =>
      val dim = vs.head._2.length
      s -> (0 until dim).map { i =>
        val sum = vs.map(v => BigDecimal(money(v._2(i)))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
        money(sum / vs.length)
      }
    }
    val nSources = centroids.size
    assert(rows.length == nSources * (nSources - 1) / 2)
    rows.foreach { r =>
      val (va, vb) = (centroids(r.getString(0)), centroids(r.getString(1)))
      val dot = va.zip(vb).foldLeft(0.0) { case (a, (x, y)) => a + x * y }
      val na = va.foldLeft(0.0)((a, x) => a + x * x)
      val nb = vb.foldLeft(0.0)((a, x) => a + x * x)
      assert(math.abs(r.getDouble(2) - money(dot / math.sqrt(na * nb))) < 2e-4)
      assert(r.getDouble(2) >= -1.0001 && r.getDouble(2) <= 1.0001)
    }
  }

  test("clusterSizeHist: size × clusters = docs per bucket; mass totals the clustered set") {
    val rows = Dedup.clusterSizeHist(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getLong(0) * r.getLong(1) == r.getLong(2),
        s"size ${r.getLong(0)}: ${r.getLong(1)} clusters but ${r.getLong(2)} docs")
    }
    val clustered = Dedup.nearDupClusters(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == clustered)
  }

  test("pqRecall: bounded, consistent, and the PQ shortlist beats random recall") {
    val rows = Similarity.pqRecall(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
      assert(math.abs(r.getDouble(3) - r.getLong(1).toDouble / r.getLong(2)) < 1e-4)
    }
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.2, s"mean PQ recall $mean")
  }

  test("annRecall: per-query recall bounded and consistent with n_hit") {
    val rows = Similarity.annRecall(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (hit, k, recall) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(hit >= 0 && hit <= k)
      assert(math.abs(recall - hit.toDouble / k) < 1e-4)
    }
    // probing 2/10 lists must beat random-list recall on the fixture
    val mean = rows.map(_.getDouble(3)).sum / rows.length
    assert(mean >= 0.2, s"mean recall $mean")
  }

  test("clusterTopics: contiguous ranks per cluster, scores consistent and ordered") {
    val rows = Similarity.clusterTopics(spark, dir).collect()
    val byCid = rows.groupBy(_.getInt(0))
    byCid.values.foreach { cs =>
      val sorted = cs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      assert(sorted.length <= 5)
      // scores non-increasing down the ranking; score = money(tf·ln(K/df))
      val scores = sorted.map(_.getDouble(5))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      sorted.foreach { r =>
        val expect = math.floor(
          r.getLong(3) * math.log(10.0 / r.getLong(4)) * 10000 + 0.5) / 10000
        assert(math.abs(r.getDouble(5) - expect) < 1e-9)
      }
    }
    // every document's cluster is represented across the topics input
    assert(byCid.keySet.size > 1)
  }

  test("zipfFit: negative slope on a frequency-ranked vocabulary") {
    val r = TextAnalysis.zipfFit(spark, dir).head()
    val vocab = Tables.documents(spark, dir)
      .select(explode(expr("split(text, ' ')")).as("t"))
      .select(countDistinct(col("t"))).head().getLong(0)
    assert(r.getLong(0) == math.min(100L, vocab))
    assert(r.getDouble(1) < 0.0, s"zipf slope ${r.getDouble(1)} must be negative")
  }

  test("mixtureSchedule: targets exhaust the budget within rounding; oversampling ⇔ epochs > 1") {
    val rows = TextAnalysis.mixtureSchedule(spark, dir).collect()
    val totalTokens = rows.map(_.getLong(1)).sum
    val budget = math.floor(totalTokens * 2.0).toLong
    // Σ target_tokens ≤ budget, and within one floor-loss per source of it
    val targets = rows.map(_.getLong(3)).sum
    assert(targets <= budget && targets >= budget - rows.length * 2 -
      (budget * 2) / 10000, s"targets $targets vs budget $budget")
    rows.foreach { r =>
      assert(r.getBoolean(5) == (r.getDouble(4) > 1.0))
      assert(r.getLong(3) >= 0 && r.getLong(1) > 0)
    }
    // 2× budget + flattened weights ⇒ oversampling must occur somewhere
    // (both outcomes need uneven sources — sf0.001's are near-uniform,
    // so only the existence side is scale-independent)
    assert(rows.exists(_.getBoolean(5)))
  }

  test("embeddingQuantize: checksums within code range, error small but nonzero") {
    val rows = Similarity.embeddingQuantize(spark, dir).collect()
    val dim = Tables.embeddings(spark, dir)
      .select(expr("size(embedding)")).head().getInt(0)
    // checksum of d codes in 0..255 weighted by 1..d is bounded by 255·Σi
    val maxSum = 255L * dim * (dim + 1) / 2
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= maxSum)
      assert(r.getDouble(2) >= 0.0)
    }
    // int8 over ~unit ranges: mean error well under 100 ppm, not all zero
    val mean = rows.map(_.getDouble(2)).sum / rows.length
    assert(mean > 0.0 && mean < 100.0, s"mean recon ppm $mean")
  }

  test("simhashPrecision: buckets cover the pair set; flags and ratios consistent") {
    val rows = Dedup.simhashPrecision(spark, dir).collect()
    val nPairs = Dedup.simhashPairs(spark, dir).count()
    assert(rows.map(_.getLong(1)).sum == nPairs)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(math.abs(r.getDouble(4) -
        math.floor(r.getLong(2).toDouble / r.getLong(1) * 10000 + 0.5) / 10000) < 1e-9)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
    // Hamming 0 pairs are (near-)identical: mean Jaccard must be high
    rows.find(_.getInt(0) == 0).foreach(r => assert(r.getDouble(3) > 0.9))
  }

  test("sketchAgreement: n_caught is exactly the pair-set intersection") {
    val r = Dedup.sketchAgreement(spark, dir).head()
    // the eval's MinHash universe is the deterministic band-0 SAMPLE
    // (see sketchAgreement's scaladoc) — the spec replays the same
    // subset; the simhash membership side stays exhaustive
    val mh = Dedup.minhashPairs(spark, dir, bandSubset = Some(Seq(0)))
      .select(col("doc_a"), col("doc_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val sh = Dedup.simhashPairs(spark, dir)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(r.getLong(0) == mh.size)
    assert(r.getLong(1) == mh.intersect(sh).size)
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("spanDedup is idempotent: a second pass over the deduped corpus removes nothing") {
    import spark.implicits._
    val once = graft.text.TextAnalysis
      .spanDedupOn(Tables.documents(spark, dir)).collect()
    val again = graft.text.TextAnalysis.spanDedupOn(
      once.map(r => (r.getLong(0), r.getString(4)))
        .toSeq.toDF("doc_id", "text"))
      .collect()
    // pass 2 must keep EVERY chunk of every doc (each chunk value is
    // globally unique after pass 1 — chunk boundaries re-align exactly
    // because removal happens in whole k-token blocks)
    again.foreach { r =>
      assert(r.getLong(1) == r.getLong(2),
        s"doc ${r.getLong(0)}: pass 2 removed ${r.getLong(1) - r.getLong(2)} chunks")
    }
    // and reassembly is a fixpoint: pass-2 text == pass-1 text
    val t1 = once.map(r => r.getLong(0) -> r.getString(4)).toMap
    again.foreach(r => assert(r.getString(4) == t1(r.getLong(0))))
  }

  test("langConfusion: cells partition the corpus; correct ⇔ diagonal") {
    val rows = TextAnalysis.langConfusion(spark, dir).collect()
    val nDocs = Tables.documents(spark, dir).count()
    assert(rows.map(_.getLong(2)).sum == nDocs)
    rows.foreach { r =>
      assert(r.getBoolean(3) == (r.getString(0) == r.getString(1)))
    }
  }

  test("splitLeakage: exactly the cross-split subset of the near-dup edge set") {
    val leaks = TextAnalysis.splitLeakage(spark, dir).collect()
    val splits = Tables.documents(spark, dir)
      .select(col("doc_id"), when(graft.Fns.h64(col("text")) % 10 === 0,
        lit("test")).otherwise(lit("train")).as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = graft.dedup.Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = pairs.filter { case (a, b) => splits(a) != splits(b) }.toSet
    assert(leaks.map(r => (r.getLong(0), r.getLong(1))).toSet == expected)
    leaks.foreach(r => assert(r.getString(3) != r.getString(4)))
  }

  test("clusterSplit: zero cross-split near-dup pairs BY CONSTRUCTION; covers every doc") {
    val split = TextAnalysis.clusterSplit(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(3)))).toMap
    assert(split.size == Tables.documents(spark, dir).count())
    // atomically-assigned clusters: one split per cluster_id
    assert(split.values.groupBy(_._1).forall { case (_, vs) => vs.map(_._2).toSet.size == 1 })
    // the PREVENTION guarantee: no near-dup edge (the same Hamming ≤ 3
    // basis the clusters are built from) straddles the boundary —
    // contrast with splitLeakage, which measures the leaks the naive
    // content-hash split allows
    val pairs = graft.dedup.Dedup.simhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val leaks = pairs.filter { case (a, b) => split(a)._2 != split(b)._2 }
    assert(leaks.isEmpty, s"cluster-aware split leaked near-dup pairs: ${leaks.take(5)}")
  }

  test("qualityOls: Cramer solve matches a driver-side normal-equations replay") {
    val r = graft.queries.Analytics.qualityOls(spark, dir).head()
    // replay: collect the same money-rounded features and solve in Scala
    def money(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val feats = graft.text.TextAnalysis.lexicalDiversity(spark, dir)
      .select(col("doc_id"), col("entropy_bits"))
      .join(graft.text.TextAnalysis.quality(spark, dir)
        .select(col("doc_id"), col("n_tokens"), col("stopword_ratio")), "doc_id")
      .collect()
      .map(row => (money(math.log(row.getInt(2))), row.getDouble(3), row.getDouble(1)))
    val n = feats.length.toDouble
    def s(f: ((Double, Double, Double)) => Double) =
      feats.map(t => BigDecimal(f(t)).setScale(8, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val (s11, s12, s22) = (s(t => money(t._1 * t._1)), s(t => money(t._1 * t._2)), s(t => money(t._2 * t._2)))
    val (s1y, s2y) = (s(t => money(t._1 * t._3)), s(t => money(t._2 * t._3)))
    val det = n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2) + s2 * (s1 * s12 - s11 * s2)
    val b0 = (sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y) + s2 * (s1y * s12 - s11 * s2y)) / det
    val b1 = (n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2) + s2 * (s1 * s2y - s1y * s2)) / det
    val b2 = (n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2) + sy * (s1 * s12 - s11 * s2)) / det
    assert(r.getLong(0) == feats.length)
    assert(math.abs(r.getDouble(1) - money(b0)) < 2e-4, s"beta0 ${r.getDouble(1)} vs $b0")
    assert(math.abs(r.getDouble(2) - money(b1)) < 2e-4, s"beta1 ${r.getDouble(2)} vs $b1")
    assert(math.abs(r.getDouble(3) - money(b2)) < 2e-4, s"beta2 ${r.getDouble(3)} vs $b2")
    // entropy grows with document length: the ln-tokens coefficient is positive
    assert(r.getDouble(2) > 0.0)
    assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0) // R²
  }

  test("tokenizerCoverage: token mass conserved, coverage consistent") {
    val rows = TextAnalysis.tokenizerCoverage(spark, dir).collect()
    val totalToks = Tables.documents(spark, dir)
      .select(sum(expr("size(split(text, ' '))"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == totalToks)
    rows.foreach { r =>
      val (n, cov, rate) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(r.getLong(2) <= n)
      assert(cov >= 0.0 && cov <= 1.0)
      assert(math.abs(cov + rate - 1.0) < 2e-4) // money-rounded complements
    }
  }
}
