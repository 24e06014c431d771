package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Properties of the round-4 text-prep operators that the oracle diff
  * cannot see: chunk coverage/reconstruction, length-band losslessness of
  * the edit-distance candidate join, and the all-ASCII fixture pin the
  * byte-vs-codepoint levenshtein oracle caveat rests on. */
class TextPrepSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("docChunks: windows tile every document — stride-aligned, full coverage, correct clipping") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), length(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = TextAnalysis.docChunks(spark, dir).collect()
    val byDoc = chunks.groupBy(_.getLong(0))
    assert(byDoc.keySet == docs.keySet) // every doc chunked, even short ones
    for ((id, cs) <- byDoc) {
      val n = docs(id)
      val sorted = cs.sortBy(_.getInt(1))
      // chunk ids are 0..k-1; starts stride apart; all but last are full
      assert(sorted.map(_.getInt(1)).toSeq == (0 until sorted.length))
      assert(sorted.init.forall(_.getInt(3) == 200))
      // last chunk reaches exactly the end of the text
      val last = sorted.last
      assert(last.getInt(1) * 150 + last.getInt(3) == n)
      // coverage: next window starts inside the previous one (overlap 50)
      assert(sorted.length == (if (n <= 200) 1 else (n - 200 + 149) / 150 + 1))
    }
  }

  test("spanDedup: each distinct chunk survives exactly once; fully-kept docs reconstruct") {
    val out = TextAnalysis.spanDedup(spark, dir).collect()
    // global invariant: Σ n_kept over the corpus = number of DISTINCT
    // chunk hashes (first occurrence survives, every other copy removed)
    val k = 8
    val distinctChunks = Tables.documents(spark, dir)
      .select(col("doc_id"), expr("split(text, ' ')").as("toks"))
      // mirror the production short-doc guard: sequence(1, 0) yields a
      // DESCENDING [1, 0] and would fabricate two phantom chunks per
      // sub-k-token doc (latent on this fixture — shortest doc has 10
      // tokens — but the derivation must not depend on that)
      .filter(size(col("toks")) >= k)
      .select(explode(expr(
        s"""transform(sequence(1, CAST(floor(size(toks) / $k) AS INT)),
            i -> concat_ws(' ', slice(toks, (i - 1) * $k + 1, $k)))""")).as("c"))
      .agg(countDistinct(col("c"))).head().getLong(0)
    assert(out.map(_.getLong(2)).sum == distinctChunks)
    // reconstruction: a doc keeping ALL its chunks reassembles to its
    // original text (kept chunks in order + tail remainder)
    val texts = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val md5 = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md5.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val full = out.filter(r => r.getLong(1) == r.getLong(2))
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getString(4) == hex(texts(r.getLong(0))),
        s"doc ${r.getLong(0)} fully kept but reassembly differs")
    }
    // every doc appears exactly once, short docs (< k tokens) included
    assert(out.map(_.getLong(0)).toSet == texts.keySet)
  }

  test("curriculumOrder: positions are the exact global rank (permutation, window-agreement)") {
    val out = TextAnalysis.curriculumOrder(spark, dir).collect()
    val n = out.length
    // a permutation of 1..N
    assert(out.map(_.getLong(2)).sorted.toSeq == (1L to n).toSeq)
    // agrees with the single-partition window reference (fixture-sized)
    val byRank = out.sortBy(_.getLong(2))
    val reference = out.sortBy(r => (-r.getDouble(1), r.getLong(0)))
    assert(byRank.map(_.getLong(0)).toSeq == reference.map(_.getLong(0)).toSeq)
  }

  test("lengthBuckets: buckets partition the corpus and widths bound every doc") {
    val docs = Tables.documents(spark, dir)
      .select(expr("size(split(text, ' '))").as("n")).collect().map(_.getInt(0))
    val out = TextAnalysis.lengthBuckets(spark, dir).collect()
    assert(out.map(_.getLong(1)).sum == docs.length)      // every doc bucketed once
    assert(out.map(_.getLong(2)).sum == docs.map(_.toLong).sum) // token mass conserved
    out.foreach { r =>
      val (width, nDocs, dpb, nBatches) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert((width & (width - 1)) == 0L)                 // power of two
      assert(dpb >= 1)
      assert(nBatches == (nDocs + dpb - 1) / dpb)         // ceil division
      assert(r.getLong(5) == nDocs * width)               // padded = n * width
    }
  }

  test("editDistancePairs: banding + q-gram count filter are lossless vs all-pairs") {
    import spark.implicits._
    val banded = Dedup.editDistancePairs(spark, dir).collect().toSeq
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        expr("substring(text, 1, 120)").as("p"))
    val a = docs.select(col("lang"), col("doc_id").as("doc_a"),
      col("n_chars").as("la"), col("p").as("pa"))
    val b = docs.select(col("lang"), col("doc_id").as("doc_b"),
      col("n_chars").as("lb"), col("p").as("pb"))
    val allPairs = a.join(b, "lang")
      .filter(col("doc_a") < col("doc_b") && abs(col("la") - col("lb")) <= 60)
      .withColumn("edit_dist", expr("levenshtein(pa, pb)").cast("int"))
      .filter(col("edit_dist") <= 12)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"))
      .orderBy(col("doc_a"), col("doc_b")).collect().toSeq
    assert(banded == allPairs)
    assert(banded.nonEmpty) // the fixture does contain char-level near-dups
  }

  test("documents fixture is all-ASCII (the levenshtein oracle's byte=codepoint precondition)") {
    // DuckDB's levenshtein counts bytes, Spark's counts codepoints; the
    // oracle comparison is valid only while the corpus is single-byte
    val nonAscii = Tables.documents(spark, dir)
      .filter(length(col("text")) !== octet_length(col("text"))).count()
    assert(nonAscii == 0)
  }

  test("repetitionSignals: coverage fractions match a per-doc brute force") {
    val got = TextAnalysis.repetitionSignals(spark, dir).collect()
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.map(_.getLong(0)).toSet == texts.keySet)
    for (r <- got) {
      val toks = texts(r.getLong(0)).split(" ", -1)
      assert(r.getInt(1) == toks.length)
      val bg = toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
        .groupBy(identity).view.mapValues(_.size)
      val (topG, topN) = bg.toSeq.minBy { case (g, n) => (-n, g) }
      assert(r.getString(2) == topG && r.getLong(3) == topN.toLong)
      val bigFrac = math.min(1.0, topN * 2.0 / toks.length)
      assert(math.abs(r.getDouble(4) - bigFrac) < 1e-4)
      val dupTok = toks.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
        .groupBy(identity).valuesIterator.map(_.size).filter(_ >= 2).map(_ * 3).sum
      val triFrac = math.min(1.0, dupTok.toDouble / toks.length)
      assert(math.abs(r.getDouble(5) - triFrac) < 1e-4)
    }
    // the signal discriminates: the fixture's looping docs score high
    assert(got.exists(_.getDouble(4) > 0.2) && got.exists(_.getDouble(4) < 0.05))
  }

  test("lmPerplexity: bits-per-token matches a driver-side replay of the bigram LM") {
    def money(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val texts = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val bigrams = texts.view.mapValues(
      _.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq).toMap
    val c12 = bigrams.values.flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c1 = c12.groupBy(_._1.split(" ", -1).head).view.mapValues(_.values.sum).toMap
    val v = texts.values.flatten.toSet.size.toDouble
    val got = TextAnalysis.lmPerplexity(spark, dir).collect()
    assert(got.map(_.getLong(0)).toSet == texts.keySet)
    for (r <- got) {
      val bg = bigrams(r.getLong(0))
      assert(r.getLong(1) == bg.length)
      val wSum = bg.groupBy(identity).map { case (g, occ) =>
        BigDecimal(money(occ.size * (math.log((c12(g) + 1.0) /
          (c1(g.split(" ", -1).head) + v)) / math.log(2.0))))
      }.sum
      val bits = money(-(wSum.toDouble) / bg.length)
      assert(r.getDouble(2) == bits)
      assert(r.getDouble(3) == money(math.pow(2.0, bits)))
    }
    // the LM discriminates: scores spread (the fixture's templated docs
    // differ by ~0.5 bits) and the best-scored doc beats the uniform
    // model's log2(V) bits
    val bits = got.map(_.getDouble(2))
    assert(bits.max > bits.min + 0.1)
    assert(bits.min < math.log(v) / math.log(2.0))
  }

  test("perplexityGate: per-lang terciles are balanced, ordered, and keep = not tail") {
    val rows = TextAnalysis.perplexityGate(spark, dir).collect()
    val total = Tables.documents(spark, dir).count()
    assert(rows.length == total)
    for ((_, g) <- rows.groupBy(_.getString(1))) {
      val byBucket = g.groupBy(_.getString(3)).view.mapValues(_.length).toMap
      // ntile(3): bucket sizes differ by at most 1, head gets the remainder first
      val sizes = Seq("head", "middle", "tail").map(byBucket.getOrElse(_, 0))
      assert(sizes.max - sizes.min <= 1 && sizes.sum == g.length)
      assert(sizes(0) >= sizes(1) && sizes(1) >= sizes(2))
      // the cut is ordered: every head score <= every middle <= every tail
      def bits(b: String) = g.filter(_.getString(3) == b).map(_.getDouble(2))
      if (bits("head").nonEmpty && bits("middle").nonEmpty)
        assert(bits("head").max <= bits("middle").min)
      if (bits("middle").nonEmpty && bits("tail").nonEmpty)
        assert(bits("middle").max <= bits("tail").min)
    }
    assert(rows.forall(r => r.getBoolean(4) == (r.getString(3) != "tail")))
  }

  test("dsirWeights: log importance weights match a driver-side replay and favor the target slice") {
    def money(x: Double) = math.floor(x * 10000 + 0.5) / 10000
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2).split(" ", -1).toSeq))
    def feats(toks: Seq[String]) = toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    val buckets = docs.map { case (id, lang, toks) =>
      (id, lang, feats(toks).map(f => Fns.h64Literal(f) % 4096)) }
    val all = buckets.flatMap(_._3)
    val cq = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val enFeats = buckets.filter(_._2 == "en").flatMap(_._3)
    val ct = enFeats.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (qTot, tTot) = (all.size.toDouble, enFeats.size.toDouble)
    val rb = cq.map { case (b, q) =>
      b -> money(math.log(((ct.getOrElse(b, 0L) + 1.0) / (tTot + 4096.0)) /
        ((q + 1.0) / (qTot + 4096.0))) / math.log(2.0)) }
    val expected = buckets.map { case (id, _, bs) =>
      val perB = bs.groupBy(identity).view.mapValues(_.size.toLong)
      id -> money(perB.map { case (b, c) => BigDecimal(money(c * rb(b))) }.sum.toDouble)
    }.toMap
    val got = TextAnalysis.dsirWeights(spark, dir).collect()
    assert(got.length == docs.length)
    for (r <- got) assert(r.getDouble(3) == expected(r.getLong(0)),
      s"doc ${r.getLong(0)}: got ${r.getDouble(3)} want ${expected(r.getLong(0))}")
    // ntile(4) head bucket: exactly the top-quarter by (log_w DESC, doc_id)
    val n = got.length
    val headSize = n / 4 + (if (n % 4 >= 1) 1 else 0)
    val sorted = got.sortBy(r => (-r.getDouble(3), r.getLong(0))).map(_.getLong(0))
    val selIds = got.filter(_.getBoolean(4)).map(_.getLong(0)).toSet
    assert(selIds == sorted.take(headSize).toSet)
    // the weights discriminate: target-language docs average higher
    val (en, rest) = got.partition(_.getString(1) == "en")
    assert(en.map(_.getDouble(3)).sum / en.length > rest.map(_.getDouble(3)).sum / rest.length)
  }

  test("packingManifest: offsets tile the token stream; window spans are exact") {
    val budget = 2048L
    val rows = TextAnalysis.packingManifest(spark, dir).collect()
      .sortBy(_.getLong(0))
    // exclusive-scan tiling: each doc starts where the previous ended
    var expect = 0L
    rows.foreach { r =>
      assert(r.getLong(2) == expect, s"doc ${r.getLong(0)} offset")
      expect += r.getLong(1)
    }
    rows.foreach { r =>
      val (n, off) = (r.getLong(1), r.getLong(2))
      assert(r.getLong(3) == off / budget)
      assert(r.getLong(4) == off % budget)
      val lastTok = off + math.max(n, 1) - 1
      assert(r.getLong(5) == lastTok / budget - off / budget + 1)
      assert(r.getLong(5) >= 1)
    }
    // every context window up to the last is referenced by some doc
    val touched = rows.flatMap(r =>
      r.getLong(3) to (r.getLong(3) + r.getLong(5) - 1)).toSet
    assert(touched == (0L to (expect - 1) / budget).toSet)
  }

  test("corpusMixture: weights normalize and temperature-flattening favors small sources") {
    val rows = TextAnalysis.corpusMixture(spark, dir).collect()
    val weightSum = rows.map(_.getDouble(4)).sum
    assert(math.abs(weightSum - 1.0) < 1e-3) // rounded weights still ~normalize
    val byTokens = rows.sortBy(_.getLong(2))
    assert(byTokens.head.getDouble(5) > 1.0) // smallest source boosted
    assert(byTokens.last.getDouble(5) < 1.0) // largest source damped
    // α=0.5 flattening is order-preserving: more tokens, more weight
    assert(byTokens.map(_.getDouble(4)).toSeq == byTokens.map(_.getDouble(4)).sorted.toSeq)
  }
}
