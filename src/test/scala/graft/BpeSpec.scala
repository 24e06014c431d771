package graft

import graft.text.Bpe

/** Distributed BPE trainer vs a plain sequential reference implementation
  * on the same fixture corpus: the merge SEQUENCE (order, pairs, counts)
  * must be identical, which pins both the pair-count aggregation and the
  * greedy left-to-right remap fold. */
class BpeSpec extends SparkSpec {

  // --- sequential reference trainer (textbook BPE, driver-side) ---

  private def refWords(texts: Seq[String]): Map[Vector[String], Long] =
    texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.toVector.map(_.toString) -> ws.size.toLong
      }

  private def refMergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (x <- syms)
      if (out.nonEmpty && out.last == l && x == r) out(out.size - 1) = l + r
      else out += x
    out.toVector
  }

  private def refTrain(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
    var words = refWords(texts)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    while (round < k) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, cnt) <- words; i <- 0 until syms.size - 1)
        pairs((syms(i), syms(i + 1))) = pairs.getOrElse((syms(i), syms(i + 1)), 0L) + cnt
      if (pairs.isEmpty) round = k
      else {
        val ((l, r), c) = pairs.minBy { case ((a, b), n) => (-n, a, b) }
        merges += ((l, r, c))
        words = words.toSeq.map { case (syms, cnt) => (refMergeWord(syms, l, r), cnt) }
          .groupBy(_._1).map { case (s, g) => s -> g.map(_._2).sum }
        round += 1
      }
    }
    merges.toSeq
  }

  test("distributed merge sequence equals the sequential reference") {
    val texts = TestSession.spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0)).toSeq
    val expected = refTrain(texts, 10)
    val got = Bpe.trainMerges(spark, sf, 10).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got == expected,
      s"merge sequences diverge:\n  dist: $got\n  ref : $expected")
  }

  test("segmentation is lossless: joining a word's segments reconstructs the word") {
    val rows = Bpe.segmentedVocab(spark, sf, 5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(2).replace(" ", "") == r.getString(0),
        s"segmentation not a partition of the word: $r")
    }
    // at least one multi-character subword must have been learned
    assert(rows.exists(_.getString(2).split(" ").exists(_.length > 1)))
  }
}
