package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Pins [[Dedup.dedupIncremental]] (batch-vs-corpus near-dup admission)
  * to the symmetric [[Dedup.minhashPairs]] it specializes: restricting
  * the full pair relation to cross-side pairs and taking each batch
  * doc's best match (rounded Jaccard DESC, corpus doc_id ASC) must give
  * exactly the incremental operator's verdicts — same candidates (the
  * band buckets are the same), same verify, same tie-break.
  */
class DedupIncrementalSpec extends SparkSpec {

  test("dedupIncremental == per-batch-doc argmax of minhashPairs' cross-side pairs") {
    val inc = Dedup.dedupIncremental(spark, sf).collect()
    val crossSide = Dedup.minhashPairs(spark, sf).collect().flatMap { r =>
      val a = r.getLong(0); val b = r.getLong(1); val j = r.getDouble(2)
      if (a % 10 == 0 && b % 10 != 0) Some((a, b, j))
      else if (b % 10 == 0 && a % 10 != 0) Some((b, a, j))
      else None // batch-internal / corpus-internal pairs are out of scope
    }
    val expected = crossSide.groupBy(_._1).map { case (d, ps) =>
      val m = ps.maxBy(p => (p._3, -p._2)) // jaccard DESC, corpus id ASC
      d -> ((m._2, m._3))
    }
    val batchIds = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    // one row per batch doc, no extras
    assert(inc.map(_.getLong(0)).toSet == batchIds)
    assert(inc.length == batchIds.size)
    var dups = 0
    inc.foreach { r =>
      val d = r.getLong(0)
      expected.get(d) match {
        case Some((matchId, j)) =>
          assert(r.getBoolean(1), s"doc $d must be flagged dup")
          assert(r.getLong(2) == matchId, s"doc $d: match ${r.getLong(2)} != $matchId")
          assert(r.getDouble(3) == j, s"doc $d: jaccard ${r.getDouble(3)} != $j")
          dups += 1
        case None =>
          assert(!r.getBoolean(1), s"doc $d must not be flagged dup")
          assert(r.isNullAt(2) && r.isNullAt(3), s"doc $d: no-match row must carry nulls")
      }
    }
    // the fixture is dup-dense: the test must exercise BOTH branches
    assert(dups > 0 && dups < batchIds.size,
      s"degenerate fixture split: $dups dups of ${batchIds.size} batch docs")
  }

  test("broadcast guard: maxBroadcastSets=0 degrades to the shuffled band join with identical verdicts") {
    // forcing the fallback path (every real batch exceeds a 0 bound)
    // must change the PLAN, never the result — same candidates, same
    // verify, same argmax
    val viaBroadcast = Dedup.dedupIncremental(spark, sf)
      .collect().map(_.toSeq).toSet
    val viaShuffle = Dedup.dedupIncremental(spark, sf, maxBroadcastSets = 0L)
      .collect().map(_.toSeq).toSet
    assert(viaShuffle == viaBroadcast)
    assert(viaBroadcast.nonEmpty)
  }

  test("degenerate splits: empty batch, empty corpus, cross-side exact clone") {
    import spark.implicits._
    def dirWith(rows: Seq[(Long, String)], tag: String): String = {
      val tmp = java.nio.file.Files.createTempDirectory(tag).toString
      rows.toDF("doc_id", "text").write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      tmp
    }
    // no doc_id % 10 == 0 ⇒ nothing to admit, empty output (not an error)
    val noBatch = dirWith(Seq((1L, "a b c"), (2L, "d e f"), (3L, "g h i")), "edi_nb")
    assert(Dedup.dedupIncremental(spark, noBatch).collect().isEmpty)
    // corpus empty ⇒ every batch doc comes back is_dup=false with nulls
    val noCorpus = dirWith(Seq((10L, "a b c"), (20L, "d e f")), "edi_nc")
    val nc = Dedup.dedupIncremental(spark, noCorpus).collect()
    assert(nc.map(_.getLong(0)).toSeq == Seq(10L, 20L))
    assert(nc.forall(r => !r.getBoolean(1) && r.isNullAt(2) && r.isNullAt(3)))
    // an exact cross-side clone must flag at jaccard 1.0 via the band join
    val clone = dirWith(Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely unrelated set of corpus words here")), "edi_cl")
    val cl = Dedup.dedupIncremental(spark, clone).collect()
    assert(cl.length == 1 && cl.head.getLong(0) == 10L)
    assert(cl.head.getBoolean(1) && cl.head.getLong(2) == 1L
      && cl.head.getDouble(3) == 1.0, cl.mkString(","))
  }
}
