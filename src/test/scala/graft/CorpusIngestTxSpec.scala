package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.Manifest
import graft.streaming.{CorpusIngest, CorpusIngestTx}

/** The manifest-committed corpus ingest: same admission decisions as the
  * directory-keyed [[CorpusIngest]], plus the substrate's guarantees —
  * snapshot-isolated readers, version-keyed replay skip, time-travel
  * decision basis, and crash recovery between the two table commits. */
class CorpusIngestTxSpec extends SparkSpec {

  private val base = (0 until 60).map(i => s"w$i").mkString(" ")
  private def variant(tag: String) = ((0 until 59).map(i => s"w$i") :+ tag).mkString(" ")
  private def unique(tag: String) = (0 until 60).map(i => s"$tag$i").mkString(" ")

  test("admission decisions match the directory-keyed variant; replay is a version-probe skip") {
    import spark.implicits._
    val root = Files.createTempDirectory("tx1").toString
    val b0 = Seq((1L, base), (2L, variant("x1")), (3L, unique("q")))
      .toDF("doc_id", "text")
    val b1 = Seq((10L, variant("y2")), (11L, unique("z"))).toDF("doc_id", "text")
    assert(CorpusIngestTx.ingestBatch(b0, root, 0L) == 2)
    assert(CorpusIngestTx.ingestBatch(b1, root, 1L) == 1)
    val ids = CorpusIngestTx.corpus(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 11L))
    // replay of batch 1: detected by hasVersion, nothing recomputed or
    // re-committed — versions unchanged on both tables
    assert(CorpusIngestTx.ingestBatch(b1, root, 1L) == 1)
    assert(Manifest.currentVersion(spark, s"$root/docs").contains(1L))
    assert(Manifest.currentVersion(spark, s"$root/index").contains(1L))
  }

  test("snapshot isolation: a reader pinned before a batch sees the complete earlier corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory("tx2").toString
    CorpusIngestTx.ingestBatch(
      Seq((1L, base), (2L, unique("u"))).toDF("doc_id", "text"), root, 0L)
    val pinned = CorpusIngestTx.corpus(spark, root, Some(0L))
    CorpusIngestTx.ingestBatch(
      Seq((10L, variant("y2")), (11L, unique("z"))).toDF("doc_id", "text"), root, 1L)
    // pinned: exactly the v0 corpus, regardless of the later commit
    assert(pinned.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(CorpusIngestTx.corpus(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L))
  }

  test("crash between index and docs commits recovers with the identical decision basis") {
    import spark.implicits._
    val root = Files.createTempDirectory("tx3").toString
    CorpusIngestTx.ingestBatch(
      Seq((1L, base), (2L, unique("u"))).toDF("doc_id", "text"), root, 0L)
    // simulate the crash window: batch 1's INDEX commit landed, docs did
    // not — by running only the index half by hand
    val b1 = Seq((10L, variant("y2")), (11L, unique("z"))).toDF("doc_id", "text")
    val sigs = graft.dedup.Dedup.signaturesFor(b1)
    Manifest.replacePartitionsVersioned(
      sigs.filter(col("doc_id") === 11L).withColumn("batch_id", lit(1L)),
      s"$root/index", Seq("batch_id"), 1L)
    assert(!Manifest.hasVersion(spark, s"$root/docs", 1L))
    // recovery replay: index half skips (version exists), docs half
    // recomputes against index v0 — the original basis — and commits
    assert(CorpusIngestTx.ingestBatch(b1, root, 1L) == 1)
    assert(CorpusIngestTx.corpus(spark, root)
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 2L, 11L))
  }

  test("an all-rejected batch still commits its version; replay skips; corpus unchanged") {
    import spark.implicits._
    val root = Files.createTempDirectory("tx4").toString
    CorpusIngestTx.ingestBatch(Seq((1L, base)).toDF("doc_id", "text"), root, 0L)
    // batch 1 is one near-dup of the stored corpus → zero admitted
    assert(CorpusIngestTx.ingestBatch(
      Seq((10L, variant("y9"))).toDF("doc_id", "text"), root, 1L) == 0)
    assert(Manifest.currentVersion(spark, s"$root/docs").contains(1L))
    assert(CorpusIngestTx.corpus(spark, root).count() == 1)
    // progress recorded: the replay is detected even with nothing written
    assert(CorpusIngestTx.ingestBatch(
      Seq((10L, variant("y9"))).toDF("doc_id", "text"), root, 1L) == 0)
    assert(Manifest.currentVersion(spark, s"$root/docs").contains(1L))
  }

  test("streaming form: micro-batched file source builds the same corpus as the directory variant") {
    import spark.implicits._
    val root = Files.createTempDirectory("tx5").toString
    val in = s"$root/incoming"; val ckpt = s"$root/ckpt"
    Seq((1L, base), (2L, variant("x1")), (3L, unique("q")))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/f0")
    Seq((10L, variant("y2")), (11L, unique("z")))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/f1")
    new java.io.File(s"$in/f1").listFiles().foreach { f =>
      f.setLastModified(System.currentTimeMillis() + 60000)
    }
    val schema = spark.read.parquet(s"$in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
    val q = CorpusIngestTx.sink(stream, s"$root/corpus", ckpt)
    q.awaitTermination(120000)
    assert(CorpusIngestTx.corpus(spark, s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 11L))
  }
}
