package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.CorpusIngest

/** Incremental corpus ingestion: near-dups rejected within a batch,
  * across batches against the stored index, and the whole thing
  * idempotent under batch replay. */
class CorpusIngestSpec extends SparkSpec {

  private val base = (0 until 60).map(i => s"w$i").mkString(" ")
  private def variant(tag: String) = ((0 until 59).map(i => s"w$i") :+ tag).mkString(" ")
  private def unique(tag: String) = (0 until 60).map(i => s"$tag$i").mkString(" ")

  test("within-batch and cross-batch near-dups rejected; replay idempotent") {
    import spark.implicits._
    val root = Files.createTempDirectory("ingest").toString

    // batch 0: A, B≈A (59/61 tokens shared → jaccard .967), C unique
    val b0 = Seq((1L, base), (2L, variant("x1")), (3L, unique("q")))
      .toDF("doc_id", "text")
    val n0 = CorpusIngest.ingestBatch(b0, root, batchId = 0L)
    assert(n0 == 2)
    assert(CorpusIngest.corpus(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(1L, 3L))

    // batch 1: D≈A (cross-batch, vs the stored index), E unique
    val b1 = Seq((10L, variant("y2")), (11L, unique("z"))).toDF("doc_id", "text")
    val n1 = CorpusIngest.ingestBatch(b1, root, batchId = 1L)
    assert(n1 == 1)
    val afterB1 = CorpusIngest.corpus(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(afterB1 == Set(1L, 3L, 11L))

    // replay batch 1 (crash-after-write, checkpoint lost): REPLACES, never appends
    val n1r = CorpusIngest.ingestBatch(b1, root, batchId = 1L)
    assert(n1r == 1)
    val corpus = CorpusIngest.corpus(spark, root)
    assert(corpus.count() == 3)
    assert(corpus.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L, 3L, 11L))
  }

  test("out-of-order replay of an OLDER batch probes only strictly-earlier index partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("ingest_ooo").toString
    val b0 = Seq((1L, base), (2L, unique("u"))).toDF("doc_id", "text")
    val b1 = Seq((10L, variant("y2")), (11L, unique("z"))).toDF("doc_id", "text")
    assert(CorpusIngest.ingestBatch(b0, root, batchId = 0L) == 2)
    assert(CorpusIngest.ingestBatch(b1, root, batchId = 1L) == 1)
    // A redelivered batch must see exactly the index its original run
    // saw: strictly earlier batch_ids, with partition pruning making the
    // exclusion a directory skip. Proof by poison: a LATER partition of
    // garbage bytes crashes any plan that actually opens it — so the
    // replays below succeed only if later partitions are pruned, not
    // merely filtered post-scan.
    val poison = new java.io.File(s"$root/index/batch_id=99")
    poison.mkdirs()
    Files.write(poison.toPath.resolve("part-00000.parquet"),
      "not a parquet file".getBytes)
    assert(CorpusIngest.ingestBatch(b0, root, batchId = 0L) == 2) // probes nothing
    assert(CorpusIngest.ingestBatch(b1, root, batchId = 1L) == 1) // probes batch 0 only
    val ids = CorpusIngest.corpus(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 11L))
  }

  test("streaming form: micro-batched file source builds the same deduped corpus") {
    import spark.implicits._
    val root = Files.createTempDirectory("ingest_s").toString
    val in = s"$root/incoming"; val ckpt = s"$root/ckpt"
    // two files → two micro-batches (maxFilesPerTrigger=1)
    Seq((1L, base), (2L, variant("x1")), (3L, unique("q")))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/f0")
    Seq((10L, variant("y2")), (11L, unique("z")))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$in/f1")
    // the file source orders micro-batches by modification time; writes
    // landing in the same timestamp granule would make batch order (and
    // which near-dup side survives) nondeterministic — force f1 later
    new java.io.File(s"$in/f1").listFiles().foreach { f =>
      f.setLastModified(System.currentTimeMillis() + 60000)
    }
    val schema = spark.read.parquet(s"$in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
    val q = CorpusIngest.sink(stream, s"$root/corpus", ckpt)
    q.awaitTermination(120000)
    val ids = CorpusIngest.corpus(spark, s"$root/corpus")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 3L, 11L))
  }
}
