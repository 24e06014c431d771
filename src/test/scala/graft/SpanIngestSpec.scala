package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.SpanIngest
import graft.text.TextAnalysis

/** The streaming span-dedup ingest: batch-sequence equivalence with the
  * global batch operator, replay idempotence, and the foreachBatch
  * wrapper end-to-end over a memory stream. */
class SpanIngestSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text"))

  test("id-ordered batches reproduce the global dedup exactly; replay is a no-op") {
    val root = java.nio.file.Files.createTempDirectory("spaningest").toString
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val removed1 = SpanIngest.ingestBatch(b1, root, 0)
    val removed2 = SpanIngest.ingestBatch(b2, root, 1)
    assert(removed1 >= 0 && removed2 > 0) // the fixture is near-dup-dense

    def state() = SpanIngest.corpus(spark, root)
      .select(col("doc_id"), col("n_kept"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq

    // batches ascending in doc_id ⇒ the incremental first-occurrence
    // election coincides with the global min-(doc_id, chunk_no) keeper
    val incremental = state()
    val global = TextAnalysis.spanDedupOn(docs)
      .select(col("doc_id"), col("n_kept"), col("clean_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(incremental == global)

    // replay batch 0 AFTER batch 1 was ingested: decision basis is
    // `< batchId` so the rewrite re-derives bit-for-bit and the
    // batch-keyed replace leaves the corpus unchanged
    val removedReplay = SpanIngest.ingestBatch(b1, root, 0)
    assert(removedReplay == removed1)
    assert(state() == incremental)
  }

  test("foreachBatch sink over a memory stream matches the direct batch calls") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("spanstream").toString
    val ckpt = java.nio.file.Files.createTempDirectory("spanckpt").toString
    val all = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)]
    val q = SpanIngest.sink(
      input.toDF().toDF("doc_id", "text"), root, ckpt, availableNow = false)
    input.addData(all.filter(_._1 < 250).toSeq)
    q.processAllAvailable()
    input.addData(all.filter(_._1 >= 250).toSeq)
    q.processAllAvailable()
    q.stop()
    val streamed = SpanIngest.corpus(spark, root)
      .select(col("doc_id"), col("n_kept"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val global = TextAnalysis.spanDedupOn(docs)
      .select(col("doc_id"), col("n_kept"), col("clean_text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(streamed == global)
  }
}
