package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{Manifest, Mv}
import graft.streaming.StreamingMv

/** Streaming incremental MV: per-epoch snapshot commits pinned to the
  * previous epoch's version, replay-safe without sink-side dedup. */
class StreamingMvSpec extends SparkSpec {

  test("epoch-pinned merges equal the one-shot build; a replayed epoch is a no-op") {
    import spark.implicits._
    val root = Files.createTempDirectory("smv").toString
    val in = s"$root/incoming"; val mv = s"$root/mv"; val ckpt = s"$root/ckpt"
    val batches = Seq(
      Seq(("2024-01-01", 10.25), ("2024-01-02", 5.50)),
      Seq(("2024-01-01", 1.75), ("2024-01-03", 2.00)),
      Seq(("2024-01-02", 100.00), ("2024-01-03", 0.25), ("2024-01-04", 7.00)))
    batches.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("day", "amount").coalesce(1).write.parquet(s"$in/f$i")
      // force distinct mod-times so micro-batch order is deterministic
      new java.io.File(s"$in/f$i").listFiles().foreach(
        _.setLastModified(System.currentTimeMillis() + i * 60000))
    }
    val schema = spark.read.parquet(s"$in/f0").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$in/*")
    StreamingMv.sink(stream, mv, ckpt, Seq("day"), "amount").awaitTermination(120000)

    assert(Manifest.currentVersion(spark, mv).contains(2L))
    val got = StreamingMv.serve(spark, mv, Seq("day"))
      .orderBy("day").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val oneShot = Mv.serve(
      Mv.state(batches.flatten.toDF("day", "amount"), Seq("day"), col("amount")), Seq("day"))
      .orderBy("day").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(oneShot))

    // redelivery of epoch 1 (crash after its commit, before the engine
    // checkpointed): same base version, same delta — refused, no change
    val delta1 = Mv.state(batches(1).toDF("day", "amount"), Seq("day"), col("amount"))
    val replay = Mv.merge(Seq(Manifest.read(spark, mv, Some(0L)), delta1), Seq("day"))
    assert(!Manifest.writeVersioned(replay, mv, Seq.empty, 1L))
    assert(Manifest.currentVersion(spark, mv).contains(2L))
    val after = StreamingMv.serve(spark, mv, Seq("day"))
      .orderBy("day").collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(after.sameElements(oneShot))
    // the refused replay left no dangling data dirs behind
    val refd = (0L to 2L).flatMap(v => Manifest.state(spark, mv, Some(v)).get.entries.map(_.dir)).toSet
    val onDisk = graft.engine.Fs.listDirs(spark, mv).map(_.getName).filter(_.startsWith("data-")).toSet
    assert(onDisk == refd)
  }
}
