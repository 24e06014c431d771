package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.engine.{Fs, Manifest}

/** Snapshot semantics of the manifest-committed table layer — the
  * transactional-log stand-in for the reference's Delta tables. The
  * properties Delta's log gives and directory-rename publishing cannot:
  * no absent-partition window, readers pinned to a consistent version,
  * crashed commits invisible. */
class ManifestSpec extends SparkSpec {

  private def mk(tag: Int) = {
    import spark.implicits._
    Seq.tabulate(60)(i => (i % 3 + 1, i.toLong, tag)).toDF("p", "id", "version")
  }

  test("write + read round-trips, partition column typed from the committed schema") {
    val path = Files.createTempDirectory("man1").toString
    val v = Manifest.write(mk(0), path, Seq("p"))
    assert(v == 0L)
    val got = Manifest.read(spark, path)
    assert(got.count() == 60)
    assert(got.schema("p").dataType == org.apache.spark.sql.types.IntegerType)
    assert(got.filter(col("p") === 2).count() == 20)
  }

  test("replacePartitions: snapshot isolation — a reader resolved before the commit sees the full old version") {
    import spark.implicits._
    val path = Files.createTempDirectory("man2").toString
    Manifest.write(mk(0), path, Seq("p"))
    // reader resolves v0 (plans lazily against its files)
    val pinned = Manifest.read(spark, path, Some(0L))
    // writer replaces partition p=2 — immutable data dirs, new manifest
    Manifest.replacePartitions(Seq((2, 999L, 1)).toDF("p", "id", "version"), path, Seq("p"))
    // pinned reader: complete OLD snapshot — p=2 present with 20 old rows,
    // never absent (the window replacePartitionsAtomic has) or mixed
    assert(pinned.count() == 60)
    assert(pinned.filter(col("version") =!= 0).count() == 0)
    // fresh reader: new snapshot, only p=2 changed
    val now = Manifest.read(spark, path)
    assert(now.count() == 41)
    assert(now.filter(col("p") === 2).select("id").head().getLong(0) == 999L)
    assert(now.filter(col("p") =!= 2 && col("version") =!= 0).count() == 0)
  }

  test("crash before manifest commit leaves the table byte-identical; vacuum GCs the dangling dir") {
    val path = Files.createTempDirectory("man3").toString
    Manifest.write(mk(0), path, Seq("p"))
    // simulate a writer dying after its data write, before its commit:
    // a data dir exists but no manifest references it
    mk(1).write.partitionBy("p").parquet(s"$path/data-deadbeef")
    assert(Manifest.read(spark, path).count() == 60)
    assert(Manifest.read(spark, path).filter(col("version") =!= 0).count() == 0)
    Manifest.vacuum(spark, path)
    assert(!Fs.exists(spark, s"$path/data-deadbeef"))
    assert(Manifest.read(spark, path).count() == 60) // live snapshot untouched
  }

  test("re-committing the same batch converges (at-least-once loader stays exactly-once)") {
    val path = Files.createTempDirectory("man4").toString
    Manifest.write(mk(0), path, Seq("p"))
    Manifest.replacePartitions(mk(1), path, Seq("p"))
    Manifest.replacePartitions(mk(1), path, Seq("p")) // the retry
    val got = Manifest.read(spark, path)
    assert(got.count() == 60)
    assert(got.filter(col("version") =!= 1).count() == 0)
  }

  test("time travel: every committed version stays readable until vacuumed") {
    val path = Files.createTempDirectory("man5").toString
    Manifest.write(mk(0), path, Seq("p"))
    Manifest.replacePartitions(mk(1).filter(col("p") === 1), path, Seq("p"))
    assert(Manifest.currentVersion(spark, path).contains(1L))
    assert(Manifest.read(spark, path, Some(0L)).filter(col("version") === 1).count() == 0)
    assert(Manifest.read(spark, path, Some(1L)).filter(col("version") === 1).count() == 20)
    // vacuum to 1 version: v0 gone, superseded files gone, live intact
    Manifest.vacuum(spark, path, keepVersions = 1)
    intercept[Exception] { Manifest.read(spark, path, Some(0L)).count() }
    val live = Manifest.read(spark, path)
    assert(live.count() == 60 && live.filter(col("p") === 1 && col("version") =!= 1).count() == 0)
    // exactly the dirs the live manifest references survive
    val refd = Manifest.state(spark, path).get.entries.map(_.dir).toSet
    val onDisk = Fs.listDirs(spark, path).map(_.getName).filter(_.startsWith("data-")).toSet
    assert(onDisk == refd)
  }

  test("losing the commit race surfaces as ConcurrentModificationException, not silent overwrite") {
    val path = Files.createTempDirectory("man6").toString
    Manifest.write(mk(0), path, Seq("p"))
    // two writers both staged against v0 and both target v1: the first
    // commit wins the rename; the loser re-plays the protocol tail with
    // the same stale version number and must be refused loudly
    val winner = Manifest.state(spark, path).get.copy(version = 1L)
    Manifest.commit(spark, path, winner)
    val dup = intercept[java.util.ConcurrentModificationException] {
      Manifest.commit(spark, path, winner)
    }
    assert(dup.getMessage.contains("lost the race"))
    // the winner's manifest is intact, no torn log entry
    assert(Manifest.currentVersion(spark, path).contains(1L))
    assert(Manifest.read(spark, path).count() == 60)
  }

  test("unpartitioned table commits and an empty snapshot keeps its schema") {
    import spark.implicits._
    val path = Files.createTempDirectory("man7").toString
    Manifest.write(mk(0).drop("p"), path)
    assert(Manifest.read(spark, path).count() == 60)
    // full overwrite with an empty frame: snapshot is empty but typed
    Manifest.write(mk(0).drop("p").limit(0), path)
    val empty = Manifest.read(spark, path)
    assert(empty.count() == 0)
    assert(empty.schema.fieldNames.toSeq == Seq("id", "version"))
  }
}
