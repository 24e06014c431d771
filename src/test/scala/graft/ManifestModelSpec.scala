package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Manifest

/** Model-based check of the manifest table layer: a seeded random
  * sequence of DML operations (overwrite, partition replace, delete,
  * upsert, compact, z-order optimize) runs against both the real table
  * and a trivial in-memory map; after EVERY commit the live snapshot
  * must equal the model, and at the end every recorded version must
  * still time-travel to its model snapshot. Catches cross-op
  * interactions (delete-after-upsert, compact-after-delete, …) that
  * per-op specs can't enumerate. */
class ManifestModelSpec extends SparkSpec {

  type Row3 = (Int, Long, Int)
  private def df(rows: Seq[Row3]): DataFrame = {
    import spark.implicits._
    rows.toDF("p", "id", "version")
  }
  private def readSet(path: String, v: Option[Long] = None): Set[Row3] =
    Manifest.read(spark, path, v).collect().toIndexedSeq
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet

  test("random DML sequences match the in-memory model at every version") {
    val rnd = new scala.util.Random(42)
    val path = Files.createTempDirectory("manmodel").toString
    var model = Map.empty[(Int, Long), Int] // (p, id) -> version payload
    val history = scala.collection.mutable.Map.empty[Long, Set[Row3]]

    def fresh(step: Int, parts: Seq[Int]): Seq[Row3] =
      for { p <- parts; id <- 0L until 8L if rnd.nextBoolean() } yield (p, id, step)

    // op 0 must seed the log
    val seed = fresh(0, 1 to 4)
    history(Manifest.write(df(seed), path, Seq("p"))) =
      { model = seed.map(r => (r._1, r._2) -> r._3).toMap; model.map { case ((p, i), v) => (p, i, v) }.toSet }

    for (step <- 1 to 12) {
      val v = rnd.nextInt(5) match {
        case 0 => // replace a random subset of partitions
          val parts = (1 to 4).filter(_ => rnd.nextBoolean()) match {
            case Seq() => Seq(1); case ps => ps
          }
          val rows = fresh(step, parts)
          // replacePartitions replaces only partitions PRESENT in the df:
          // a partition all of whose coin flips came up false is untouched
          val touched = rows.map(_._1).toSet
          model = model.filterNot { case ((p, _), _) => touched.contains(p) } ++
            rows.map(r => (r._1, r._2) -> r._3)
          Manifest.replacePartitions(df(rows), path, Seq("p"))
        case 1 => // delete by predicate
          val m = rnd.nextInt(3) + 2; val r = rnd.nextInt(m)
          val cond = col("id") % m === r
          model = model.filterNot { case ((_, id), _) => id % m == r }
          Manifest.deleteWhere(spark, path, cond)
        case 2 => // upsert: update existing keys + insert new ones
          val ups = model.keys.toSeq.sortBy(identity).take(3)
            .map { case (p, id) => (p, id, step) }
          val ins = Seq((rnd.nextInt(4) + 1, 100L + step, step))
          model = model ++ (ups ++ ins).map(r => (r._1, r._2) -> r._3)
          Manifest.upsert(df(ups ++ ins), path, Seq("p", "id"))
        case 3 =>
          Manifest.compact(spark, path)
        case 4 => // full overwrite
          val rows = fresh(step, 1 to 4)
          model = rows.map(r => (r._1, r._2) -> r._3).toMap
          Manifest.write(df(rows), path, Seq("p"))
      }
      val expect = model.map { case ((p, i), ver) => (p, i, ver) }.toSet
      assert(readSet(path) == expect, s"live snapshot diverged at step $step")
      history(v) = expect
    }
    // every committed version still time-travels to its recorded state
    history.foreach { case (v, snap) =>
      assert(readSet(path, Some(v)) == snap, s"time travel diverged at v$v")
    }
    // CDC invariant: applying the v→v' change feed to the v snapshot
    // reproduces the v' snapshot, for every consecutive committed pair
    // AND for the net head catch-up a restarting consumer would do
    def applyFeed(from: Long, to: Long, base: Set[Row3]): Set[Row3] = {
      val feed = Manifest.changeFeed(spark, path, from, to).collect().toIndexedSeq
      val dels = feed.filter(_.getString(3) == "delete")
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      val ins = feed.filter(_.getString(3) == "insert")
        .map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).toSet
      (base -- dels) ++ ins
    }
    val vs = history.keys.toSeq.sorted
    vs.sliding(2).foreach { case Seq(a, b) =>
      assert(applyFeed(a, b, history(a)) == history(b), s"feed $a->$b diverged")
    case _ => () }
    assert(applyFeed(vs.head, vs.last, history(vs.head)) == history(vs.last),
      "net catch-up feed diverged")
    // vacuum to the live version only: live intact, only referenced dirs remain
    Manifest.vacuum(spark, path)
    assert(readSet(path) == history(history.keys.max))
    val refd = Manifest.state(spark, path).get.entries.map(_.dir).toSet
    val onDisk = graft.engine.Fs.listDirs(spark, path).map(_.getName)
      .filter(_.startsWith("data-")).toSet
    assert(onDisk == refd)
  }
}
