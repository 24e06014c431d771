package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.{Manifest, Mv}

/** Incremental materialized-view maintenance: merge-order independence of
  * the partial-aggregate state, and the manifest-pinned refresh protocol
  * that keeps replays exactly-once. */
class MvSpec extends SparkSpec {

  private def orders(n: Int, seed: Int): DataFrame = {
    import spark.implicits._
    // money-grid values (2 decimals) across 5 days
    Seq.tabulate(n)(i => (s"2024-01-0${i % 5 + 1}",
      ((i * 7919 + seed * 13) % 100000) / 100.0)).toDF("day", "amount")
  }

  private def rows(df: DataFrame): Seq[(String, Long, Double, Double)] =
    df.orderBy("day").collect().toIndexedSeq
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))

  test("state merge is order-independent and equals the one-shot full build") {
    val full = orders(300, 1)
    val slices = Seq(
      full.filter(col("amount") < 300),
      full.filter(col("amount") >= 300 && col("amount") < 600),
      full.filter(col("amount") >= 600)).map(Mv.state(_, Seq("day"), col("amount")))
    val ab_c = Mv.merge(Seq(Mv.merge(slices.take(2), Seq("day")), slices(2)), Seq("day"))
    val a_bc = Mv.merge(Seq(slices(0), Mv.merge(slices.drop(1), Seq("day"))), Seq("day"))
    val oneShot = Mv.state(full, Seq("day"), col("amount"))
    val expect = rows(Mv.serve(oneShot, Seq("day")))
    assert(rows(Mv.serve(ab_c, Seq("day"))) == expect)
    assert(rows(Mv.serve(a_bc, Seq("day"))) == expect)
  }

  test("manifest-pinned refresh: replaying a crashed refresh cannot double-count the delta") {
    val path = Files.createTempDirectory("mvman").toString
    val batch0 = orders(200, 1)
    val delta = orders(80, 2)
    val v0 = Manifest.write(Mv.state(batch0, Seq("day"), col("amount")), path, Seq("day"))
    // refresh = merge(state@BASE VERSION, delta partials) → commit.
    // Pinning the read to the base version is what makes replay safe: a
    // retry that read "latest" after a crash-after-commit would fold the
    // delta in twice.
    def refresh(): Long = Manifest.write(
      Mv.merge(Seq(Manifest.read(spark, path, Some(v0)),
        Mv.state(delta, Seq("day"), col("amount"))), Seq("day")),
      path, Seq("day"))
    refresh()
    refresh() // the replay (crash after commit, before checkpoint ack)
    val got = rows(Mv.serve(Manifest.read(spark, path), Seq("day")))
    val expect = rows(Mv.serve(
      Mv.state(batch0.unionByName(delta), Seq("day"), col("amount")), Seq("day")))
    assert(got == expect)
  }
}
