package graft

import org.apache.spark.sql.functions._

/** Pins [[graft.engine.Derived]] — the per-JVM derived-relation store
  * behind the shingle index and the minhash/simhash contractions: a
  * derivation builds exactly once per (name, dir), round-trips values
  * exactly, distinct keys stay isolated, and the registry clear makes
  * the next call rebuild (the scratch path is deleted and rewritten). */
class DerivedSpec extends SparkSpec {

  test("builds once per (name, dir), round-trips exactly, isolates keys") {
    import spark.implicits._
    val dirA = java.nio.file.Files.createTempDirectory("derived_a").toString
    val dirB = java.nio.file.Files.createTempDirectory("derived_b").toString
    var builds = 0
    def rel(tag: String) = {
      builds += 1
      Seq((1L, Seq(3L, 5L), tag), (2L, Seq.empty[Long], tag))
        .toDF("id", "xs", "tag")
    }
    val a1 = graft.engine.Derived.cached(spark, "spec_rel", dirA)(rel("a")).collect()
    val a2 = graft.engine.Derived.cached(spark, "spec_rel", dirA)(rel("never"))
    val b1 = graft.engine.Derived.cached(spark, "spec_rel", dirB)(rel("b"))
    assert(builds == 2, s"expected one build per key, saw $builds")
    assert(a2.collect().map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2))).toSet ==
      a1.map(r => (r.getLong(0), r.getSeq[Long](1), r.getString(2))).toSet)
    assert(b1.collect().forall(_.getString(2) == "b"), "keys leaked across dirs")
    // a second NAME over the same dir is its own entry
    graft.engine.Derived.cached(spark, "spec_rel2", dirA)(rel("c"))
    assert(builds == 3)
    // clear(): the next call rebuilds (delete-then-write on the same
    // JVM-keyed scratch path)
    graft.engine.Derived.clear()
    val a3 = graft.engine.Derived.cached(spark, "spec_rel", dirA)(rel("rebuilt"))
    assert(builds == 4)
    assert(a3.collect().forall(_.getString(2) == "rebuilt"))
  }
}
