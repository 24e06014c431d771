package graft

import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Focused pins on the RDD-based connected-components fixpoint
  * ([[Dedup.minLabelFixpoint]], round-10 rewrite): the end-to-end cluster
  * queries exercise it on the fixture's graph shape, this spec drives the
  * shapes the fixture can't — deep chains (pointer-jumping's reason to
  * exist), disjoint mixes, an empty edge set, and label-permutation
  * invariance (hash partition routing must not leak into results). */
class MinLabelFixpointSpec extends SparkSpec {

  private def labelsOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.minLabelFixpoint(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("deep chain collapses to the global min (pointer jumping past O(1) rounds)") {
    // a 300-node path: naive propagation needs ~300 rounds, the 64-round
    // guard proves jumping is actually engaged
    val chain = (0L until 299L).map(i => (i + 7, i + 8)) // ids 7..306
    val ls = labelsOf(chain)
    assert(ls.size == 300)
    assert(ls.values.forall(_ == 7L))
  }

  test("disjoint components each get their own min; singleton edges too") {
    val pairs = Seq(
      (10L, 2L), (2L, 30L),     // component min 2
      (100L, 101L),             // component min 100
      (500L, 500L))             // degenerate self-pair: own label
    val ls = labelsOf(pairs)
    assert(ls(10L) == 2L && ls(2L) == 2L && ls(30L) == 2L)
    assert(ls(100L) == 100L && ls(101L) == 100L)
    assert(ls(500L) == 500L)
  }

  test("empty edge set yields an empty label relation without looping forever") {
    assert(labelsOf(Seq.empty).isEmpty)
  }

  test("random graphs: labels equal a driver-side union-find reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def draw[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    for (trial <- 1 to 5) {
      // sparse random graph over a sparse id space: a mix of tiny
      // components, chains, and the occasional larger blob
      val nEdges = 20 + trial * 15
      val pairs = draw(Gen.zip(Gen.choose(1L, 120L), Gen.choose(1L, 120L)),
        nEdges, trial * 1000L).filter { case (a, b) => a != b }
      // reference: naive union-find with min-root union
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      val expected = pairs.flatMap(p => Seq(p._1, p._2)).distinct
        .map(x => x -> find(x)).toMap
      assert(labelsOf(pairs) == expected, s"trial $trial: $pairs")
    }
  }

  test("labels are id-permutation consistent: relabeled graph gives relabeled result") {
    // same topology under two id assignments that hash to different
    // partitions — the min label must follow the ids, not the routing
    val base = Seq((1L, 9L), (9L, 4L), (20L, 25L))
    def shift(s: Long) = base.map { case (a, b) => (a * 1000 + s, b * 1000 + s) }
    val l1 = labelsOf(shift(3))
    val l2 = labelsOf(shift(17))
    assert(l1.map { case (k, v) => (k - 3, v - 3) } ==
      l2.map { case (k, v) => (k - 17, v - 17) })
  }
}
