package graft

import org.apache.spark.sql.functions._
import graft.queries.{Extras, Graphs}

/** Fixed-point PageRank ([[graft.queries.Graphs]]) and winsorized stats
  * ([[graft.queries.Extras.winsorizedStats]]). */
class GraphsSpec extends SparkSpec {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    val both = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val e = both.toDF("src", "dst")
    e.join(e.groupBy($"src").agg(count(lit(1)).as("outdeg")), "src")
  }

  test("pagerank: symmetric triangle is the uniform fixed point") {
    val r = Graphs.pagerank(sym((1L, 2L), (2L, 3L), (1L, 3L)), iters = 5).collect()
    assert(r.length == 3)
    val ranks = r.map(_.getLong(1)).toSet
    assert(ranks.size == 1, s"uniform graph must rank uniformly: ${r.toSeq}")
    val third = Graphs.Scale / 3
    // floor-division leaks a few units of mass per round, never gains
    assert(ranks.head <= third && ranks.head >= third - 1000)
  }

  test("pagerank: path center outranks endpoints, mass is conserved minus floor leakage") {
    val r = Graphs.pagerank(sym((1L, 2L), (2L, 3L)), iters = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) > r(1L) && r(1L) == r(3L),
      s"center must dominate symmetric endpoints: $r")
    val total = r.values.sum
    assert(total <= Graphs.Scale && total > (Graphs.Scale * 99L) / 100L,
      s"rank mass off: $total of ${Graphs.Scale}")
  }

  test("part_pagerank on the fixture: conserved mass, degree-correlated head") {
    val ranks = Graphs.partPagerank(spark, sf).collect()
    val total = ranks.map(_.getLong(1)).sum
    assert(total <= Graphs.Scale && total > (Graphs.Scale * 99L) / 100L)
    // the top-ranked part must be in the top decile by degree: PageRank on
    // a near-regular co-purchase graph tracks degree
    val deg = Graphs.coPurchaseEdges(spark, sf)
      .groupBy($"src").agg(first($"outdeg").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cut = deg.values.toSeq.sorted.reverse
      .apply(math.max(0, deg.size / 10 - 1))
    assert(deg(ranks.head.getLong(0)) >= cut,
      s"top-ranked part has degree ${deg(ranks.head.getLong(0))}, decile cut $cut")
  }

  private def adjOf(pairs: (Long, Long)*): org.apache.spark.sql.DataFrame = {
    val both = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }.distinct
    both.toDF("src", "dst").groupBy($"src")
      .agg(sort_array(collect_set($"dst")).as("nbrs"))
      .withColumn("outdeg", size($"nbrs").cast("long"))
  }

  test("kcore: pendant chain peels over cascading rounds, the clique survives") {
    // K4 {1,2,3,4} + chain 4-5-6: 6 peels round 1, 5 only round 2
    val adj = adjOf((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L))
    val r = Graphs.kcoreAdj(adj, k = 2L, rounds = 12).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L))
    // in-core degrees: node 4's pendant is gone, all four sit at 3
    assert(r.values.toSet === Set(3L))
    // k above the clique degree empties the core
    assert(Graphs.kcoreAdj(adj, k = 4L, rounds = 12).count() === 0L)
  }

  test("kcore: random graphs match brute-force peeling at several k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def draw[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
      (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
    for (trial <- 1 to 4; k <- Seq(2L, 3L)) {
      val pairs = draw(Gen.zip(Gen.choose(1L, 40L), Gen.choose(1L, 40L)),
        30 + trial * 10, trial * 777L).filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        // reference: peel to fixpoint on the symmetric closure
        val adjM = (pairs ++ pairs.map(_.swap)).distinct
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        var alive = adjM.keySet
        var stable = false
        while (!stable) {
          val next = alive.filter(v => (adjM(v) & alive).size >= k)
          stable = next == alive; alive = next
        }
        val expected = alive.map(v => v -> (adjM(v) & alive).size.toLong).toMap
        // rounds ≥ node count: a path graph peels one layer per round,
        // so fixpoint can take up to n rounds on adversarial shapes
        val got = Graphs.kcoreAdj(adjOf(pairs: _*), k, rounds = 40).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got === expected, s"trial $trial k=$k: $pairs")
      }
    }
  }

  test("part_kcore on the fixture: matches brute-force peeling to fixpoint") {
    val got = Graphs.partKcore(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force peel over the same co-purchase edge set
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long")).distinct()
      .as[(Long, Long)].collect()
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sumDeg = adj.values.map(_.size.toLong).sum
    val k = (7L * sumDeg) / (10L * adj.size)
    var alive = adj.keySet
    var stable = false
    var guard = 0
    while (!stable && guard < 100) {
      val next = alive.filter(v => (adj(v) & alive).size >= k)
      stable = next == alive
      alive = next
      guard += 1
    }
    assert(guard < 12, s"fixture no longer converges within the 12-round horizon ($guard)")
    val expected = alive.map(v => v -> (adj(v) & alive).size.toLong).toMap
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("triangle counts: per-node counts match a brute-force enumeration") {
    val got = Graphs.triangleCounts(spark, sf, k = 1000).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over the same undirected edge set
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long")).distinct()
      .as[(Long, Long)].collect()
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val expected = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) if c > b && adj(b)(c)) {
      expected(a) += 1; expected(b) += 1; expected(c) += 1
    }
    assert(got.nonEmpty)
    // k=1000 exceeds the node count at sf0.001, so the result is complete
    assert(got.keySet === expected.keySet)
    got.foreach { case (node, n) =>
      assert(n === expected(node), s"node $node: got $n, brute ${expected(node)}")
    }
    // totals agree too (each triangle contributes 3 corners)
    assert(expected.values.sum % 3 === 0L)
  }

  test("part similarity: common-neighbor counts match brute force, jaccard in (0,1]") {
    val got = Graphs.partSimilarity(spark, sf, minCommon = 2).collect()
    assert(got.nonEmpty)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long")).distinct()
      .as[(Long, Long)].collect()
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val common = (adj(a) intersect adj(b)).size
      assert(r.getLong(2) === common.toLong, s"($a,$b)")
      assert(r.getLong(3) === adj(a).size.toLong && r.getLong(4) === adj(b).size.toLong)
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("label propagation: labels match a driver-side synchronous replay; sizes consistent") {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey").cast("long")).distinct()
      .as[(Long, Long)].collect()
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = (edges.toSeq ++ edges.toSeq.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var labels: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      labels = adj.map { case (n, nbrs) =>
        val counts = nbrs.map(labels).groupBy(identity).view.mapValues(_.size).toMap
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val got = Graphs.partCommunities(spark, sf).collect()
    assert(got.length == labels.size)
    val sizes = labels.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { r =>
      assert(r.getLong(1) == labels(r.getLong(0)), s"part ${r.getLong(0)}")
      assert(r.getLong(2) == sizes(r.getLong(1)))
    }
    // propagation actually merged: strictly fewer communities than nodes
    assert(sizes.size < labels.size)
  }

  test("coPurchaseAdjacency is exactly the edge list regrouped: same nodes, neighbors, degrees") {
    val adj = Graphs.coPurchaseAdjacency(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1).toList, r.getLong(2))).toMap
    val fromEdges = Graphs.coPurchaseEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(adj.keySet == fromEdges.keySet)
    fromEdges.foreach { case (n, es) =>
      val (nbrs, deg) = adj(n)
      assert(nbrs == es.map(_._2).sorted.toList, s"node $n neighbor mismatch")
      assert(deg == es.head._3 && deg == nbrs.length, s"node $n degree mismatch")
      assert(nbrs == nbrs.distinct, s"node $n duplicate neighbors")
    }
  }

  test("winsorized stats: mean clamped into [lo, hi], clips counted, raw mean off-bounds") {
    Extras.winsorizedStats(spark, sf).collect().foreach { r =>
      val (lo, hi) = (r.getDouble(6), r.getDouble(7))
      val wm = r.getDouble(4)
      assert(wm >= lo && wm <= hi, s"winsor_mean $wm outside [$lo, $hi]")
      // p05/p95 clipping must actually clip on 1500+ orders per priority
      assert(r.getLong(2) > 0 && r.getLong(3) > 0, s"no rows clipped: $r")
      assert(lo < hi)
    }
  }
}
