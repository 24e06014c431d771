package graft

import org.apache.spark.sql.functions._
import graft.engine.{Layers, Skew}

class SkewSpec extends SparkSpec {

  test("salted aggregation equals plain groupBy sum/count") {
    val ev = Tables.events(spark, sf)
    val plain = ev.groupBy(col("user_id"))
      .agg(sum(col("value")).as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(ev, col("user_id"), col("value"),
        col("event_id"), salt = 8)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(plain.keySet == salted.keySet)
    assert(plain.forall { case (k, (t, n)) =>
      math.abs(salted(k)._1 - t) < 1e-6 && salted(k)._2 == n
    })
  }

  test("salted aggregation handles a synthetic heavy hitter") {
    import spark.implicits._
    val skewed = (1 to 10000).map(i => (if (i % 100 == 0) i.toLong else 7L, 1.0))
      .toDF("k", "v").withColumn("id", monotonically_increasing_id())
    val out = Skew.saltedSumCount(skewed, col("k"), col("v"), col("id"), salt = 32)
    val hot = out.filter(col("k") === 7L).head()
    assert(hot.getAs[Long]("n") == 9900L)
  }
}

class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    Layers.createAll(spark)
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    Layers.writeBucketed(li, "silver.li_bucketed", "l_orderkey", 8)
    Layers.writeBucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"),
      "silver.o_bucketed", "l_orderkey", 8)
    try {
      // disable broadcast so the join must choose a non-broadcast strategy;
      // bucketing should then satisfy the distribution with zero exchanges
      val s = spark
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Layers.table(s, "silver.li_bucketed")
          .join(Layers.table(s, "silver.o_bucketed"), "l_orderkey")
        val physical = j.queryExecution.executedPlan.toString
        assert(!physical.contains("Exchange hashpartitioning"),
          s"expected bucket-co-located join without shuffle, got:\n$physical")
        assert(j.count() > 0)
      } finally {
        s.conf.set("spark.sql.autoBroadcastJoinThreshold",
          (64L * 1024 * 1024).toString)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS silver.li_bucketed")
      spark.sql("DROP TABLE IF EXISTS silver.o_bucketed")
    }
  }
}

class ApproxSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact for big-pipeline cardinality") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("HLL sketch rollup: daily sketches union to range-wide distincts without rescanning") {
    import graft.queries.Events
    val sketches = Events.dailyUserSketches(spark, sf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // serve a range query purely from the rollup...
      val served = Events.sketchEstimate(sketches, "2024-01-05", "2024-01-20")
        .collect().map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
      // ...and cross-check against the exact distinct over raw events
      val exact = Tables.events(spark, sf)
        .filter(to_date(col("ts")) >= lit("2024-01-05") &&
          to_date(col("ts")) <= lit("2024-01-20"))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(served.keySet == exact.keySet && served.nonEmpty)
      served.foreach { case (t, approx) =>
        val e = exact(t)
        assert(math.abs(approx - e).toDouble / e < 0.05, s"$t: approx=$approx exact=$e")
      }
      // mergeability — the property that makes the rollup valid: union of
      // per-day sketches equals one sketch built over the whole range
      val direct = Tables.events(spark, sf)
        .filter(to_date(col("ts")) >= lit("2024-01-05") &&
          to_date(col("ts")) <= lit("2024-01-20"))
        .groupBy(col("event_type"))
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("direct"))
        .collect().map(r => r.getString(0) -> r.getAs[Long]("direct")).toMap
      served.foreach { case (t, approx) => assert(approx == direct(t), t) }
    } finally sketches.unpersist()
  }

  test("approx_percentile tracks exact percentile within accuracy bound") {
    // exact percentile keeps every distinct value in memory per group —
    // the sketch is the 100 TB path; pin its error against the exact form
    val both = Tables.orders(spark, sf)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.9)").as("exact_p90"),
        expr("approx_percentile(o_totalprice, 0.9, 1000)").as("approx_p90"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val e50 = r.getAs[Double]("exact_p50"); val a50 = r.getAs[Double]("approx_p50")
      val e90 = r.getAs[Double]("exact_p90"); val a90 = r.getAs[Double]("approx_p90")
      assert(math.abs(a50 - e50) / e50 < 0.05, s"p50 $a50 vs $e50")
      assert(math.abs(a90 - e90) / e90 < 0.05, s"p90 $a90 vs $e90")
    }
  }
}

class RuntimeFilterSpec extends SparkSpec {

  test("runtime bloom filter injects into a selective shuffle join") {
    val s = spark
    val saved = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val li = Tables.lineitem(s, sf)
      val p = Tables.part(s, sf).filter(col("p_size") === 1)
      val j = li.join(p, col("l_partkey") === col("p_partkey"))
      // the optimizer wraps the fact-side scan in might_contain(bloom_agg(...))
      assert(j.queryExecution.optimizedPlan.toString.contains("bloom"))
      assert(j.count() > 0)
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      s.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }
}
