package graft

import org.apache.spark.sql.functions._
import graft.engine.Prefix
import graft.queries.Analytics

class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("exclusiveScanMax equals the single-partition window reference") {
    val df = Seq((1L, 5L), (2L, 3L), (3L, 9L), (4L, 2L), (5L, 9L), (6L, 1L))
      .toDF("ord", "v")
    val got = Prefix.exclusiveScanMax(df, "ord", "v", "pmax")
      .orderBy("ord").select("ord", "pmax").as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> Long.MinValue, 2L -> 5L, 3L -> 5L,
      4L -> 9L, 5L -> 9L, 6L -> 9L))
  }

  test("skyline: every result is undominated, every non-result is dominated") {
    val sky = Analytics.partSkyline(spark, sf)
      .select("price", "psize").as[(Double, Int)].collect().toSet
    val pairs = Tables.part(spark, sf)
      .select(col("p_retailprice"), col("p_size")).distinct()
      .as[(Double, Int)].collect().toSeq
    def dominated(p: (Double, Int)) = pairs.exists(q =>
      q._1 <= p._1 && q._2 >= p._2 && (q._1 < p._1 || q._2 > p._2))
    assert(sky.nonEmpty)
    sky.foreach(p => assert(!dominated(p), s"$p on frontier but dominated"))
    pairs.filterNot(sky).foreach(p => assert(dominated(p), s"$p dropped but undominated"))
  }

  test("pps sample: ~n draws, heavy certainty items kept, pure function of data") {
    val s1 = Analytics.ppsSample(spark, sf, n = 50).collect()
    val s2 = Analytics.ppsSample(spark, sf, n = 50).collect()
    assert(s1.toSeq === s2.toSeq) // no RNG anywhere
    // systematic PPS draws between n - #certainty-overflows and n + 1 rows
    assert(s1.length >= 40 && s1.length <= 51, s"got ${s1.length} draws")
    // every order heavier than the stride is a certainty draw
    val w = Tables.orders(spark, sf)
      .select(floor(col("o_totalprice") * 10000 + 0.5).cast("long").as("wt"))
    val total = w.agg(sum("wt")).as[Long].head()
    val stride = total / 50
    val heavyKeys = Tables.orders(spark, sf)
      .filter(floor(col("o_totalprice") * 10000 + 0.5).cast("long") > stride)
      .select("o_orderkey").as[Long].collect().toSet
    val drawn = s1.map(_.getLong(0)).toSet
    assert(heavyKeys.subsetOf(drawn))
  }

  test("ewma: constant series converges to the constant, truncation bias decays") {
    // alpha=1/2 truncated at k lags: weights sum to 1 - 2^-k, so a
    // constant 100 series must read exactly 100 * (1 - 2^-30) ~ 100
    val days = (0 until 40).map(i => (i, 100.0))
    val df = days.toDF("i", "day_revenue")
      .select(date_add(to_date(lit("2024-01-01")), col("i")).as("day"), col("day_revenue"))
    val win = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val ewma = (0 until 30)
      .map(k => coalesce(lag(col("day_revenue"), k).over(win), lit(0.0)) *
        lit(math.pow(0.5, k + 1)))
      .reduce(_ + _)
    val last = df.select(col("day"), Fns.money(ewma).as("e"))
      .orderBy(col("day").desc).limit(1).select("e").as[Double].head()
    assert(last === 100.0) // 100 * 2^-30 rounds away at the 1e-4 grid
  }

  test("mad outliers: counts match a driver-side replay") {
    val rows = Analytics.madOutliers(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_totalprice"))
      .as[(String, Double)].collect().groupBy(_._1)
    rows.foreach { r =>
      val xs = data(r.getString(0)).map(_._2)
      val med = r.getDouble(2); val mad = r.getDouble(3)
      assert(r.getLong(1) === xs.length.toLong)
      val expected = xs.count(x => math.abs(x - med) > 3.0 * mad)
      assert(r.getLong(4) === expected.toLong, s"priority ${r.getString(0)}")
    }
  }

  test("profiler: one row per column, exact metrics for a spot-checked column") {
    val p = Analytics.profileOrders(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(p.keySet === Tables.orders(spark, sf).schema.fieldNames.toSet)
    val o = Tables.orders(spark, sf)
    val k = p("o_orderkey")
    assert(k.getLong(1) === o.count())
    assert(k.getLong(2) === 0L)
    assert(k.getLong(3) === o.select("o_orderkey").distinct().count())
    assert(k.getDouble(4) === o.agg(min("o_orderkey")).head().getLong(0).toDouble)
    assert(p("o_orderstatus").isNullAt(4)) // non-numeric: no min/max
  }

  test("dow seasonality: weighted seasonal indices average to ~1") {
    val rows = Analytics.dowSeasonality(spark, sf).collect()
    assert(rows.length === 7)
    val nTotal = rows.map(_.getLong(1)).sum.toDouble
    val weighted = rows.map(r => r.getDouble(3) * r.getLong(1) / nTotal).sum
    assert(math.abs(weighted - 1.0) < 0.01, s"weighted index mean $weighted")
  }

  test("revenue trend: slope matches a driver-side OLS replay") {
    val rows = Analytics.revenueTrend(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.orders(spark, sf)
      .select(col("o_orderpriority"),
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date")).cast("long"),
        col("o_totalprice"))
      .as[(String, Long, Double)].collect().groupBy(_._1)
    rows.foreach { r =>
      val pts = data(r.getString(0))
      val n = pts.length.toDouble
      val sx = pts.map(_._2.toDouble).sum; val sy = pts.map(_._3).sum
      val sxy = pts.map(p => p._2 * p._3).sum; val sx2 = pts.map(p => p._2.toDouble * p._2).sum
      val slope = (n * sxy - sx * sy) / (n * sx2 - sx * sx)
      assert(math.abs(r.getDouble(3) - slope * 365.0) < 1.0,
        s"priority ${r.getString(0)}: got ${r.getDouble(3)}, replay ${slope * 365.0}")
    }
  }

  test("basket rules: confidence and lift agree with exact count ratios") {
    val rows = Analytics.basketRules(spark, sf, k = 10).collect()
    assert(rows.nonEmpty)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .as[(Long, Long)].collect()
    val byBasket = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val itemCnt = items.groupBy(_._2).view.mapValues(_.length).toMap
    val nB = byBasket.size.toDouble
    rows.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val pair = byBasket.valuesIterator.count(s => s(a) && s(b))
      assert(r.getLong(2) === pair.toLong)
      assert(math.abs(r.getDouble(3) - pair.toDouble / itemCnt(a)) < 1e-3)
      assert(math.abs(r.getDouble(4) - pair * nB / (itemCnt(a).toDouble * itemCnt(b))) < 1e-3)
    }
  }

  test("rfm segments: scores in 1..4, customer total conserved, monotone monetary") {
    val rows = Analytics.rfmSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq(0, 1, 2).foreach(i => assert(r.getInt(i) >= 1 && r.getInt(i) <= 4))
      assert(r.getDouble(4) > 0)
    }
    val total = rows.map(_.getLong(3)).sum
    val nCust = Tables.orders(spark, sf).select("o_custkey").distinct().count()
    assert(total === nCust) // every customer lands in exactly one segment
    // higher m_score buckets have higher mean monetary on average
    val byM = rows.groupBy(_.getInt(2)).view
      .mapValues(rs => rs.map(r => r.getDouble(4) * r.getLong(3)).sum / rs.map(_.getLong(3)).sum)
      .toMap
    assert(byM(4) > byM(1))
  }

  test("partkey skew: shares bounded, HHI matches the integer-form replay") {
    val rows = Analytics.partkeySkew(spark, sf).collect()
    assert(rows.nonEmpty)
    val counts = Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey")).count().as[(Long, Long)].collect().map(_._2)
    val total = counts.sum.toDouble
    val hhi = counts.map(c => c * c).sum / (total * total) * 10000
    rows.foreach { r =>
      assert(r.getDouble(2) > 0 && r.getDouble(2) <= 100.0)
      assert(math.abs(r.getDouble(3) - hhi) < 0.001, s"hhi ${r.getDouble(3)} vs $hhi")
    }
  }

  test("bigram novelty: ratio bounds and an all-unique-corpus degenerate case") {
    val rows = Analytics.bigramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, rare, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rare <= n && ratio >= 0.0 && ratio <= 1.0)
    }
    // a document whose bigrams all have corpus count <= 2 has ratio 1
    val allRare = rows.filter(r => r.getLong(2) == r.getLong(1))
    allRare.foreach(r => assert(r.getDouble(3) === 1.0))
  }

  test("kAnonymity: classes partition customers; flags match their definitions") {
    val rows = Analytics.kAnonymity(spark, sf).collect()
    val nCustomers = Tables.customer(spark, sf).count()
    assert(rows.map(_.getLong(3)).sum == nCustomers) // QI classes partition the table
    rows.foreach { r =>
      val (size, lDist, kFlag, lFlag) =
        (r.getLong(3), r.getLong(4), r.getBoolean(5), r.getBoolean(6))
      assert(kFlag == (size >= 5) && lFlag == (lDist >= 2))
      assert(lDist <= 5) // at most the 5 distinct order priorities
      assert(size >= 1)
    }
    // violating classes must exist at any fixture scale (singletons are
    // inevitable); both outcomes only once classes can reach k=5 members
    assert(rows.exists(!_.getBoolean(5)))
    if (nCustomers >= 10000) assert(rows.exists(_.getBoolean(5)))
  }
}
