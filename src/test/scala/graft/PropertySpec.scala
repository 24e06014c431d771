package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.engine.Scd2

/** Property-based invariants (SURVEY.md §5.3) driven by seeded ScalaCheck
  * generators (the scalatest-scalacheck bridge isn't in the offline
  * cache, so cases are drawn explicitly and deterministically). */
class PropertySpec extends SparkSpec {

  private def draw[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("date-key round-trip: yyyyMMdd int ↔ date for arbitrary days") {
    import spark.implicits._
    val offsets = draw(Gen.choose(0, 7304), 30)
    val df = offsets.toDF("o")
      .withColumn("d", date_add(to_date(lit("2010-01-01")), col("o")))
      .withColumn("k", date_format(col("d"), "yyyyMMdd").cast("int"))
      .withColumn("rt", to_date(col("k").cast("string"), "yyyyMMdd"))
    assert(df.filter(col("d") =!= col("rt")).count() == 0)
  }

  test("scd2 invariant: repeated applyChanges keeps exactly 1 current per " +
      "live key, valid intervals, unique surrogates") {
    import spark.implicits._
    val cfg = Scd2.Config("k", Seq("attr"))
    val updates = draw(Gen.zip(Gen.choose(1L, 6L), Gen.choose(0, 3)), 10)
    val initial = Seq((1L, "a0"), (2L, "b0"), (3L, "c0")).toDF("k", "attr")
    var dim = Scd2.initialLoad(initial, cfg, "2024-01-01")
    updates.zipWithIndex.foreach { case ((key, v), i) =>
      val src = Seq((key, s"v$v")).toDF("k", "attr")
      dim = Scd2.applyChanges(dim, src, cfg, f"2024-02-${(i % 27) + 1}%02d")
    }
    val rows = dim.collect()
    val currentPerKey = rows.filter(_.getAs[Boolean]("is_current"))
      .groupBy(_.getAs[Long]("k")).view.mapValues(_.length).toMap
    assert(currentPerKey.values.forall(_ == 1))
    assert(rows.filter(!_.getAs[Boolean]("is_current")).forall { r =>
      val eff = r.getAs[java.sql.Date]("effective_date")
      val exp = r.getAs[java.sql.Date]("expiry_date")
      exp != null && !exp.before(eff)
    })
    val sks = rows.map(_.getAs[Long]("surrogate_key"))
    assert(sks.distinct.length == sks.length)
  }

  test("portable hash h64: Spark conv(md5) equals documented semantics") {
    import spark.implicits._
    val strs = draw(Gen.alphaNumStr.suchThat(_.nonEmpty), 25)
    val got = strs.toDF("x").select(col("x"), Fns.h64(col("x")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(got(s) == java.lang.Long.parseLong(hex.substring(0, 15), 16))
    }
  }

  test("money rounding: idempotent and within half-grid of input") {
    import spark.implicits._
    val xs = draw(Gen.choose(-1e6, 1e6), 50)
    val rows = xs.toDF("x")
      .select(col("x"), Fns.money(col("x")).as("m"))
      .select(col("x"), col("m"), Fns.money(col("m")).as("mm"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == r.getDouble(2))
      assert(math.abs(r.getDouble(1) - r.getDouble(0)) <= 0.00005 + 1e-9)
    }
  }

  test("distributed scans: exclusiveScan and exclusiveScanMax equal the " +
      "sequential fold for arbitrary data and any partitioning") {
    import spark.implicits._
    import graft.engine.Prefix
    val data = draw(Gen.zip(Gen.choose(-1000L, 1000L), Gen.choose(0L, 500L)), 60)
      .map(_._1).distinct.zip(draw(Gen.choose(0L, 500L), 60)).take(40)
    val df = data.toDF("ord", "v").repartition(7) // deliberately odd partitioning
    val sortedSeq = data.sortBy(_._1)
    val expSum = sortedSeq.map(_._2).scanLeft(0L)(_ + _).init
    val expMax = sortedSeq.map(_._2).scanLeft(Long.MinValue)(math.max).init
    val gotSum = Prefix.exclusiveScan(df, "ord", "v", "s")
      .orderBy("ord").select("s").as[Long].collect().toSeq
    val gotMax = Prefix.exclusiveScanMax(df, "ord", "v", "m")
      .orderBy("ord").select("m").as[Long].collect().toSeq
    assert(gotSum === expSum)
    assert(gotMax === expMax)
  }

  test("skyline dominance is antisymmetric and complete for random pairs") {
    import spark.implicits._
    import graft.engine.Prefix
    // random (price-grid, size) pairs, deduplicated — replay the
    // part_skyline kernel and check the frontier definition directly
    val pairs = draw(Gen.zip(Gen.choose(1, 300), Gen.choose(1, 50)), 80)
      .distinct.take(60)
    val df = pairs.toDF("p", "s")
      .withColumn("ord", col("p").cast("long") * 1000 + (lit(999L) - col("s")))
      .withColumn("sz", col("s").cast("long"))
    val sky = Prefix.exclusiveScanMax(df, "ord", "sz", "pm")
      .filter(col("sz") > col("pm"))
      .select("p", "s").as[(Int, Int)].collect().toSet
    def dominated(x: (Int, Int)) = pairs.exists(q =>
      q._1 <= x._1 && q._2 >= x._2 && (q._1 < x._1 || q._2 > x._2))
    pairs.foreach { x =>
      assert(sky(x) === !dominated(x), s"$x frontier=${sky(x)} dominated=${dominated(x)}")
    }
  }

  test("watermark monotonicity: incremental never re-emits rows ≤ watermark " +
      "and full = incremental ∪ excluded") {
    val ev = Tables.events(spark, sf)
    val full = ev.count()
    for (wm <- Seq("2024-01-02 00:00:00", "2024-01-04 12:00:00", "2030-01-01 00:00:00")) {
      val inc = graft.queries.Events.incrementalExtract(spark, sf, wm)
      val below = ev.filter(col("ts") <= to_timestamp(lit(wm))).count()
      assert(inc.count() == full - below)
    }
  }
}
