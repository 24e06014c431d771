package graft

import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {

  test("cluster-safe tune() sets no local-only keys; localTune() carries them all") {
    import org.apache.spark.sql.SparkSession
    // builder options via reflection: the spec must see what a deploy
    // copying tune() verbatim would actually ship, without creating a
    // second session in the shared test JVM
    def opts(b: SparkSession.Builder): Map[String, String] = {
      var c: Class[_] = b.getClass
      var fld: java.lang.reflect.Field = null
      while (c != null && fld == null) {
        fld = c.getDeclaredFields.find(_.getName.endsWith("options")).orNull
        if (fld == null) c = c.getSuperclass
      }
      assert(fld != null, "SparkSession.Builder no longer has an options field")
      fld.setAccessible(true)
      fld.get(b).asInstanceOf[scala.collection.mutable.HashMap[String, String]].toMap
    }
    val localOnly = Seq("spark.shuffle.compress", "spark.shuffle.spill.compress",
      "spark.driver.host")
    val t = opts(Sessions.tune(SparkSession.builder(), "4"))
    localOnly.foreach(k =>
      assert(!t.contains(k), s"cluster-safe tune() must not set local-only $k"))
    // the correctness-bearing confs must be in the cluster-safe set
    Seq("spark.sql.session.timeZone", "spark.sql.legacy.parquet.nanosAsLong",
      "spark.sql.adaptive.enabled").foreach(k => assert(t.contains(k)))
    val lt = opts(Sessions.localTune(SparkSession.builder(), "4"))
    localOnly.foreach(k => assert(lt.contains(k), s"localTune() must carry $k"))
  }

  test("releaseAll frees localCheckpoint blocks that clearCache alone leaves pinned") {
    // a localCheckpoint registers a persisted RDD OUTSIDE the catalog
    // cache — the round-4 bench interference mechanism
    val df = Tables.orders(spark, sf).limit(100).localCheckpoint(true)
    df.count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    spark.catalog.clearCache()
    // catalog cache clearing does NOT free them — this is the trap
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty)
    Sessions.releaseAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"still pinned: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("releaseAll also drops catalog-cached relations") {
    val df = Tables.customer(spark, sf).cache()
    df.count()
    assert(!spark.sharedState.cacheManager.isEmpty)
    Sessions.releaseAll(spark)
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
