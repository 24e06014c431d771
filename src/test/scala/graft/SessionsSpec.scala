package graft

import org.apache.spark.sql.functions._

class SessionsSpec extends SparkSpec {

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
