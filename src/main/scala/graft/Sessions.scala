package graft

import org.apache.spark.sql.SparkSession

/** Session tuning shared by Verify, Bench, and tests. Local-mode values;
  * on a real cluster only master/memory change — the SQL confs carry over.
  */
object Sessions {

  /** Confs required for correctness (not just speed) — e.g. reading the
    * nanosecond-timestamp events fixture and UTC determinism. */
  def tune(b: SparkSession.Builder, cpus: String): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // NOTE (measured, round 7): parallelismFirst=false + an 8 MB
      // advisory size — the "coalesce tiny shuffles harder" theory —
      // regressed a 12-query probe 47.6 -> 68.2 s (triangle_counts
      // 5.7 -> 15.8): byte-small shuffles here are often CPU-heavy per
      // row (adjacency intersects, signature verifies), and losing
      // cores costs far more than the saved task scheduling. Keep the
      // default parallelism-first coalescing.
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      // LOCAL-MODE ONLY: shuffle blocks never cross a network here, so
      // lz4 on the shuffle path is pure CPU overhead against the page
      // cache (measured: 12-query probe 50.3 -> 48.5 s). On a real
      // cluster KEEP BOTH TRUE — network + disk bandwidth dominate and
      // compression wins; this is a deploy-profile flip, not a default.
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")): SparkSession = {
    val s = tune(SparkSession.builder().master(s"local[$cpus]"), cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Release EVERYTHING a finished query may have pinned in the block
    * manager. `clearCache()` alone is not enough: `localCheckpoint`
    * blocks (e.g. the dedup connected-components fixpoints) are
    * persisted RDDs OUTSIDE the catalog cache and survive it — in a
    * long-lived session they accumulate until driver GC happens to let
    * the ContextCleaner reap them, bleeding storage/execution memory
    * into whatever runs next (the round-4 bench interference). Safe to
    * call between queries: prior DataFrames are dead, so no live
    * lineage can need the dropped blocks. */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    System.gc()
  }
}
