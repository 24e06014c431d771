package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.engine.Scd2

/** Driver-verifiable SCD2 scenarios over the `part` fixture (stands in for
  * the reference's product dimension, `dags/product.py`). Double-typed
  * price is pre-encoded as integer cents so the change-hash is
  * engine-portable. */
object Scd2Queries {

  val cfg: Scd2.Config = Scd2.Config(
    businessKey = "part_key",
    trackedCols = Seq("p_name", "p_brand", "p_type", "p_size", "price_cents"))

  /** Conformed source projection (reference silver layer). */
  def partSource(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).select(
      col("p_partkey").as("part_key"),
      col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
      floor(col("p_retailprice") * 100 + lit(0.5)).cast("long").as("price_cents"))

  /** Initial SCD2 load as of 2024-01-01. */
  def initial(spark: SparkSession, dir: String): DataFrame =
    Scd2.initialLoad(partSource(spark, dir), cfg, "2024-01-01")
      .orderBy(col("surrogate_key"))

  /** Second load with deterministic mutations: every 7th part gets a price
    * bump (changed → expire + new version), every 50th part reappears
    * under a new business key (new → insert). */
  def secondSource(spark: SparkSession, dir: String): DataFrame = {
    val base = partSource(spark, dir)
    val mutated = base.withColumn("price_cents",
      when(col("part_key") % 7 === 0, col("price_cents") + 100)
        .otherwise(col("price_cents")))
    val fresh = base.filter(col("part_key") % 50 === 0)
      .withColumn("part_key", col("part_key") + 1000000)
      .withColumn("p_name", concat(col("p_name"), lit("_v2")))
    mutated.unionByName(fresh)
  }

  /** Full SCD2 merge result after the second load (as of 2024-06-01):
    * expired prior versions, surviving current rows, and appended new
    * versions with surrogate keys continuing from max(sk). */
  def upsert(spark: SparkSession, dir: String): DataFrame =
    Scd2.applyChanges(initial(spark, dir), secondSource(spark, dir), cfg, "2024-06-01")
      .orderBy(col("surrogate_key"))

  /** Point-in-time read of the upserted dimension AFTER the second load
    * date — the time-travel lookup a fact join uses ([[Scd2.snapshotAsOf]]). */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    Scd2.snapshotAsOf(upsert(spark, dir), cfg, "2024-07-01")
      .orderBy(col("surrogate_key"))
}
