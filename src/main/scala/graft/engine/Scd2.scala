package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Generic SCD Type 2 dimension maintenance — Spark-first redesign of the
  * reference's product dimension load (`dags/product.py:153-378`):
  * hash-diff change detection (md5 over tracked attributes,
  * `dags/product.py:160-186`), expire-old/insert-new versioning
  * (`dags/product.py:276-361`), and surrogate key assignment.
  *
  * Scale redesigns vs the reference (SURVEY.md §7.5):
  *  - The reference assigns surrogate keys with a GLOBAL unpartitioned
  *    `row_number()` (`dags/product.py:240`) — a single-partition sort that
  *    dies at 100 TB. [[assignIds]] instead range-partitions on the
  *    business key, sorts within partitions, and adds per-partition offsets
  *    via `zipWithIndex` — same deterministic output, no global sort.
  *  - The reference rewrites the whole dimension on expire; [[applyChanges]]
  *    keeps that semantic (dimensions are small relative to facts) but
  *    computes the changed set with a single hash-diff join.
  */
object Scd2 {

  /** @param recencyCol when a source batch can carry several rows per
    *   business key (routine through streaming micro-batches), the column
    *   that orders them — latest wins. None = ties broken by attr-hash
    *   (deterministic, but arbitrary; set recencyCol whenever one exists). */
  case class Config(
      businessKey: String,
      trackedCols: Seq[String],
      surrogateKey: String = "surrogate_key",
      hashCol: String = "attr_hash",
      effectiveCol: String = "effective_date",
      expiryCol: String = "expiry_date",
      currentCol: String = "is_current",
      recencyCol: Option[String] = None)

  /** md5 change-hash over tracked columns (reference `dags/product.py:160-167`):
    * `md5(concat_ws("|", coalesce(cast(c as string), "")...))`. Callers must
    * pre-format double columns deterministically (e.g. integer cents) —
    * raw double→string rendering is not portable across engines. */
  def attrHash(cols: Seq[String]): Column =
    md5(concat_ws("|", cols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))

  /** Deterministic sequential ids 1..n (+offset) ordered by `orderCol`,
    * without a global single-partition sort: range repartition → local sort
    * → per-partition offset via zipWithIndex. Equivalent to
    * `row_number() OVER (ORDER BY orderCol)` when `orderCol` is unique. */
  def assignIds(df: DataFrame, orderCol: String, idCol: String, offset: Long = 0L): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(col(orderCol)).sortWithinPartitions(orderCol)
    val schema = sorted.schema.add(idCol, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + offset))
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Hash attributes and keep ONE row per business key — latest by
    * `cfg.recencyCol`; ties (or no recency column) break by attr-hash,
    * then by a hash over EVERY column, so the pick is deterministic even
    * when duplicate rows agree on all tracked columns but differ in an
    * untracked one. The reference dedups latest-per-key the same way
    * before its merge (`dags/product.py:174-180`); without it a batch
    * carrying two rows for one key would open two is_current=true
    * versions and break the ≤1-current-per-key invariant. */
  private def hashAndDedup(src: DataFrame, cfg: Config): DataFrame = {
    val allColsHash = md5(concat_ws("",
      src.columns.toIndexedSeq.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
    val dedupOrder: Seq[Column] =
      cfg.recencyCol.map(c => col(c).desc_nulls_last).toSeq ++
        Seq(col(cfg.hashCol).desc, allColsHash.desc)
    src.withColumn(cfg.hashCol, attrHash(cfg.trackedCols))
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(cfg.businessKey)).orderBy(dedupOrder: _*)))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Initial dimension load: hash attributes, assign surrogate keys in
    * business-key order, open all versions as of `asOfDate`
    * (reference initial-load branch `dags/product.py:238-258`). */
  def initialLoad(src: DataFrame, cfg: Config, asOfDate: String): DataFrame = {
    val hashed = hashAndDedup(src, cfg)
    assignIds(hashed, cfg.businessKey, cfg.surrogateKey)
      .withColumn(cfg.effectiveCol, to_date(lit(asOfDate)))
      .withColumn(cfg.expiryCol, lit(null).cast("date"))
      .withColumn(cfg.currentCol, lit(true))
  }

  /** Point-in-time snapshot of an SCD2 dimension: the version of each
    * business key that was current ON `asOfDate` — effective ≤ date <
    * expiry (open versions have null expiry). The "time travel" read
    * every SCD2 consumer eventually needs (join facts to the dimension
    * AS OF the fact date); a pure filter, so partition/row-group pruning
    * on the effective/expiry columns applies at scale. */
  def snapshotAsOf(dim: DataFrame, cfg: Config, asOfDate: String): DataFrame = {
    val d = to_date(lit(asOfDate))
    dim.filter(col(cfg.effectiveCol) <= d &&
      (col(cfg.expiryCol).isNull || col(cfg.expiryCol) > d))
  }

  /** Incremental SCD2 merge: detect new/changed source rows by hash-diff
    * against current versions (reference `dags/product.py:276-302`), expire
    * superseded versions (`:325-346`), and append new versions with
    * surrogate keys continuing after max(sk) (`:349-361`).
    *
    * `dim` must be a prior [[initialLoad]]/[[applyChanges]] output; `src`
    * carries the business key + tracked columns. */
  def applyChanges(dim: DataFrame, src: DataFrame, cfg: Config, asOfDate: String): DataFrame = {
    val spark = dim.sparkSession
    val k = cfg.businessKey

    val srcHashed = hashAndDedup(src, cfg)
    val current = dim.filter(col(cfg.currentCol))

    // J5: aliased left join, new/changed detection (dags/product.py:276-291)
    val detect = srcHashed.as("source")
      .join(current.as("target"), col(s"source.$k") === col(s"target.$k"), "left")
      .withColumn("is_new", col(s"target.$k").isNull)
      .withColumn("is_changed",
        col(s"target.$k").isNotNull &&
          col(s"source.${cfg.hashCol}") =!= col(s"target.${cfg.hashCol}"))

    val upserts = detect.filter(col("is_new") || col("is_changed"))
      .select(srcHashed.columns.map(c => col(s"source.$c")): _*)

    // J6+F6: expire current versions superseded by a changed source row
    val changedKeys = upserts.select(col(k).as("__changed_key")).distinct()
    val expired = dim.as("dim")
      .join(changedKeys,
        col(s"dim.$k") === col("__changed_key") && col(s"dim.${cfg.currentCol}"),
        "left")
      .withColumn(cfg.expiryCol,
        when(col("__changed_key").isNotNull, to_date(lit(asOfDate)))
          .otherwise(col(s"dim.${cfg.expiryCol}")))
      .withColumn(cfg.currentCol,
        when(col("__changed_key").isNotNull, lit(false))
          .otherwise(col(s"dim.${cfg.currentCol}")))
      .drop("__changed_key")

    // W2+A2 redesign: continue surrogate keys after max(sk) without a
    // global sort (reference dags/product.py:262-263,349-352)
    val maxSk = dim.agg(coalesce(max(col(cfg.surrogateKey)), lit(0L))).first().getLong(0)
    val newVersions = assignIds(upserts, k, cfg.surrogateKey, maxSk)
      .withColumn(cfg.effectiveCol, to_date(lit(asOfDate)))
      .withColumn(cfg.expiryCol, lit(null).cast("date"))
      .withColumn(cfg.currentCol, lit(true))
      .select(expired.columns.map(col): _*)

    expired.unionByName(newVersions)
  }
}
