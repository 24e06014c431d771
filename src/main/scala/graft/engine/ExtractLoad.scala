package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Try

/** Incremental watermark extract-load — Spark-native re-expression of the
  * reference's reusable extractor (`dags/utils/extract_load_template.py:20-209`):
  * JSON checkpoint doc → full-vs-incremental branch → event-time cast →
  * count-gated append partitioned by ingestion_date → watermark save.
  *
  * The JDBC transport is abstracted behind a source DataFrame (SURVEY.md
  * §7.1 — no JDBC drivers locally); the watermark predicate is applied to
  * the source plan, which Catalyst pushes into the scan (parquet min/max
  * skipping locally, a JDBC WHERE on a cluster — the reference builds the
  * same predicate by hand at `extract_load_template.py:158`).
  *
  * Scale notes: the checkpoint is a single tiny JSON doc (`coalesce(1)`,
  * reference `:209`); the data path stays fully distributed, appends are
  * partitioned by `ingestion_date` so re-loads prune to new partitions.
  */
object ExtractLoad {

  /** Watermark doc — field-for-field the reference's checkpoint
    * (`extract_load_template.py:60-62`). The event time is stored as a
    * microsecond-precision string: Spark's JSON timestamp writer only
    * keeps milliseconds, which would silently widen the strictly-greater
    * watermark (the reference formats the timestamp by hand for the same
    * reason, `extract_load_template.py:133-154`). */
  case class Checkpoint(
      table_name: String,
      last_id: Long,
      last_event_time: String, // "yyyy-MM-dd HH:mm:ss.SSSSSS", session TZ
      processed_at: String)

  /** S3: read watermark; empty/missing dir → None → full load
    * (reference `extract_load_template.py:102-119`). */
  def readCheckpoint(spark: SparkSession, dir: String): Option[Checkpoint] = {
    import spark.implicits._
    Try {
      val df = spark.read.json(dir)
      if (df.isEmpty) None
      else {
        val r = df.select(
          col("table_name"), col("last_id").cast("long"),
          col("last_event_time").cast("string"),
          col("processed_at").cast("string")).as[Checkpoint].head()
        Some(r)
      }
    }.toOption.flatten
  }

  /** S4: single-row JSON overwrite (reference `extract_load_template.py:197-209`). */
  def saveCheckpoint(spark: SparkSession, dir: String, ckpt: Checkpoint): Unit = {
    import spark.implicits._
    Seq(ckpt).toDS().toDF().coalesce(1).write.mode(SaveMode.Overwrite).json(dir)
  }

  /** S2: incremental scan — watermark predicate pushed into the source
    * plan (strictly `>`, like the reference's `ModifiedDate >` at `:158`). */
  def incremental(source: DataFrame, idCol: String, eventCol: String,
      ckpt: Option[Checkpoint]): DataFrame =
    ckpt match {
      case Some(c) => source.filter(col(eventCol) > to_timestamp(lit(c.last_event_time)))
      case None    => source
    }

  /** Full pipeline run: returns number of rows loaded. `ingestionDate`
    * is injectable for reproducibility (SURVEY.md §7.5.5 — the reference
    * uses wall-clock `current_timestamp` at `:169`).
    *
    * Idempotent, unlike the reference's blind append (`dags/sales.py:
    * 102-106`, a known defect): each work unit — identified by the
    * checkpoint watermark it STARTED from (`batch_id` = last_id, -1 for
    * the initial full load) — owns the partition
    * `(ingestion_date, batch_id)` and the write is a dynamic partition
    * OVERWRITE of exactly that partition. A retry after a partial failure
    * (data written, checkpoint not yet advanced) re-extracts the same
    * delta and replaces its own partition with identical content; a
    * successful re-trigger extracts an empty delta and touches nothing;
    * distinct work units can never collide, even several on one
    * ingestion_date. Readers prune on `ingestion_date` exactly as before
    * — `batch_id` is a sub-directory they never need to mention. */
  def run(spark: SparkSession, source: DataFrame, tableName: String,
      idCol: String, eventCol: String, ckptDir: String, outDir: String,
      ingestionDate: String): Long = {
    val ckpt = readCheckpoint(spark, ckptDir)
    val batchId = ckpt.map(_.last_id).getOrElse(-1L)
    val delta = incremental(source, idCol, eventCol, ckpt)
      .withColumn("ingestion_date", to_date(lit(ingestionDate)))
      .withColumn("batch_id", lit(batchId))
    val n = delta.count() // count gate (reference :78,166)
    if (n > 0)
      promote(spark, delta, tableName, idCol, eventCol, ckptDir, outDir,
        ingestionDate, batchId)
    n
  }

  /** The write + watermark-advance half of [[run]]: replace this work
    * unit's partition, then persist the new checkpoint. Only called once
    * the batch has passed its gates — the checkpoint must never advance
    * past data that was not durably written. */
  private def promote(spark: SparkSession, delta: DataFrame, tableName: String,
      idCol: String, eventCol: String, ckptDir: String, outDir: String,
      ingestionDate: String, batchId: Long): Unit = {
    // a retry can cross midnight: same work unit (batch_id) but a NEW
    // ingestionDate — dynamic overwrite would leave the partial write
    // under the old date in place and duplicate the delta. The work
    // unit owns its batch_id everywhere: drop any leftover
    // batch_id=<this> partition under a DIFFERENT ingestion_date first.
    Fs.listDirs(spark, outDir)
      .filter(d => d.getName.startsWith("ingestion_date=") &&
        d.getName != s"ingestion_date=$ingestionDate")
      .map(d => s"$d/batch_id=$batchId")
      .foreach(Fs.deleteDir(spark, _))
    Layers.replacePartitionsPath(delta, outDir, Seq("ingestion_date", "batch_id"))
    val wm = delta.agg(
      max(col(idCol)).cast("long"),
      date_format(max(col(eventCol)), "yyyy-MM-dd HH:mm:ss.SSSSSS")).head()
    saveCheckpoint(spark, ckptDir, Checkpoint(
      tableName, wm.getLong(0), wm.getString(1), s"$ingestionDate 00:00:00"))
  }

  /** [[run]] with a DATA-QUALITY GATE between extract and load — the
    * reference's bare count gate (`extract_load_template.py:78,166`)
    * extended to declarative expectations ([[DataQuality.Rule]]) and
    * referential integrity ([[DataQuality.Ri]]), the dbt-test /
    * expectation-suite promotion contract. Any violation REJECTS the
    * whole batch: nothing is written and the checkpoint does NOT
    * advance, so after the upstream defect is repaired the identical
    * watermark re-extracts the batch and promotion retries cleanly —
    * rejecting without advancing is what makes the gate safe to automate.
    *
    * Returns (rows loaded — 0 when rejected or empty, the gate report
    * with a `promoted` column). The whole report — rule counts AND RI
    * orphan counts — is ONE aggregation job over the delta (which doubles
    * as the count gate: `n_rows` is the batch count); see
    * [[DataQuality.gateReport]]. */
  def runGated(spark: SparkSession, source: DataFrame, tableName: String,
      idCol: String, eventCol: String, ckptDir: String, outDir: String,
      ingestionDate: String, rules: Seq[DataQuality.Rule],
      ri: Seq[DataQuality.Ri] = Nil): (Long, DataFrame) = {
    val ckpt = readCheckpoint(spark, ckptDir)
    val batchId = ckpt.map(_.last_id).getOrElse(-1L)
    val delta = incremental(source, idCol, eventCol, ckpt)
      .withColumn("ingestion_date", to_date(lit(ingestionDate)))
      .withColumn("batch_id", lit(batchId))
    val report = DataQuality.gateReport(delta, rules, ri)
    // the report is |rules| rows — a driver-side decision, not a scan
    val rows = report.collect()
    val n = rows.headOption.map(_.getAs[Long]("n_rows")).getOrElse(0L)
    val clean = rows.forall(_.getAs[Boolean]("passed"))
    val promoted = clean && n > 0
    if (promoted)
      promote(spark, delta, tableName, idCol, eventCol, ckptDir, outDir,
        ingestionDate, batchId)
    (if (promoted) n else 0L, report.withColumn("promoted", lit(promoted)))
  }
}
