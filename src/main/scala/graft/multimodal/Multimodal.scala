package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing for a training-data pipeline: media as
  * opaque `binary` payloads + typed metadata, with decode/feature
  * extraction as per-partition batch work.
  *
  * The container has no image/audio codecs and the fixtures carry no real
  * media, so the DECODE STEP IS A DETERMINISTIC STUB ([[decodeStub]] — it
  * derives pseudo width/height/frames from an md5 of the payload). The
  * Spark-side plumbing is real and what matters at scale: binary column +
  * schema, `mapPartitions` batch shape (one codec init per partition, the
  * same shape a JNI/FFmpeg decoder needs), typed `Dataset[MediaMeta]`
  * output, and engine-portable metadata so the oracle can verify the
  * pipeline end-to-end.
  */
object Multimodal {

  case class MediaMeta(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int)

  /** Fixture media table: text payload as opaque bytes + claimed type. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      element_at(
        array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("media_type"))

  /** STUB codec: deterministic pseudo-decode of an opaque payload.
    * Replace with a real decoder (JNI/FFmpeg/ImageIO) in production —
    * signature and batch shape stay identical. */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val width = 64 + (h % 512).toInt
    val height = 64 + ((h >> 9) % 512).toInt
    val frames = 1 + (payload.length % 24)
    (width, height, frames)
  }

  /** Decode/feature-extract over partitions: one codec instance per
    * partition, rows streamed through it — the genuine per-partition
    * imperative case (preference order (d) in the build rules). */
  def extractMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir)
      .select("doc_id", "payload", "media_type")
      .as[(Long, Array[Byte], String)]
      .mapPartitions { rows =>
        // codec init would happen here, once per partition
        rows.map { case (id, payload, mtype) =>
          val (w, hgt, f) = decodeStub(payload)
          MediaMeta(id, mtype, payload.length.toLong, w, hgt, f)
        }
      }
  }

  /** Driver-verifiable query: typed metadata per media file. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    extractMeta(spark, dir).toDF().orderBy(col("doc_id"))

  // ---- feature extraction / resize / frame sampling ------------------
  // Same contract as decodeStub: the CODEC body is a deterministic fake
  // (no image/audio libs in this container); schema, batch shape and
  // partition-level plumbing are the real thing.

  case class MediaFeatures(doc_id: Long, embedding_dim: Int,
      features: Seq[Float], feature_norm: Double)
  case class Frame(doc_id: Long, frame_idx: Int, offset_bytes: Long,
      frame_checksum: Long)

  /** STUB feature extractor: 8-dim "embedding" from payload byte
    * statistics (stands in for a vision/audio encoder forward pass —
    * batch-shaped so a real model would amortize per-partition init). */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, p) =>
          val feats = (0 until 8).map { j =>
            val slice = p.iterator.zipWithIndex.filter(_._2 % 8 == j).map(_._1 & 0xff)
            if (p.isEmpty) 0f else slice.sum.toFloat / p.length
          }
          val norm = math.sqrt(feats.map(f => f.toDouble * f).sum)
          MediaFeatures(id, 8, feats, norm)
        }
      }
  }

  /** STUB resize: recompute metadata for a target box preserving aspect
    * ratio (integer arithmetic only — engine-portable). */
  def resizeMeta(meta: Dataset[MediaMeta], maxSide: Int): DataFrame = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.map { m =>
      val scaleNum = maxSide
      val scaleDen = math.max(m.width, m.height)
      val w = if (scaleDen <= maxSide) m.width else m.width * scaleNum / scaleDen
      val h = if (scaleDen <= maxSide) m.height else m.height * scaleNum / scaleDen
      (m.doc_id, m.width, m.height, w, h)
    }.toDF("doc_id", "width", "height", "resized_w", "resized_h")
  }

  /** STUB frame sampler: every `stride`-th 256-byte block is a "frame";
    * checksum via the portable md5 hash of the block. */
  def sampleFrames(spark: SparkSession, dir: String, stride: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    mediaTable(spark, dir).select("doc_id", "payload")
      .as[(Long, Array[Byte])]
      .flatMap { case (id, p) =>
        val blocks = p.grouped(256).zipWithIndex.toSeq
        blocks.collect { case (block, i) if i % stride == 0 =>
          val md = java.security.MessageDigest.getInstance("MD5")
          val hex = md.digest(block).map("%02x".format(_)).mkString
          Frame(id, i, i.toLong * 256, java.lang.Long.parseLong(hex.substring(0, 15), 16))
        }
      }
  }

  // ---- oracle-covered media queries ----------------------------------

  /** [[sampleFrames]] under the oracle: the frame-sample MANIFEST a
    * video loader consumes — (frame index, byte offset, checksum) per
    * sampled frame, deterministic given payload + stride. The checksum
    * is the portable md5-based hash so the oracle replays it exactly
    * (the fixture is all-ASCII, so byte blocks equal substring blocks). */
  def frameManifest(spark: SparkSession, dir: String, stride: Int = 4): DataFrame =
    sampleFrames(spark, dir, stride).toDF()
      .orderBy(col("doc_id"), col("frame_idx"))

  /** [[resizeMeta]] under the oracle: target-box metadata at
    * `maxSide`, aspect preserved, pure integer arithmetic (multiply
    * before divide — both engines truncate identically). */
  def mediaResize(spark: SparkSession, dir: String, maxSide: Int = 128): DataFrame =
    resizeMeta(extractMeta(spark, dir), maxSide).orderBy(col("doc_id"))

  /** Content-addressed media dedup: the storage/curation audit every
    * media pipeline runs before decode — files are identical iff their
    * payload digests match (the CAS key), so per-type unique counts and
    * the duplicate ratio fall out of one grouped aggregate. Dedup here
    * is EXACT by construction (byte identity); perceptual near-dup
    * belongs to the embedding pipeline ([[graft.dedup.Dedup
    * .embeddingPairs]]) once a real encoder replaces [[decodeStub]].
    *
    * Scale shape: one per-row digest + one |types|-group aggregate with
    * map-side partials; nothing is collected or joined. */
  def mediaDedup(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir)
      .select(col("media_type"), md5(col("payload")).as("h"))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("n_files"),
        countDistinct(col("h")).as("n_unique"))
      .withColumn("n_dup_files", (col("n_files") - col("n_unique")).cast("long"))
      .withColumn("dup_ratio", graft.Fns.money(
        col("n_dup_files").cast("double") / col("n_files").cast("double")))
      .orderBy(col("media_type"))

  /** Decode-batch assignment: per media type, files are packed in
    * doc_id order into fixed byte-budget batches — the unit of work a
    * GPU decode/encode worker pulls (one batch ≈ one forward pass of
    * amortized codec state). A file is assigned to the batch where its
    * FIRST byte lands in the per-type byte stream (the
    * [[graft.text.TextAnalysis.packingManifest]] stream-packing rule),
    * so assignment is a pure function of the exclusive running sum.
    *
    * Scale shape: one window per (type) partition — fine while each
    * type's stream fits a reducer's SORT; the 100 TB deployment swaps
    * the window for [[graft.engine.Prefix]]'s two-pass range-partitioned
    * exclusive scan exactly as `packing_manifest` documents. */
  def mediaBatches(spark: SparkSession, dir: String,
      budgetBytes: Long = 16384L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("media_type")).orderBy(col("doc_id"))
    mediaTable(spark, dir)
      .select(col("doc_id"), col("media_type"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("__cum", sum(col("n_bytes")).over(w))
      .withColumn("batch_id",
        ((col("__cum") - col("n_bytes")) / lit(budgetBytes)).cast("long"))
      .withColumn("offset_in_batch",
        (col("__cum") - col("n_bytes") - col("batch_id") * lit(budgetBytes))
          .cast("long"))
      .select(col("doc_id"), col("media_type"), col("n_bytes"),
        col("batch_id"), col("offset_in_batch"))
      .orderBy(col("doc_id"))
  }
}
