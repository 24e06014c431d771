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
}
