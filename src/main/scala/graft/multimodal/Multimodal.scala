package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video payloads as opaque `binary` columns
  * with typed metadata, decoded partition-wise.
  *
  * The container ships no image/audio codecs, so [[Multimodal.fakeDecode]] is
  * a CLEARLY-MARKED deterministic STUB standing in for a codec call — the
  * Spark-side plumbing is real and tested: binary column handling, a typed
  * `Dataset[MediaRecord]` boundary, partition-wise decode via `mapPartitions`
  * (one decoder instance per partition, the shape a JNI codec needs), and a
  * schema'd metadata result. Swap `fakeDecode` for the codec and nothing else
  * changes.
  */
final case class MediaRecord(doc_id: Long, media: Array[Byte])

final case class MediaMeta(
    doc_id: Long, n_bytes: Long, width: Int, height: Int, channels: Int,
    px_hash: String)

object Multimodal {

  def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  /** STUB — stands in for an image codec (???-grade): derives deterministic
    * fake dimensions from the first two payload bytes. A real build links a
    * codec here; everything around it (schema, batching, partitioning) is
    * production-shaped. */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    val b0 = if (bytes.nonEmpty) bytes(0) & 0xFF else 0
    val b1 = if (bytes.length > 1) bytes(1) & 0xFF else 0
    (16 * (1 + b0 % 8), 16 * (1 + b1 % 8), 3)
  }

  /** Partition-wise decode: binary payloads → typed metadata. At 100 TB this
    * runs embarrassingly parallel, one codec per partition, no shuffle. */
  def decodeMeta(ds: Dataset[MediaRecord]): Dataset[MediaMeta] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      // per-partition decoder init would go here (JNI codec handle)
      it.map { r =>
        val (w, h, c) = fakeDecode(r.media)
        MediaMeta(r.doc_id, r.media.length.toLong, w, h, c, md5hex(r.media))
      }
    }
  }

  /** The documents fixture as a media table: utf-8 payload bytes stand in for
    * encoded frames (TESTDATA has no true binary column). */
  def mediaTable(docs: DataFrame): Dataset[MediaRecord] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRecord]
  }
}
