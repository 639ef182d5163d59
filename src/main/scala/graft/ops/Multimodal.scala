package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing (SURVEY.md §2.D): media as opaque binary
  * columns with typed metadata, decode/feature-extraction as a
  * partition-local Dataset transform.
  *
  * The decode kernel is a STUB — image/audio codecs are not in this
  * container — but everything Spark-side is real: binary schema,
  * mapPartitions batching, typed output rows, partition-preserving
  * execution. Swapping `FakeDecoder` for a JNI/FFI codec changes no
  * plan shape.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Input: media id + opaque payload + declared type. */
  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  /** Output: extracted metadata + a fixed-size feature vector. */
  case class MediaMeta(
      media_id: Long,
      media_type: String,
      byte_len: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  /** STUB decoder: deterministic pseudo-decode from payload bytes. A
    * real implementation would parse container headers and run the
    * codec; the signature (bytes in, dims + features out) is the
    * contract the pipeline depends on. */
  object FakeDecoder {
    def decode(m: MediaRow): MediaMeta = {
      // mask to 31 bits: math.abs(Int.MinValue) stays negative
      val h = graft.functions.IcebergHash.hashBytes(m.payload) & 0x7fffffff
      val w = 160 + (h % 8) * 80 // "decoded" width
      val ht = 90 + ((h >> 3) % 8) * 60 // "decoded" height
      val frames = m.media_type match {
        case "video" => 1 + (h >> 6) % 300
        case "audio" => 1 + (h >> 6) % 3000
        case _ => 1
      }
      // 8-dim "feature": rolling hash of payload windows, unit-scaled
      val feat = Array.tabulate(8) { i =>
        val slice = m.payload.drop(i * (m.payload.length / 8 max 1))
          .take(m.payload.length / 8 max 1)
        graft.functions.IcebergHash.hashBytes(slice).toFloat / Int.MaxValue
      }
      MediaMeta(m.media_id, m.media_type, m.payload.length, w, ht, frames, feat)
    }
  }

  /** Documents-as-media: payload = UTF-8 bytes, media type round-robin
    * by id — exercises the binary column path end to end, then decodes
    * partition-locally (no shuffle: the plan is scan → mapPartitions →
    * sort for output determinism only). */
  val mmBinaryMeta: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media
      .mapPartitions(_.map(FakeDecoder.decode))
      .toDF()
      .select(col("media_id"), col("media_type"), col("byte_len"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, Q] = Map("mm_binary_meta" -> mmBinaryMeta)
  val oracles: Map[String, String] = Map.empty
}
