package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** Multimodal columns (SURVEY.md §2.D): media as opaque binary
  * columns with typed metadata; decode / resize / feature-extract as
  * partition-local Dataset transforms (scan → mapPartitions, no
  * shuffle).
  *
  * Image and audio are REAL codecs: PNG via javax.imageio (decode +
  * area-averaged resize to an 8×8 grayscale feature) and WAV/PCM16
  * (RIFF header parse + windowed amplitude features). Video remains a
  * clearly-marked stub — no video codec ships in the JDK — but its
  * row shape and batching are identical, so swapping in an FFI codec
  * changes no plan.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Input: media id + opaque payload + declared type. */
  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  /** Output: extracted metadata + a fixed-size feature vector.
    * `byte_len` is the container size; `decoded_bytes` is the size of
    * the DECODED content (pixel bytes / PCM data bytes / raw payload),
    * which — unlike a compressed container length — is derivable from
    * the decoded dimensions and so exactly oracle-checkable. */
  case class MediaMeta(
      media_id: Long,
      media_type: String,
      byte_len: Int,
      decoded_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float])

  object MediaCodec {

    /** Deterministic real PNG: pixels from an LCG over the seed. */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      var x = seed | 1L
      var i = 0
      while (i < width * height) {
        x = x * 6364136223846793005L + 1442695040888963407L
        img.setRGB(i % width, i / width, (x >>> 40).toInt & 0xffffff)
        i += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Deterministic real WAV (RIFF/PCM16 mono 8kHz). */
    def encodeWav(nSamples: Int, seed: Long): Array[Byte] = {
      val dataLen = nSamples * 2
      val b = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(36 + dataLen); b.put("WAVE".getBytes)
      b.put("fmt ".getBytes); b.putInt(16)
      b.putShort(1); b.putShort(1) // PCM, mono
      b.putInt(8000); b.putInt(8000 * 2) // sample rate, byte rate
      b.putShort(2); b.putShort(16) // block align, bits
      b.put("data".getBytes); b.putInt(dataLen)
      var x = seed | 1L
      var i = 0
      while (i < nSamples) {
        x = x * 6364136223846793005L + 1442695040888963407L
        b.putShort((x >>> 48).toShort)
        i += 1
      }
      b.array()
    }

    /** 8×8 area-averaged grayscale resize → 64-dim unit feature. */
    private def imageFeature(img: BufferedImage): Array[Float] = {
      val small = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
      val g = small.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 8, 8, null)
      g.dispose()
      Array.tabulate(64) { i =>
        val rgb = small.getRGB(i % 8, i / 8)
        val lum = 0.299f * ((rgb >> 16) & 0xff) +
          0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
        lum / 255f
      }
    }

    /** Real decode for image (PNG/JPEG via ImageIO) and audio
      * (WAV/PCM16); video is the marked stub. */
    def decode(m: MediaRow): MediaMeta = m.media_type match {
      case "image" =>
        val img = ImageIO.read(new ByteArrayInputStream(m.payload))
        require(img != null, s"media ${m.media_id}: undecodable image")
        MediaMeta(m.media_id, m.media_type, m.payload.length,
          img.getWidth * img.getHeight * 3,
          img.getWidth, img.getHeight, 1, imageFeature(img))
      case "audio" =>
        val b = ByteBuffer.wrap(m.payload).order(ByteOrder.LITTLE_ENDIAN)
        require(m.payload.length >= 44 &&
          new String(m.payload, 0, 4) == "RIFF" &&
          new String(m.payload, 8, 4) == "WAVE",
          s"media ${m.media_id}: not a RIFF/WAVE payload")
        val sampleRate = b.getInt(24)
        val bytesPerSample = b.getShort(34) / 8
        val dataLen = b.getInt(40)
        val frames = dataLen / (bytesPerSample max 1)
        // windowed mean-absolute-amplitude feature (8 windows)
        val feat = Array.tabulate(8) { w =>
          val win = frames / 8 max 1
          var sum = 0L; var n = 0
          var i = w * win
          while (i < ((w + 1) * win min frames)) {
            sum += math.abs(b.getShort(44 + i * 2).toInt); n += 1; i += 1
          }
          if (n == 0) 0f else (sum.toFloat / n) / Short.MaxValue
        }
        MediaMeta(m.media_id, m.media_type, m.payload.length, dataLen,
          sampleRate, 1, frames, feat)
      case _ =>
        // STUB: video frame-sampling needs a codec the JDK lacks; the
        // deterministic pseudo-decode keeps the pipeline end-to-end
        val h = graft.functions.IcebergHash.hashBytes(m.payload) & 0x7fffffff
        MediaMeta(m.media_id, m.media_type, m.payload.length,
          m.payload.length,
          160 + (h % 8) * 80, 90 + ((h >> 3) % 8) * 60,
          1 + (h >> 6) % 300, Array.tabulate(8)(_.toFloat))
    }
  }

  /** Documents-as-media: REAL payloads synthesized per row (PNG bytes
    * for image rows, WAV bytes for audio rows, raw text for video),
    * then decoded back partition-locally — the decode step parses
    * actual container headers. The plan is scan → mapPartitions
    * (encode) → mapPartitions (decode) → sort for output determinism. */
  val mmBinaryMeta: Q = (s, d) => {
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        (id % 3) match {
          case 1 => MediaRow(id, "image",
            MediaCodec.encodePng(16 + (id % 4).toInt * 8,
              12 + (id % 3).toInt * 8, id))
          case 2 => MediaRow(id, "audio",
            MediaCodec.encodeWav(800 + (id % 10).toInt * 80, id))
          case _ => MediaRow(id, "video", text.getBytes("UTF-8"))
        }
      })
    media
      .mapPartitions(_.map(MediaCodec.decode))
      .toDF()
      .select(col("media_id"), col("media_type"), col("decoded_bytes"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("media_id"))
  }

  val queries: Map[String, Q] = Map("mm_binary_meta" -> mmBinaryMeta)

  /** DuckDB replica of the decode outputs: the synthesis parameters
    * (dimensions, sample counts) are deterministic in doc_id, the
    * video pseudo-decode is murmur3 over the text (the same pure-SQL
    * recursive mix as the pt_bucket / ta_fingerprint oracles), and
    * decoded_bytes is derivable from the decoded dimensions — so the
    * real ImageIO / RIFF decode path is what the gate checks. */
  val mmBinaryMetaSql: String =
    """WITH RECURSIVE vid AS (SELECT doc_id, text AS s FROM documents WHERE doc_id % 3 = 0),
blk AS (
  SELECT doc_id, s, 0::BIGINT AS i, 0::BIGINT AS h, length(s)//4 AS nb FROM vid
  UNION ALL
  SELECT doc_id, s, i+1,
    ((((((xor(h, (((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT)) << 13) | ((xor(h, (((((((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | (((((ord(substr(s, 4*i+1, 1)) + ord(substr(s, 4*i+2, 1))*256 + ord(substr(s, 4*i+3, 1))*65536 + ord(substr(s, 4*i+4, 1))*16777216))::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT)) >> 19)) & 4294967295) * 5 + 3864292196) % 4294967296),
    nb
  FROM blk WHERE i < nb),
done AS (SELECT doc_id, s, h, nb FROM blk WHERE i = nb),
tail AS (
  SELECT doc_id, s, h, length(s) AS len,
    CASE length(s) % 4
      WHEN 0 THEN 0 WHEN 1 THEN ord(substr(s, 4*nb+1, 1))
      WHEN 2 THEN ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256
      ELSE ord(substr(s, 4*nb+1, 1)) + ord(substr(s, 4*nb+2, 1))*256 + ord(substr(s, 4*nb+3, 1))*65536
    END AS tk
  FROM done),
mixed AS (
  SELECT doc_id, len, CASE WHEN len % 4 = 0 THEN h
    ELSE xor(h, ((((((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) << 15) | ((((tk)::HUGEINT * 3432918353 % 4294967296)::BIGINT) >> 17)) & 4294967295))::HUGEINT * 461845907 % 4294967296)::BIGINT) END AS hm
  FROM tail),
fin AS (
  SELECT doc_id, xor(hm, len) AS f0, xor(f0, f0 >> 16) AS f1,
    ((f1)::HUGEINT * 2246822507 % 4294967296)::BIGINT AS f2, xor(f2, f2 >> 13) AS f3,
    ((f3)::HUGEINT * 3266489909 % 4294967296)::BIGINT AS f4, xor(f4, f4 >> 16) AS hu
  FROM mixed),
vh AS (SELECT doc_id, (hu & 2147483647) AS h FROM fin)
SELECT d.doc_id AS media_id,
  CASE d.doc_id % 3 WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END AS media_type,
  (CASE d.doc_id % 3
    WHEN 1 THEN (16 + (d.doc_id % 4) * 8) * 20 * 3
    WHEN 2 THEN (800 + (d.doc_id % 10) * 80) * 2
    ELSE length(d.text) END)::INT AS decoded_bytes,
  (CASE d.doc_id % 3
    WHEN 1 THEN 16 + (d.doc_id % 4) * 8
    WHEN 2 THEN 8000
    ELSE 160 + (v.h % 8) * 80 END)::INT AS width,
  (CASE d.doc_id % 3
    WHEN 1 THEN 20 WHEN 2 THEN 1
    ELSE 90 + ((v.h >> 3) % 8) * 60 END)::INT AS height,
  (CASE d.doc_id % 3
    WHEN 1 THEN 1
    WHEN 2 THEN 800 + (d.doc_id % 10) * 80
    ELSE 1 + (v.h >> 6) % 300 END)::INT AS n_frames
FROM documents d LEFT JOIN vh v ON d.doc_id = v.doc_id
ORDER BY media_id"""

  val oracles: Map[String, String] = Map("mm_binary_meta" -> mmBinaryMetaSql)
}
