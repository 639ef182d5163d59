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
  * All three modalities are REAL codecs: PNG via javax.imageio
  * (decode + area-averaged resize to an 8×8 grayscale feature),
  * WAV/PCM16 (RIFF header parse + windowed amplitude features), and
  * animated GIF as the video container (multi-frame decode via the
  * JDK's GIF ImageReader, evenly-spaced frame SAMPLING for a
  * per-frame luminance feature — the shape of any video
  * frame-sampling pipeline; a heavier codec swaps in behind the same
  * row shape without changing the plan).
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Input: media id + opaque payload + declared type. */
  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  /** Output: extracted metadata + a fixed-size feature vector.
    * `byte_len` is the container size; `decoded_bytes` is the size of
    * the DECODED content (pixel bytes / PCM data bytes / frame pixel
    * bytes), which — unlike a compressed container length — is
    * derivable from the decoded dimensions and so exactly
    * oracle-checkable. */
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

    // ImageIO's default stream cache backs every encode/decode with a
    // TEMP FILE on disk (FileCacheImageInput/OutputStream) — a per-row
    // disk round trip in the partition-local codec loops. Memory
    // caching is semantically identical and this is per-task work
    // (guide §1.2 step 2): the decoded bytes/pixels are unchanged.
    ImageIO.setUseCache(false)

    /** Deterministic real PNG: pixels from an LCG over the seed
      * (the zero-mask case of encodePngVariant — ONE copy of the LCG
      * loop keeps the SQL oracle replays in sync). */
    def encodePng(width: Int, height: Int, seed: Long): Array[Byte] =
      encodePngVariant(width, height, seed, 0, 1)

    /** Fill a TYPE_INT_RGB image's raster directly from the LCG state
      * `x0` (already seed-folded): same stored pixel values as
      * per-pixel setRGB (INT_RGB stores the 24-bit value verbatim),
      * without setRGB's per-call color-model conversion and bounds
      * checks. Returns the advanced LCG state (GIF frames continue
      * it). */
    private def fillLcgRaster(img: BufferedImage, x0: Long,
        xorMask: Int, stride: Int): Long = {
      val data = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var x = x0
      var i = 0
      val n = data.length
      while (i < n) {
        x = x * 6364136223846793005L + 1442695040888963407L
        val base = (x >>> 40).toInt & 0xffffff
        data(i) = if (i % stride == 0) base ^ xorMask else base
        i += 1
      }
      x
    }

    /** Near-duplicate PNG: the same LCG raster with every `stride`-th
      * pixel XOR-perturbed — a re-encode with slight pixel noise, the
      * input shape perceptual hashing exists for. */
    def encodePngVariant(width: Int, height: Int, seed: Long,
        xorMask: Int, stride: Int): Array[Byte] = {
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      fillLcgRaster(img, seed | 1L, xorMask, stride)
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

    /** Deterministic real animated GIF: nFrames frames of LCG pixels
      * (palettized by the writer; dimensions and frame count are what
      * the decode oracle checks). */
    def encodeGif(width: Int, height: Int, nFrames: Int, seed: Long): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(bos)
      val writer = ImageIO.getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var x = seed | 1L
      var f = 0
      while (f < nFrames) {
        val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
        x = fillLcgRaster(img, x, 0, 1) // stride 1, no mask: plain LCG raster
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
      writer.dispose()
      ios.close()
      bos.toByteArray
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

    /** Real decode for image (PNG/JPEG via ImageIO), audio
      * (WAV/PCM16), and video (animated GIF, frame-sampled). */
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
        // video = animated GIF: multi-frame decode + frame SAMPLING
        // (up to 8 evenly-spaced frames, mean luminance per sample)
        val iis = ImageIO.createImageInputStream(
          new ByteArrayInputStream(m.payload))
        var reader: javax.imageio.ImageReader = null
        try {
          val readers = ImageIO.getImageReaders(iis)
          require(readers.hasNext, s"media ${m.media_id}: undecodable video")
          reader = readers.next()
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          require(n > 0, s"media ${m.media_id}: zero-frame video")
          val first = reader.read(0)
          def meanLum(img: BufferedImage): Float = {
            val (w, h) = (img.getWidth, img.getHeight)
            // one bulk getRGB: same per-pixel sRGB values, none of the
            // per-call conversion/bounds overhead
            val px = img.getRGB(0, 0, w, h, null, 0, w)
            var sum = 0f
            var p = 0
            while (p < px.length) {
              val rgb = px(p)
              sum += 0.299f * ((rgb >> 16) & 0xff) +
                0.587f * ((rgb >> 8) & 0xff) + 0.114f * (rgb & 0xff)
              p += 1
            }
            sum / (w * h) / 255f
          }
          // sample indexes repeat when n < 8 — decode each frame ONCE
          def sampleIdx(i: Int): Int = if (n == 1) 0 else (i * (n - 1)) / 7
          val lumByFrame = (0 until 8).map(sampleIdx).distinct.map { fi =>
            fi -> meanLum(if (fi == 0) first else reader.read(fi))
          }.toMap
          val feat = Array.tabulate(8)(i => lumByFrame(sampleIdx(i)))
          MediaMeta(m.media_id, m.media_type, m.payload.length,
            first.getWidth * first.getHeight * 3 * n,
            first.getWidth, first.getHeight, n, feat)
        } finally {
          if (reader != null) reader.dispose()
          iis.close()
        }
    }
  }

  /** Documents-as-media: REAL payloads synthesized per row (PNG bytes
    * for image rows, WAV bytes for audio rows, animated-GIF bytes for
    * video rows), then decoded back — the decode step parses actual
    * container headers and, for video, samples real frames. Encode
    * and decode FUSE into one partition-local pass: the payload bytes
    * live only on the task heap between the two steps, never crossing
    * an encoder (serialization) boundary — the shape a real pipeline
    * wants, where decode follows ingest inside the same task. The
    * plan is scan → mapPartitions (encode+decode) → sort. */
  val mmBinaryMeta: Q = (s, d) => {
    import s.implicits._
    // spread: the codec pass is CPU-bound and a local single-file read
    // plans ONE split (no-op at cluster scale — see Tables.spread)
    Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, _) =>
        val row = (id % 3) match {
          case 1 => MediaRow(id, "image",
            MediaCodec.encodePng(16 + (id % 4).toInt * 8,
              12 + (id % 3).toInt * 8, id))
          case 2 => MediaRow(id, "audio",
            MediaCodec.encodeWav(800 + (id % 10).toInt * 80, id))
          case _ => MediaRow(id, "video",
            MediaCodec.encodeGif(16 + (id % 4).toInt * 4,
              12 + (id % 3).toInt * 4, 2 + (id % 4).toInt, id))
        }
        MediaCodec.decode(row)
      })
      .toDF()
      .select(col("media_id"), col("media_type"), col("decoded_bytes"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("media_id"))
  }

  /** Image dedup by decoded content: re-hosted identical images in a
    * crawl (here: PNGs whose pixels repeat whenever the synthesis
    * parameters repeat) are found by hashing the DECODED raster —
    * container bytes can differ (re-encodes, metadata) while the
    * pixels don't, so the key is the raster, not the file. Plan:
    * partition-local encode+decode+md5(raster) (no shuffle), then ONE
    * shuffle on the 16-byte content key — at crawl scale the wire
    * carries (key, id), never pixels. The oracle never sees the hash:
    * it regroups by the synthesis parameters that provably determine
    * the raster — including the seed|1 fold in the pixel LCG, which
    * makes even/odd seed pairs byte-identical — so a Spark run only
    * matches if content-hash grouping equals true pixel-equality
    * grouping. */
  val mmImageDedup: Q = (s, d) => {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 1)
      .mapPartitions(_.map { id =>
        val w = 16 + (id % 4).toInt * 8
        val h = 12 + (id % 5).toInt * 4
        val png = MediaCodec.encodePng(w, h, id % 24)
        val img = ImageIO.read(new ByteArrayInputStream(png))
        val bb = ByteBuffer.allocate(8 + img.getWidth * img.getHeight * 4)
        bb.putInt(img.getWidth).putInt(img.getHeight)
        val px = img.getRGB(0, 0, img.getWidth, img.getHeight,
          null, 0, img.getWidth) // bulk: same values as per-pixel getRGB
        var i = 0
        while (i < px.length) { bb.putInt(px(i)); i += 1 }
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(bb.array())
        (id, digest.map("%02x".format(_)).mkString)
      })
      .toDF("doc_id", "content_key")
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("doc_id")).as("id_sum"))
      .select(col("keep_id"), col("n_copies"), col("id_sum"))
      .orderBy(col("keep_id"))
  }

  /** Audio dedup by decoded content — the WAV analog of
    * mm_image_dedup: identical recordings re-hosted in different
    * containers are found by hashing the PCM SAMPLE STREAM, located by
    * walking the RIFF chunk list (not by hashing container bytes,
    * which metadata chunks would perturb). Same plan shape:
    * partition-local encode+parse+md5 (no shuffle), then ONE shuffle
    * on the 16-byte content key. The oracle regroups by the synthesis
    * parameters that provably determine the samples — (n%6 length
    * variants, (seed%16)|1 with the even/odd LCG fold) — so a pass
    * proves sample-hash grouping equals true content-equality
    * grouping. */
  val mmAudioDedup: Q = (s, d) => {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 2)
      .mapPartitions(_.map { id =>
        val wav = MediaCodec.encodeWav(800 + (id % 6).toInt * 80, id % 16)
        val bb = ByteBuffer.wrap(wav).order(ByteOrder.LITTLE_ENDIAN)
        require(new String(wav, 0, 4) == "RIFF" &&
          new String(wav, 8, 4) == "WAVE", s"doc $id: not RIFF/WAVE")
        bb.position(12)
        var dataOff = -1
        var dataLen = -1
        // chunk walk with the RIFF rules a wild file needs: lengths
        // must be sane, odd-length chunks pad to even, and a missing
        // data chunk fails with the doc id instead of running off
        while (dataOff < 0 && bb.remaining() >= 8) {
          val tag = new String(wav, bb.position(), 4)
          bb.position(bb.position() + 4)
          val len = bb.getInt
          require(len >= 0 && len <= bb.remaining(),
            s"doc $id: corrupt RIFF chunk '$tag' length $len")
          if (tag == "data") { dataOff = bb.position(); dataLen = len }
          else bb.position(bb.position() + len + (len & 1))
        }
        require(dataOff >= 0, s"doc $id: RIFF file has no data chunk")
        val digest = java.security.MessageDigest.getInstance("MD5")
        digest.update(wav, dataOff, dataLen)
        (id, digest.digest().map("%02x".format(_)).mkString)
      })
      .toDF("doc_id", "content_key")
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("doc_id")).as("id_sum"))
      .select(col("keep_id"), col("n_copies"), col("id_sum"))
      .orderBy(col("keep_id"))
  }

  /** Video dedup by decoded frame content — completing the modality
    * triple: every frame of the animated GIF is decoded and its RGB
    * raster hashed in sequence, so re-containered but frame-identical
    * clips group together while a single differing frame splits them.
    * GIF palettization is deterministic for identical input pixels, so
    * equal synthesis parameters yield byte-equal decoded rasters.
    * Same plan: partition-local decode+hash, ONE shuffle on the
    * content key. */
  val mmVideoDedup: Q = (s, d) => {
    import s.implicits._
    Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .filter((id: Long) => id % 3 == 0)
      .mapPartitions(_.map { id =>
        val gif = MediaCodec.encodeGif(
          16 + (id % 4).toInt * 4, 12 + (id % 5).toInt * 2,
          2 + ((id % 7) % 3).toInt, id % 12)
        val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(gif))
        val reader = ImageIO.getImageReaders(iis).next()
        val digest = java.security.MessageDigest.getInstance("MD5")
        try {
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          var f = 0
          while (f < n) {
            val img = reader.read(f)
            val bb = ByteBuffer.allocate(8 + img.getWidth * img.getHeight * 4)
            bb.putInt(img.getWidth).putInt(img.getHeight)
            val px = img.getRGB(0, 0, img.getWidth, img.getHeight,
              null, 0, img.getWidth) // bulk: same values as per-pixel getRGB
            var i = 0
            while (i < px.length) { bb.putInt(px(i)); i += 1 }
            digest.update(bb.array())
            f += 1
          }
        } finally { reader.dispose(); iis.close() }
        (id, digest.digest().map("%02x".format(_)).mkString)
      })
      .toDF("doc_id", "content_key")
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("doc_id")).as("id_sum"))
      .select(col("keep_id"), col("n_copies"), col("id_sum"))
      .orderBy(col("keep_id"))
  }

  /** The frame sequence is a pure function of (w, h, n-frames,
    * seed|1). */
  val mmVideoDedupSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
      CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 3 = 0
    GROUP BY doc_id % 4, doc_id % 5, (doc_id % 7) % 3, (doc_id % 12) | 1
    ORDER BY keep_id"""

  /** The sample stream is a pure function of (n-samples, seed|1). */
  val mmAudioDedupSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
      CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 3 = 2
    GROUP BY doc_id % 6, (doc_id % 16) | 1
    ORDER BY keep_id"""

  /** The raster is a pure function of (w, h, seed|1): regrouping by
    * those parameters must equal grouping by decoded-pixel hash. */
  val mmImageDedupSql: String =
    """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
      CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM documents WHERE doc_id % 3 = 1
    GROUP BY doc_id % 4, doc_id % 5, (doc_id % 24) | 1
    ORDER BY keep_id"""

  /** Perceptual image NEAR-dup — the approximate twin of
    * mm_image_dedup's exact raster hash: re-encodes with slight pixel
    * noise (the crawl reality: thumbnails, recompressions, watermark
    * dots) defeat exact content hashing, so each decoded raster maps
    * to a 64-bit block-mean perceptual hash (8×8 luminance grid, bit
    * = block mean above the global mean — the classic aHash/pHash
    * family, integer-exact by cross-multiplication) and near-dups are
    * pairs within hamming <= 3. Every document carries an image here:
    * even ids the base raster, odd ids a variant with every 191st
    * pixel XOR-perturbed — visually identical, byte-wise different.
    *
    * Scale: decode+hash is partition-local (the only thing that ever
    * crosses the wire is (id, 8-byte hash)); candidate pairs come
    * from the dd_simhash pigeonhole — 16-bit chunk agreement is
    * LOSSLESS for hamming <= 3 over 4 chunks — so pair generation is
    * an equi-join on (chunk, value), never N² over rasters. The
    * oracle replays the pixel LCG arithmetically (PNG is lossless),
    * recomputes every block sum and hash bit in pure SQL, and scans
    * ALL pairs exhaustively — if chunk bucketing ever dropped a true
    * near-dup pair, the gate fails. */
  val mmImagePhash: Q = (s, d) => {
    import s.implicits._
    val hashed = Tables.spread(s, Tables.documents(s, d))
      .select(col("doc_id")).as[Long]
      .mapPartitions(_.map { id =>
        val g = id / 2
        val w = 16 + (g % 4).toInt * 8
        val h = 16 + (g % 3).toInt * 8
        val png =
          if (id % 2 == 0) MediaCodec.encodePng(w, h, g)
          else MediaCodec.encodePngVariant(w, h, g, 0x0f0f, 191)
        val img = ImageIO.read(new ByteArrayInputStream(png))
        val bw = w / 8
        val bh = h / 8
        val sums = new Array[Long](64)
        val px = img.getRGB(0, 0, w, h, null, 0, w) // bulk: same values
        var i = 0
        while (i < px.length) {
          val p = px(i)
          val lum = 299L * ((p >> 16) & 0xff) + 587L * ((p >> 8) & 0xff) +
            114L * (p & 0xff)
          sums(((i / w) / bh) * 8 + ((i % w) / bw)) += lum
          i += 1
        }
        val total = sums.sum
        var hash = 0L
        var b = 0
        // equal-count blocks (8 | w and 8 | h), so S*64 > total is the
        // exact integer form of "block mean above global mean"
        while (b < 64) { if (sums(b) * 64 > total) hash |= (1L << b); b += 1 }
        (id, hash)
      }).toDF("doc_id", "ph")
    val keyed = hashed.select(col("doc_id"), col("ph"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("c"),
          shiftrightunsigned(col("ph"), c * 16).bitwiseAND(lit(0xffffL)).as("v"))
      }: _*)).as("x"))
      .select(col("doc_id"), col("ph"), col("x.c").as("c"), col("x.v").as("v"))
    val a = keyed.select(col("c"), col("v"), col("doc_id").as("doc_a"),
      col("ph").as("pa"))
    val b = keyed.select(col("c"), col("v"), col("doc_id").as("doc_b"),
      col("ph").as("pb"))
    a.join(b, Seq("c", "v")).filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("pa").bitwiseXOR(col("pb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Pure-SQL replica: the pixel LCG replayed per image group by a
    * recursive CTE in HUGEINT mod-2^64 arithmetic (PNG is lossless, so
    * the decoded raster IS the generated one), block sums and hash
    * bits recomputed integer-exactly for both the base and the
    * XOR-perturbed variant, hashes held as two 32-bit halves, and an
    * EXHAUSTIVE all-pairs hamming scan. */
  val mmImagePhashSql: String =
    """WITH RECURSIVE
par AS (
  SELECT g, 16 + (g % 4) * 8 AS w, 16 + (g % 3) * 8 AS h
  FROM (SELECT DISTINCT doc_id // 2 AS g FROM documents)),
pix AS (
  SELECT g, w, h, 0::BIGINT AS i,
    ((g | 1)::HUGEINT % 18446744073709551616) AS x, 0::HUGEINT AS px
  FROM par
  UNION ALL
  SELECT g, w, h, i + 1, xn, (xn // 1099511627776) % 16777216
  FROM (SELECT g, w, h, i,
      ((x * 6364136223846793005 + 1442695040888963407)
        % 18446744073709551616) AS xn
    FROM pix WHERE i < w * h) t),
lums AS (
  SELECT g, w, h, i - 1 AS idx, px::BIGINT AS p
  FROM pix WHERE i >= 1),
cells AS (
  SELECT g,
    ((idx // w) // (h // 8)) * 8 + ((idx % w) // (w // 8)) AS cell,
    sum(299 * ((p // 65536) % 256) + 587 * ((p // 256) % 256)
      + 114 * (p % 256)) AS s0,
    sum(299 * (((CASE WHEN idx % 191 = 0 THEN xor(p, 3855) ELSE p END)
        // 65536) % 256)
      + 587 * (((CASE WHEN idx % 191 = 0 THEN xor(p, 3855) ELSE p END)
        // 256) % 256)
      + 114 * ((CASE WHEN idx % 191 = 0 THEN xor(p, 3855) ELSE p END)
        % 256)) AS s1
  FROM lums GROUP BY g, cell),
tot AS (SELECT g, sum(s0) AS t0, sum(s1) AS t1 FROM cells GROUP BY g),
hashes AS (
  SELECT c.g,
    sum(CASE WHEN s0 * 64 > t0 AND cell < 32
      THEN (1::BIGINT << cell) ELSE 0 END) AS lo0,
    sum(CASE WHEN s0 * 64 > t0 AND cell >= 32
      THEN (1::BIGINT << (cell - 32)) ELSE 0 END) AS hi0,
    sum(CASE WHEN s1 * 64 > t1 AND cell < 32
      THEN (1::BIGINT << cell) ELSE 0 END) AS lo1,
    sum(CASE WHEN s1 * 64 > t1 AND cell >= 32
      THEN (1::BIGINT << (cell - 32)) ELSE 0 END) AS hi1
  FROM cells c JOIN tot USING (g) GROUP BY c.g),
dh AS (
  SELECT d.doc_id,
    CASE WHEN d.doc_id % 2 = 0 THEN h.lo0 ELSE h.lo1 END AS lo,
    CASE WHEN d.doc_id % 2 = 0 THEN h.hi0 ELSE h.hi1 END AS hi
  FROM documents d JOIN hashes h ON h.g = d.doc_id // 2)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  (bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)))::INT AS hamming
FROM dh a JOIN dh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) <= 3
ORDER BY doc_a, doc_b"""

  val queries: Map[String, Q] = Map(
    "mm_binary_meta" -> mmBinaryMeta,
    "mm_image_dedup" -> mmImageDedup,
    "mm_image_phash" -> mmImagePhash,
    "mm_audio_dedup" -> mmAudioDedup,
    "mm_video_dedup" -> mmVideoDedup)

  /** DuckDB replica of the decode outputs: every synthesis parameter
    * (dimensions, sample counts, frame counts) is deterministic in
    * doc_id and decoded_bytes is derivable from the decoded
    * dimensions — so what the gate checks is that the real ImageIO
    * PNG / RIFF WAV / multi-frame GIF decode paths recover exactly
    * the containers' declared shapes. */
  val mmBinaryMetaSql: String =
    """SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 1 THEN 'image' WHEN 2 THEN 'audio' ELSE 'video' END AS media_type,
  (CASE doc_id % 3
    WHEN 1 THEN (16 + (doc_id % 4) * 8) * 20 * 3
    WHEN 2 THEN (800 + (doc_id % 10) * 80) * 2
    ELSE (16 + (doc_id % 4) * 4) * (12 + (doc_id % 3) * 4) * 3 * (2 + doc_id % 4) END)::INT AS decoded_bytes,
  (CASE doc_id % 3
    WHEN 1 THEN 16 + (doc_id % 4) * 8
    WHEN 2 THEN 8000
    ELSE 16 + (doc_id % 4) * 4 END)::INT AS width,
  (CASE doc_id % 3
    WHEN 1 THEN 20 WHEN 2 THEN 1
    ELSE 12 + (doc_id % 3) * 4 END)::INT AS height,
  (CASE doc_id % 3
    WHEN 1 THEN 1
    WHEN 2 THEN 800 + (doc_id % 10) * 80
    ELSE 2 + doc_id % 4 END)::INT AS n_frames
FROM documents ORDER BY media_id"""

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" -> mmBinaryMetaSql,
    "mm_image_dedup" -> mmImageDedupSql,
    "mm_image_phash" -> mmImagePhashSql,
    "mm_audio_dedup" -> mmAudioDedupSql,
    "mm_video_dedup" -> mmVideoDedupSql)
}
