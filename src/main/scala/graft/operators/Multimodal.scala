package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline.
  *
  * Media (image/audio/video) is carried as an opaque `binary` payload
  * column plus typed metadata, and decoded per partition with
  * `Dataset.mapPartitions` — the Scala analog of `mapInPandas`: the
  * executor streams batches of blobs through a decode function without
  * ever collecting to the driver. The literal Pandas-UDF form of the
  * same operator (binary payload → `mapInPandas` → typed feature
  * schema, vectorized pandas batches) is exercised end-to-end by
  * `tools/pymultimodal_smoke.py`, cross-checked value-for-value
  * against the fallback's arithmetic.
  *
  * ==== Decode paths ====
  * IMAGE payloads are decoded for REAL via the JDK's `javax.imageio`
  * (PNG / JPEG / BMP / GIF readers ship with Java SE — no external
  * library): true width/height, true frame count (animated GIF), and
  * an integer-exact mean-luminance stat ([[decodeImage]], pinned by
  * MultimodalDecodeSpec on images generated in-test). Payloads whose
  * magic bytes are not a decodable image — including the synthetic
  * text-byte payloads the driver testdata carries — fall back to
  * [[decodeStub]], a DETERMINISTIC arithmetic featurizer whose values
  * the q41 DuckDB oracle replays (a SQL oracle cannot decode pixels,
  * so the oracle-checked entry exercises the fallback path by
  * construction; the real path is spec-pinned instead). Audio/video
  * codecs have no JDK decoder and always take the fallback. Either
  * way the plumbing — binary schema, typed Encoders, partition-wise
  * batch iteration, output schema — is identical.
  */
object Multimodal {

  /** Opaque media blob + typed metadata. */
  final case class MediaBlob(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Extracted features (fake, deterministic — see STUB note). */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      n_bytes: Long,
      byte_sum: Long)

  /** Fallback decode: byte statistics in lieu of pixel decode — the
    * DETERMINISTIC arithmetic the q41 oracle replays. Pure and
    * per-element — safe to run inside `mapPartitions` on executors. */
  def decodeStub(blob: MediaBlob): MediaFeatures = {
    var sum = 0L
    var i = 0
    val p = blob.payload
    while (i < p.length) { sum += (p(i) & 0xff); i += 1 }
    MediaFeatures(
      doc_id = blob.doc_id,
      media_type = blob.media_type,
      width = (p.length % 640) + 16,
      // widen BEFORE the multiply: p.length * 7 overflows Int32 past
      // ~307 MB payloads, and a negative % stays negative in Scala —
      // the oracle computes this in BIGINT
      height = ((p.length.toLong * 7L) % 480L).toInt + 16,
      n_frames = (p.length % 16) + 1,
      n_bytes = p.length.toLong,
      byte_sum = sum)
  }

  /** True iff the payload leads with a decodable-image magic number
    * (PNG / JPEG / GIF / BMP — the JDK ImageIO reader set). A sniff is
    * a HINT only: text can legitimately start with "BM", so the decode
    * itself still falls back on failure. */
  def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 8 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte && p(2) == 0xFF.toByte) ||
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F' && p(3) == '8') ||
      (p(0) == 'B' && p(1) == 'M'))

  // ImageIO setup, once per executor JVM: no display (headless) and no
  // temp-file stream cache (decode stays in memory on executors)
  private lazy val imageIoReady: Unit = {
    System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** REAL image decode via the JDK's ImageIO: true dimensions, true
    * frame count (animated GIF), payload byte sum. Returns None when
    * the bytes are not a decodable image (caller falls back to
    * [[decodeStub]]). Mean luminance is integer-exact — see
    * [[meanLumaE4]]. */
  def decodeImage(blob: MediaBlob): Option[MediaFeatures] = {
    if (!looksLikeImage(blob.payload)) return None
    imageIoReady
    val in = new java.io.ByteArrayInputStream(blob.payload)
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(in)
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return None
        val r = readers.next()
        try {
          r.setInput(iis, false, true)
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          // allowSearch=true walks the stream for the exact count (GIF
          // frame count); single-frame formats answer 1 immediately
          val frames = r.getNumImages(true)
          var sum = 0L
          var i = 0
          while (i < blob.payload.length) { sum += (blob.payload(i) & 0xff); i += 1 }
          Some(MediaFeatures(blob.doc_id, blob.media_type, w, h,
            math.max(frames, 1), blob.payload.length.toLong, sum))
        } finally r.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      case scala.util.control.NonFatal(_) => None // not an image → fallback
    }
  }

  /** Integer-exact mean luminance ×10⁴ of the first frame: per pixel
    * luma = (299·R + 587·G + 114·B) div 1000 (the ITU-R 601 integer
    * weights), mean scaled to 1e4 with integer division — every step
    * exact, so the stat is reproducible across JVMs and platforms. */
  def meanLumaE4(payload: Array[Byte]): Option[Long] = {
    imageIoReady
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sum += (299L * r + 587L * g + 114L * b) / 1000L
          x += 1
        }
        y += 1
      }
      val n = img.getWidth.toLong * img.getHeight.toLong
      Some(sum * 10000L / math.max(n, 1L))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Pure-JDK thumbnail: decode, scale so max(width, height) == maxDim
    * (never upscale), re-encode as PNG. The resize step of an image
    * curation pipeline — runs per-partition on executors like the
    * decode. Returns None for non-image payloads. */
  def thumbnail(payload: Array[Byte], maxDim: Int): Option[Array[Byte]] = {
    imageIoReady
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val scale = math.min(1.0, maxDim.toDouble / math.max(img.getWidth, img.getHeight))
      val tw = math.max(1, math.round(img.getWidth * scale).toInt)
      val th = math.max(1, math.round(img.getHeight * scale).toInt)
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, tw, th, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      Some(bos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** The operator: blobs → features, executed partition-wise. Real
    * ImageIO decode for image payloads, deterministic arithmetic
    * fallback for everything else (see the object Scaladoc). */
  def extractFeatures(blobs: Dataset[MediaBlob]): Dataset[MediaFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map(b => decodeImage(b).getOrElse(decodeStub(b))))
  }

  /** Decoded audio features — REAL decode via the JDK's
    * `javax.sound.sampled` (WAV / AIFF / AU readers ship with Java SE).
    * `mean_square` and `peak_abs` are computed over 16-bit PCM samples
    * in exact integer arithmetic (sum of squares is a long; one integer
    * division) so the stats are platform-reproducible. */
  final case class AudioFeatures(
      doc_id: Long,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      mean_square: Long,
      peak_abs: Int)

  /** True iff the payload leads with a JDK-decodable audio container
    * magic (RIFF/WAVE, FORM/AIFF, .snd). Like [[looksLikeImage]], a
    * hint only — decode failure still returns None. */
  def looksLikeAudio(p: Array[Byte]): Boolean =
    p.length >= 12 && (
      (p(0) == 'R' && p(1) == 'I' && p(2) == 'F' && p(3) == 'F' &&
        p(8) == 'W' && p(9) == 'A' && p(10) == 'V' && p(11) == 'E') ||
      (p(0) == 'F' && p(1) == 'O' && p(2) == 'R' && p(3) == 'M') ||
      (p(0) == '.' && p(1) == 's' && p(2) == 'n' && p(3) == 'd'))

  /** REAL audio decode: container parsed by `AudioSystem`, samples
    * normalized to signed 16-bit PCM (the JDK converts other PCM
    * widths/encodings), features from one pass over the frames.
    * Returns None for non-audio payloads — the same
    * sniff-then-fallback discipline as [[decodeImage]]. */
  def decodeAudio(blob: MediaBlob): Option[AudioFeatures] = {
    if (!looksLikeAudio(blob.payload)) return None
    imageIoReady // headless, no stream temp-file cache
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val raw = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(blob.payload))
      try {
        val f = raw.getFormat
        val want = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
          f.getSampleRate, 16, f.getChannels, f.getChannels * 2,
          f.getSampleRate, false)
        val pcm = if (f.matches(want)) raw
          else AudioSystem.getAudioInputStream(want, raw)
        try {
          val bytes = pcm.readAllBytes()
          val ch = want.getChannels
          val nSamples = bytes.length / 2
          var sumSq = 0L
          var peak = 0
          var i = 0
          while (i + 1 < bytes.length) {
            // little-endian signed 16-bit
            val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort.toInt
            sumSq += s.toLong * s.toLong
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 2
          }
          val frames = if (ch > 0) nSamples.toLong / ch else 0L
          val rate = math.round(want.getSampleRate)
          Some(AudioFeatures(blob.doc_id, rate, ch, frames,
            if (rate > 0) frames * 1000L / rate else 0L,
            if (nSamples > 0) sumSq / nSamples else 0L, peak))
        } finally pcm.close()
      } finally raw.close()
    } catch {
      // UnsupportedAudioFileException (sniff false-positive) included
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** The audio operator: blobs → decoded features, partition-wise;
    * non-audio payloads are dropped (flatMap — the select-and-decode
    * step of an audio curation pipeline). */
  def extractAudioFeatures(blobs: Dataset[MediaBlob]): Dataset[AudioFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap(b => decodeAudio(b))
  }

  /** One sampled frame of a video-like payload (the "frame" is a byte
    * slice; a pixel-level sampler would route through [[decodeImage]] —
    * video containers have no JDK decoder, so this stays byte-level). */
  final case class Frame(doc_id: Long, k: Int, frame_idx: Int, frame_off: Long, frame_len: Int)

  /** Frame sampling: each blob yields 4 evenly-spaced frame references —
    * the flatMap shape (1 row in, N rows out per media item) of a
    * frame-extraction pipeline. */
  def sampleFrames(blobs: Dataset[MediaBlob]): Dataset[Frame] = {
    import blobs.sparkSession.implicits._
    blobs.flatMap { b =>
      val nBytes = b.payload.length.toLong
      val nFrames = (b.payload.length % 16) + 1
      (0 until 4).map { k =>
        val idx = k * nFrames / 4
        Frame(b.doc_id, k, idx, (idx.toLong * 997L) % math.max(nBytes, 1L),
          math.min(64L, nBytes).toInt)
      }
    }
  }

  /** Solid-color image encoded by the JDK (executor-side helper for the
    * roundtrip entries; the decode result depends only on the pixels,
    * never on byte-level encoder details). */
  def encodeSolidPng(w: Int, h: Int, rgb: Int): Array[Byte] = {
    imageIoReady
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Constant-amplitude 16-bit mono PCM WAV (executor-side helper). */
  def encodeConstWav(amplitude: Short, frames: Int, rate: Int): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](frames * 2)
    var i = 0
    while (i < frames) {
      bytes(2 * i) = (amplitude & 0xff).toByte
      bytes(2 * i + 1) = ((amplitude >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, 1, 2, rate.toFloat, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Grayscale test-pattern image for the perceptual-hash entry: pixel
    * (x, y) has gray level `(k·31 + x·7 + y·13) mod 256` in all three
    * channels (so integer luma == gray exactly: (299+587+114)·g / 1000
    * = g). Content depends only on `k`, which is how the roundtrip
    * corpus gets INTENTIONAL duplicates to find. */
  def encodePatternPng(k: Long, w: Int, h: Int): Array[Byte] = {
    imageIoReady
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = ((k * 31 + x * 7 + y * 13) % 256).toInt
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Average-hash (aHash) of a decoded image, all-integer: the 32×32
    * grayscale is reduced to an 8×8 grid of 4×4 block means (integer
    * division), each bit is `block mean > overall mean` (the overall
    * mean is the integer mean of the 64 block means), emitted as a
    * 64-char bit string in (by, bx) row-major order. Every step is
    * exact integer arithmetic, so the hash is closed-form predictable
    * from the pixel formula — which is what lets a SQL oracle check a
    * perceptual hash at all. */
  def aHash64(payload: Array[Byte]): Option[String] = {
    imageIoReady
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null || img.getWidth < 8 || img.getHeight < 8) return None
      val bw = img.getWidth / 8
      val bh = img.getHeight / 8
      val bm = new Array[Long](64)
      var by = 0
      while (by < 8) {
        var bx = 0
        while (bx < 8) {
          var s = 0L
          var y = by * bh
          while (y < (by + 1) * bh) {
            var x = bx * bw
            while (x < (bx + 1) * bw) {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              s += (299L * r + 587L * g + 114L * b) / 1000L
              x += 1
            }
            y += 1
          }
          bm(by * 8 + bx) = s / (bw.toLong * bh.toLong)
          bx += 1
        }
        by += 1
      }
      val mean = bm.sum / 64L
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i < 64) { sb.append(if (bm(i) > mean) '1' else '0'); i += 1 }
      Some(sb.toString)
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef.sql(
      "q41_multimodal",
      // the oracle replays the deterministic fake decode in SQL; text is
      // ASCII so per-char codepoints == payload bytes
      """WITH f AS (
        |  SELECT doc_id, length(text) AS n,
        |    coalesce(list_sum(list_transform(generate_series(1, length(text)),
        |      i -> ascii(substr(text, i, 1)))), 0) AS byte_sum
        |  FROM documents)
        |SELECT doc_id, 'image' AS media_type,
        |  (n % 640) + 16 AS width,
        |  ((n * 7) % 480) + 16 AS height,
        |  (n % 16) + 1 AS n_frames,
        |  n AS n_bytes,
        |  byte_sum::BIGINT AS byte_sum,
        |  ((byte_sum * 10000) // greatest(n, 1))::BIGINT AS mean_byte_e4
        |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), lit("image").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaBlob]
      extractFeatures(blobs).toDF()
        // mean as a ×10⁴ integer: round(double) is not bit-identical
        // across engines (Spark HALF_UP vs DuckDB's nearest-double), so
        // the derived stat is computed in exact integer arithmetic
        .withColumn("mean_byte_e4", expr("byte_sum * 10000L DIV greatest(n_bytes, 1L)"))
        .orderBy("doc_id")
    },

    QueryDef.sql(
      "q43_frame_sample",
      """WITH f AS (SELECT doc_id, length(text) AS n FROM documents)
        |SELECT doc_id, k,
        |  (k * ((n % 16) + 1)) // 4 AS frame_idx,
        |  (((k * ((n % 16) + 1)) // 4) * 997) % greatest(n, 1) AS frame_off,
        |  least(64, n) AS frame_len
        |FROM f, range(0, 4) t(k)
        |ORDER BY doc_id, k""".stripMargin) { (s, dir) =>
      import s.implicits._
      val blobs = Tables.load(s, dir, "documents")
        .select(col("doc_id"), lit("video").as("media_type"),
          encode(col("text"), "UTF-8").as("payload"))
        .as[MediaBlob]
      sampleFrames(blobs).toDF()
        .select(col("doc_id"), col("k"), col("frame_idx"), col("frame_off"),
          col("frame_len"))
        .orderBy("doc_id", "k")
    },

    // ---- REAL image decode under the oracle gate (the q99 roundtrip
    //      pattern applied to media): each doc is rendered to a solid
    //      PNG whose dimensions and color are closed-form functions of
    //      its (doc_id, n_chars), encoded AND decoded with the JDK's
    //      ImageIO on executors, and the DECODED truth — dimensions,
    //      frame count, integer-exact mean luminance — is what the
    //      query emits. The DuckDB oracle states the same closed forms,
    //      so a decode defect (wrong dims, luma drift, frame
    //      miscount) breaks the hash. Encode→decode runs inside ONE
    //      mapPartitions pass; nothing but the narrow feature rows
    //      leaves the executor. ----
    QueryDef.sql(
      "q112_image_roundtrip",
      """SELECT doc_id,
        |  ((n_chars % 48) + 8)::BIGINT AS width,
        |  ((doc_id % 32) + 8)::BIGINT AS height,
        |  1::BIGINT AS n_frames,
        |  (((299 * (doc_id % 256) + 587 * (n_chars % 256) + 114 * 42) // 1000)
        |    * 10000)::BIGINT AS luma_e4
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // the global sort sits BELOW the codec pass: a sort directly above
      // the decode would run its lineage TWICE (the range partitioner's
      // sampling job re-executes an exchange-free child), doubling every
      // ImageIO encode+decode — sorting the two-long projection first is
      // a cheap resample, and the per-row map preserves the order
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          val w = ((nc % 48) + 8).toInt
          val h = ((id % 32) + 8).toInt
          val rgb = (((id % 256) << 16) | ((nc % 256) << 8) | 42).toInt
          val png = encodeSolidPng(w, h, rgb)
          val f = decodeImage(MediaBlob(id, "image", png)).getOrElse(
            throw new IllegalStateException(s"q112: PNG for doc $id failed to decode"))
          val luma = meanLumaE4(png).getOrElse(
            throw new IllegalStateException(s"q112: luma for doc $id failed"))
          (id, f.width.toLong, f.height.toLong, f.n_frames.toLong, luma)
        })
        .toDF("doc_id", "width", "height", "n_frames", "luma_e4")
    },

    // ---- REAL audio decode under the oracle gate: constant-amplitude
    //      WAV per doc (amplitude, frame count closed-form from doc
    //      fields), written and parsed by javax.sound.sampled on
    //      executors; the DECODED rate / frames / duration / exact PCM
    //      energy is the output the oracle predicts. ----
    QueryDef.sql(
      "q113_audio_roundtrip",
      """SELECT doc_id,
        |  8000::BIGINT AS sample_rate,
        |  ((n_chars % 500) + 100)::BIGINT AS n_frames,
        |  (((n_chars % 500) + 100) * 1000 // 8000)::BIGINT AS duration_ms,
        |  ((doc_id % 1000) * (doc_id % 1000))::BIGINT AS mean_square,
        |  (doc_id % 1000)::BIGINT AS peak_abs
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      // sort below the codec pass — same double-execution avoidance as
      // q112 (the sampling job would re-run every WAV encode+decode)
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
        .orderBy("doc_id")
        .as[(Long, Long)]
        .mapPartitions(_.map { case (id, nc) =>
          val amp = (id % 1000).toShort
          val frames = ((nc % 500) + 100).toInt
          val wavBytes = encodeConstWav(amp, frames, 8000)
          val f = decodeAudio(MediaBlob(id, "audio", wavBytes)).getOrElse(
            throw new IllegalStateException(s"q113: WAV for doc $id failed to decode"))
          (id, f.sample_rate.toLong, f.n_frames, f.duration_ms, f.mean_square,
            f.peak_abs.toLong)
        })
        .toDF("doc_id", "sample_rate", "n_frames", "duration_ms", "mean_square", "peak_abs")
    },

    // ---- perceptual-hash image dedup (aHash) over REAL decoded
    //      pixels: each doc renders a 32×32 grayscale test pattern
    //      whose content depends only on doc_id mod 50 (so the corpus
    //      carries intentional pixel-identical duplicates), the PNG
    //      goes through a full ImageIO encode→decode, and the decoded
    //      pixels are average-hashed — 8×8 block means vs their mean,
    //      all integer arithmetic, so the SQL oracle predicts every
    //      bit of the hash from the pixel formula. Dedup = group by
    //      hash, keep the lowest doc_id (the image-dedup rule of a
    //      multimodal curation pipeline, here with the hash computed
    //      from REAL codec output rather than metadata).
    //
    //      Scale shape: render+decode+hash is one scan-local
    //      mapPartitions pass with a per-partition content cache (one
    //      render per DISTINCT pattern, not per row); dedup is one
    //      hash-key window — the q34 exact-dedup shape with a
    //      perceptual key. ----
    QueryDef.sql(
      "q114_phash_dedup",
      """WITH ks AS (
        |  SELECT DISTINCT doc_id % 50 AS k FROM documents
        |), px AS (
        |  SELECT k, x // 4 AS bx, y // 4 AS by,
        |    (k * 31 + x * 7 + y * 13) % 256 AS g
        |  FROM ks, range(0, 32) t1(x), range(0, 32) t2(y)
        |), blk AS (
        |  SELECT k, by, bx, (sum(g) // 16)::BIGINT AS bm
        |  FROM px GROUP BY k, by, bx
        |), mn AS (
        |  SELECT k, (sum(bm) // 64)::BIGINT AS mm FROM blk GROUP BY k
        |), h AS (
        |  SELECT blk.k,
        |    array_to_string(list(CASE WHEN bm > mm THEN '1' ELSE '0' END
        |      ORDER BY by, bx), '') AS ahash
        |  FROM blk JOIN mn ON blk.k = mn.k GROUP BY blk.k
        |), a AS (
        |  SELECT d.doc_id, h.ahash FROM documents d JOIN h ON d.doc_id % 50 = h.k
        |)
        |SELECT doc_id, ahash,
        |  min(doc_id) OVER (PARTITION BY ahash) AS canonical_id,
        |  (count(*) OVER (PARTITION BY ahash))::BIGINT AS group_size,
        |  (doc_id != min(doc_id) OVER (PARTITION BY ahash)) AS is_dup
        |FROM a ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      val hashed = Tables.load(s, dir, "documents")
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          // one render+decode+hash per DISTINCT pattern per partition
          val cache = scala.collection.mutable.HashMap.empty[Long, String]
          it.map { id =>
            val k = id % 50
            val h = cache.getOrElseUpdate(k, {
              aHash64(encodePatternPng(k, 32, 32)).getOrElse(
                throw new IllegalStateException(s"q114: aHash failed for k=$k"))
            })
            (id, h)
          }
        }.toDF("doc_id", "ahash")
      val wH = Window.partitionBy(col("ahash"))
      hashed
        .select(col("doc_id"), col("ahash"),
          min(col("doc_id")).over(wH).as("canonical_id"),
          count(lit(1)).over(wH).as("group_size"),
          (col("doc_id") =!= min(col("doc_id")).over(wH)).as("is_dup"))
        .orderBy("doc_id")
    })
}
