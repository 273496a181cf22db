package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageTypeSpecifier}
import javax.imageio.metadata.IIOMetadataNode
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The REAL multimodal decode path: images generated in-test (pure JDK
  * ImageIO — the same library the operator decodes with, but through
  * independent write/read entry points), pushed through the Spark
  * `mapPartitions` operator, and checked for true dimensions, frame
  * counts, and integer-exact pixel stats. The arithmetic fallback for
  * non-image payloads (what the q41 oracle replays) is pinned alongside
  * so the dispatch can never silently flip. */
class MultimodalDecodeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .appName("multimodal-decode-spec")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def solidImage(w: Int, h: Int, rgb: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try { g.setColor(new java.awt.Color(rgb)); g.fillRect(0, 0, w, h) }
    finally g.dispose()
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
    bos.toByteArray
  }

  /** 3-frame animated GIF via the JDK sequence writer. */
  private def animatedGif(frames: Seq[BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersBySuffix("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        val meta = writer.getDefaultImageMetadata(
          ImageTypeSpecifier.createFromRenderedImage(f), writer.getDefaultWriteParam)
        val root = meta.getAsTree(meta.getNativeMetadataFormatName)
          .asInstanceOf[IIOMetadataNode]
        val gce = new IIOMetadataNode("GraphicControlExtension")
        gce.setAttribute("disposalMethod", "none")
        gce.setAttribute("userInputFlag", "FALSE")
        gce.setAttribute("transparentColorFlag", "FALSE")
        gce.setAttribute("delayTime", "10")
        gce.setAttribute("transparentColorIndex", "0")
        root.appendChild(gce)
        meta.setFromTree(meta.getNativeMetadataFormatName, root)
        writer.writeToSequence(new IIOImage(f, null, meta), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  private def features(blobs: Seq[Multimodal.MediaBlob]): Map[Long, Multimodal.MediaFeatures] = {
    val s = spark
    import s.implicits._
    Multimodal.extractFeatures(s.createDataset(blobs))
      .collect().map(f => f.doc_id -> f).toMap
  }

  test("PNG / JPEG / BMP / GIF payloads decode to their TRUE dimensions through the operator") {
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "image", encode(solidImage(31, 17, 0x336699), "png")),
      Multimodal.MediaBlob(2L, "image", encode(solidImage(64, 48, 0x808080), "jpg")),
      Multimodal.MediaBlob(3L, "image", encode(solidImage(5, 200, 0xFF0000), "bmp")),
      Multimodal.MediaBlob(4L, "image", encode(solidImage(12, 12, 0x00FF00), "gif")))
    val f = features(blobs)
    assert((f(1L).width, f(1L).height, f(1L).n_frames) == ((31, 17, 1)))
    assert((f(2L).width, f(2L).height, f(2L).n_frames) == ((64, 48, 1)))
    assert((f(3L).width, f(3L).height, f(3L).n_frames) == ((5, 200, 1)))
    assert((f(4L).width, f(4L).height, f(4L).n_frames) == ((12, 12, 1)))
    // byte stats describe the payload either way
    blobs.foreach { b =>
      assert(f(b.doc_id).n_bytes == b.payload.length.toLong)
      assert(f(b.doc_id).byte_sum == b.payload.map(_ & 0xff).map(_.toLong).sum)
    }
  }

  test("animated GIF reports its true frame count") {
    val gif = animatedGif(Seq(
      solidImage(20, 10, 0x111111), solidImage(20, 10, 0x222222),
      solidImage(20, 10, 0x333333)))
    val f = features(Seq(Multimodal.MediaBlob(7L, "image", gif)))(7L)
    assert((f.width, f.height) == ((20, 10)))
    assert(f.n_frames == 3, s"expected 3 GIF frames, got ${f.n_frames}")
  }

  test("non-image payloads take the deterministic arithmetic fallback (the q41 oracle path)") {
    val text = "some document text that is clearly not an image"
      .getBytes("UTF-8")
    val f = features(Seq(Multimodal.MediaBlob(9L, "image", text)))(9L)
    assert(f == Multimodal.decodeStub(Multimodal.MediaBlob(9L, "image", text)))
    assert(f.width == (text.length % 640) + 16, "fallback arithmetic must be the oracle's")
  }

  test("a payload with an image magic but corrupt body falls back — never crashes, never lies") {
    // "BM" + garbage: the sniff says BMP, the reader must reject it
    val fake = ("BM" + "W is a car maker, not a bitmap header").getBytes("UTF-8")
    val f = features(Seq(Multimodal.MediaBlob(11L, "image", fake)))(11L)
    assert(f == Multimodal.decodeStub(Multimodal.MediaBlob(11L, "image", fake)))
  }

  test("mean luminance is integer-exact: solid colors give the closed-form value") {
    // luma(90, 120, 30) = (299*90 + 587*120 + 114*30) div 1000 = 100 (exact)
    val png = encode(solidImage(40, 30, (90 << 16) | (120 << 8) | 30), "png")
    assert(Multimodal.meanLumaE4(png).contains(100L * 10000L))
    // black and white extremes
    assert(Multimodal.meanLumaE4(encode(solidImage(8, 8, 0x000000), "png")).contains(0L))
    assert(Multimodal.meanLumaE4(encode(solidImage(8, 8, 0xFFFFFF), "png")).contains(255L * 10000L))
    assert(Multimodal.meanLumaE4("not an image".getBytes("UTF-8")).isEmpty)
  }

  /** 16-bit mono little-endian PCM WAV from raw sample values. */
  private def wav(samples: Array[Short], rate: Int, channels: Int = 1): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val bytes = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      bytes(2 * i) = (samples(i) & 0xff).toByte
      bytes(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
      rate.toFloat, 16, channels, channels * 2, rate.toFloat, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("WAV payloads decode to true rate/frames and integer-exact energy through the operator") {
    val s = spark
    import s.implicits._
    // 100 ms of a ±1000 square wave at 44.1 kHz: mean_square = 1000²,
    // peak = 1000, frames = 4410 — all closed-form
    val sq = Array.tabulate(4410)(i => if ((i / 5) % 2 == 0) 1000.toShort else (-1000).toShort)
    // stereo: L = 300, R = -300 constants → mean_square = 300², 2 channels
    val st = Array.tabulate(2000)(i => if (i % 2 == 0) 300.toShort else (-300).toShort)
    val blobs = Seq(
      Multimodal.MediaBlob(1L, "audio", wav(sq, 44100)),
      Multimodal.MediaBlob(2L, "audio", wav(st, 8000, channels = 2)),
      Multimodal.MediaBlob(3L, "audio", "RIFFxxxxWAVE but not really".getBytes("UTF-8")),
      Multimodal.MediaBlob(4L, "audio", "plain text".getBytes("UTF-8")))
    val out = Multimodal.extractAudioFeatures(s.createDataset(blobs))
      .collect().map(f => f.doc_id -> f).toMap
    // corrupt header and text are dropped by the flatMap
    assert(out.keySet == Set(1L, 2L))
    val a = out(1L)
    assert((a.sample_rate, a.channels, a.n_frames, a.duration_ms) == ((44100, 1, 4410L, 100L)))
    assert(a.mean_square == 1000L * 1000L)
    assert(a.peak_abs == 1000)
    val b = out(2L)
    assert((b.sample_rate, b.channels, b.n_frames) == ((8000, 2, 1000L)))
    assert(b.mean_square == 300L * 300L)
    assert(b.peak_abs == 300)
  }

  test("aHash: left-black right-white image gives the checkerboard-free closed form") {
    // 32×32, left half black (luma 0), right half white (luma 255):
    // block means are 0 for bx<4 and 255 for bx>=4; overall mean
    // = (4*0 + 4*255)*8/64 = 127 -> bits 0000111100001111... row-major
    val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(java.awt.Color.BLACK); g.fillRect(0, 0, 16, 32)
      g.setColor(java.awt.Color.WHITE); g.fillRect(16, 0, 16, 32)
    } finally g.dispose()
    val h = Multimodal.aHash64(encode(img, "png")).get
    assert(h == "0000111100001111000011110000111100001111000011110000111100001111")
    // solid image: no block exceeds the mean -> all zeros
    assert(Multimodal.aHash64(encode(solidImage(32, 32, 0x777777), "png"))
      .contains("0" * 64))
    assert(Multimodal.aHash64("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("thumbnail scales max dimension down (never up) and survives a decode roundtrip") {
    val big = encode(solidImage(640, 480, 0x446688), "png")
    val tn = Multimodal.thumbnail(big, 64).get
    val back = ImageIO.read(new java.io.ByteArrayInputStream(tn))
    assert((back.getWidth, back.getHeight) == ((64, 48)))
    // solid color survives bilinear resampling exactly
    assert((back.getRGB(32, 24) & 0xFFFFFF) == 0x446688)
    // small images pass through unscaled
    val small = encode(solidImage(10, 6, 0x010203), "png")
    val tn2 = Multimodal.thumbnail(small, 64).get
    val back2 = ImageIO.read(new java.io.ByteArrayInputStream(tn2))
    assert((back2.getWidth, back2.getHeight) == ((10, 6)))
    assert(Multimodal.thumbnail("plain text".getBytes("UTF-8"), 64).isEmpty)
  }
}
