package graft.zarr

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `ZarrMaintenance.analyze` — the stats-sidecar backfill (ANALYZE) for
  * stores the engine did not write. A foreign store (Zarr v2, or a v3
  * store from another writer) arrives sidecar-less, so scans silently
  * degrade to decode-and-test; analyze restores chunk skipping and
  * metadata-only aggregate pushdown with one distributed pass. */
class AnalyzeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("analyze-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graftstat.impl", classOf[RecordingFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-analyze").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t)
    }
  }

  test("analyze a foreign Zarr v2 store: min/max pushdown then answers with zero chunk reads") {
    // fixtures are read-only — analyze writes a sidecar, so copy first
    copyDir(Paths.get("src/test/resources/zarr_v2_1d"), Paths.get(s"$base/v2"))
    val url = s"graftstat://$base/v2"
    val n = ZarrMaintenance.analyze(spark, url)
    assert(n == 3, s"11 rows / chunk 4 = 3 chunks, analyzed $n")
    val segs = ZarrStore(url).listStatsSegments()
    assert(segs.map(_._2).sum == 3 && segs.head._1 == 0L,
      s"segments must cover ordinals [0, 3): $segs")
    val df = spark.read.format("zarr").load(url)
    RecordingFileSystem.opened.clear()
    val r = df.agg(count(lit(1)), min("id64"), max("id64"), max("u8")).collect()(0)
    assert(r.getLong(0) == 11)
    assert(r.getLong(1) == 1000000000000L && r.getLong(2) == 1000000000010L)
    assert(r.getShort(3) == 255)
    val chunkOpens = RecordingFileSystem.opened.toArray.map(_.toString)
      .filter(_.matches(".*/v2/(flag|id64|u8)/\\d+$"))
    assert(chunkOpens.isEmpty,
      s"post-analyze metadata-only aggregate read chunks: ${chunkOpens.mkString(", ")}")
  }

  test("analyze restores a v3 store whose sidecar was lost") {
    val sp = spark; import sp.implicits._
    val url = s"graftstat://$base/v3"
    (0 until 60).map(i => (i.toLong, 3.5 * i)).toDF("id", "x")
      .coalesce(1).write.format("zarr").mode("overwrite")
      .option("chunk_size", "16").save(url)
    // lose the sidecar (a foreign copy, an object-store mishap, ...)
    val statsDir = Paths.get(s"$base/v3/${ChunkStats.dirName}")
    Files.walk(statsDir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => Files.delete(p))
    assert(ZarrStore(url).listStatsSegments().isEmpty)
    assert(ZarrMaintenance.analyze(spark, url) == 4) // 60/16 -> 4 chunks
    val df = spark.read.format("zarr").load(url)
    RecordingFileSystem.opened.clear()
    val r = df.agg(min("x"), max("x"), sum("id")).collect()(0)
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 3.5 * 59)
    assert(r.getLong(2) == 59L * 60 / 2)
    val chunkOpens = RecordingFileSystem.opened.toArray.map(_.toString)
      .filter(_.matches(".*/v3/(id|x)/c/\\d+$"))
    assert(chunkOpens.isEmpty,
      s"restored sidecar must serve the aggregate: ${chunkOpens.mkString(", ")}")
  }

  test("analyze refuses N-D stores and is loud about it") {
    copyDir(Paths.get("src/test/resources/zarr_v2_2d"), Paths.get(s"$base/v2nd"))
    val e = intercept[ZarrException] {
      ZarrMaintenance.analyze(spark, s"$base/v2nd")
    }
    assert(e.getMessage.contains("1-D"), e.getMessage)
  }

  test("re-analyze refreshes: stale segments are purged, coverage stays whole") {
    val url = s"graftstat://$base/v2"
    assert(ZarrMaintenance.analyze(spark, url) == 3) // second run, same store
    val segs = ZarrStore(url).listStatsSegments()
    assert(segs.map(_._2).sum == 3, s"re-analyze must not double segments: $segs")
  }
}
