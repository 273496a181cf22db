package graft.zarr

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Consolidated metadata: DSv2-written stores embed every array's
  * zarr.json in the root group document, so schema inference is ONE
  * object read instead of a LIST + one GET per array; stores without the
  * field (all test-utility fixtures) use the per-array fallback. */
class ConsolidatedMetaSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("consolidated-meta-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graftstat.impl", classOf[RecordingFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-consolidated").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("DSv2 write embeds consolidated metadata; inference never opens per-array docs") {
    val sp = spark; import sp.implicits._
    val url = s"graftstat://$base/c1"
    (0 until 64).map(i => (i.toLong, i * 0.5, s"k$i")).toDF("id", "v", "name")
      .coalesce(1).write.format("zarr").mode("overwrite")
      .option("chunk_size", "16").save(url)

    val store = ZarrStore(s"$base/c1",
      Seq("fs.graftstat.impl" -> classOf[RecordingFileSystem].getName))
    val metas = store.readConsolidatedMetas()
    assert(metas.isDefined && metas.get.map(_.name) == Seq("id", "name", "v"))
    assert(metas.get.forall(_.shape(0) == 64))

    RecordingFileSystem.opened.clear()
    val schema = spark.read.format("zarr").load(url).schema
    assert(schema.fieldNames.toSeq == Seq("id", "name", "v"))
    val metaOpens = RecordingFileSystem.opened.toArray.map(_.toString)
      .filter(_.endsWith("zarr.json"))
    assert(metaOpens.nonEmpty && metaOpens.forall(_.endsWith("/c1/zarr.json")),
      s"schema inference must read only the root document, opened: ${metaOpens.mkString(", ")}")
  }

  test("append refreshes the consolidated shape") {
    val sp = spark; import sp.implicits._
    val url = s"file://$base/c2"
    (0 until 32).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .coalesce(1).write.format("zarr").mode("overwrite")
      .option("chunk_size", "16").save(url)
    (32 until 48).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .coalesce(1).write.format("zarr").mode("append").save(url)
    val metas = ZarrStore(s"$base/c2").readConsolidatedMetas()
    assert(metas.exists(_.forall(_.shape(0) == 48)))
    assert(spark.read.format("zarr").load(url).count() == 48)
  }

  test("stores without consolidated metadata fall back to per-array reads") {
    val store = ZarrStore(s"$base/c3")
    ZarrWriter.writeArray(store, "x", ZarrType.Int64,
      Seq(8L), Seq(4), (0 until 8).map(_.toLong: Any),
      None, ZarrWriter.CodecChain.raw)
    store.writeStoreRootMeta() // bare group doc, no consolidated field
    assert(store.readConsolidatedMetas().isEmpty)
    val df = spark.read.format("zarr").load(s"$base/c3")
    assert(df.schema.fieldNames.toSeq == Seq("x"))
    assert(df.count() == 8)
  }
}
