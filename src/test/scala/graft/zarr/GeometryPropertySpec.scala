package graft.zarr

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-style roundtrips over random geometries (SURVEY §5: ∀ shape,
  * chunk: union of all emitted batches == row-major flatten of the
  * array). Exercises edge-chunk truncation, partition splits and
  * batch coalescing across dimension counts and codecs. */
class GeometryPropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _
  private val rnd = new scala.util.Random(20260812L)

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("geometry-prop-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-prop").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val chains = Seq(
    ZarrWriter.CodecChain.raw, ZarrWriter.CodecChain.gzip,
    ZarrWriter.CodecChain.zstd, ZarrWriter.CodecChain.bloscLz4,
    ZarrWriter.CodecChain.crc32c)

  test("random 1-3D geometries: scan == row-major flatten (30 cases)") {
    (0 until 30).foreach { case_i =>
      val ndim = 1 + rnd.nextInt(3)
      val shape = Array.fill(ndim)(1L + rnd.nextInt(17))
      val chunk = shape.map(s => 1 + rnd.nextInt(s.toInt))
      val n = shape.product.toInt
      val vals = (0 until n).map(_.toDouble + case_i * 10000)
      val dir = s"$base/case$case_i"
      val store = ZarrStore(dir)
      store.writeStoreRootMeta()
      ZarrWriter.writeArray(store, "v", ZarrType.Float64,
        shape.toSeq, chunk.toSeq, vals, None, chains(case_i % chains.length))

      val parts = 1 + rnd.nextInt(6)
      val got = spark.read.format("zarr").option("partitions", parts.toString)
        .load(dir).collect().map(_.getDouble(0)).sorted
      assert(got.length == n,
        s"case $case_i shape=${shape.mkString("x")} chunk=${chunk.mkString("x")} parts=$parts")
      assert(got.toSeq == vals.sorted,
        s"case $case_i values mismatch (shape=${shape.mkString("x")} chunk=${chunk.mkString("x")})")
    }
  }

  test("random 2D grid with coordinates: broadcast tuples correct (10 cases)") {
    (0 until 10).foreach { case_i =>
      val rows = 2 + rnd.nextInt(12)
      val cols = 2 + rnd.nextInt(12)
      val cr = 1 + rnd.nextInt(rows)
      val cc = 1 + rnd.nextInt(cols)
      val dir = s"$base/coord$case_i"
      val store = ZarrStore(dir)
      store.writeStoreRootMeta()
      ZarrWriter.writeArray(store, "r", ZarrType.Float64, Seq(rows), Seq(cr),
        (0 until rows).map(_ * 1.0), Some(Seq("r")), ZarrWriter.CodecChain.gzip)
      ZarrWriter.writeArray(store, "c", ZarrType.Float64, Seq(cols), Seq(cc),
        (0 until cols).map(_ * 1.0), Some(Seq("c")), ZarrWriter.CodecChain.gzip)
      ZarrWriter.writeArray(store, "v", ZarrType.Float64,
        Seq(rows, cols), Seq(cr, cc),
        (0 until rows * cols).map(_.toDouble), Some(Seq("r", "c")),
        ZarrWriter.CodecChain.gzip)
      val got = spark.read.format("zarr").load(dir)
        .select("r", "c", "v").collect()
        .map(x => (x.getDouble(0), x.getDouble(1), x.getDouble(2)))
      assert(got.length == rows * cols, s"case $case_i $rows x $cols (chunk $cr x $cc)")
      got.foreach { case (r, c, v) =>
        assert(r == (v.toInt / cols) && c == (v.toInt % cols),
          s"case $case_i: bad coord tuple ($r,$c) for v=$v with $rows x $cols chunk $cr x $cc")
      }
    }
  }

  test("filter pushdown on uint64 (decimal) column is correct") {
    val dir = s"$base/u64"
    val store = ZarrStore(dir)
    store.writeStoreRootMeta()
    ZarrWriter.writeArray(store, "u", ZarrType.UInt64, Seq(20), Seq(6),
      (0 until 20).map(i => -1L - i), None, ZarrWriter.CodecChain.raw) // huge unsigned
    val got = spark.read.format("zarr").load(dir)
      .filter(org.apache.spark.sql.functions.col("u") ===
        new java.math.BigDecimal("18446744073709551615"))
      .collect()
    assert(got.length == 1) // only -1L == 2^64-1
  }
}
