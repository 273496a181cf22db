package graft.zarr

import java.nio.file.Files

import graft.tools.LatencyFileSystem
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Per-inner-chunk stats (`_stats/i<ord>.json`, analyze-written): DATA
  * column predicates mask inner chunks of sharded stores before any
  * shard byte is fetched. Pins the three staleness guards (shape
  * signature, region-overwrite retirement, object-length verification)
  * — a stale data bound would silently DROP matching rows, so each
  * guard gets an adversarial case. */
class InnerStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("inner-stats-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.graftlat.impl", classOf[LatencyFileSystem].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-innerstats").toString
  }

  override def afterAll(): Unit = {
    if (spark != null) {
      spark.sparkContext.hadoopConfiguration.unset("graft.zarr.ranged.reads")
      spark.stop()
    }
  }

  test("inner-doc encode/parse roundtrip") {
    val json = ChunkStats.encodeInner(
      Seq(32L, 32L), Seq("lat", "lon"), Seq(32, 32),
      Seq(("data", ZarrType.Float64, Seq(8, 8), 1234L,
        IndexedSeq(Some(ChunkStats.Bound(0.0, 7.5)), None,
          Some(ChunkStats.Bound(-1.0, 2.0))))))
    val doc = ChunkStats.parseInner(json, _ => Some(ZarrType.Float64)).get
    assert(doc.shape.toSeq == Seq(32L, 32L))
    assert(doc.dims.toSeq == Seq("lat", "lon"))
    assert(doc.chunk.toSeq == Seq(32, 32))
    val cs = doc.cols("data")
    assert(cs.inner.toSeq == Seq(8, 8) && cs.objectLen == 1234L)
    assert(cs.range(0).contains((0.0, 7.5)))
    assert(cs.range(1).isEmpty)
    assert(cs.range(2).contains((-1.0, 2.0)))
    assert(ChunkStats.parseInner("{not json", _ => Some(ZarrType.Float64)).isEmpty)
    assert(ChunkStats.parseInnerName("i17.json").contains(17L))
    assert(ChunkStats.parseInnerName("s0_4.json").isEmpty)
  }

  /** 32x32 store, ONE (32,32) shard of 8x8 inner chunks (16), data =
    * row-major ordinal (spatially correlated, like real measurements). */
  private def buildStore(dir: String): Unit = {
    LatencyFileSystem.reset(0)
    val st = ZarrStore(dir,
      Seq("fs.graftlat.impl" -> classOf[LatencyFileSystem].getName))
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "lat", ZarrType.Float64, Seq(32), Seq(32),
      (0 until 32).map(_.toDouble), Some(Seq("lat")), ZarrWriter.CodecChain.bloscLz4)
    ZarrWriter.writeArray(st, "lon", ZarrType.Float64, Seq(32), Seq(32),
      (0 until 32).map(_.toDouble), Some(Seq("lon")), ZarrWriter.CodecChain.bloscLz4)
    ZarrWriter.writeArray(st, "data", ZarrType.Float64, Seq(32, 32), Seq(32, 32),
      (0 until 1024).map(_.toDouble), Some(Seq("lat", "lon")),
      ZarrWriter.CodecChain.bloscLz4.sharded(Seq(8, 8)))
  }

  test("data-predicate inner masking: fewer bytes, subset emission, identical rows") {
    val dir = s"$base/datapred"
    buildStore(dir)
    val url = s"graftlat://$dir"
    val n = ZarrMaintenance.analyze(spark, url)
    assert(n == 1L)
    assert(new java.io.File(s"$dir/_stats/i0.json").exists(), "analyze wrote the inner doc")
    val hc = spark.sparkContext.hadoopConfiguration
    // data >= 768 keeps exactly the last inner-lat band: 4 of 16 inner chunks
    def run(mode: String): (Seq[String], Int, Long, Long) = {
      hc.set("graft.zarr.ranged.reads", mode)
      try {
        LatencyFileSystem.reset(0)
        val df = spark.read.format("zarr").load(url)
          .filter("data >= 768.0").select("data")
        val rows = df.collect().map(_.toString).sorted.toSeq
        val scanned = df.queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            s.metrics("numOutputRows").value
        }.head
        (rows, LatencyFileSystem.chunkGets("datapred"),
          LatencyFileSystem.chunkBytes("datapred"), scanned)
      } finally hc.unset("graft.zarr.ranged.reads")
    }
    val (wholeRows, wholeGets, wholeBytes, wholeScanned) = run("never")
    val (rangedRows, rangedGets, rangedBytes, rangedScanned) = run("always")
    assert(wholeRows == (768 until 1024).map(v => s"[$v.0]").sorted)
    assert(rangedRows == wholeRows)
    assert(wholeGets == 1 && wholeScanned == 1024L)
    // ranged: 1 index GET + 1 coalesced range (the kept band is one
    // contiguous run of inner chunks); only the kept rows are emitted
    assert(rangedGets == 2, s"ranged gets $rangedGets")
    assert(rangedScanned == 256L, s"ranged scan emitted $rangedScanned")
    assert(rangedBytes < wholeBytes / 2, s"bytes $rangedBytes vs $wholeBytes")
  }

  test("OBJECT-LENGTH guard: a foreign rewrite makes the doc stale, bounds are ignored") {
    val dir = s"$base/stale"
    buildStore(dir)
    val url = s"graftlat://$dir"
    ZarrMaintenance.analyze(spark, url)
    // rewrite the shard OUT OF BAND (no retirement ran): all zeros, so
    // the object length definitely changes while the stale doc claims
    // bounds 0..1023 per band
    val st = ZarrStore(dir,
      Seq("fs.graftlat.impl" -> classOf[LatencyFileSystem].getName))
    ZarrWriter.writeArray(st, "data", ZarrType.Float64, Seq(32, 32), Seq(32, 32),
      (0 until 1024).map(_ => 0.0), Some(Seq("lat", "lon")),
      ZarrWriter.CodecChain.bloscLz4.sharded(Seq(8, 8)))
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("graft.zarr.ranged.reads", "always")
    try {
      // stale bounds would keep only the band containing 0 and silently
      // drop 768 matching rows; the length check must reject the doc
      val rows = spark.read.format("zarr").load(url)
        .filter("data <= 0.0").select("data").collect()
      assert(rows.length == 1024, s"stale doc dropped rows: ${rows.length}")
    } finally hc.unset("graft.zarr.ranged.reads")
  }

  private def cubeSlab(dFrom: Int, dUntil: Int, vBase: Double = 0.0) = {
    val sp = spark; import sp.implicits._
    (for (d <- dFrom until dUntil; s <- 0 until 8)
      yield (d.toLong, s.toLong, vBase + d * 100.0 + s))
      .toDF("day", "source", "value").repartition(3)
  }

  test("WRITE-TIME inner docs: a fresh sharded cube write masks with no analyze pass") {
    val dir = s"$base/writetime/store"
    cubeSlab(0, 8).write.format("zarr").mode("append")
      .option("dims", "day,source").option("chunk_shape", "2,4")
      .option("shard_shape", "4,8").save(dir)
    // the write itself emitted one doc per shard (2 shards), no analyze
    assert(new java.io.File(s"$dir/_stats/i0.json").exists())
    assert(new java.io.File(s"$dir/_stats/i1.json").exists())
    val hc = spark.sparkContext.hadoopConfiguration
    def run(mode: String): Seq[String] = {
      hc.set("graft.zarr.ranged.reads", mode)
      try spark.read.format("zarr").load(dir)
        .filter("value >= 600.0").collect().map(_.toString).sorted.toSeq
      finally hc.unset("graft.zarr.ranged.reads")
    }
    val whole = run("never")
    assert(whole.length == 2 * 8) // days 6,7
    assert(run("always") == whole)
  }

  test("REGION overwrite retires the window's docs and promotes fresh ones post-swap") {
    val dir = s"$base/region/store"
    cubeSlab(0, 8).write.format("zarr").mode("append")
      .option("dims", "day,source").option("chunk_shape", "2,4")
      .option("shard_shape", "4,8").save(dir)
    ZarrMaintenance.analyze(spark, dir)
    assert(new java.io.File(s"$dir/_stats/i0.json").exists())
    assert(new java.io.File(s"$dir/_stats/i1.json").exists())
    // overwrite days 4..7 (= shard ordinal 1) with shifted values
    cubeSlab(4, 8, vBase = 50000.0).write.format("zarr").mode("overwrite")
      .option("region_dim", "day").save(dir)
    assert(new java.io.File(s"$dir/_stats/i0.json").exists(), "out-of-window doc kept")
    // the stale window doc was retired and the write's own staged doc
    // promoted after the chunk swap — its bounds describe the NEW values
    val st = ZarrStore(dir)
    val doc = ChunkStats.parseInner(
      st.readText("_stats/i1.json").getOrElse(fail("window doc missing")),
      _ => Some(ZarrType.Float64)).getOrElse(fail("window doc unparseable"))
    val vals = doc.cols("value")
    assert((0 until vals.mins.length).forall(gi =>
      vals.range(gi).forall { case (lo, _) =>
        lo.asInstanceOf[Double] >= 50000.0 }),
      "refreshed doc must describe the overwritten values")
    val hc = spark.sparkContext.hadoopConfiguration
    def run(mode: String): Seq[String] = {
      hc.set("graft.zarr.ranged.reads", mode)
      try spark.read.format("zarr").load(dir)
        .filter("value >= 50000.0").collect().map(_.toString).sorted.toSeq
      finally hc.unset("graft.zarr.ranged.reads")
    }
    val whole = run("never")
    assert(whole.length == 32) // the 4 overwritten days x 8 sources
    assert(run("always") == whole)
    // no staging leftovers in the sidecar dir
    assert(!new java.io.File(s"$dir/_stats").listFiles()
      .exists(_.getName.startsWith("c.part")), "staged docs must be promoted away")
  }

  test("APPEND changes the shape signature: old docs are ignored and vacuumed") {
    val dir = s"$base/append/store"
    cubeSlab(0, 8).write.format("zarr").mode("append")
      .option("dims", "day,source").option("chunk_shape", "2,4")
      .option("shard_shape", "4,8").save(dir)
    ZarrMaintenance.analyze(spark, dir)
    cubeSlab(8, 12).write.format("zarr").mode("append")
      .option("append_dim", "day").save(dir)
    val hc = spark.sparkContext.hadoopConfiguration
    def run(mode: String): Seq[String] = {
      hc.set("graft.zarr.ranged.reads", mode)
      try spark.read.format("zarr").load(dir)
        .filter("value >= 800.0").collect().map(_.toString).sorted.toSeq
      finally hc.unset("graft.zarr.ranged.reads")
    }
    val whole = run("never")
    assert(whole.length == 4 * 8) // days 8..11
    assert(run("always") == whole)
    // the append's own slab doc (ordinal 2, new shape) is fresh and live
    assert(new java.io.File(s"$dir/_stats/i2.json").exists())
    // vacuum reclaims the shape-mismatched docs as phantoms, keeps i2
    val rows = ZarrMaintenance.vacuum(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rows("_stats") >= 2L, s"expected the stale inner docs reclaimed: $rows")
    assert(!new java.io.File(s"$dir/_stats/i0.json").exists())
    assert(new java.io.File(s"$dir/_stats/i2.json").exists())
  }
}
