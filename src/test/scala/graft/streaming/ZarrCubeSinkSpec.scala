package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming → CUBE: dense dim-0 slabs append through
  * [[ZarrCubeSink.appendBatch]] with coordinate-keyed exactly-once
  * semantics. Pins: a real writeStream growing a cube one slab per
  * trigger, replayed batches as byte-identical no-ops, crash-window
  * healing (phantom chunks beyond the committed shape overwritten on
  * re-run), the mixed-coordinate refusal, and first-batch creation
  * honoring chunk/shard layout. */
class ZarrCubeSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("zarr-cube-sink-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-cube-sink").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Dense slab for days [tFrom, tUntil): 4 sensors. */
  private def slab(tFrom: Int, tUntil: Int): DataFrame = {
    val sp = spark; import sp.implicits._
    (for (t <- tFrom until tUntil; x <- 0 until 4) yield
      (t.toLong, 100L + x, (t * 10 + x).toDouble))
      .toDF("day", "sensor", "temp").repartition(2)
  }

  private def readBack(path: String): Seq[(Long, Long, Double)] =
    spark.read.format("zarr").load(path)
      .select("day", "sensor", "temp").orderBy("day", "sensor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  private def storeBytes(path: String): Map[String, Int] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
    walk(new java.io.File(path)).map(f =>
      f.getPath -> java.util.Arrays.hashCode(Files.readAllBytes(f.toPath))).toMap
  }

  test("a real stream grows a cube one dense slab per trigger") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val path = s"$base/stream-cube"
    val in = MemoryStream[Int] // each element = one day
    val q = in.toDF()
      .select(col("value").cast("long").as("day"))
      .join(sp.range(4).select((col("id") + 100L).as("sensor")))
      .select(col("day"), col("sensor"),
        (col("day") * 10 + col("sensor") - 100L).cast("double").as("temp"))
      .writeStream
      .option("checkpointLocation", s"$base/stream-ckpt")
      .foreachBatch((df: DataFrame, id: Long) =>
        ZarrCubeSink.appendBatch(df, id, path, Seq("day", "sensor"),
          chunkShape = Some(Seq(1, 4))))
      .start()
    in.addData(0, 1); q.processAllAvailable()
    assert(readBack(path).size == 8)
    in.addData(2); q.processAllAvailable()
    in.addData(3, 4); q.processAllAvailable()
    q.stop()
    val exp = for (t <- 0L until 5L; x <- 0L until 4L)
      yield (t, 100L + x, (t * 10 + x).toDouble)
    assert(readBack(path) == exp.toSeq)
  }

  test("replayed batch is a byte-identical no-op; crash-window phantoms heal") {
    val path = s"$base/replay"
    ZarrCubeSink.appendBatch(slab(0, 2), 0L, path, Seq("day", "sensor"),
      chunkShape = Some(Seq(2, 4)))
    ZarrCubeSink.appendBatch(slab(2, 4), 1L, path, Seq("day", "sensor"))
    val committed = storeBytes(path)
    // replay of an already-committed batch (crash AFTER the root commit):
    // every coordinate is on the axis -> no-op, nothing touched
    ZarrCubeSink.appendBatch(slab(2, 4), 1L, path, Seq("day", "sensor"))
    assert(storeBytes(path) == committed, "replay must not touch the store")

    // crash BEFORE the root commit: phantom final-key chunks beyond the
    // committed shape (exactly what a killed append leaves behind)
    val phantom = new java.io.File(s"$path/temp/c/2/0")
    phantom.getParentFile.mkdirs()
    java.nio.file.Files.write(phantom.toPath, Array[Byte](1, 2, 3))
    ZarrCubeSink.appendBatch(slab(4, 6), 2L, path, Seq("day", "sensor"))
    val exp = for (t <- 0L until 6L; x <- 0L until 4L)
      yield (t, 100L + x, (t * 10 + x).toDouble)
    assert(readBack(path) == exp.toSeq, "re-run must overwrite phantom chunks")
  }

  test("mixed coordinates (neither fresh slab nor replay) refuse loudly") {
    val path = s"$base/mixed"
    ZarrCubeSink.appendBatch(slab(0, 2), 0L, path, Seq("day", "sensor"),
      chunkShape = Some(Seq(1, 4)))
    val e = intercept[Exception] {
      ZarrCubeSink.appendBatch(slab(1, 3), 1L, path, Seq("day", "sensor"))
    }
    assert(e.getMessage.contains("neither a"), e.getMessage)
    // empty batches are ignored (streams deliver them on idle triggers)
    ZarrCubeSink.appendBatch(slab(0, 0), 2L, path, Seq("day", "sensor"))
    assert(readBack(path).size == 8)
  }

  test("first batch creates the store with the given shard layout") {
    val path = s"$base/sharded"
    ZarrCubeSink.appendBatch(slab(0, 2), 0L, path, Seq("day", "sensor"),
      chunkShape = Some(Seq(1, 2)), shardShape = Some(Seq(2, 4)))
    ZarrCubeSink.appendBatch(slab(2, 4), 1L, path, Seq("day", "sensor"))
    val m = graft.zarr.ZarrStore(path).readMeta("temp")
    assert(m.chunkShape.toSeq == Seq(2, 4))
    assert(m.shardingSpec.exists(_.innerShape == Seq(1, 2)))
    val exp = for (t <- 0L until 4L; x <- 0L until 4L)
      yield (t, 100L + x, (t * 10 + x).toDouble)
    assert(readBack(path) == exp.toSeq)
  }

  test("misaligned slabs stream correctly: ragged extents between triggers") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    // chunk0 = 2 but every trigger delivers 3 days: the store's extent
    // is ragged after every odd batch and the sink (via the append's
    // edge chunk-row rewrite) keeps growing it correctly
    val path = s"$base/ragged-stream"
    val in = MemoryStream[Int]
    val q = in.toDF()
      .select(col("value").cast("long").as("day"))
      .join(sp.range(4).select((col("id") + 100L).as("sensor")))
      .select(col("day"), col("sensor"),
        (col("day") * 10 + col("sensor") - 100L).cast("double").as("temp"))
      .writeStream
      .option("checkpointLocation", s"$base/ragged-ckpt")
      .foreachBatch((df: DataFrame, id: Long) =>
        ZarrCubeSink.appendBatch(df, id, path, Seq("day", "sensor"),
          chunkShape = Some(Seq(2, 4))))
      .start()
    in.addData(0, 1, 2); q.processAllAvailable() // extent 3 (ragged)
    in.addData(3, 4, 5); q.processAllAvailable() // 6
    in.addData(6, 7, 8); q.processAllAvailable() // 9 (ragged)
    q.stop()
    val exp = for (t <- 0L until 9L; x <- 0L until 4L)
      yield (t, 100L + x, (t * 10 + x).toDouble)
    assert(readBack(path) == exp.toSeq)

    // a replay of the last (ragged-base) batch is still a no-op
    val committed = storeBytes(path)
    val replay = slab(6, 9)
    ZarrCubeSink.appendBatch(replay, 2L, path, Seq("day", "sensor"))
    assert(storeBytes(path) == committed, "ragged replay must not touch the store")
  }

  test("compactEvery bounds the sidecar across batches; replay with it stays byte-equal") {
    val path = s"$base/compact-cadence"
    // six single-day triggers, one write task per batch (chunk 1x4 over
    // a 4-sensor grid) → one stats segment per batch without the
    // cadence; compactEvery=2 merges the backlog every second batch
    def batch(d: Int): Unit =
      ZarrCubeSink.appendBatch(slab(d, d + 1), d.toLong, path,
        Seq("day", "sensor"), chunkShape = Some(Seq(1, 4)),
        compactEvery = Some(2))
    (0 until 6).foreach(batch)
    val store = graft.zarr.ZarrStore(path)
    val segs = store.listStatsSegmentsRaw()
    assert(segs == Seq((0L, 6)),
      s"six ingested segments must have compacted into one ($segs)")
    // the merged document still serves the metadata path: full coverage
    assert(store.listStatsSegments().map(_._2).sum == 6)
    // a replayed batch with the cadence enabled is STILL a no-op —
    // including its compaction pass (nothing left to merge)
    val committed = storeBytes(path)
    batch(5)
    assert(storeBytes(path) == committed,
      "replay with compactEvery must not touch the store")
    // and the data reads back exactly
    val exp = for (t <- 0L until 6L; x <- 0L until 4L)
      yield (t, 100L + x, (t * 10 + x).toDouble)
    assert(readBack(path) == exp.toSeq)
    // cadence misuse refuses loudly — both the degenerate interval and
    // the contradictory stats=false (a silent no-op cadence would read
    // as bounded fragmentation that never happens)
    val e = intercept[Exception] {
      ZarrCubeSink.appendBatch(slab(6, 7), 6L, path, Seq("day", "sensor"),
        compactEvery = Some(0))
    }
    assert(e.getMessage.contains("compact_every"), e.getMessage)
    val e2 = intercept[Exception] {
      ZarrCubeSink.appendBatch(slab(6, 7), 6L, path, Seq("day", "sensor"),
        stats = false, compactEvery = Some(2))
    }
    assert(e2.getMessage.contains("requires stats=true"), e2.getMessage)
  }

  test("cadence fires on an EMPTY trigger once a store exists; first-ever empty trigger is a no-op") {
    val path = s"$base/empty-cadence"
    // first-ever trigger empty WITH a cadence: no store yet, nothing to
    // compact — must be a silent no-op, not a failure or a store create
    ZarrCubeSink.appendBatch(slab(0, 0), 0L, path, Seq("day", "sensor"),
      chunkShape = Some(Seq(1, 4)), compactEvery = Some(1))
    assert(!new java.io.File(path).exists(), "empty first trigger must not create a store")
    // three real batches WITHOUT the cadence fragment the sidecar
    (0 until 3).foreach(d =>
      ZarrCubeSink.appendBatch(slab(d, d + 1), d.toLong, path,
        Seq("day", "sensor"), chunkShape = Some(Seq(1, 4))))
    val store = graft.zarr.ZarrStore(path)
    assert(store.listStatsSegmentsRaw().size == 3)
    // a cadence hit landing on an EMPTY trigger still compacts: quiet
    // ingest windows aligned with the cadence (every n-th trigger empty)
    // must not defer compaction indefinitely
    ZarrCubeSink.appendBatch(slab(0, 0), 3L, path, Seq("day", "sensor"),
      compactEvery = Some(2)) // (3+1) % 2 == 0 → fires
    assert(store.listStatsSegmentsRaw() == Seq((0L, 3)),
      s"empty-trigger cadence must compact the backlog (${store.listStatsSegmentsRaw()})")
    // data untouched by the empty trigger
    val exp = for (t <- 0L until 3L; x <- 0L until 4L)
      yield (t, 100L + x, (t * 10 + x).toDouble)
    assert(readBack(path) == exp.toSeq)
  }

  test("shard_shape without chunk_shape refuses on every entry point") {
    // a sink caller sharding over the DERIVED default chunking would pin
    // an arbitrary inner layout into the store permanently — the DSv2
    // 'shard_shape requires chunk_shape' contract must hold here too
    val e = intercept[Exception] {
      ZarrCubeSink.appendBatch(slab(0, 2), 0L, s"$base/shard-only",
        Seq("day", "sensor"), shardShape = Some(Seq(2, 4)))
    }
    assert(e.getMessage.contains("shard_shape requires an explicit chunk_shape"),
      e.getMessage)
  }

  test("a broken store surfaces its own fault, not a fresh-gate refusal") {
    import graft.zarr.{ZarrStore, ZarrType, ZarrWriter}
    // descending day axis: the probe must propagate the ascending-axis
    // message instead of swallowing it into the fresh-create path (whose
    // eventual "already holds arrays ... use mode(overwrite)" refusal
    // would misattribute the real fault)
    val path = s"$base/desc"
    val store = ZarrStore(path)
    store.writeStoreRootMeta()
    ZarrWriter.writeArray(store, "day", ZarrType.Int64, Seq(4), Seq(2),
      (0 until 4).map(i => (3 - i).toLong), Some(Seq("day")))
    ZarrWriter.writeArray(store, "sensor", ZarrType.Int64, Seq(4), Seq(4),
      (0 until 4).map(i => 100L + i), Some(Seq("sensor")))
    ZarrWriter.writeArray(store, "temp", ZarrType.Float64, Seq(4, 4), Seq(2, 4),
      (0 until 16).map(_.toDouble), Some(Seq("day", "sensor")))
    val e = intercept[Exception] {
      ZarrCubeSink.appendBatch(slab(4, 5), 0L, path, Seq("day", "sensor"))
    }
    assert(e.getMessage.contains("ascending"), e.getMessage)
    assert(!e.getMessage.contains("already holds arrays"), e.getMessage)

    // unreadable coordinate metadata likewise propagates as itself
    val path2 = s"$base/corrupt"
    ZarrCubeSink.appendBatch(slab(0, 2), 0L, path2, Seq("day", "sensor"),
      chunkShape = Some(Seq(1, 4)))
    val metaFile = java.nio.file.Paths.get(path2, "day", "zarr.json")
    Files.write(metaFile, "{not json".getBytes)
    val e2 = intercept[Exception] {
      ZarrCubeSink.appendBatch(slab(2, 4), 1L, path2, Seq("day", "sensor"))
    }
    assert(!e2.getMessage.contains("already holds arrays"), e2.getMessage)
  }
}
