package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Streaming → zarr: micro-batches of arbitrary size append through the
  * chunk-aligned tail-buffer sink; replayed batches are no-ops. */
class ZarrSinkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("zarr-sink-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-sink").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def storeRows(path: String): Long =
    spark.read.format("zarr").load(path).count()

  test("uneven micro-batches append chunk-aligned with a carried tail") {
    val sp = spark
    implicit val sq = sp.sqlContext
    import sp.implicits._
    val path = s"$base/stream-store"
    val in = MemoryStream[Long]
    val q = in.toDF().selectExpr("value AS id", "value * 2.0D AS x")
      .writeStream
      .option("checkpointLocation", s"$base/ckpt")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        ZarrSink.appendBatch(df, id, path, chunkSize = 8))
      .start()

    in.addData(0L until 5L: _*); q.processAllAvailable()
    // 5 rows < chunk → all in tail, no store yet or empty store
    in.addData(5L until 15L: _*); q.processAllAvailable()
    // 15 total → 8 in store, 7 in tail
    assert(storeRows(path) == 8)
    in.addData(15L until 22L: _*); q.processAllAvailable()
    // 22 total → 16 in store, 6 in tail
    assert(storeRows(path) == 16)
    q.stop()

    ZarrSink.flush(spark, path, chunkSize = 8)
    val rows = spark.read.format("zarr").load(path).orderBy("id").collect()
    assert(rows.length == 22)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i.toLong && r.getDouble(1) == i * 2.0)
    }
  }

  test("orphaned tail tmp dir (crash between delete and rename) is adopted, not lost") {
    val sp = spark; import sp.implicits._
    val path = s"$base/heal-store"
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // batch 0: 5 rows, all tail (no full chunk)
    ZarrSink.appendBatch((0L until 5L).toDF("id"), 0L, path, chunkSize = 8)
    // simulate the crash window: tail deleted, tmp (the NEW tail) orphaned
    f.rename(new org.apache.hadoop.fs.Path(s"$path/_tail.parquet"),
      new org.apache.hadoop.fs.Path(s"$path/_tail.tmp.parquet"))
    // replayed batch 0 is guarded by the marker; batch 1 must see all 5
    // healed tail rows plus its own 6 → 8 in store, 3 in tail
    ZarrSink.appendBatch((5L until 11L).toDF("id"), 1L, path, chunkSize = 8)
    assert(storeRows(path) == 8)
    ZarrSink.flush(spark, path, chunkSize = 8)
    val got = spark.read.format("zarr").load(path).orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq == (0L until 11L))
  }

  test("a torn (empty) commit marker reads as nothing-committed, not an error") {
    val sp = spark; import sp.implicits._
    val path = s"$base/torn-marker"
    ZarrSink.appendBatch((0L until 8L).toDF("id"), 0L, path, chunkSize = 8)
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = f.create(new org.apache.hadoop.fs.Path(s"$path/_stream_commit"), true)
    out.close() // 0-byte marker, as left by a crash mid-write
    // must not throw NumberFormatException; duplication is allowed
    // (at-least-once), loss and wedging are not
    ZarrSink.appendBatch((8L until 16L).toDF("id"), 1L, path, chunkSize = 8)
    assert(storeRows(path) == 16)
  }

  test("flush is idempotent across a crash between append and cleanup") {
    val sp = spark; import sp.implicits._
    val path = s"$base/flush-crash"
    ZarrSink.appendBatch((0L until 8L).toDF("id"), 0L, path, chunkSize = 8)
    ZarrSink.appendBatch((8L until 13L).toDF("id"), 1L, path, chunkSize = 8)
    assert(storeRows(path) == 8) // 5 rows in tail
    ZarrSink.flush(spark, path, chunkSize = 8)
    assert(storeRows(path) == 13)
    // rerun: nothing to do, nothing duplicated, no alignment error
    ZarrSink.flush(spark, path, chunkSize = 8)
    assert(storeRows(path) == 13)
    // simulate the post-append crash window directly: staging dir and
    // target present, store already at target → cleanup only
    val f = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (10L until 15L).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_tail.flush.parquet")
    val out = f.create(new org.apache.hadoop.fs.Path(s"$path/_flush_target"), true)
    out.write("13".getBytes("UTF-8")); out.close()
    ZarrSink.flush(spark, path, chunkSize = 8)
    assert(storeRows(path) == 13, "already-applied staging must not re-append")
    assert(!f.exists(new org.apache.hadoop.fs.Path(s"$path/_tail.flush.parquet")))
  }

  test("full streaming loop: zarr source -> transform -> zarr sink") {
    import graft.zarr.{ZarrStore, ZarrType, ZarrWriter}
    val src = s"$base/loop-src"
    val dst = s"$base/loop-dst"
    val store = ZarrStore(src)
    store.writeStoreRootMeta()
    ZarrWriter.writeArray(store, "v", ZarrType.Float64, Seq(20), Seq(4),
      (0 until 20).map(_ * 1.0), None, ZarrWriter.CodecChain.gzip)

    val q = spark.readStream.format("zarr").load(src)
      .selectExpr("v", "v * v AS v2")
      .writeStream
      .option("checkpointLocation", s"$base/loop-ckpt")
      .foreachBatch((df: org.apache.spark.sql.DataFrame, id: Long) =>
        ZarrSink.appendBatch(df, id, dst, chunkSize = 8))
      .start()
    q.processAllAvailable(); q.stop()
    ZarrSink.flush(spark, dst, chunkSize = 8)

    val rows = spark.read.format("zarr").load(dst).orderBy("v").collect()
    assert(rows.length == 20)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == i.toDouble && r.getDouble(1) == (i * i).toDouble)
    }
  }

  test("a replayed batchId is a no-op (idempotent recovery)") {
    val sp = spark; import sp.implicits._
    val path = s"$base/replay-store"
    val b0 = (0L until 16L).toDF("id")
    ZarrSink.appendBatch(b0, 0L, path, chunkSize = 8)
    assert(storeRows(path) == 16)
    // same batchId again (Structured Streaming replays the last batch
    // after recovery) → nothing must change
    ZarrSink.appendBatch(b0, 0L, path, chunkSize = 8)
    assert(storeRows(path) == 16)
    // next batchId appends
    ZarrSink.appendBatch((16L until 24L).toDF("id"), 1L, path, chunkSize = 8)
    assert(storeRows(path) == 24)
  }
}
