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
