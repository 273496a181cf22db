package graft.streaming

import graft.sources.ZarrWriteSupport
import graft.zarr.ZarrException
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Streaming zarr sink: `df.writeStream.foreachBatch(ZarrSink.appendBatch(
  * _, _, path, chunkSize)).start()`.
  *
  * Zarr append requires the existing store to be chunk-aligned (a partial
  * last chunk would need read-modify-write on every micro-batch), but
  * micro-batches have arbitrary sizes. The sink keeps the invariant by
  * carrying the sub-chunk REMAINDER in a `_tail.parquet` directory inside
  * the store root (readers ignore it — array discovery requires a nested
  * `zarr.json`): each batch prepends the tail, appends the largest
  * chunk-aligned prefix to the zarr arrays via the DSv2 fast path, and
  * rewrites the tail with what is left. Store freshness therefore lags by
  * < chunk_size rows until the next batch (or a final [[flush]]).
  *
  * Delivery: idempotent on micro-batch REPLAY (a `_stream_commit` marker
  * records the last applied batchId; Structured Streaming replays the
  * last batch on recovery and the sink skips it). A crash BETWEEN the
  * zarr append and the marker write can duplicate that batch's rows —
  * at-least-once, the standard contract for foreachBatch sinks without a
  * transactional target.
  *
  * Scale: the only driver-side work is the tail/marker bookkeeping
  * (< chunk_size rows); the aligned prefix flows through the same
  * executor-parallel DSv2 write path as batch writes.
  */
object ZarrSink {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def lastCommitted(spark: SparkSession, path: String): Long = {
    val p = new Path(s"$path/_stream_commit")
    val f = fs(spark, path)
    if (!f.exists(p)) -1L
    else {
      val in = f.open(p)
      try new String(in.readAllBytes()).trim.toLong finally in.close()
    }
  }

  private def writeCommit(spark: SparkSession, path: String, batchId: Long): Unit = {
    val f = fs(spark, path)
    val out = f.create(new Path(s"$path/_stream_commit"), true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
  }

  /** foreachBatch body. Appends `batch` to the zarr store at `path`,
    * carrying any sub-chunk remainder to the next batch. */
  def appendBatch(batch: DataFrame, batchId: Long, path: String, chunkSize: Int): Unit = {
    require(chunkSize > 0, "chunkSize must be positive")
    val spark = batch.sparkSession
    if (batchId >= 0 && batchId <= lastCommitted(spark, path)) return // replay → no-op

    val tailPath = s"$path/_tail.parquet"
    val f = fs(spark, path)
    val haveTail = f.exists(new Path(tailPath))
    // tail rows FIRST so arrival order is preserved across batches
    val all = if (haveTail) spark.read.parquet(tailPath).unionByName(batch) else batch

    val schema = all.schema
    val rows = all.rdd.zipWithIndex().map(_.swap).cache()
    try {
      val total = rows.count()
      val nFull = total / chunkSize * chunkSize
      if (nFull > 0) {
        val main = spark.createDataFrame(
          rows.filter(_._1 < nFull).sortBy(_._1).map(_._2), schema)
        ZarrWriteSupport.alignForWrite(main, chunkSize)
          .write.format("zarr").mode("append")
          .option("chunk_size", chunkSize.toString)
          .option("rows_per_partition", chunkSize.toString)
          .save(path)
      }
      val rest: Array[Row] = rows.filter(_._1 >= nFull).sortBy(_._1).map(_._2).collect()
      // rewrite the tail via a temp dir + rename so a crash mid-write
      // cannot leave a half-written tail AND an advanced marker
      val tmp = s"$path/_tail.tmp.parquet"
      spark.createDataFrame(spark.sparkContext.parallelize(rest.toSeq, 1), schema)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      f.delete(new Path(tailPath), true)
      if (!f.rename(new Path(tmp), new Path(tailPath)))
        throw new ZarrException(s"tail rename failed for $path")
      if (batchId >= 0) writeCommit(spark, path, batchId)
    } finally rows.unpersist()
  }

  /** Flush the carried tail into the store as a final (possibly partial)
    * logical chunk set — call after the stream stops to make every row
    * visible. The store stays chunk-aligned only if the tail happens to
    * be; this uses the staged (non-fast-path) append which allows a
    * short LAST partition. */
  def flush(spark: SparkSession, path: String, chunkSize: Int): Unit = {
    val tailPath = s"$path/_tail.parquet"
    val f = fs(spark, path)
    if (!f.exists(new Path(tailPath))) return
    val tail = spark.read.parquet(tailPath)
    if (tail.count() > 0)
      tail.coalesce(1).write.format("zarr").mode("append")
        .option("chunk_size", chunkSize.toString)
        .save(path)
    f.delete(new Path(tailPath), true)
  }
}
