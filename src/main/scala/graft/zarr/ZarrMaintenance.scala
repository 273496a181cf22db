package graft.zarr

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Store maintenance: compaction.
  *
  * A streaming ingest (ZarrSink) grows a store in micro-batch-sized
  * chunks; at object-store scale that accumulates into many small
  * objects per column — each a GET at read time, each a LIST entry.
  * `compact` rewrites the store into a fresh one with production
  * chunking and `sharding_indexed` packing (many logical chunks per
  * stored object with a binary index), which is the layout the read
  * path scans fastest (ScanBench: sharded parity with parquet after
  * the parallel intra-shard decode).
  *
  * Runs as one distributed pass: the chunked scan feeds the parallel
  * append writer; row order is preserved (the scan enumerates chunks
  * in order and write tasks commit in partition order), so the
  * compacted store is value- AND order-identical — proven in
  * ZarrMaintenanceSpec. The swap is left to the caller (write to a
  * sibling path, then rename), matching how object-store compaction
  * jobs actually deploy.
  */
object ZarrMaintenance {

  /** Rewrite `srcPath` into `dstPath` with the given chunking. Returns
    * (objects before, objects after) counted across all columns —
    * the GET/LIST economy the compaction buys. */
  def compact(
      spark: SparkSession,
      srcPath: String,
      dstPath: String,
      chunkSize: Int = 65536,
      innerChunkSize: Int = 8192): (Long, Long) = {
    val df = spark.read.format("zarr").load(srcPath)
    // the source scan partitions at the OLD chunk granularity; re-align
    // to the new chunk size so the writer's aligned fast path applies
    // (one write task per new-layout partition, order preserved)
    graft.sources.ZarrWriteSupport.alignForWrite(df, chunkSize)
      .write.format("zarr").mode("append")
      .option("chunk_size", chunkSize.toString)
      .option("inner_chunk_size", innerChunkSize.toString)
      .option("rows_per_partition", chunkSize.toString)
      .save(dstPath)
    (countChunkObjects(srcPath), countChunkObjects(dstPath))
  }

  /** Stored chunk objects across all columns (files under each array's
    * `c/` prefix — data only, no metadata documents or stats sidecar). */
  def countChunkObjects(path: String): Long = {
    val root = new Path(path)
    val fs = root.getFileSystem(new Configuration())
    def walk(dir: Path): Long =
      fs.listStatus(dir).map { st =>
        if (st.isDirectory) walk(st.getPath) else 1L
      }.sum
    ZarrStore(path).listArrays().map { name =>
      val c = new Path(root, s"$name/c")
      if (fs.exists(c)) walk(c) else 0L
    }.sum
  }
}
