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
    // refuse a non-empty destination: the write below uses append
    // semantics, so a re-run (orchestrator retry, ambiguous failure)
    // against an existing dst would silently append a SECOND full copy
    // of every row — compaction must be write-fresh-then-swap
    val conf0 = spark.sessionState.newHadoopConf()
    val dstRoot = new Path(dstPath)
    val dfs = dstRoot.getFileSystem(conf0)
    if (dfs.exists(dstRoot) && dfs.listStatus(dstRoot).exists(st =>
      st.isDirectory && dfs.exists(new Path(st.getPath, "zarr.json"))))
      throw new ZarrException(
        s"compact destination $dstPath already holds arrays; compaction " +
          "writes a FRESH store — delete the destination (a prior/partial " +
          "run) and re-run")
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
    val conf = spark.sessionState.newHadoopConf()
    (countChunkObjects(srcPath, conf), countChunkObjects(dstPath, conf))
  }

  /** Stored chunk objects across all columns (files under each array's
    * `c/` prefix — data only, no metadata documents or stats sidecar).
    * Takes the session's Hadoop configuration so non-default
    * filesystems (custom schemes, s3a credentials registered on the
    * session conf) resolve the same way the read/write path did. */
  def countChunkObjects(path: String, conf: Configuration): Long = {
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    def walk(dir: Path): Long =
      fs.listStatus(dir).map { st =>
        if (st.isDirectory) walk(st.getPath) else 1L
      }.sum
    // list arrays with the SAME FileSystem handle (a dir is an array
    // iff it carries a zarr.json — mirrors ZarrStore.listArrays); chunk
    // objects live under `c/` (canonical keys) and `c.part*/` dirs
    // (manifest-keyed staged commits)
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && fs.exists(new Path(st.getPath, "zarr.json")))
      .map { st =>
        val entries = fs.listStatus(st.getPath).toSeq
        val dirObjects = entries
          .filter(d => d.isDirectory &&
            (d.getPath.getName == "c" || d.getPath.getName.startsWith("c.part")))
          .map(d => walk(d.getPath)).sum
        // '.'-separated chunk_key_encoding stores chunks as FLAT files in
        // the array root ("c.0", "c.12.3") — count them too, or such a
        // store reports zero objects-before and the compaction economy
        // metric reads as a no-op
        val flatObjects = entries.count { e =>
          val nm = e.getPath.getName
          !e.isDirectory && nm.startsWith("c.") &&
            nm.drop(2).split('.').forall(s => s.nonEmpty && s.forall(_.isDigit))
        }
        dirObjects + flatObjects.toLong
      }.sum
  }

  def countChunkObjects(path: String): Long =
    countChunkObjects(path, new Configuration())
}
