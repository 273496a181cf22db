package graft.sources

import graft.zarr._
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.Filter

/** Streaming read of a Zarr store that GROWS along its first dimension
  * (the common append pattern for time-series arrays: shape[0] advances,
  * chunk grid otherwise fixed).
  *
  * The reference is strictly bounded (`Boundedness::Bounded`,
  * `scanner.rs:54`); this extends the same scan machinery to Structured
  * Streaming: an offset is the number of *complete target chunks*
  * currently present per live `zarr.json` metadata, and each micro-batch
  * is a contiguous range of chunk ordinals — chunk ordinals are stable
  * under dim-0 growth because the row-major grid suffix (dims 1..n) is
  * fixed.
  *
  * Admission control: `option("max_chunks_per_trigger", n)` caps each
  * micro-batch at n chunk ordinals (the unit is CHUNKS, not rows — one
  * chunk decodes to `product(chunk_shape)` rows). Without it, a stream
  * starting against an existing large store — or catching up after
  * downtime — would take the ENTIRE backlog as one micro-batch: one
  * giant checkpoint interval, no progress visibility, and executor
  * memory sized by backlog instead of by trigger. Same contract as the
  * Kafka/file sources' maxOffsetsPerTrigger/maxFilesPerTrigger.
  *
  *   spark.readStream.format("zarr").load(path)
  */
final case class ZarrOffset(chunks: Long) extends Offset {
  override def json(): String = chunks.toString
}

class ZarrMicroBatchStream(
    store: ZarrStore,
    arrayNames: Seq[String],
    outputNames: Seq[String],
    pushed: Seq[Filter],
    checkpointLocation: String,
    maxChunksPerTrigger: Long = -1L)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def currentGeometry(): (ScanGeometry, Seq[(String, String)]) = {
    val metas = arrayNames.map(store.readMeta)
    (ScanGeometry.resolve(metas), metas.map(m => m.name -> m.sourceJson))
  }

  @volatile private var planned: Seq[(String, String)] = Seq.empty

  override def initialOffset(): Offset = ZarrOffset(0L)

  private def availableOffset(): ZarrOffset = {
    val (g, _) = currentGeometry()
    // only COMPLETE dim-0 chunk slabs are committed: a partial trailing
    // chunk must not advance the offset, or rows later appended into that
    // same chunk ordinal would be permanently skipped (its ordinal would
    // already be below the committed watermark)
    val completeDim0 = g.targetShape(0) / g.targetChunk(0) // floor
    val fixedGrid = (1 until g.ndim).map(d => g.gridShape(d).toLong).product
    ZarrOffset(completeDim0 * fixedGrid)
  }

  override def latestOffset(): Offset = availableOffset()

  override def getDefaultReadLimit: ReadLimit =
    if (maxChunksPerTrigger > 0) ReadLimit.maxRows(maxChunksPerTrigger)
    else ReadLimit.allAvailable()

  /** Trigger.AvailableNow contract: the run drains up to the head seen
    * HERE (in capped batches), then stops — appends racing the run are
    * left for the next one. */
  @volatile private var availableNowSnapshot: Option[Long] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowSnapshot = Some(availableOffset().chunks)

  /** Engine entry point when admission control is active: cap this
    * batch's end offset at start + the configured chunk budget. */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val avail = availableNowSnapshot.getOrElse(availableOffset().chunks)
    val lo = start.asInstanceOf[ZarrOffset].chunks
    limit match {
      case r: ReadMaxRows => ZarrOffset(math.min(avail, lo + r.maxRows()))
      case _ => ZarrOffset(avail)
    }
  }

  /** True head of the stream regardless of the cap — feeds the progress
    * reporter's backlog/lag metrics. */
  override def reportLatestOffset(): Offset = availableOffset()

  override def deserializeOffset(json: String): Offset = ZarrOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[ZarrOffset].chunks
    val hi = end.asInstanceOf[ZarrOffset].chunks
    val (_, metaJsons) = currentGeometry()
    planned = metaJsons
    if (hi <= lo) Array.empty
    else {
      // one partition per up-to-64-chunk range within the new window
      val n = math.max(1, math.min(hi - lo, 32L)).toInt
      val per = math.max(1L, (hi - lo + n - 1) / n)
      (0 until n).iterator
        .map(i => (lo + i * per, math.min(hi, lo + (i + 1) * per)))
        .filter { case (a, b) => b > a }
        .map { case (a, b) => ZarrInputPartition(a, b): InputPartition }
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    ZarrReaderFactory(store, planned, outputNames, pushed,
      statsSegmentIndex =
        if (pushed.isEmpty) Nil
        else try store.listStatsSegments() catch { case _: Throwable => Nil },
      manifestParts = graft.zarr.ChunkManifest.requiredParts(store, planned.map(_._2)))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
