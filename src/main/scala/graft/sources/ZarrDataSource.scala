package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import graft.zarr._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Spark DataSource V2 connector for Zarr v3 stores: the idiomatic-Spark
  * re-expression of the reference's DataFusion `TableProvider`
  * (`/root/reference/crates/arrow-zarr/src/table/table_provider.rs`).
  *
  *   spark.read.format("zarr").load("/path/to/store")
  *   CREATE TABLE z USING zarr LOCATION '/path/to/store'
  *
  * Cardinality caveat (inherent to the coordinate model, shared with the
  * reference): the projected column set determines the flattened grid —
  * `SELECT lat` yields the 1-D coordinate (8 rows on the canonical
  * fixture) while `SELECT lat, lon` yields the 64-row cross product, so
  * aggressive column pruning (e.g. `count()` over a join) can legally
  * reduce cardinality.
  *
  * Scale design: one input partition per contiguous range of chunks
  * (reference `zarr_data_stream.rs:805-817`); Spark schedules them as
  * tasks across executors, so a 100 TB store with millions of chunks
  * fans out horizontally. Projection pushdown means unselected arrays
  * are never opened; filter pushdown is *inexact* (chunk-granularity
  * skip, `table_provider.rs:91-96`) with Spark's residual `Filter`
  * giving exact rows.
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "zarr"
  override def supportsExternalMetadata(): Boolean = true

  private def storeFor(options: CaseInsensitiveStringMap): ZarrStore = {
    val path = Option(options.get("path")).getOrElse(
      throw new ZarrException("zarr source requires a path"))
    // carry fs.* credentials/endpoints (e.g. s3a) from the driver conf to
    // executor-side FileSystem resolution
    val hadoopPairs = SparkSession.active.sparkContext.hadoopConfiguration
      .iterator().asScala
      .map(e => e.getKey -> e.getValue)
      .filter(_._1.startsWith("fs."))
      .toSeq
    ZarrStore(path, hadoopPairs)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val store = storeFor(options)
    ZarrDataSource.schemaOf(ZarrDataSource.metasOf(store))
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val store = storeFor(options)
    // a missing/empty store with a caller-supplied schema is a WRITE
    // target (df.write.format("zarr").save(path))
    val metas =
      try ZarrDataSource.metasOf(store)
      catch {
        case _: ZarrException if schema != null && schema.nonEmpty => Seq.empty[ZarrArrayMeta]
      }
    if (metas.isEmpty) return new ZarrTable(store, schema, Seq.empty)
    val inferred = ZarrDataSource.schemaOf(metas)
    // a user-supplied schema is a column selection + type assertion for
    // READS (reference `table_provider.rs:147-163`) — but the same entry
    // point also serves schema-changing OVERWRITE writes, so a mismatch
    // is only an error if the table is then scanned (validated lazily in
    // newScanBuilder)
    if (schema == null || schema.isEmpty || schema == inferred)
      return new ZarrTable(store, inferred, metas)
    val byName = inferred.fields.map(f => f.name -> f).toMap
    val mismatch: Option[String] = schema.fields.iterator.flatMap { f =>
      byName.get(f.name) match {
        case None => Some(s"Column ${f.name} not found in zarr store")
        case Some(inf) if inf.dataType != f.dataType =>
          Some(s"Column ${f.name}: requested type ${f.dataType.sql} does not match " +
            s"stored type ${inf.dataType.sql}")
        case _ => None
      }
    }.take(1).toSeq.headOption
    mismatch match {
      case Some(err) => new ZarrTable(store, schema, metas, Some(err))
      case None =>
        val effective = StructType(schema.fields.map(f => byName(f.name)))
        val selected = effective.fields.map(_.name).toSet
        new ZarrTable(store, effective, metas.filter(m => selected(m.name)))
    }
  }
}

object ZarrDataSource {
  def schemaOf(metas: Seq[ZarrArrayMeta]): StructType =
    StructType(metas.map(m => StructField(m.name, m.dataType.sparkType, nullable = true)))

  /** All array metadata of a store: ONE root-document read on
    * consolidated stores (ZarrWrite output), falling back to the
    * reference's list-then-GET-per-array shape (`config.rs:201-258`)
    * everywhere else. */
  def metasOf(store: ZarrStore): Seq[ZarrArrayMeta] =
    store.readConsolidatedMetas()
      .getOrElse(store.listArrays().map(store.readMeta))
}

class ZarrTable(
    store: ZarrStore, tableSchema: StructType, metas: Seq[ZarrArrayMeta],
    schemaError: Option[String] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"zarr:${store.root}"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    schemaError.foreach(e => throw new ZarrException(e))
    new ZarrScanBuilder(store, tableSchema, metas, options)
  }
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new ZarrWriteBuilder(store, info)
}

class ZarrScanBuilder(
    store: ZarrStore,
    tableSchema: StructType,
    metas: Seq[ZarrArrayMeta],
    options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters
    with SupportsPushDownLimit {

  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  /** LIMIT pushdown (the reference accepts and ignores limit,
    * `table_provider.rs:103` — here a pushed limit stops each partition
    * after `limit` rows, and partition planning shrinks to the chunks
    * that can possibly be needed). Partial: Spark keeps its own global
    * limit above the scan. */
  override def pushLimit(l: Int): Boolean = {
    // only safe without filters: a chunk-skipping scan cannot know how
    // many chunks satisfy the predicate
    if (pushed.isEmpty) { limit = l; true } else false
  }

  override def isPartiallyPushed: Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** All filters are residual (kept by Spark for exact evaluation); the
    * supported subset is additionally used reader-side for chunk skipping
    * — the reference's Inexact pushdown contract. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val names = metas.map(_.name).toSet
    pushed = filters.filter(f =>
      ChunkFilter.supported(f) && ChunkFilter.references(f).forall(names))
    filters // Spark must re-evaluate everything exactly
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new ZarrScan(store, metas, required, pushed, options, limit)
}

class ZarrScan(
    store: ZarrStore,
    metas: Seq[ZarrArrayMeta],
    required: StructType,
    pushed: Array[Filter],
    options: CaseInsensitiveStringMap,
    limit: Int = -1)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsRuntimeFiltering {

  private val byName = metas.map(m => m.name -> m).toMap

  /** Arrays the reader must open: projected ones first (output order),
    * then any predicate-only columns (reference's filter/projection
    * column sharing, `zarr_data_stream.rs:943-963`). */
  private val readNames: Seq[String] = {
    val proj = required.fields.map(_.name).toSeq
    val predOnly = pushed.flatMap(ChunkFilter.references).distinct
      .filterNot(proj.contains).filter(byName.contains)
    val all = proj ++ predOnly
    if (all.nonEmpty) all else metas.map(_.name) // count(*): grid from full table
  }

  private[sources] lazy val geometry: ScanGeometry =
    ScanGeometry.resolve(readNames.map(byName))

  override def readSchema(): StructType = required

  override def toBatch: Batch = this

  override def toMicroBatchStream(
      checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ZarrMicroBatchStream(
      store, readNames, required.fields.map(_.name).toSeq, pushed.toSeq,
      checkpointLocation)

  override def description(): String =
    s"ZarrScan ${store.root} cols=[${readNames.mkString(",")}] " +
      s"pushed=[${pushed.mkString(",")}]" +
      (if (limit >= 0) s" limit=$limit" else "")

  override def planInputPartitions(): Array[InputPartition] = {
    // a pushed limit bounds how many chunks can possibly contribute rows
    val total =
      if (limit < 0) geometry.numChunks
      else {
        val rowsPerChunk = math.max(1L, geometry.targetChunk.map(_.toLong).product)
        math.min(geometry.numChunks, (limit + rowsPerChunk - 1) / rowsPerChunk)
      }
    val requested = Option(options.get("partitions")).map(_.toInt)
    val default =
      try math.max(2 * SparkSession.active.sparkContext.defaultParallelism, 1)
      catch { case _: Throwable => 32 }
    val n = math.max(1, math.min(total, requested.getOrElse(default).toLong).toInt)
    geometry.partitionRanges(n)
      .map { case (lo, hi) => ZarrInputPartition(lo, hi): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val metaJsons = readNames.map(n => n -> byName(n).sourceJson)
    ZarrReaderFactory(store, metaJsons, required.fields.map(_.name).toSeq,
      (pushed ++ runtimeFilters).toSeq, limit)
  }

  /** Runtime (join-derived) filters — e.g. a broadcast join's IN-set on
    * a coordinate — feed the same chunk-skip machinery as static pushed
    * filters: dynamic pruning for array stores. */
  private var runtimeFilters: Array[Filter] = Array.empty

  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    required.fields.map(f =>
      org.apache.spark.sql.connector.expressions.Expressions.column(f.name))

  override def filter(filters: Array[Filter]): Unit = {
    val names = metas.map(_.name).toSet
    runtimeFilters = filters.filter(f =>
      ChunkFilter.supported(f) && ChunkFilter.references(f).forall(names))
  }

  /** Exact row count from array shapes — strictly better than the
    * reference's empty statistics (`opener.rs:171-173`). */
  override def estimateStatistics(): Statistics = new Statistics {
    override def numRows(): OptionalLong = OptionalLong.of(geometry.numRows)
    override def sizeInBytes(): OptionalLong = {
      val perRow = required.fields.map(_.dataType.defaultSize.toLong).sum
      OptionalLong.of(geometry.numRows * math.max(perRow, 1L))
    }
  }
}

final case class ZarrInputPartition(lo: Long, hi: Long) extends InputPartition
