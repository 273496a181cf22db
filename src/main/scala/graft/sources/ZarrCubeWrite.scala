package graft.sources

import graft.zarr._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** N-D cube write: a relational DataFrame whose rows are the dense cross
  * product of `dims` coordinate columns becomes a Zarr store with one 1-D
  * coordinate array per dim and one N-D data array per remaining column —
  * the WRITE half of the reference's flagship lat/lon shape
  * (`/root/reference/crates/arrow-zarr/src/table/table_provider.rs:417-423`
  * reads such stores; its fixture writer `lib.rs:170-240` builds the 2-D
  * arrays by hand). Surfaced as
  * `df.write.format("zarr").option("dims", "time,lat,lon").save(path)`.
  *
  * Layout contract (loudly enforced, never guessed):
  *  - every dim column's DISTINCT values become the sorted coordinate
  *    axis; rows must cover the full cross product exactly once —
  *    duplicates and missing cells are refused with counts, because a
  *    silently fill-padded hole would read back as a fabricated value;
  *  - coordinate values must be non-NULL and (for floats) finite: the
  *    chunk-skip machinery and xarray-style alignment both rely on a
  *    totally ordered axis;
  *  - 1 to 3 dims (the scan geometry's supported range, mirroring the
  *    reference's `Only 1-3 dimensional arrays` rule).
  *
  * Scale design — why this is NOT the 1-D staged-commit path: a cube
  * row's target chunk ordinal is a PURE FUNCTION of its coordinates, so
  * every task knows the final key of every chunk it assembles and writes
  * it directly — no staging, no manifest, no commit-time renames. The
  * pipeline is: (a) axis-sized jobs (per-dim distinct — map-side combined
  * — and one groupBy-count density proof whose shuffle is bounded by the
  * cell count, not the row count); (b) per-dim BROADCAST joins attach
  * grid indices (axis-sized build sides; Spark's float normalization
  * defines value equality consistently with the distinct() that built
  * the axes); (c) ONE row shuffle clustered by contiguous chunk-ordinal
  * blocks, sorted within partitions by (ordinal, offset) so each task
  * assembles one chunk at a time (memory = one chunk per data column);
  * (d) tasks write chunks at final keys plus grid-signed `_stats`
  * segments (the same sidecar `analyze` builds, so chunk-skip,
  * metadata-only aggregates, hybrid pushdown and CBO stats work
  * immediately); (e) the driver writes the axis arrays (axis-sized) and
  * commits by writing per-array metadata then the consolidated root
  * LAST — the single-PUT commit point the read path expects.
  */
object ZarrCubeWrite {

  /** Parse the `dims` write option: comma-separated column names. */
  def parseDims(s: String): Seq[String] = {
    val dims = s.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    if (dims.isEmpty)
      throw new ZarrException(s"dims option is empty: '$s'")
    if (dims.distinct.length != dims.length)
      throw new ZarrException(s"dims option repeats a column: '$s'")
    dims
  }

  /** Default chunk shape: halve the largest extent until the chunk holds
    * at most 2^18 elements (a few MB per chunk across codecs) — the
    * deterministic shape a caller gets without a `chunk_shape` option. */
  def defaultChunkShape(shape: Seq[Long]): Seq[Int] = {
    val c = shape.map(s => math.min(s, Int.MaxValue.toLong).toInt).toArray
    while (c.map(_.toLong).product > (1L << 18)) {
      val i = c.indexOf(c.max)
      c(i) = (c(i) + 1) / 2
    }
    c.toSeq
  }

  // scalastyle:off method.length
  def write(
      df: DataFrame,
      path: String,
      dims: Seq[String],
      chunkShapeOpt: Option[Seq[Int]],
      codec: String,
      stats: Boolean,
      truncate: Boolean,
      maxAxisLen: Int = 1 << 22,
      rowsPerTask: Long = 1L << 22): Unit = {
    val spark = df.sparkSession
    if (maxAxisLen > (1 << 30))
      throw new ZarrException(
        s"max_axis_len $maxAxisLen exceeds 2^30 (grid-index arithmetic bound)")
    import scala.jdk.CollectionConverters._
    val hadoopPairs = spark.sparkContext.hadoopConfiguration
      .iterator().asScala.map(e => e.getKey -> e.getValue)
      .filter(_._1.startsWith("fs.")).toSeq
    val store = ZarrStore(path, hadoopPairs)

    // ---- schema validation, all driver-side and before any IO ----
    if (dims.length > 3)
      throw new ZarrException(
        s"cube write supports 1-3 dims (scan geometry limit), got ${dims.length}")
    val fieldByName = df.schema.fields.map(f => f.name -> f).toMap
    dims.foreach(d => if (!fieldByName.contains(d))
      throw new ZarrException(
        s"dims column '$d' not in DataFrame columns ${df.columns.mkString(",")}"))
    val dataCols = df.schema.fields.filterNot(f => dims.contains(f.name)).toSeq
    if (dataCols.isEmpty)
      throw new ZarrException(
        "cube write needs at least one non-dim data column")
    if (df.columns.exists(_.startsWith("__zarr_")))
      throw new ZarrException(
        "column names starting with __zarr_ collide with cube-write internals")
    val dimZts = dims.map(d => ZarrWriteSupport.zarrTypeFor(fieldByName(d).dataType))
    val dataZts = dataCols.map(f => ZarrWriteSupport.zarrTypeFor(f.dataType))
    val chain = ZarrWriteSupport.chainFor(codec)

    // fresh-store-only: a cube's shape is a global property of one
    // dataset; "appending" would need coordinate re-alignment — refuse
    // rather than guess (the 1-D tabular path owns append). The gate
    // also decides the FAILURE-CLEANUP scope: we may only delete the
    // root wholesale if this write created it (or the caller asked for
    // overwrite) — a mistyped path pointing at a user's existing
    // directory must never be wiped by a validation refusal.
    val inventory = store.rootInventory()
    if (truncate) store.delete()
    else inventory.foreach { entries =>
      val arrays = entries.collect { case (n, true) => n }.sorted
      if (arrays.nonEmpty)
        throw new ZarrException(
          s"cube write targets a FRESH store but $path already holds arrays " +
            s"(${arrays.mkString(",")}); use mode('overwrite') to replace it")
      // an EMPTY zarr store root (a bare root doc / stats sidecar, no
      // arrays) is a legitimate fresh target; anything else present is
      // unrelated user data this write must not touch — refuse before
      // any IO so the failure cleanup can never reach it
      val foreign = entries.collect { case (n, false)
        if n != "zarr.json" && n != graft.zarr.ChunkStats.dirName => n }.sorted
      if (foreign.nonEmpty)
        throw new ZarrException(
          s"cube write target $path is an existing directory holding non-zarr " +
            s"entries (${foreign.take(5).mkString(",")}); refusing to write " +
            "into — and potentially clean up over — unrelated files; point at " +
            "a fresh path or use mode('overwrite') on a zarr store")
    }
    // cleanup scope decided ABOVE any store IO: wholesale root delete only
    // when we created or (on explicit overwrite) truncated it; a
    // pre-existing empty dir / bare store root keeps its directory entry —
    // only the contents (this write's partial output) are removed
    val ownRoot = truncate || inventory.isEmpty

    try {
      // ---- coordinate axes: global sorted distincts (axis-sized) ----
      val axes: Seq[Array[Any]] = dims.map { d =>
        val rows = df.select(col(d)).distinct().orderBy(col(d))
          .limit(maxAxisLen + 1).collect()
        if (rows.length > maxAxisLen)
          throw new ZarrException(
            s"coordinate axis '$d' exceeds $maxAxisLen distinct values; " +
              "raise max_axis_len if the driver can hold the axis")
        if (rows.exists(_.isNullAt(0)))
          throw new ZarrException(
            s"coordinate column '$d' contains NULL; zarr coordinates are total orders")
        val vals = rows.map(_.get(0))
        vals.foreach {
          case f: Float if !java.lang.Float.isFinite(f) =>
            throw new ZarrException(s"coordinate column '$d' contains non-finite $f")
          case x: Double if !java.lang.Double.isFinite(x) =>
            throw new ZarrException(s"coordinate column '$d' contains non-finite $x")
          case _ => ()
        }
        vals
      }
      val shape: Seq[Long] = axes.map(_.length.toLong)
      val totalCells: Long = shape.foldLeft(1L)((a, b) =>
        try Math.multiplyExact(a, b)
        catch { case _: ArithmeticException =>
          throw new ZarrException(s"cube volume overflows Long: axes ${shape.mkString("x")}")
        })
      if (totalCells == 0L)
        throw new ZarrException("cube write: input DataFrame is empty")

      // ---- density proof: every cell exactly once ----
      // one aggregate job; the shuffle after map-side partial aggregation
      // is bounded by the CELL count, and the final reduction is 3 numbers
      val proof = df.groupBy(dims.map(col): _*).agg(count(lit(1)).as("__zarr_c"))
        .agg(sum(col("__zarr_c")), max(col("__zarr_c"))).collect()(0)
      val nRows = proof.getLong(0)
      val maxMult = proof.getLong(1)
      if (maxMult > 1L)
        throw new ZarrException(
          s"cube write: duplicate coordinate tuples (a (${dims.mkString(",")}) " +
            s"combination appears $maxMult times); deduplicate or aggregate first")
      if (nRows != totalCells)
        throw new ZarrException(
          s"cube write: grid is not dense — ${shape.mkString("x")} = $totalCells " +
            s"cells but $nRows rows (${totalCells - nRows} missing); densify " +
            "(cross join the axes and fill) before writing")

      val chunkShape: Seq[Int] = chunkShapeOpt match {
        case Some(cs) =>
          if (cs.length != dims.length)
            throw new ZarrException(
              s"chunk_shape has ${cs.length} entries for ${dims.length} dims")
          if (cs.exists(_ < 1))
            throw new ZarrException(s"chunk_shape entries must be >= 1: ${cs.mkString(",")}")
          cs
        case None => defaultChunkShape(shape)
      }
      val grid: Seq[Int] = shape.zip(chunkShape)
        .map { case (s, c) => ((s + c - 1) / c).toInt }
      val numChunks: Long = grid.foldLeft(1L)(_ * _.toLong)
      val chunkElems: Long = chunkShape.foldLeft(1L)(_ * _.toLong)
      if (chunkElems > Int.MaxValue / 2)
        throw new ZarrException(s"chunk_shape too large: $chunkElems elements")

      // ---- per-array metadata documents (the writers derive codec
      //      chain / separator / element type from these; the commit
      //      persists these exact documents) ----
      // a column scanned from a v2 datetime64/timedelta64 array carries
      // zarr_time_kind/zarr_time_unit Spark field metadata — thread it
      // into the destination's v3 attributes so a migrated time axis
      // stays an ANNOTATED int64, not an anonymous one
      def timeMetaOf(name: String): Option[(String, String)] = {
        val md = fieldByName(name).metadata
        if (md.contains("zarr_time_kind") && md.contains("zarr_time_unit"))
          Some((md.getString("zarr_time_kind"), md.getString("zarr_time_unit")))
        else None
      }
      val dataMetaJsons: Seq[(String, String)] = dataCols.zip(dataZts).map { case (f, zt) =>
        f.name -> ZarrWriter.metaJson(zt, shape, chunkShape,
          ZarrBatchWrite.defaultFillJson(zt), Some(dims), chain,
          timeMeta = timeMetaOf(f.name))
      }
      val coordMetaJsons: Seq[(String, String)] = dims.zip(dimZts).zipWithIndex.map {
        case ((d, zt), i) =>
          d -> ZarrWriter.metaJson(zt, Seq(shape(i)), Seq(chunkShape(i)),
            ZarrBatchWrite.defaultFillJson(zt), Some(Seq(d)), chain,
            timeMeta = timeMetaOf(d))
      }

      // ---- attach grid indices via per-dim BROADCAST joins ----
      // each build side is one axis (value, index); equality semantics
      // (float normalization, -0.0, NaN) are Spark's own, i.e. exactly
      // the semantics of the distinct() that produced the axis
      var indexed = df
      dims.zipWithIndex.foreach { case (d, i) =>
        val axisDf = spark.createDataFrame(
          new java.util.ArrayList[Row](axes(i).zipWithIndex.map { case (v, g) =>
            Row(v, g.toLong)
          }.toSeq.asJava),
          StructType(Seq(
            StructField(s"__zarr_v$i", fieldByName(d).dataType, nullable = false),
            StructField(s"__zarr_g$i", LongType, nullable = false))))
        indexed = indexed.join(broadcast(axisDf), col(d) === col(s"__zarr_v$i"))
      }
      // row-major chunk ordinal and offset within the (padded) chunk —
      // pure integer Column arithmetic, whole-stage-codegen'd. Spark's
      // `/` is double division, so integral div is (g - g % c) / c: the
      // numerator is an exact multiple and the quotient < 2^53 (axis
      // length is capped), so the double division is exact
      var ordCol: Column = lit(0L)
      var offCol: Column = lit(0L)
      dims.indices.foreach { i =>
        val g = col(s"__zarr_g$i")
        val inChunk = g % chunkShape(i)
        ordCol = ordCol * grid(i) + ((g - inChunk) / chunkShape(i)).cast(LongType)
        offCol = offCol * chunkShape(i) + inChunk
      }

      // ---- one clustered shuffle; contiguous ordinal blocks per task ----
      val chunksPerBlock: Long = math.max(1L, rowsPerTask / math.max(1L, chunkElems))
      val nBlocks: Int = math.min(1 << 16,
        ((numChunks + chunksPerBlock - 1) / chunksPerBlock)).toInt
      val shuffled = indexed
        .select((dataCols.map(f => col(f.name)) :+
          ordCol.as("__zarr_ord") :+ offCol.as("__zarr_off")): _*)
        .repartition(nBlocks, (col("__zarr_ord") / chunksPerBlock).cast(LongType))
        .sortWithinPartitions(col("__zarr_ord"), col("__zarr_off"))

      val gridArr = grid.toArray
      val chunkArr = chunkShape.toArray
      val shapeArr = shape.toArray
      val dimsArr = dims.toArray
      val dimZtArr = dimZts.toArray
      val dataNames = dataCols.map(_.name).toArray
      val dataJsonArr = dataMetaJsons.map(_._2).toArray
      val axesB = spark.sparkContext.broadcast(axes.map(_.toIndexedSeq))
      val statsOn = stats
      val root = store.root
      val pairs = hadoopPairs

      import spark.implicits._
      val written = shuffled.mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else Iterator.single(ZarrCubeWrite.assemblePartition(
          it, root, pairs, dataNames, dataJsonArr, dimsArr, dimZtArr,
          axesB.value, shapeArr, chunkArr, gridArr, statsOn))
      }.collect()

      val rowsWritten = written.map(_._1).sum
      val chunksWritten = written.map(_._2).sum
      if (rowsWritten != totalCells || chunksWritten != numChunks)
        throw new ZarrException(
          s"cube write incomplete: $rowsWritten/$totalCells rows, " +
            s"$chunksWritten/$numChunks chunks reached the store")

      // ---- driver commit: axis arrays (axis-sized), per-array metadata,
      //      consolidated root LAST (the atomic commit point) ----
      dims.zipWithIndex.foreach { case (d, i) =>
        ZarrWriter.writeArray(store, d, dimZts(i), Seq(shape(i)), Seq(chunkShape(i)),
          axes(i).toIndexedSeq, Some(Seq(d)), chain,
          ZarrBatchWrite.defaultFillJson(dimZts(i)),
          timeMeta = timeMetaOf(d))
      }
      dataMetaJsons.foreach { case (n, j) => store.writeMeta(n, j) }
      val allJsons = coordMetaJsons ++ dataMetaJsons
      store.writeStoreRootMeta(allJsons, ChunkManifest.empty)
    } catch {
      case e: Throwable =>
        // cube writes are fresh-only, so everything under the root is
        // this write's partial output — but the DELETION scope follows
        // ownership: wholesale root delete only if we created/truncated
        // the root; for a pre-existing (verified-empty) directory remove
        // the contents and keep the user's directory entry
        try {
          if (ownRoot) store.delete() else store.deleteRootContents()
        } catch { case _: Throwable => () }
        throw e
    }
  }
  // scalastyle:on method.length

  /** Task kernel: rows arrive sorted by (ordinal, offset); assemble and
    * write one chunk at a time at its FINAL key, flush grid-signed stats
    * segments per contiguous ordinal run. Returns (rows, chunks). */
  private def assemblePartition(
      it: Iterator[Row],
      root: String,
      hadoopPairs: Seq[(String, String)],
      dataNames: Array[String],
      dataMetaJsons: Array[String],
      dims: Array[String],
      dimZts: Array[ZarrType],
      axes: Seq[IndexedSeq[Any]],
      shape: Array[Long],
      chunkShape: Array[Int],
      grid: Array[Int],
      stats: Boolean): (Long, Long) = {
    val store = ZarrStore(root, hadoopPairs)
    val ndim = grid.length
    val ncols = dataNames.length
    val metas = dataNames.zip(dataMetaJsons).map { case (n, j) => ZarrMeta.parse(n, j) }
    val zts = metas.map(_.dataType)
    val chains = metas.map(m => Codecs.bytesCodecs(m.codecs,
      if (m.dataType.byteWidth > 0) m.dataType.byteWidth else 1))
    val orders = metas.map(m => Codecs.endianness(m.codecs))
    val fills = metas.map(_.fillValue)
    val chunkElems = chunkShape.map(_.toLong).product.toInt

    val buf: Array[Array[Any]] = Array.tabulate(ncols)(_ => new Array[Any](chunkElems))
    // real (in-extent) values per data column, for stats over output rows
    val realVals: Array[scala.collection.mutable.ArrayBuffer[Any]] =
      Array.fill(ncols)(scala.collection.mutable.ArrayBuffer.empty)

    // stats segment accumulators: ALL columns (coords first, then data),
    // matching what `analyze` records for this grid
    val segColNames = dims ++ dataNames
    val segZts = dimZts ++ zts
    var segFirst = -1L
    var segLen = 0
    val segBounds = Array.fill(segColNames.length)(
      Vector.newBuilder[Option[ChunkStats.Bound]])
    val segSums = Array.fill(segColNames.length)(Vector.newBuilder[Option[Long]])
    val maxSegChunks = 4096

    def flushSegment(): Unit = {
      if (stats && segLen > 0) {
        val cols = segColNames.indices.map { i =>
          (segColNames(i), segZts(i), segBounds(i).result(), segSums(i).result())
        }
        store.writeText(ChunkStats.segmentKey(segFirst, segLen),
          ChunkStats.encodeBounds(cols, grid.toSeq, dims.toSeq))
      }
      segColNames.indices.foreach { i => segBounds(i).clear(); segSums(i).clear() }
      segFirst = -1L
      segLen = 0
    }

    def chunkIndex(ord: Long): Array[Int] = {
      val idx = new Array[Int](ndim)
      var rem = ord
      var d = ndim - 1
      while (d >= 0) { idx(d) = (rem % grid(d)).toInt; rem /= grid(d); d -= 1 }
      idx
    }

    var rows = 0L
    var chunks = 0L
    var curOrd = -1L
    var rowsInChunk = 0

    def flushChunk(): Unit = {
      if (curOrd < 0) return
      val idx = chunkIndex(curOrd)
      val extent = new Array[Int](ndim)
      var d = 0
      while (d < ndim) {
        val start = idx(d).toLong * chunkShape(d)
        extent(d) = math.min(chunkShape(d).toLong, shape(d) - start).toInt
        d += 1
      }
      val nReal = extent.product
      if (rowsInChunk != nReal)
        throw new ZarrException(
          s"cube write: chunk ordinal $curOrd assembled $rowsInChunk rows, " +
            s"expected $nReal — density proof violated mid-write")
      var c = 0
      while (c < ncols) {
        val enc = ZarrDataWriter.encode(zts(c),
          scala.collection.immutable.ArraySeq.unsafeWrapArray(buf(c)), orders(c))
        val packed = chains(c).foldLeft(enc)((b, cc) => cc.encode(b))
        store.writeChunk(dataNames(c), metas(c).chunkKey(idx), packed)
        c += 1
      }
      if (stats) {
        if (segFirst < 0) segFirst = curOrd
        // coordinate bounds/sums over the chunk's OUTPUT rows, computed
        // from the broadcast axes (broadcast multiplicity realized by a
        // strided view, not materialization)
        var i = 0
        while (i < ndim) {
          val view = new CoordChunkView(axes(i), idx(i).toLong * chunkShape(i), extent, i)
          segBounds(i) += ChunkStats.minMaxBound(dimZts(i), view)
          segSums(i) += ChunkStats.chunkSum(dimZts(i), view)
          i += 1
        }
        var c2 = 0
        while (c2 < ncols) {
          segBounds(ndim + c2) += ChunkStats.minMaxBound(zts(c2), realVals(c2))
          segSums(ndim + c2) += ChunkStats.chunkSum(zts(c2), realVals(c2))
          c2 += 1
        }
        segLen += 1
        if (segLen == maxSegChunks) flushSegment()
      }
      chunks += 1
      var c3 = 0
      while (c3 < ncols) {
        java.util.Arrays.fill(buf(c3).asInstanceOf[Array[AnyRef]], fills(c3).asInstanceOf[AnyRef])
        realVals(c3).clear()
        c3 += 1
      }
      rowsInChunk = 0
      curOrd = -1L
    }

    // pre-fill buffers (positions outside the edge extent stay fill)
    var c0 = 0
    while (c0 < ncols) {
      java.util.Arrays.fill(buf(c0).asInstanceOf[Array[AnyRef]], fills(c0).asInstanceOf[AnyRef])
      c0 += 1
    }

    it.foreach { row =>
      val ord = row.getLong(ncols)
      val off = row.getLong(ncols + 1).toInt
      if (ord != curOrd) {
        flushChunk()
        // segments must cover CONTIGUOUS ordinal runs (the key encodes
        // [first, first+n)); a block boundary or hash-collided partition
        // starts a new run
        if (stats && segLen > 0 && ord != segFirst + segLen) flushSegment()
        curOrd = ord
      }
      var c = 0
      while (c < ncols) {
        val v = row.get(c)
        if (v == null)
          throw new ZarrException(
            s"zarr arrays cannot store NULL (column ${dataNames(c)}); " +
              "coalesce/filter nulls before writing")
        buf(c)(off) = v
        realVals(c) += v
        c += 1
      }
      rowsInChunk += 1
      rows += 1
    }
    flushChunk()
    flushSegment()
    (rows, chunks)
  }

  /** Output rows of one chunk for coordinate `d`: the axis slice repeated
    * with the broadcast multiplicity, as a strided O(1)-memory view. */
  private final class CoordChunkView(
      axis: IndexedSeq[Any], base: Long, extent: Array[Int], d: Int)
      extends IndexedSeq[Any] {
    private val strideAfter: Int = {
      var p = 1
      var i = d + 1
      while (i < extent.length) { p *= extent(i); i += 1 }
      p
    }
    override val length: Int = extent.product
    override def apply(r: Int): Any = axis((base + (r / strideAfter) % extent(d)).toInt)
  }
}
