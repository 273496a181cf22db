package graft.zarr

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.types._

/** Zarr v3 array metadata (`zarr.json`) model + parser.
  *
  * Mirrors the fields the reference consumes
  * (`/root/reference/crates/arrow-zarr/src/table/config.rs:239-253`,
  * `zarr_store_opener/zarr_data_stream.rs:123-142`): shape, data_type,
  * chunk_grid, chunk_key_encoding, fill_value, codecs, dimension_names.
  * Only Zarr v3 (`zarr_format: 3`, `node_type: "array"`) is accepted,
  * matching `config.rs:242-247`.
  */
final case class ZarrArrayMeta(
    name: String,
    shape: Array[Long],
    dataType: ZarrType,
    chunkShape: Array[Int],
    chunkKeySeparator: String,
    fillValue: Any, // boxed value in the JVM type of `dataType`
    codecs: Seq[CodecSpec],
    dimensionNames: Option[Seq[String]],
    /** Raw zarr.json text — shipped to executors (Jackson nodes in
      * `codecs` are not reliably serializable) and re-parsed there. */
    sourceJson: String = "",
    /** 2 for arrays translated from Zarr v2 `.zarray` metadata
      * ([[ZarrMeta.parseV2]]); affects only chunk-key naming. Executors
      * re-parse `sourceJson` (the ORIGINAL v2 doc), so the version
      * survives serialization by construction. */
    formatVersion: Int = 3,
    /** ("datetime64"|"timedelta64", unit) for v2 `M8[..]`/`m8[..]`
      * dtypes — decoded as raw int64 counts; surfaced as Spark field
      * metadata by the connector. Survives serialization via
      * `sourceJson` re-parse like `formatVersion`. */
    timeMeta: Option[(String, String)] = None) {

  def ndim: Int = shape.length

  /** Element permutation of the codec chain's net `transpose`, if any —
    * memoized so the O(chunk-elements) table is built once per task per
    * array, not per chunk on the hot decode path. */
  @transient lazy val transposePerm: Option[Array[Int]] =
    Codecs.transposeOrder(codecs, chunkShape.length)
      .map(o => Codecs.transposePerm(chunkShape, o))

  /** Parsed `sharding_indexed` spec, memoized for the same reason. */
  @transient lazy val shardingSpec: Option[Sharding.Spec] =
    Sharding.specOf(codecs)

  /** Number of chunks along each dimension. */
  def gridShape: Array[Int] =
    shape.zip(chunkShape).map { case (s, c) => ((s + c - 1) / c).toInt }

  def numElements: Long = shape.product

  /** A coordinate is a 1-D array whose single dimension name equals its own
    * array name (reference: `zarr_data_stream.rs:108-215`). */
  def isCoordinate: Boolean =
    ndim == 1 && dimensionNames.exists(d => d.length == 1 && d.head == name)

  /** Storage key of chunk `idx` relative to the array root (v3 "default"
    * chunk key encoding: `c<sep>i0<sep>i1...`; v2: bare `i0<sep>i1...`
    * with "." as the default separator and NO prefix). */
  def chunkKey(idx: Array[Int]): String =
    if (formatVersion == 2) idx.mkString(chunkKeySeparator)
    else (Seq("c") ++ idx.map(_.toString)).mkString(chunkKeySeparator)

  /** Valid extent of chunk `idx` along each dim (edge chunks truncated;
    * reference: `zarr_data_stream.rs:577-594`). */
  def chunkExtent(idx: Array[Int]): Array[Int] = {
    val out = new Array[Int](ndim)
    var d = 0
    while (d < ndim) {
      val start = idx(d).toLong * chunkShape(d)
      out(d) = math.min(chunkShape(d).toLong, shape(d) - start).toInt
      d += 1
    }
    out
  }
}

/** Supported Zarr v3 primitive types and their Spark SQL mapping
  * (reference type table: `config.rs:261-282`; SURVEY §1.4 documents the
  * unsigned widenings — Spark has no unsigned integers). */
sealed abstract class ZarrType(val zarrName: String, val sparkType: DataType, val byteWidth: Int)
object ZarrType {
  case object Bool extends ZarrType("bool", BooleanType, 1)
  case object Int8 extends ZarrType("int8", ByteType, 1)
  case object Int16 extends ZarrType("int16", ShortType, 2)
  case object Int32 extends ZarrType("int32", IntegerType, 4)
  case object Int64 extends ZarrType("int64", LongType, 8)
  case object UInt8 extends ZarrType("uint8", ShortType, 1)
  case object UInt16 extends ZarrType("uint16", IntegerType, 2)
  case object UInt32 extends ZarrType("uint32", LongType, 4)
  case object UInt64 extends ZarrType("uint64", DecimalType(20, 0), 8)
  case object Float32 extends ZarrType("float32", FloatType, 4)
  case object Float64 extends ZarrType("float64", DoubleType, 8)
  case object Str extends ZarrType("string", StringType, -1)
  /** Variable-length raw bytes (v2 `|O` + numcodecs `vlen-bytes`, and
    * on the write side zarr-python's experimental v3 `bytes` dtype with
    * the `vlen-bytes` object codec): Spark BinaryType — array-native
    * storage for opaque multimodal payloads (image/audio blobs
    * co-located with their features). Full read/write surface since
    * r20, including sharded layouts (inner chunks are offset-addressed
    * through the ZEP 2 shard index, so variable-length elements shard
    * like any other — the layout big-shard multimodal stores need). */
  case object Bytes extends ZarrType("bytes", org.apache.spark.sql.types.BinaryType, -1)

  val all: Seq[ZarrType] = Seq(Bool, Int8, Int16, Int32, Int64,
    UInt8, UInt16, UInt32, UInt64, Float32, Float64, Str, Bytes)

  def fromName(n: String): ZarrType =
    all.find(_.zarrName == n).getOrElse(
      throw new ZarrException(s"Unsupported type: $n"))
}

final case class CodecSpec(name: String, config: Map[String, JsonNode])

class ZarrException(msg: String, cause: Throwable = null)
  extends RuntimeException(msg, cause)

object ZarrMeta {
  private val mapper = new ObjectMapper()

  /** Rewrite only `shape[0]` of an existing zarr.json (appends must
    * preserve every other stored property — codecs, fill_value,
    * dimension_names — verbatim). */
  def withShape0(json: String, n: Long): String = {
    val root = mapper.readTree(json).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val shape = root.withArray("shape")
    val rest = new Array[Long](shape.size())
    var i = 0
    while (i < rest.length) { rest(i) = shape.get(i).asLong(); i += 1 }
    shape.removeAll()
    shape.add(n)
    i = 1
    while (i < rest.length) { shape.add(rest(i)); i += 1 }
    mapper.writeValueAsString(root)
  }

  /** Array metadata embedded in a root group document's Zarr v3
    * `consolidated_metadata.metadata` map (empty when the field is
    * absent, not inline, or the doc is not a v3 group). Non-array nodes
    * (sub-groups) are skipped. */
  def parseConsolidated(rootJson: String): Seq[ZarrArrayMeta] = {
    val root =
      try mapper.readTree(rootJson)
      catch { case _: Throwable => return Seq.empty }
    if (root.path("zarr_format").asInt(-1) != 3 ||
      root.path("node_type").asText("") != "group") return Seq.empty
    val cm = root.path("consolidated_metadata")
    if (cm.path("kind").asText("inline") != "inline") return Seq.empty
    val md = cm.path("metadata")
    if (!md.isObject) return Seq.empty
    import scala.jdk.CollectionConverters._
    // only root-level arrays (no '/' in the key): zarr-python
    // consolidates recursively, and a nested 'grp/arr' entry would make
    // the schema depend on WHICH metadata path ran — the listArrays
    // fallback (and parseV2Consolidated) only surface root-level arrays
    md.fields().asScala.toSeq.collect {
      case e if !e.getKey.contains("/") &&
          e.getValue.path("node_type").asText("") == "array" =>
        parse(e.getKey, mapper.writeValueAsString(e.getValue))
    }
  }

  /** Array metadata from a Zarr v2 `.zmetadata` consolidated document
    * (`zarr_consolidated_format: 1`, entries keyed `<name>/.zarray`).
    * Empty on anything else. Only root-level arrays (one path segment)
    * are surfaced, matching [[ZarrStore.listArrays]]. */
  def parseV2Consolidated(doc: String): Seq[ZarrArrayMeta] = {
    val root =
      try mapper.readTree(doc)
      catch { case _: Throwable => return Seq.empty }
    if (root.path("zarr_consolidated_format").asInt(-1) != 1) return Seq.empty
    val md = root.path("metadata")
    if (!md.isObject) return Seq.empty
    import scala.jdk.CollectionConverters._
    val entries = md.fields().asScala.toSeq
    val attrsByName = entries.collect {
      case e if e.getKey.endsWith("/.zattrs") =>
        e.getKey.dropRight("/.zattrs".length) -> mapper.writeValueAsString(e.getValue)
    }.toMap
    entries.collect {
      case e if e.getKey.endsWith("/.zarray") &&
        !e.getKey.dropRight("/.zarray".length).contains("/") =>
        val name = e.getKey.dropRight("/.zarray".length)
        parseV2(name, mergeV2Attrs(
          mapper.writeValueAsString(e.getValue), attrsByName.get(name)))
    }
  }

  def parse(arrayName: String, json: String): ZarrArrayMeta = {
    val root = mapper.readTree(json)
    if (root.path("zarr_format").asInt(-1) == 2)
      return parseV2(arrayName, json)
    if (root.path("zarr_format").asInt(-1) != 3)
      throw new ZarrException("Only Zarr v2/v3 metadata is supported")
    if (root.path("node_type").asText("") != "array")
      throw new ZarrException(s"Not an array node: $arrayName")

    val shape = iter(root.path("shape")).map(_.asLong()).toArray
    if (shape.length < 1 || shape.length > 8)
      throw new ZarrException(
        s"Only 1-8 dimensional arrays are supported, got ${shape.length} for $arrayName")

    val dtype = ZarrType.fromName(root.path("data_type").asText(""))

    val grid = root.path("chunk_grid")
    if (grid.path("name").asText("") != "regular")
      throw new ZarrException(s"Unsupported chunk grid: ${grid.path("name").asText("")}")
    val chunkShape = iter(grid.path("configuration").path("chunk_shape"))
      .map { n =>
        // canConvertToInt guards Jackson's silent asInt truncation: a
        // chunk_shape entry past Int range would otherwise wrap and the
        // array would decode with a WRONG grid — garbage, not an error
        if (!n.canConvertToInt || n.asInt() < 1)
          throw new ZarrException(
            s"chunk_shape entry ${n.asText()} of $arrayName must be a " +
              "positive 32-bit integer")
        n.asInt()
      }.toArray
    if (chunkShape.length != shape.length)
      throw new ZarrException(s"chunk_shape rank != shape rank for $arrayName")

    val keyEnc = root.path("chunk_key_encoding")
    val sep = keyEnc.path("name").asText("default") match {
      case "default" =>
        val s = keyEnc.path("configuration").path("separator")
        val sep0 = if (s.isMissingNode) "/" else s.asText("/")
        // the spec allows exactly '/' and '.'; any other value would
        // build keys the chunks do not live at — every read silently
        // fill-valued (the v2 path already refuses loudly)
        if (sep0 != "/" && sep0 != ".")
          throw new ZarrException(
            s"Bad chunk_key_encoding separator '$sep0' for $arrayName (use '/' or '.')")
        sep0
      case other => throw new ZarrException(s"Unsupported chunk_key_encoding: $other")
    }

    val fill = parseFill(root.path("fill_value"), dtype)

    val codecs = codecSpecs(root.path("codecs"))
    // unknown codecs must fail HERE, not silently skip at decode time
    // (Codecs.bytesCodecs is a collect) — garbage-decode prevention
    Codecs.validate(codecs, shape.length, s"array $arrayName")
    // eagerly parse any sharding spec so malformed/unsupported inner
    // codec chains are metadata errors too, not first-read surprises
    Sharding.specOf(codecs)

    val dimNames = {
      val dn = root.path("dimension_names")
      if (dn.isArray) Some(iter(dn).map(_.asText()).toSeq) else None
    }

    // Zarr v3: storage transformers are must-understand — an array keyed
    // through a transformer this reader does not implement would silently
    // read as all fill values, so unknown names are a hard error. The
    // only transformer we implement is the chunk manifest (whose mapping
    // itself lives in the store root doc, ChunkManifest).
    val st = root.path("storage_transformers")
    if (st.isArray) iter(st).foreach { t =>
      val n = t.path("name").asText("")
      if (n != ChunkManifest.transformerName)
        throw new ZarrException(
          s"Unsupported storage transformer '$n' for $arrayName")
    }

    // v3 has no datetime dtype; this engine records a migrated v2
    // datetime64/timedelta64 axis's kind/unit as array ATTRIBUTES
    // (ZarrWriter.metaJson) so the annotation survives cube write /
    // compact. Surface them exactly like parseV2 does — only meaningful
    // on the int64 representation.
    val timeMeta = {
      val at = root.path("attributes")
      val k = at.path("zarr_time_kind")
      val u = at.path("zarr_time_unit")
      if (dtype == ZarrType.Int64 && k.isTextual && u.isTextual)
        Some((k.asText(), u.asText()))
      else None
    }

    ZarrArrayMeta(arrayName, shape, dtype, chunkShape, sep, fill, codecs, dimNames, json,
      timeMeta = timeMeta)
  }

  /** Zarr v2 `.zarray` metadata, translated into the v3-shaped internal
    * model (the reference reads v2 transparently — `zarrs`'
    * `Array::async_open` falls back from `zarr.json` to `.zarray`; this
    * is the JVM equivalent). The translation:
    *
    *  - numpy dtype typestr → [[ZarrType]] + an explicit-endian `bytes`
    *    codec (`>f8` reads as float64 big-endian);
    *  - `order: "F"` → a `transpose` codec with reversed order (Fortran
    *    layout IS the [ndim-1..0] dimension permutation);
    *  - `compressor` → the equivalent bytes→bytes codec: numcodecs
    *    `blosc` (same c-blosc container the v3 codec decodes), `zlib`,
    *    `gzip`, `zstd`. `null` → uncompressed. Anything else is a hard
    *    error (the garbage-decode discipline);
    *  - `filters` → the supported numcodecs filters translate to
    *    bytes→bytes codecs in encode order (decode reverses them after
    *    decompression): `delta` (typed running-difference; the common
    *    climate/geo filter) and `shuffle` (standalone byte shuffle).
    *    `vlen-utf8` is the object codec for `|O` string arrays (the
    *    same element layout the v3 vlen-utf8 path decodes). Any OTHER
    *    filter id remains a hard error — silently ignoring one would
    *    decode garbage;
    *  - string dtypes: `|O`+vlen-utf8 → vlen strings; `|S<n>` →
    *    fixed-width NUL-padded bytes (must be valid UTF-8 — loud error
    *    otherwise); `<U<n>`/`>U<n>` → fixed-width NUL-padded UCS-4;
    *  - chunk keys are bare dot-separated indices (`0.0`), honoring
    *    `dimension_separator`;
    *
    * Read-only: the writer and append/sink paths stay v3 and refuse v2
    * stores ([[graft.sources.ZarrWrite]]). */
  def parseV2(arrayName: String, json: String): ZarrArrayMeta = {
    val root = mapper.readTree(json)
    if (root.path("zarr_format").asInt(-1) != 2)
      throw new ZarrException(s"Not Zarr v2 metadata: $arrayName")

    val shape = iter(root.path("shape")).map(_.asLong()).toArray
    if (shape.length < 1 || shape.length > 8)
      throw new ZarrException(
        s"Only 1-8 dimensional arrays are supported, got ${shape.length} for $arrayName")
    val chunkShape = iter(root.path("chunks")).map(_.asInt()).toArray
    if (chunkShape.length != shape.length)
      throw new ZarrException(s"chunks rank != shape rank for $arrayName")

    val v2t = v2Dtype(root.path("dtype").asText(""), arrayName)
    val bigEndian = v2t.big

    val filterNodes = {
      val f = root.path("filters")
      if (f.isArray) iter(f).toSeq else Seq.empty[JsonNode]
    }

    // `|O` element format comes from the object codec (filters[0] in
    // zarr-python): vlen-utf8 → Spark string, vlen-bytes → Spark binary
    // (the multimodal-blob column type). The dtype is resolved here so
    // every later stage (fill, codecs, decode) sees the real type.
    val dtype =
      if (v2t.strKind == V2StrKind.Obj &&
          filterNodes.headOption.exists(_.path("id").asText("") == "vlen-bytes"))
        ZarrType.Bytes
      else v2t.t

    val sep = root.path("dimension_separator").asText(".")
    if (sep != "." && sep != "/")
      throw new ZarrException(s"Bad v2 dimension_separator '$sep' for $arrayName")

    val fillNode = root.path("fill_value")
    val fill =
      if (fillNode.isNull || fillNode.isMissingNode) dtype match {
        // v2 fill_value null = undefined; absent chunks then read as the
        // type's zero (what zarr-python materializes for 0-filled reads)
        case ZarrType.Float32 => java.lang.Float.valueOf(0f)
        case ZarrType.Float64 => java.lang.Double.valueOf(0d)
        case ZarrType.Str => "" // numpy's zero for S/U/O is the empty string
        case ZarrType.Bytes => Array.emptyByteArray
        case _ => parseFill(mapper.readTree("0"), dtype)
      }
      else if (v2t.strKind == V2StrKind.FixedBytes) {
        // v2 spec: fill_value for 'S' (and 'V') dtypes is Base64-encoded.
        // Same treatment as stored elements (ChunkColumn.decodeFixedBytesStr):
        // strip the trailing NUL padding a writer may have included, then
        // STRICT UTF-8 — a non-UTF-8 fill must fail as loudly as a
        // non-UTF-8 chunk, not materialize replacement chars
        val bytes =
          try java.util.Base64.getDecoder.decode(fillNode.asText(""))
          catch {
            case e: IllegalArgumentException =>
              throw new ZarrException(
                s"fill_value for S dtype must be Base64 for $arrayName", e)
          }
        var end = bytes.length
        while (end > 0 && bytes(end - 1) == 0) end -= 1
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        try dec.decode(java.nio.ByteBuffer.wrap(bytes, 0, end)).toString
        catch {
          case e: java.nio.charset.CharacterCodingException =>
            throw new ZarrException(
              s"fill_value for S dtype is not valid UTF-8 for $arrayName", e)
        }
      } else parseFill(fillNode, dtype)

    val specs = Seq.newBuilder[CodecSpec]
    if (root.path("order").asText("C") == "F") {
      val order = mapper.createArrayNode()
      (shape.indices.reverse).foreach(order.add)
      specs += CodecSpec("transpose", Map("order" -> order))
    }
    // numcodecs filters apply AFTER the array layout and BEFORE the
    // compressor on encode; listing them in encode order makes the
    // existing reverse-fold decode apply them correctly (decompress →
    // un-shuffle → un-delta → un-scale → interpret). `cur` tracks the
    // STORED element repr through the stack (fixedscaleoffset re-types
    // floats to a small integer astype, so a later delta/shuffle acts
    // on THAT, not the array dtype).
    var sawVlen = false
    var sawFso = false
    val fsoIdx = filterNodes.indexWhere(_.path("id").asText("") == "fixedscaleoffset")
    // (width, isFloat, bigEndian) of the element repr entering each
    // filter ON THE DECODE SIDE. When a fixedscaleoffset appears later
    // in the stack, un-fso re-emits the dtype's floats as LITTLE-endian
    // bytes regardless of the dtype's declared order, so every filter
    // BEFORE the fso must bind little-endian for its values to survive
    // (a value filter like delta is endian-portable once read in the
    // right order; the byte-layout-sensitive shuffle is rejected below).
    var cur: (Int, Boolean, Boolean) =
      (dtype.byteWidth, dtype == ZarrType.Float32 || dtype == ZarrType.Float64,
        bigEndian && fsoIdx < 0)
    val filterSpecs = Seq.newBuilder[CodecSpec]
    filterNodes.zipWithIndex.foreach { case (fn, fIdx) =>
      fn.path("id").asText("") match {
        case "vlen-utf8" =>
          if (v2t.strKind != V2StrKind.Obj)
            throw new ZarrException(
              s"vlen-utf8 object codec requires dtype '|O' for $arrayName")
          if (sawVlen)
            throw new ZarrException(s"Duplicate vlen-utf8 filter for $arrayName")
          sawVlen = true
          filterSpecs += CodecSpec("vlen-utf8", Map.empty)
        case "vlen-bytes" =>
          if (v2t.strKind != V2StrKind.Obj || fIdx != 0)
            throw new ZarrException(
              s"vlen-bytes object codec requires dtype '|O' as filters[0] for $arrayName")
          if (sawVlen)
            throw new ZarrException(s"Duplicate object codec for $arrayName")
          sawVlen = true
          filterSpecs += CodecSpec("vlen-bytes", Map.empty)
        case "delta" =>
          if (dtype == ZarrType.Str || dtype == ZarrType.Bytes || dtype == ZarrType.Bool)
            throw new ZarrException(
              s"numcodecs delta filter on non-numeric dtype for $arrayName")
          val fDt = fn.path("dtype").asText("")
          val astype = fn.path("astype")
          if (!astype.isMissingNode && !astype.isNull &&
              astype.asText("") != fDt)
            throw new ZarrException(
              s"numcodecs delta with astype != dtype is not supported for $arrayName")
          // the stored element repr is the filter's dtype (usually the
          // incoming repr verbatim); its width/order drive the cumsum
          val dd = fDt match {
            case "" => cur
            case ts =>
              val d = v2Dtype(ts, s"$arrayName delta filter")
              // the config dtype describes the ENCODE-side layout; on the
              // decode side a downstream un-fso has already normalized
              // the bytes to little-endian (values unchanged)
              (d.t.byteWidth, d.t == ZarrType.Float32 || d.t == ZarrType.Float64,
                d.big && !(fsoIdx >= 0 && fIdx < fsoIdx))
          }
          if (dd._1 != cur._1)
            throw new ZarrException(
              s"numcodecs delta dtype '$fDt' width differs from the stored repr for $arrayName")
          filterSpecs += CodecSpec("v2-delta", Map(
            "width" -> mapper.readTree(dd._1.toString),
            "float" -> mapper.readTree(dd._2.toString),
            "endian" -> mapper.readTree(if (dd._3) "\"big\"" else "\"little\"")))
        case "shuffle" =>
          if (fsoIdx >= 0 && fIdx < fsoIdx && bigEndian)
            throw new ZarrException(
              s"numcodecs shuffle before fixedscaleoffset on a big-endian dtype " +
                s"is not supported for $arrayName (the un-scaled bytes change layout)")
          // numcodecs' Shuffle default elementsize is 4 — NOT the dtype
          // width; defaulting to the width would silently unshuffle with
          // the wrong stride on stores whose config omits the key
          val es = fn.path("elementsize").asInt(4)
          if (es <= 0)
            throw new ZarrException(s"Bad shuffle elementsize $es for $arrayName")
          filterSpecs += CodecSpec("v2-shuffle",
            Map("elementsize" -> mapper.readTree(es.toString)))
        case "fixedscaleoffset" =>
          if (dtype != ZarrType.Float32 && dtype != ZarrType.Float64)
            throw new ZarrException(
              s"numcodecs fixedscaleoffset requires a float array dtype for $arrayName")
          if (sawFso)
            throw new ZarrException(s"Duplicate fixedscaleoffset filter for $arrayName")
          sawFso = true
          val fDt = fn.path("dtype").asText("")
          if (fDt.nonEmpty) {
            val d = v2Dtype(fDt, s"$arrayName fixedscaleoffset dtype")
            if (d.t != dtype)
              throw new ZarrException(
                s"fixedscaleoffset dtype '$fDt' differs from array dtype for $arrayName")
          }
          val aTs = fn.path("astype").asText("")
          val at =
            if (aTs.isEmpty) v2t
            else v2Dtype(aTs, s"$arrayName fixedscaleoffset astype")
          val aKind = if (aTs.length >= 2) aTs.charAt(1) else ' '
          if (aKind != 'i' && aKind != 'u')
            throw new ZarrException(
              s"fixedscaleoffset astype '$aTs' must be an integer type for $arrayName")
          val scale = fn.path("scale").asDouble(0)
          if (!(scale > 0))
            throw new ZarrException(s"fixedscaleoffset scale must be > 0 for $arrayName")
          filterSpecs += CodecSpec("v2-fso", Map(
            "offset" -> fn.path("offset"),
            "scale" -> fn.path("scale"),
            "dtype_width" -> mapper.readTree(dtype.byteWidth.toString),
            "astype_width" -> mapper.readTree(at.t.byteWidth.toString),
            "astype_signed" -> mapper.readTree((aKind == 'i').toString),
            "astype_big" -> mapper.readTree(at.big.toString)))
          cur = (at.t.byteWidth, false, at.big)
        case "packbits" =>
          if (dtype != ZarrType.Bool)
            throw new ZarrException(
              s"numcodecs packbits requires a bool array dtype for $arrayName")
          filterSpecs += CodecSpec("v2-packbits", Map.empty)
        case "quantize" | "bitround" =>
          // lossy float rounding applied at WRITE time; decode is the
          // identity, and this reader is read-only for v2 — accept and
          // emit nothing (zarrs does the same passthrough)
          if (dtype != ZarrType.Float32 && dtype != ZarrType.Float64)
            throw new ZarrException(
              s"numcodecs ${fn.path("id").asText("")} requires a float dtype for $arrayName")
        case other =>
          throw new ZarrException(
            s"Unsupported Zarr v2 filter '$other' for $arrayName (supported: " +
              "delta, shuffle, fixedscaleoffset, packbits, quantize, bitround, " +
              "vlen-utf8, vlen-bytes)")
      }
    }
    if (v2t.strKind == V2StrKind.Obj && !sawVlen)
      throw new ZarrException(
        s"Object dtype '|O' without a vlen-utf8/vlen-bytes object codec for $arrayName " +
          "(other object codecs are not supported)")

    // array→bytes interpretation: endian marker for numerics (LITTLE
    // when fixedscaleoffset is present — its decode re-emits normalized
    // little-endian floats regardless of the astype's order), the
    // string-element layout marker for S/U, vlen-utf8 for |O (already
    // appended from `filters` above)
    v2t.strKind match {
      case V2StrKind.NotStr =>
        val little = sawFso || !bigEndian
        specs += CodecSpec("bytes",
          Map("endian" -> mapper.readTree(if (little) "\"little\"" else "\"big\"")))
      case V2StrKind.FixedBytes =>
        specs += CodecSpec("v2-fixed-bytes-str",
          Map("width" -> mapper.readTree(v2t.strWidth.toString)))
      case V2StrKind.FixedUcs4 =>
        specs += CodecSpec("v2-fixed-ucs4", Map(
          "width" -> mapper.readTree(v2t.strWidth.toString),
          "endian" -> mapper.readTree(if (bigEndian) "\"big\"" else "\"little\"")))
      case V2StrKind.Obj => // vlen-utf8 spec appended from filters
    }
    specs ++= filterSpecs.result()
    val comp = root.path("compressor")
    if (!comp.isNull && !comp.isMissingNode) {
      comp.path("id").asText("") match {
        case "blosc" =>
          val shuffleName = comp.path("shuffle").asInt(1) match {
            case 0 => "noshuffle"
            case 2 => "bitshuffle"
            case _ => "shuffle"
          }
          specs += CodecSpec("blosc", Map(
            "cname" -> comp.path("cname"),
            "clevel" -> comp.path("clevel"),
            "shuffle" -> mapper.readTree("\"" + shuffleName + "\""),
            "blocksize" -> comp.path("blocksize")))
        case "zlib" => specs += CodecSpec("zlib", Map("level" -> comp.path("level")))
        case "lz4" =>
          // numcodecs LZ4 block container (u32-LE size prefix + one raw
          // LZ4 block) — distinct from blosc-lz4 (blosc framing) and
          // from the LZ4 frame format
          specs += CodecSpec("v2-lz4", Map("acceleration" -> comp.path("acceleration")))
        case "gzip" => specs += CodecSpec("gzip", Map("level" -> comp.path("level")))
        case "zstd" => specs += CodecSpec("zstd", Map("level" -> comp.path("level")))
        case "bz2" => specs += CodecSpec("v2-bz2", Map("level" -> comp.path("level")))
        case "lzma" =>
          // numcodecs LZMA default container is XZ (format=1); the
          // legacy ALONE/RAW containers and custom filter chains would
          // decode garbage through an XZ reader — loud errors
          val fmt = comp.path("format")
          if (!fmt.isMissingNode && !fmt.isNull && fmt.asInt(1) != 1)
            throw new ZarrException(
              s"lzma compressor format ${fmt.asInt(1)} (non-XZ) is not supported for $arrayName")
          val lzFilters = comp.path("filters")
          if (lzFilters.isArray && lzFilters.size() > 0)
            throw new ZarrException(
              s"lzma compressor custom filter chains are not supported for $arrayName")
          specs += CodecSpec("v2-lzma", Map("preset" -> comp.path("preset")))
        case other =>
          throw new ZarrException(
            s"Unsupported Zarr v2 compressor '$other' for $arrayName")
      }
    }
    val codecs = specs.result()
    Codecs.validate(codecs, shape.length, s"array $arrayName (v2)")

    // xarray convention: dimension names live in the `.zattrs` sidecar
    // as `_ARRAY_DIMENSIONS` (v2 has no dimension_names field). The
    // store layer merges `.zattrs` into this doc under "attributes"
    // ([[mergeV2Attrs]]) so ONE document round-trips to executors.
    // This is what makes coordinate broadcast work on xarray v2 stores
    // (the reference gets the same names from `zarrs`' v2→v3 metadata
    // conversion of that attribute).
    val dims = {
      val dn = root.path("attributes").path("_ARRAY_DIMENSIONS")
      if (dn.isArray && dn.size() == shape.length)
        Some(iter(dn).map(_.asText()).toSeq)
      else None
    }

    ZarrArrayMeta(arrayName, shape, dtype, chunkShape, sep, fill, codecs,
      dimensionNames = dims, sourceJson = json, formatVersion = 2,
      timeMeta = v2t.timeMeta)
  }

  /** Embed a v2 `.zattrs` document into its `.zarray` doc under
    * "attributes" (a field v2 `.zarray` never carries, so the merge is
    * unambiguous). No-op when attrs are absent/unparseable. */
  def mergeV2Attrs(zarrayJson: String, zattrs: Option[String]): String =
    zattrs.fold(zarrayJson) { attrs =>
      try {
        val root = mapper.readTree(zarrayJson)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        val a = mapper.readTree(attrs)
        if (a.isObject) root.set[JsonNode]("attributes", a)
        mapper.writeValueAsString(root)
      } catch { case scala.util.control.NonFatal(_) => zarrayJson }
    }

  /** How a v2 string dtype stores its elements. */
  private[zarr] sealed trait V2StrKind
  private[zarr] object V2StrKind {
    case object NotStr extends V2StrKind
    /** `|O`: variable-length; decode format comes from the object codec
      * in `filters` (vlen-utf8), not the dtype. */
    case object Obj extends V2StrKind
    /** `|S<n>`: n raw bytes per element, NUL-padded. */
    case object FixedBytes extends V2StrKind
    /** `<U<n>`/`>U<n>`: n UCS-4 code points per element, NUL-padded. */
    case object FixedUcs4 extends V2StrKind
  }

  /** Parsed numpy typestr: the internal type, byte order, and — for the
    * fixed-width string dtypes `S`/`U` — the declared per-element width
    * (bytes for `S`, code points for `U`; 0 otherwise). `timeMeta`
    * carries ("datetime64"|"timedelta64", unit) for `M8[..]`/`m8[..]`
    * dtypes, which decode as their raw int64 counts. */
  private[zarr] final case class V2Dtype(
      t: ZarrType, big: Boolean, strWidth: Int = 0,
      strKind: V2StrKind = V2StrKind.NotStr,
      timeMeta: Option[(String, String)] = None)

  /** numpy typestr → [[V2Dtype]]. Byte-order discipline (zarr-python
    * always normalizes to explicit `<`/`>` on write):
    *  - `|` (byte-order-less) is legal ONLY where order is meaningless —
    *    1-byte element types (`b1`/`i1`/`u1`), byte strings `S*`, and
    *    object `O`. A `|i4` in the wild is malformed metadata and gets a
    *    loud error rather than a silent little-endian guess.
    *  - `=` (native order of the WRITING host) is rejected outright:
    *    the reader cannot know the writer's endianness, so decoding
    *    would be a coin flip. */
  private[zarr] def v2Dtype(ts: String, ctx: String): V2Dtype = {
    if (ts.length < 2)
      throw new ZarrException(s"Bad v2 dtype '$ts' for $ctx")
    val order = ts.charAt(0)
    val kind = ts.charAt(1)
    val width = ts.substring(2)
    if (order == '=')
      throw new ZarrException(
        s"Bad v2 dtype '$ts' for $ctx: '=' (writer-native byte order) is " +
          "ambiguous on read; re-write the store with an explicit '<'/'>'")
    val big = order match {
      case '>' => true
      case '<' | '|' => false
      case other => throw new ZarrException(s"Bad v2 dtype byte order '$other' for $ctx")
    }
    // object dtype: numpy writes '|O' (no width); the element format is
    // carried by the filters' object codec (vlen-utf8 → Spark string)
    if (kind == 'O') {
      if (order != '|' || (width.nonEmpty && width != "8"))
        throw new ZarrException(s"Bad v2 object dtype '$ts' for $ctx")
      return V2Dtype(ZarrType.Str, big = false, strKind = V2StrKind.Obj)
    }
    // fixed-width strings: 'S<n>' raw bytes (order-less), '<U<n>'/'>U<n>'
    // UCS-4 with 4 bytes per code point
    if (kind == 'S' || kind == 'U') {
      val n =
        try width.toInt
        catch { case _: NumberFormatException =>
          throw new ZarrException(s"Bad v2 string dtype '$ts' for $ctx") }
      if (n <= 0)
        throw new ZarrException(s"Bad v2 string dtype '$ts' for $ctx: width must be positive")
      if (kind == 'S') {
        if (order != '|')
          throw new ZarrException(
            s"Bad v2 dtype '$ts' for $ctx: byte strings are order-less ('|S$n')")
        V2Dtype(ZarrType.Str, big = false, strWidth = n, strKind = V2StrKind.FixedBytes)
      } else {
        if (order == '|')
          throw new ZarrException(
            s"Bad v2 dtype '$ts' for $ctx: 'U' elements are 4-byte code points and need '<'/'>'")
        V2Dtype(ZarrType.Str, big, strWidth = n, strKind = V2StrKind.FixedUcs4)
      }
    } else if (kind == 'M' || kind == 'm') {
      // numpy datetime64 ('M8[unit]') / timedelta64 ('m8[unit]'):
      // stored as int64 counts of `unit` since the epoch (or as a
      // duration). Decoded as the RAW int64 — lossless for every unit
      // incl. [ns] (a TIMESTAMP mapping would truncate ns to Spark's
      // microseconds and turn numpy's NaT sentinel into a "valid"
      // instant) and consistent with this engine's epoch-integer time
      // convention (events.ts). The kind/unit ride the Spark schema as
      // field metadata (`zarr_time_kind`/`zarr_time_unit`); NaT passes
      // through as Long.MinValue.
      val TimeRe = """8\[(\w+)\]""".r
      val unit = width match {
        case TimeRe(u) => u
        case _ =>
          throw new ZarrException(
            s"Bad v2 datetime dtype '$ts' for $ctx (expected e.g. '<M8[ns]')")
      }
      val validUnits = Set("Y", "M", "W", "D", "h", "m", "s", "ms", "us", "ns",
        "ps", "fs", "as")
      if (!validUnits(unit))
        throw new ZarrException(
          s"Bad v2 datetime dtype '$ts' for $ctx: unknown unit '$unit'")
      if (order == '|')
        throw new ZarrException(
          s"Bad v2 dtype '$ts' for $ctx: datetime64/timedelta64 are 8-byte " +
            "and need an explicit '<'/'>'")
      val kindName = if (kind == 'M') "datetime64" else "timedelta64"
      V2Dtype(ZarrType.Int64, big, timeMeta = Some((kindName, unit)))
    } else {
      if (order == '|' && width != "1")
        throw new ZarrException(
          s"Bad v2 dtype '$ts' for $ctx: '|' is legal only for 1-byte types " +
            "(zarr-python always writes an explicit '<'/'>' for wider types)")
      val t = (kind, width) match {
        case ('b', "1") => ZarrType.Bool
        case ('i', "1") => ZarrType.Int8
        case ('i', "2") => ZarrType.Int16
        case ('i', "4") => ZarrType.Int32
        case ('i', "8") => ZarrType.Int64
        case ('u', "1") => ZarrType.UInt8
        case ('u', "2") => ZarrType.UInt16
        case ('u', "4") => ZarrType.UInt32
        case ('u', "8") => ZarrType.UInt64
        case ('f', "4") => ZarrType.Float32
        case ('f', "8") => ZarrType.Float64
        case _ =>
          throw new ZarrException(s"Unsupported v2 dtype '$ts' for $ctx")
      }
      V2Dtype(t, big)
    }
  }

  /** Mark an array's metadata as manifest-keyed: add the
    * `graft-chunk-manifest` storage transformer (idempotent). Per the v3
    * spec readers must refuse transformers they don't understand, so
    * generic tools fail loudly on manifest stores instead of silently
    * reading fill values at the canonical chunk keys. */
  def withManifestTransformer(json: String): String = {
    val root = mapper.readTree(json).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val arr = root.withArray("storage_transformers")
    val has = iter(arr).exists(_.path("name").asText("") == ChunkManifest.transformerName)
    if (!has) arr.addObject().put("name", ChunkManifest.transformerName)
    mapper.writeValueAsString(root)
  }

  private def iter(n: JsonNode): Iterator[JsonNode] = {
    import scala.jdk.CollectionConverters._
    n.elements().asScala
  }

  /** Parse a JSON codec list into [[CodecSpec]]s (also used for the
    * nested lists inside `sharding_indexed` configuration). */
  def codecSpecs(node: JsonNode): Seq[CodecSpec] =
    iter(node).map { c =>
      val cfg = c.path("configuration")
      val m = if (cfg.isObject) {
        val b = Map.newBuilder[String, JsonNode]
        cfg.fields().forEachRemaining(e => b += (e.getKey -> e.getValue))
        b.result()
      } else Map.empty[String, JsonNode]
      CodecSpec(c.path("name").asText(""), m)
    }.toSeq

  /** fill_value per the v3 spec: bool, number, string; floats also accept
    * "NaN"/"Infinity"/"-Infinity" strings. */
  private def parseFill(n: JsonNode, t: ZarrType): Any = t match {
    case ZarrType.Bool => java.lang.Boolean.valueOf(n.asBoolean(false))
    case ZarrType.Int8 => java.lang.Byte.valueOf(n.asInt(0).toByte)
    case ZarrType.Int16 | ZarrType.UInt8 => java.lang.Short.valueOf(n.asInt(0).toShort)
    case ZarrType.Int32 | ZarrType.UInt16 => java.lang.Integer.valueOf(n.asInt(0))
    case ZarrType.Int64 | ZarrType.UInt32 => java.lang.Long.valueOf(n.asLong(0L))
    case ZarrType.UInt64 =>
      // may exceed Long.MaxValue; keep as unsigned via BigDecimal. Some
      // writers emit big uint64 fills as JSON STRINGS (above 2^53) —
      // parse those too; anything unparseable must fail LOUDLY, never
      // coerce to zero (absent chunks would silently read a wrong fill)
      if (n.isNumber) new java.math.BigDecimal(n.asText("0"))
      else if (n.isTextual) {
        try new java.math.BigDecimal(n.asText())
        catch { case _: NumberFormatException =>
          throw new ZarrException(s"Bad uint64 fill_value: ${n.asText()}")
        }
      }
      // JSON null / absent is NOT a defined v3 uint64 fill — refuse like
      // any other garbage (the v2 null-means-undefined case never reaches
      // here: parseV2 maps it to the type's zero BEFORE calling parseFill,
      // so a null arriving here is a malformed v3 document whose absent
      // chunks would otherwise silently read a fill the writer never chose)
      else throw new ZarrException(s"Bad uint64 fill_value: $n")
    case ZarrType.Float32 => java.lang.Float.valueOf(floatish(n).toFloat)
    case ZarrType.Float64 => java.lang.Double.valueOf(floatish(n))
    case ZarrType.Str => n.asText("")
    case ZarrType.Bytes =>
      // object/binary arrays have no meaningful declared fill beyond
      // null (→ empty payload); silently coercing one would be the
      // garbage-decode class every other branch refuses
      if (n.isNull || n.isMissingNode) Array.emptyByteArray
      else throw new ZarrException(
        s"non-null fill_value is not supported for binary arrays: $n")
  }

  private def floatish(n: JsonNode): Double =
    if (n.isNumber) n.asDouble()
    else n.asText("") match {
      case "NaN" => Double.NaN
      case "Infinity" => Double.PositiveInfinity
      case "-Infinity" => Double.NegativeInfinity
      case other => throw new ZarrException(s"Bad float fill_value: $other")
    }
}
