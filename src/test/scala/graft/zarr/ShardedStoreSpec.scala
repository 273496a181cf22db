package graft.zarr

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Zarr v3 `sharding_indexed` codec: inner-chunks-in-one-object layout
  * (the store shape large deployments actually use). Covers roundtrip
  * through both writers, absent inner chunks → fill, string arrays,
  * nested codec chains, index at start, and corruption detection. */
class ShardedStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("sharded-store-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-shard").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def readAll(dir: String): Array[org.apache.spark.sql.Row] =
    spark.read.format("zarr").load(dir).orderBy("lat", "lon").collect()

  test("2-D sharded store reads identically to its unsharded twin") {
    val plain = ZarrStore(s"$base/latlon-plain")
    val sharded = ZarrStore(s"$base/latlon-sharded")
    ZarrWriter.writeLatLonStore(plain, ZarrWriter.CodecChain.bloscLz4)
    // data 8x8, outer chunks 4x4, inner chunks 2x2 (4 inner per shard);
    // 1-D coords 8 long, outer chunk 4, inner 2
    sharded.writeStoreRootMeta()
    ZarrWriter.writeArray(sharded, "lat", ZarrType.Float64, Seq(8), Seq(4),
      (0 until 8).map(i => 38.0 + i * 0.1), Some(Seq("lat")),
      ZarrWriter.CodecChain.bloscLz4.sharded(Seq(2)))
    ZarrWriter.writeArray(sharded, "lon", ZarrType.Float64, Seq(8), Seq(4),
      (0 until 8).map(i => -117.0 + i * 0.1), Some(Seq("lon")),
      ZarrWriter.CodecChain.bloscLz4.sharded(Seq(2)))
    ZarrWriter.writeArray(sharded, "data", ZarrType.Float64, Seq(8, 8), Seq(4, 4),
      (0 until 64).map(_.toDouble), Some(Seq("lat", "lon")),
      ZarrWriter.CodecChain.bloscLz4.sharded(Seq(2, 2)))

    val a = readAll(s"$base/latlon-plain")
    val b = readAll(s"$base/latlon-sharded")
    assert(a.length == 64 && b.length == 64)
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("sharded store: the stored object count shrinks, values do not change") {
    // 1-D 64 elements: plain chunks of 4 = 16 objects; sharded outer 16 /
    // inner 4 = 4 objects holding the same 16 logical chunks
    val st = ZarrStore(s"$base/objcount")
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "v", ZarrType.Int64, Seq(64), Seq(16),
      (0 until 64).map(_.toLong), None,
      ZarrWriter.CodecChain.raw.sharded(Seq(4)), fillJson = "0")
    val chunkDir = new java.io.File(s"$base/objcount/v/c")
    assert(chunkDir.listFiles().length == 4, "4 shards expected")
    val got = spark.read.format("zarr").load(s"$base/objcount")
      .orderBy("v").collect().map(_.getLong(0))
    assert(got.toSeq == (0L until 64L))
  }

  test("absent inner chunks decode to the fill value") {
    val st = ZarrStore(s"$base/fillinner")
    st.writeStoreRootMeta()
    val metaJson = ZarrWriter.metaJson(ZarrType.Float64, Seq(8), Seq(8), "42.5", None,
      ZarrWriter.CodecChain.raw.sharded(Seq(2)))
    st.writeMeta("v", metaJson)
    val meta = ZarrMeta.parse("v", metaJson)
    val spec = Sharding.specOf(meta.codecs).get
    // shard covers 8 elements as 4 inner chunks of 2; skip inner 1 and 3
    val shard = Sharding.encode(ZarrType.Float64, Seq(8), spec,
      (0 until 8).map(_.toDouble), skipInner = Set(1, 3))
    st.writeChunk("v", "c/0", shard)
    val got = spark.read.format("zarr").load(s"$base/fillinner")
      .collect().map(_.getDouble(0)).sorted
    val want = Seq(0.0, 1.0, 4.0, 5.0) ++ Seq.fill(4)(42.5)
    assert(got.toSeq == want.sorted)
  }

  test("string array shards roundtrip (vlen-utf8 inner)") {
    val st = ZarrStore(s"$base/strshard")
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "s", ZarrType.Str, Seq(12), Seq(6),
      (0 until 12).map(i => s"value-$i"), None,
      ZarrWriter.CodecChain.gzip.sharded(Seq(3)), fillJson = "\"\"")
    val got = spark.read.format("zarr").load(s"$base/strshard")
      .collect().map(_.getString(0)).sorted
    assert(got.toSeq == (0 until 12).map(i => s"value-$i").sorted)
  }

  test("inner chain with crc32c + zstd decodes and detects index corruption") {
    val st = ZarrStore(s"$base/crcshard")
    st.writeStoreRootMeta()
    val chain = ZarrWriter.CodecChain(Seq("zstd" -> """{"level":3}""", "crc32c" -> ""))
      .sharded(Seq(4))
    ZarrWriter.writeArray(st, "v", ZarrType.Int32, Seq(16), Seq(8),
      (0 until 16).map(i => i * 3), None, chain, fillJson = "0")
    val got = spark.read.format("zarr").load(s"$base/crcshard")
      .collect().map(_.getInt(0)).sorted
    assert(got.toSeq == (0 until 16).map(_ * 3))

    // flip a byte inside the shard INDEX (last 4 bytes are its crc32c;
    // corrupt an offset byte before them) → crc32c mismatch on read
    val key = "c/0"
    val bytes = st.readChunk("v", key).get
    bytes(bytes.length - 8) = (bytes(bytes.length - 8) ^ 0x1).toByte
    st.writeChunk("v", key, bytes)
    val err = intercept[Exception] {
      spark.read.format("zarr").load(s"$base/crcshard").collect()
    }
    def rootMessages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: rootMessages(e.getCause))
    assert(rootMessages(err).exists(m => m != null && m.contains("crc32c")),
      s"expected crc32c failure, got: $err")
  }

  test("index_location start parses and decodes") {
    val st = ZarrStore(s"$base/idxstart")
    st.writeStoreRootMeta()
    val metaJson =
      s"""{
         |  "zarr_format": 3, "node_type": "array",
         |  "shape": [8], "data_type": "int64",
         |  "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [8]}},
         |  "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
         |  "fill_value": 0,
         |  "codecs": [{"name":"sharding_indexed","configuration":{
         |    "chunk_shape":[2],
         |    "codecs":[{"name":"bytes","configuration":{"endian":"little"}}],
         |    "index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"}],
         |    "index_location":"start"}}]
         |}""".stripMargin
    st.writeMeta("v", metaJson)
    val meta = ZarrMeta.parse("v", metaJson)
    val spec = Sharding.specOf(meta.codecs).get
    assert(!spec.indexAtEnd)
    st.writeChunk("v", "c/0",
      Sharding.encode(ZarrType.Int64, Seq(8), spec, (10L until 18L).toIndexedSeq))
    val got = spark.read.format("zarr").load(s"$base/idxstart")
      .collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (10L until 18L))
  }

  test("unsupported sharded layouts refuse loudly, never raw JVM errors or silent garbage") {
    // sharded BINARY arrays (supported since r20) require the vlen-bytes
    // inner element framing; a binary array declared with a FIXED-WIDTH
    // inner bytes codec has no addressable elements — must name the
    // layout BEFORE touching the shard's bytes, never a bytes-level error
    val bytesMeta = ZarrMeta.parse("b",
      s"""{
         |  "zarr_format": 3, "node_type": "array",
         |  "shape": [8], "data_type": "bytes",
         |  "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [8]}},
         |  "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
         |  "fill_value": null,
         |  "codecs": [{"name":"sharding_indexed","configuration":{
         |    "chunk_shape":[2],
         |    "codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}}]
         |}""".stripMargin)
    val spec = Sharding.specOf(bytesMeta.codecs).get
    val e = intercept[ZarrException] {
      Sharding.decode(bytesMeta, spec, new Array[Byte](64))
    }
    assert(e.getMessage.contains("sharded binary array") &&
      e.getMessage.contains("vlen-bytes"), e.getMessage)

    // spec-legal bytes->bytes codecs AFTER sharding_indexed apply to the
    // whole shard object; this reader slices stored bytes directly, so
    // accepting such a chain would misalign the index (trailing crc32c)
    // or decode garbage (trailing gzip) — refuse at validation
    val e2 = intercept[ZarrException] {
      ZarrMeta.parse("v",
        s"""{
           |  "zarr_format": 3, "node_type": "array",
           |  "shape": [8], "data_type": "int64",
           |  "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [8]}},
           |  "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
           |  "fill_value": 0,
           |  "codecs": [{"name":"sharding_indexed","configuration":{
           |    "chunk_shape":[2],
           |    "codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}},
           |    {"name":"gzip","configuration":{"level":5}}]
           |}""".stripMargin)
    }
    assert(e2.getMessage.contains("after sharding_indexed"), e2.getMessage)
  }

  test("DSv2 write with inner_chunk_size produces a sharded store and reads back") {
    val sp = spark; import sp.implicits._
    val url = s"$base/dsv2-sharded"
    val df = (0 until 96).map(i => (i.toLong, i * 0.25)).toDF("id", "x").coalesce(1)
    df.write.format("zarr").mode("overwrite")
      .option("chunk_size", "32").option("inner_chunk_size", "8").save(url)

    // metadata declares sharding; stored objects = ceil(96/32) = 3 shards
    val meta = ZarrStore(url).readMeta("id")
    assert(Sharding.specOf(meta.codecs).isDefined, meta.sourceJson)
    assert(Sharding.specOf(meta.codecs).get.innerShape == Seq(8))

    val back = spark.read.format("zarr").load(url).orderBy("id").collect()
    assert(back.length == 96)
    assert(back(50).getLong(0) == 50L && back(50).getDouble(1) == 12.5)
  }

  test("append to a sharded store preserves the sharding layout") {
    val sp = spark; import sp.implicits._
    val url = s"$base/dsv2-append"
    (0 until 32).map(i => (i.toLong, s"r$i")).toDF("id", "s").coalesce(1)
      .write.format("zarr").mode("overwrite")
      .option("chunk_size", "16").option("inner_chunk_size", "4").save(url)
    (32 until 48).map(i => (i.toLong, s"r$i")).toDF("id", "s").coalesce(1)
      .write.format("zarr").mode("append").save(url)

    val meta = ZarrStore(url).readMeta("s")
    assert(Sharding.specOf(meta.codecs).isDefined, "append must keep sharding")
    val back = spark.read.format("zarr").load(url).orderBy("id").collect()
    assert(back.length == 48)
    assert(back.map(_.getLong(0)).toSeq == (0L until 48L))
    assert(back(40).getString(1) == "r40")
  }

  test("filter pushdown chunk-skip still works over shards") {
    val st = s"$base/objcount" // 64 int64, 4 shards of outer-16
    val df = spark.read.format("zarr").load(st).where("v >= 48")
    assert(df.count() == 16)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("pushed=") || plan.contains("PushedFilters"), plan)
  }

  test("unsigned dtypes shard correctly incl. widened fill values (uint8/uint16/uint32)") {
    // parseFill boxes unsigned fills WIDENED (uint8→Short, uint16→Int,
    // uint32→Long); fillPattern must write them at the STORED width —
    // regression test for a BufferOverflowException on absent inner chunks
    val cases = Seq(
      ("u8", "uint8", "200", 200L),
      ("u16", "uint16", "60000", 60000L),
      ("u32", "uint32", "4000000000", 4000000000L))
    cases.foreach { case (arr, dt, fillJson, fillVal) =>
      val st = ZarrStore(s"$base/uint-$arr")
      st.writeStoreRootMeta()
      val metaJson =
        s"""{
           |  "zarr_format": 3, "node_type": "array",
           |  "shape": [8], "data_type": "$dt",
           |  "chunk_grid": {"name": "regular", "configuration": {"chunk_shape": [8]}},
           |  "chunk_key_encoding": {"name": "default", "configuration": {"separator": "/"}},
           |  "fill_value": $fillJson,
           |  "codecs": [{"name":"sharding_indexed","configuration":{
           |    "chunk_shape":[2],
           |    "codecs":[{"name":"bytes","configuration":{"endian":"little"}}],
           |    "index_codecs":[{"name":"bytes","configuration":{"endian":"little"}},{"name":"crc32c"}],
           |    "index_location":"end"}}]
           |}""".stripMargin
      st.writeMeta(arr, metaJson)
      val meta = ZarrMeta.parse(arr, metaJson)
      val spec = Sharding.specOf(meta.codecs).get
      val zt = meta.dataType
      val vals: IndexedSeq[Any] = zt match {
        case ZarrType.UInt8 => (0 until 8).map(i => (i * 10).toShort)
        case ZarrType.UInt16 => (0 until 8).map(i => i * 1000)
        case _ => (0 until 8).map(i => i * 100000L)
      }
      // skip inner chunk 2 (elements 4,5) → fill value must surface
      st.writeChunk(arr, "c/0",
        Sharding.encode(zt, Seq(8), spec, vals, skipInner = Set(2)))
      val got = spark.read.format("zarr").load(s"$base/uint-$arr")
        .collect().map(r => r.get(0) match {
          case s: Short => s.toLong
          case i: Int => i.toLong
          case l: Long => l
          case o => o.asInstanceOf[Number].longValue()
        }).sorted
      val expected = ((0 until 8).filterNot(i => i == 4 || i == 5).map(i => zt match {
        case ZarrType.UInt8 => (i * 10).toLong
        case ZarrType.UInt16 => (i * 1000).toLong
        case _ => i * 100000L
      }) ++ Seq(fillVal, fillVal)).sorted
      assert(got.toSeq == expected, s"dtype $dt")
    }
  }

  test("non-dividing inner chunk shape fails with a clear error") {
    val st = ZarrStore(s"$base/baddiv")
    st.writeStoreRootMeta()
    val err = intercept[ZarrException] {
      ZarrWriter.writeArray(st, "v", ZarrType.Int64, Seq(10), Seq(5),
        (0 until 10).map(_.toLong), None,
        ZarrWriter.CodecChain.raw.sharded(Seq(3)), fillJson = "0")
    }
    assert(err.getMessage.contains("does not divide"), err.getMessage)
  }

  // ---- variable-length BINARY inner chunks (r20): the shard index
  //      addresses inner chunks by (offset, nbytes), so vlen payloads
  //      shard like fixed-width types — the big-shard multimodal layout ----

  private def blobOf(i: Int): Array[Byte] =
    Array.tabulate(i % 9)(j => ((i * 31 + j) % 251).toByte)

  test("sharded BINARY array roundtrips byte-exactly; absent inner chunks read as empty fill") {
    val st = ZarrStore(s"$base/vlenshard")
    st.writeStoreRootMeta()
    val payloads = (0 until 16).map(blobOf)
    ZarrWriter.writeArray(st, "id", ZarrType.Int64, Seq(16), Seq(8),
      (0 until 16).map(_.toLong), None,
      ZarrWriter.CodecChain.raw.sharded(Seq(2)), fillJson = "0")
    ZarrWriter.writeArray(st, "blob", ZarrType.Bytes, Seq(16), Seq(8),
      payloads, None,
      ZarrWriter.CodecChain.zstd.sharded(Seq(2)), fillJson = "null")
    val got = spark.read.format("zarr").load(s"$base/vlenshard")
      .orderBy("id").collect()
    assert(got.length == 16)
    got.zipWithIndex.foreach { case (r, i) =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("blob"), payloads(i)),
        s"payload $i")
    }

    // absent inner chunks (2 → elements 4,5 of shard 0) decode to the
    // empty payload, exactly like an absent whole chunk
    val st2 = ZarrStore(s"$base/vlenshard-fill")
    st2.writeStoreRootMeta()
    val metaJson = ZarrWriter.metaJson(ZarrType.Bytes, Seq(8), Seq(8), "null", None,
      ZarrWriter.CodecChain.zstd.sharded(Seq(2)))
    st2.writeMeta("blob", metaJson)
    val meta = ZarrMeta.parse("blob", metaJson)
    val spec = meta.shardingSpec.get
    st2.writeChunk("blob", meta.chunkKey(Array(0)),
      Sharding.encode(ZarrType.Bytes, Seq(8), spec, (0 until 8).map(blobOf),
        skipInner = Set(2)))
    val col = ChunkColumn.decode(meta, st2.readChunk("blob", meta.chunkKey(Array(0))))
    (0 until 8).foreach { i =>
      val expect = if (i == 4 || i == 5) Array.emptyByteArray else blobOf(i)
      assert(java.util.Arrays.equals(col.get(i).asInstanceOf[Array[Byte]], expect),
        s"element $i")
    }
  }

  test("DSv2 tabular write shards BinaryType via inner_chunk_size; append keeps the layout") {
    val dir = s"$base/dsv2vlen"
    val df = spark.createDataFrame(
      (0 until 40).map(i => org.apache.spark.sql.Row(i.toLong, blobOf(i))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("blob", org.apache.spark.sql.types.BinaryType))))
    df.repartition(1).write.format("zarr").mode("overwrite")
      .option("chunk_size", "8").option("inner_chunk_size", "2").save(dir)
    val meta = ZarrStore(dir).readMeta("blob")
    assert(meta.shardingSpec.isDefined, "blob array must be sharded")
    assert(meta.dataType == ZarrType.Bytes)
    val got = spark.read.format("zarr").load(dir).orderBy("id").collect()
    assert(got.length == 40)
    got.foreach { r =>
      val i = r.getAs[Long]("id").toInt
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("blob"), blobOf(i)), s"row $i")
    }
    // append reproduces the existing sharded vlen chain
    val df2 = spark.createDataFrame(
      (40 until 56).map(i => org.apache.spark.sql.Row(i.toLong, blobOf(i))).asJava,
      df.schema)
    df2.repartition(1).write.format("zarr").mode("append").save(dir)
    val all = spark.read.format("zarr").load(dir).orderBy("id").collect()
    assert(all.length == 56)
    all.foreach { r =>
      val i = r.getAs[Long]("id").toInt
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]]("blob"), blobOf(i)), s"row $i")
    }
  }

}
