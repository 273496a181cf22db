package graft.zarr

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Zarr v3 `transpose` array→array codec — the layout zarr-python emits
  * for F-order arrays. Completes the v3 core codec registry (bytes,
  * vlen-utf8, blosc, gzip, zstd, crc32c, sharding_indexed, transpose),
  * and pins the companion guarantee: a codec name this reader does NOT
  * implement is a hard metadata error, never a silent skip (the
  * garbage-decode class the r9 blosc block-shuffle fix closed). */
class TransposeSpec extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private var base: String = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("transpose-spec")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    base = Files.createTempDirectory("zarr-transpose").toString
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def specs(order: Seq[Int]): Seq[CodecSpec] = {
    val json = s"""[{"name":"transpose","configuration":{"order":[${order.mkString(",")}]}}]"""
    ZarrMeta.codecSpecs(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
  }

  // ---- permutation semantics ----

  test("2-D order [1,0]: stored layout is column-major of the chunk") {
    // A (2x3) = [[0,1,2],[3,4,5]]; transposed B (3x2) row-major = 0,3,1,4,2,5
    val perm = Codecs.transposePerm(Array(2, 3), Array(1, 0))
    assert(perm.toSeq == Seq(0, 3, 1, 4, 2, 5))
    val a = Array[Byte](0, 1, 2, 3, 4, 5)
    val b = Codecs.transposeBytes(a, perm, 1)
    assert(b.toSeq == Seq[Byte](0, 3, 1, 4, 2, 5))
    assert(Codecs.untransposeBytes(b, perm, 1).toSeq == a.toSeq)
  }

  test("property: untranspose ∘ transpose == identity over random shapes/orders/widths") {
    val gen = for {
      ndim <- Gen.choose(1, 3)
      shape <- Gen.listOfN(ndim, Gen.choose(1, 7))
      order <- Gen.const(scala.util.Random.shuffle((0 until ndim).toList))
      bw <- Gen.oneOf(1, 2, 4, 8)
    } yield (shape, order, bw)
    var seed = Seed(42L)
    (1 to 120).foreach { _ =>
      val (shape, order, bw) = gen.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      val perm = Codecs.transposePerm(shape.toArray, order.toArray)
      assert(perm.sorted.toSeq == (0 until shape.product), s"bijection $shape $order")
      val n = shape.product * bw
      val in = Array.tabulate[Byte](n)(i => (i * 31 + 7).toByte)
      val round = Codecs.untransposeBytes(Codecs.transposeBytes(in, perm, bw), perm, bw)
      assert(round.toSeq == in.toSeq, s"roundtrip $shape $order bw=$bw")
    }
  }

  test("3-D permutation matches the index-map definition") {
    // order (2,0,1): encoded dim j is input dim order(j)
    val shape = Array(2, 3, 4)
    val order = Array(2, 0, 1)
    val perm = Codecs.transposePerm(shape, order)
    val shapeB = order.map(shape) // (4,2,3)
    var b = 0
    for (k0 <- 0 until shapeB(0); k1 <- 0 until shapeB(1); k2 <- 0 until shapeB(2)) {
      // input index i with i(order(j)) = k(j): i2=k0, i0=k1, i1=k2
      val a = (k1 * shape(1) + k2) * shape(2) + k0
      assert(perm(b) == a, s"b=$b k=($k0,$k1,$k2)")
      b += 1
    }
  }

  // ---- end-to-end through the connector ----

  test("transposed 2-D store reads identically to its C-order twin (with coords + filters)") {
    val plain = ZarrStore(s"$base/latlon-plain")
    val trans = ZarrStore(s"$base/latlon-trans")
    ZarrWriter.writeLatLonStore(plain, ZarrWriter.CodecChain.bloscLz4)
    trans.writeStoreRootMeta()
    ZarrWriter.writeArray(trans, "lat", ZarrType.Float64, Seq(8), Seq(3),
      (0 until 8).map(i => 38.0 + i * 0.1), Some(Seq("lat")), ZarrWriter.CodecChain.bloscLz4)
    ZarrWriter.writeArray(trans, "lon", ZarrType.Float64, Seq(8), Seq(3),
      (0 until 8).map(i => -117.0 + i * 0.1), Some(Seq("lon")), ZarrWriter.CodecChain.bloscLz4)
    ZarrWriter.writeArray(trans, "data", ZarrType.Float64, Seq(8, 8), Seq(3, 3),
      (0 until 64).map(_.toDouble), Some(Seq("lat", "lon")),
      ZarrWriter.CodecChain.bloscLz4.transposed(Seq(1, 0)))

    val a = spark.read.format("zarr").load(s"$base/latlon-plain")
      .orderBy("lat", "lon").collect().map(_.toString).toSeq
    val b = spark.read.format("zarr").load(s"$base/latlon-trans")
      .orderBy("lat", "lon").collect().map(_.toString).toSeq
    assert(a == b && a.length == 64)
    // chunk-skip filter path sees correctly ordered values too
    val f = spark.read.format("zarr").load(s"$base/latlon-trans")
      .where("data >= 30 and data < 40").select("data")
      .collect().map(_.getDouble(0)).sorted
    assert(f.toSeq == (30 until 40).map(_.toDouble))
  }

  test("the transposed store really is stored permuted (raw interior chunk differs)") {
    val st = ZarrStore(s"$base/latlon-trans")
    val meta = st.readMeta("data")
    val raw = st.readChunk("data", meta.chunkKey(Array(0, 0))).get
    val ts = meta.dataType.byteWidth
    val plainBuf = Codecs.bytesCodecs(meta.codecs, ts).reverse
      .foldLeft(raw)((x, c) => c.decode(x))
    val bb = java.nio.ByteBuffer.wrap(plainBuf).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val stored = Array.tabulate(9)(i => bb.getDouble(i * 8))
    // chunk (0,0) of data holds rows 0..2 x cols 0..2: values {0,1,2,8,9,10,16,17,18};
    // stored column-major: 0,8,16,1,9,17,2,10,18
    assert(stored.toSeq == Seq(0.0, 8.0, 16.0, 1.0, 9.0, 17.0, 2.0, 10.0, 18.0))
  }

  test("sharded store with inner transpose roundtrips") {
    val st = ZarrStore(s"$base/sharded-trans")
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "data", ZarrType.Float64, Seq(8, 8), Seq(4, 4),
      (0 until 64).map(_.toDouble), None,
      ZarrWriter.CodecChain.bloscLz4.sharded(Seq(2, 2)).transposed(Seq(1, 0)))
    val got = spark.read.format("zarr").load(s"$base/sharded-trans")
      .select("data").collect().map(_.getDouble(0)).sorted
    assert(got.toSeq == (0 until 64).map(_.toDouble))
  }

  test("transposed string array (vlen-utf8) roundtrips") {
    val st = ZarrStore(s"$base/str-trans")
    st.writeStoreRootMeta()
    val vals = (0 until 16).map(i => s"s$i")
    ZarrWriter.writeArray(st, "s", ZarrType.Str, Seq(4, 4), Seq(2, 2),
      vals, None, ZarrWriter.CodecChain.raw.transposed(Seq(1, 0)), fillJson = "\"\"")
    val got = spark.read.format("zarr").load(s"$base/str-trans")
      .select("s").collect().map(_.getString(0)).sorted
    assert(got.toSeq == vals.sorted)
  }

  test("edge chunks stay correct under transpose (non-dividing shape)") {
    val st = ZarrStore(s"$base/edge-trans")
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "v", ZarrType.Int64, Seq(5, 7), Seq(3, 4),
      (0 until 35).map(_.toLong), None,
      ZarrWriter.CodecChain.zstd.transposed(Seq(1, 0)), fillJson = "0")
    val got = spark.read.format("zarr").load(s"$base/edge-trans")
      .select("v").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 35L))
  }

  // ---- loud rejection of what we do not implement ----

  test("unknown codec name is a hard metadata error, not a silent skip") {
    val json = ZarrWriter.metaJson(ZarrType.Float64, Seq(4), Seq(2), "0.0", None,
      ZarrWriter.CodecChain.raw)
      .replace("""{"name":"bytes","configuration":{"endian":"little"}}""",
        """{"name":"bytes","configuration":{"endian":"little"}},{"name":"bogus_lz77"}""")
    val e = intercept[ZarrException](ZarrMeta.parse("v", json))
    assert(e.getMessage.contains("bogus_lz77"))
  }

  test("multiple transpose codecs compose in list order, not first-wins") {
    def two(o1: Seq[Int], o2: Seq[Int]): Seq[CodecSpec] = {
      val json = s"""[{"name":"transpose","configuration":{"order":[${o1.mkString(",")}]}},
        {"name":"transpose","configuration":{"order":[${o2.mkString(",")}]}}]"""
      ZarrMeta.codecSpecs(new com.fasterxml.jackson.databind.ObjectMapper().readTree(json))
    }
    // encode applies t1 then t2: stored dim j = input dim o1(o2(j))
    assert(Codecs.transposeOrder(two(Seq(1, 2, 0), Seq(1, 2, 0)), 3).get.toSeq == Seq(2, 0, 1))
    // an involution composed with itself is the identity → None
    assert(Codecs.transposeOrder(two(Seq(1, 0), Seq(1, 0)), 2).isEmpty)

    // end-to-end: a hand-built chunk stored under the NET permutation
    // decodes back to row-major
    val json = s"""{
      "zarr_format": 3, "node_type": "array", "shape": [2,3,4],
      "data_type": "int8",
      "chunk_grid": {"name":"regular","configuration":{"chunk_shape":[2,3,4]}},
      "chunk_key_encoding": {"name":"default","configuration":{"separator":"/"}},
      "fill_value": 0,
      "codecs": [{"name":"transpose","configuration":{"order":[1,2,0]}},
                 {"name":"transpose","configuration":{"order":[1,2,0]}},
                 {"name":"bytes","configuration":{"endian":"little"}}]
    }"""
    val meta = ZarrMeta.parse("v", json)
    val a = Array.tabulate[Byte](24)(_.toByte)
    val stored = Codecs.transposeBytes(a, meta.transposePerm.get, 1)
    val col = ChunkColumn.decode(meta, Some(stored))
    (0 until 24).foreach(i => assert(col.get(i) == i.toByte, s"elem $i"))
  }

  test("append to a 1-D store whose chain names transpose works (identity order)") {
    val sp = spark; import sp.implicits._
    val pth = s"$base/append-1d-trans"
    val st = ZarrStore(pth)
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "v", ZarrType.Int64, Seq(8), Seq(4),
      (0L until 8L).map(identity), None,
      ZarrWriter.CodecChain.zstd.transposed(Seq(0)), fillJson = "0")
    (8L until 16L).map(Tuple1(_)).toDF("v").coalesce(1)
      .write.format("zarr").mode("append").save(pth)
    val got = spark.read.format("zarr").load(pth)
      .select("v").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (0L until 16L))
  }

  test("pre-rename 'endian' codec name is accepted as an alias of 'bytes'") {
    val st = ZarrStore(s"$base/endian-alias")
    st.writeStoreRootMeta()
    ZarrWriter.writeArray(st, "v", ZarrType.Int32, Seq(6), Seq(4),
      (0 until 6).map(i => i * 11), None, ZarrWriter.CodecChain.raw, fillJson = "0")
    val metaPath = java.nio.file.Paths.get(s"$base/endian-alias/v/zarr.json")
    val json = new String(java.nio.file.Files.readAllBytes(metaPath))
    java.nio.file.Files.write(metaPath,
      json.replace("\"name\":\"bytes\"", "\"name\":\"endian\"")
        .replace("\"name\": \"bytes\"", "\"name\": \"endian\"").getBytes)
    val got = spark.read.format("zarr").load(s"$base/endian-alias")
      .select("v").collect().map(_.getInt(0)).sorted
    assert(got.toSeq == (0 until 6).map(_ * 11))
  }

  test("transpose order must be a full permutation") {
    intercept[ZarrException](Codecs.transposeOrder(specs(Seq(0, 0)), 2))
    intercept[ZarrException](Codecs.transposeOrder(specs(Seq(1, 2)), 2))
    intercept[ZarrException](Codecs.transposeOrder(specs(Seq(0)), 2))
    // identity is legal and a no-op
    assert(Codecs.transposeOrder(specs(Seq(0, 1)), 2).isEmpty)
  }

  test("transpose alongside sharding_indexed at the same level is rejected") {
    val inner = """{"name":"sharding_indexed","configuration":{"chunk_shape":[2,2],""" +
      """"codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}}"""
    val t = """{"name":"transpose","configuration":{"order":[1,0]}}"""
    val json = s"""{
      "zarr_format": 3, "node_type": "array", "shape": [4,4],
      "data_type": "float64",
      "chunk_grid": {"name":"regular","configuration":{"chunk_shape":[4,4]}},
      "chunk_key_encoding": {"name":"default","configuration":{"separator":"/"}},
      "fill_value": 0.0,
      "codecs": [$t,$inner]
    }"""
    val e = intercept[ZarrException](ZarrMeta.parse("v", json))
    assert(e.getMessage.contains("sharding_indexed"))
  }

  test("nested sharding_indexed is rejected") {
    val nested = """{"name":"sharding_indexed","configuration":{"chunk_shape":[2,2],""" +
      """"codecs":[{"name":"sharding_indexed","configuration":{"chunk_shape":[1,1],""" +
      """"codecs":[{"name":"bytes","configuration":{"endian":"little"}}]}}]}}"""
    val json = s"""{
      "zarr_format": 3, "node_type": "array", "shape": [4,4],
      "data_type": "float64",
      "chunk_grid": {"name":"regular","configuration":{"chunk_shape":[4,4]}},
      "chunk_key_encoding": {"name":"default","configuration":{"separator":"/"}},
      "fill_value": 0.0,
      "codecs": [$nested]
    }"""
    val e = intercept[ZarrException](ZarrMeta.parse("v", json))
    assert(e.getMessage.toLowerCase.contains("nested"))
  }
}
