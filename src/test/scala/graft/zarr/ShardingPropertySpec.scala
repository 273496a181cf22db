package graft.zarr

import org.scalatest.funsuite.AnyFunSuite

/** Property-style roundtrips of the sharding codec over random
  * geometries: ∀ (dims, shard shape, dividing inner shape, codec chain,
  * missing-inner subset): decode(encode(vals)) == vals with fill at the
  * missing inner chunks' positions. Runs at the codec layer (no Spark
  * session) so the geometry space can be swept densely. */
class ShardingPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260812L)

  private def divisorOf(n: Int): Int = {
    val divs = (1 to n).filter(n % _ == 0)
    divs(rnd.nextInt(divs.length))
  }

  private val chains = Seq("raw" -> ZarrWriter.CodecChain.raw,
    "gzip" -> ZarrWriter.CodecChain.gzip,
    "zstd" -> ZarrWriter.CodecChain.zstd,
    "blosc" -> ZarrWriter.CodecChain.bloscLz4,
    "crc32c" -> ZarrWriter.CodecChain.crc32c)

  test("random 1-3D shard geometries roundtrip with missing inner chunks (40 cases)") {
    (0 until 40).foreach { i =>
      val ndim = 1 + rnd.nextInt(3)
      val shard = Array.fill(ndim)(1 + rnd.nextInt(8))
      val inner = shard.map(divisorOf)
      val (cname, chain) = chains(rnd.nextInt(chains.length))
      val fill = -5.0
      val metaJson = ZarrWriter.metaJson(ZarrType.Float64,
        shard.map(_.toLong).toSeq, shard.toSeq, fill.toString, None,
        chain.sharded(inner.toSeq))
      val meta = ZarrMeta.parse(s"case$i", metaJson)
      val spec = Sharding.specOf(meta.codecs).get

      val nInner = shard.zip(inner).map { case (s, c) => s / c }.product
      val missing = (0 until nInner).filter(_ => rnd.nextBoolean()).toSet
      val n = shard.product
      val vals: IndexedSeq[Any] = (0 until n).map(v => v * 1.5 + i)

      val enc = Sharding.encode(ZarrType.Float64, shard.toSeq, spec, vals, missing)
      val col = ChunkColumn.decode(meta, Some(enc))

      // expected: fill where the element's inner chunk is missing
      val grid = shard.zip(inner).map { case (s, c) => s / c }
      (0 until n).foreach { e =>
        // element coords (row-major) → inner grid index (row-major)
        var rem = e
        val coords = new Array[Int](ndim)
        var d = ndim - 1
        while (d >= 0) { coords(d) = rem % shard(d); rem /= shard(d); d -= 1 }
        var gi = 0
        d = 0
        while (d < ndim) { gi = gi * grid(d) + coords(d) / inner(d); d += 1 }
        val want: Double = if (missing(gi)) fill else e * 1.5 + i
        assert(col.get(e) == want,
          s"case $i ($cname, shard ${shard.mkString("x")}, inner ${inner.mkString("x")}): " +
            s"elem $e (inner $gi, missing=${missing(gi)})")
      }
    }
  }

  test("parallel inner-chunk decode is deterministic (64-inner shard, 20 repeats)") {
    // one shard with enough inner chunks to exercise the decode pool on
    // every repeat; identical output across repeats pins the fan-out's
    // thread safety (disjoint output regions, stateless codecs)
    val shard = Array(64 * 16)
    val inner = Array(16)
    val metaJson = ZarrWriter.metaJson(ZarrType.Float64,
      shard.map(_.toLong).toSeq, shard.toSeq, "0.0", None,
      ZarrWriter.CodecChain.bloscLz4.sharded(inner.toSeq))
    val meta = ZarrMeta.parse("par", metaJson)
    val spec = Sharding.specOf(meta.codecs).get
    val n = shard(0)
    val vals: IndexedSeq[Any] = (0 until n).map(_ * 0.25)
    val enc = Sharding.encode(ZarrType.Float64, shard.toSeq, spec, vals, Set(7, 31))
    val expect: IndexedSeq[Double] = (0 until n).map { e =>
      if (Set(7, 31)(e / 16)) 0.0 else e * 0.25
    }
    (0 until 20).foreach { rep =>
      val col = ChunkColumn.decode(meta, Some(enc))
      (0 until n).foreach(e =>
        assert(col.get(e) == expect(e), s"repeat $rep elem $e"))
    }
  }

  test("random string shard geometries roundtrip (10 cases)") {
    (0 until 10).foreach { i =>
      val len = 2 + rnd.nextInt(12)
      val innerLen = divisorOf(len)
      val metaJson = ZarrWriter.metaJson(ZarrType.Str, Seq(len.toLong), Seq(len),
        "\"F\"", None, ZarrWriter.CodecChain.gzip.sharded(Seq(innerLen)))
      val meta = ZarrMeta.parse(s"str$i", metaJson)
      val spec = Sharding.specOf(meta.codecs).get
      val nInner = len / innerLen
      val missing = (0 until nInner).filter(_ => rnd.nextBoolean()).toSet
      val vals: IndexedSeq[Any] = (0 until len).map(v => s"s$i-$v")
      val enc = Sharding.encode(ZarrType.Str, Seq(len), spec, vals, missing)
      val col = ChunkColumn.decode(meta, Some(enc))
      (0 until len).foreach { e =>
        val want = if (missing(e / innerLen)) "F" else s"s$i-$e"
        assert(col.get(e) == want, s"case $i elem $e")
      }
    }
  }
}
