package graft.zarr

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Codec-chain roundtrips (reference delegates these to the `zarrs` crate;
  * ours are hand-built — SURVEY §7.4 risk #1, so property-test them).
  * (scalatestplus isn't in the offline cache; generators are sampled
  * directly.) */
class CodecsSpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(42L)
    (0 until n).foreach { _ =>
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val payloads = Gen.oneOf(
    Gen.const(Array.empty[Byte]),
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    // highly compressible
    Gen.choose(1, 10000).map(n => Array.fill[Byte](n)(42)),
    // sequential longs shuffled-friendly
    Gen.choose(1, 1000).map { n =>
      val bb = java.nio.ByteBuffer.allocate(n * 8)
      (0 until n).foreach(i => bb.putLong(i.toLong))
      bb.array()
    })

  test("gzip roundtrip") {
    forAll(payloads) { b => assert(Codecs.Gzip(5).decode(Codecs.Gzip(5).encode(b)).sameElements(b)) }
  }

  test("zstd roundtrip") {
    forAll(payloads) { b => assert(Codecs.Zstd(3).decode(Codecs.Zstd(3).encode(b)).sameElements(b)) }
  }

  test("crc32c roundtrip + corruption detection") {
    val b = Array.tabulate[Byte](100)(_.toByte)
    val enc = Codecs.Crc32c.encode(b)
    assert(Codecs.Crc32c.decode(enc).sameElements(b))
    enc(3) = (enc(3) ^ 0xff).toByte
    intercept[ZarrException](Codecs.Crc32c.decode(enc))
  }

  test("blosc lz4 shuffle roundtrip") {
    forAll(payloads) { b =>
      val c = Codecs.Blosc(cname = "lz4", typesize = 8)
      assert(c.decode(c.encode(b)).sameElements(b))
    }
  }

  test("blosc zstd noshuffle roundtrip") {
    forAll(payloads) { b =>
      val c = Codecs.Blosc(cname = "zstd", shuffle = Codecs.Blosc.NOSHUFFLE, typesize = 4)
      assert(c.decode(c.encode(b)).sameElements(b))
    }
  }

  test("blosc incompressible data → memcpy form") {
    val rnd = new scala.util.Random(7)
    val b = Array.fill[Byte](4096)(rnd.nextInt().toByte)
    val c = Codecs.Blosc(cname = "lz4", shuffle = Codecs.Blosc.NOSHUFFLE, typesize = 1)
    val enc = c.encode(b)
    assert(c.decode(enc).sameElements(b))
  }

  test("byte shuffle/unshuffle inverse") {
    forAll2(Gen.choose(1, 64), Gen.choose(1, 200)) { (ts: Int, n: Int) =>
      val b = Array.tabulate[Byte](ts * n)(i => (i * 31).toByte)
      assert(Codecs.Blosc.byteUnshuffle(Codecs.Blosc.byteShuffle(b, ts), ts).sameElements(b))
    }
  }

  test("vlen-utf8 roundtrip") {
    forAll(Gen.listOf(Gen.alphaNumStr)) { ss =>
      val a = ss.toArray
      assert(ChunkColumn.decodeVlenUtf8(ChunkColumn.encodeVlenUtf8(a)).sameElements(a))
    }
  }
}
