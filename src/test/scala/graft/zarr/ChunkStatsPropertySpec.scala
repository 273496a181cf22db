package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** The one property that makes the sidecar safe to ship: for ANY chunk
  * values and ANY supported filter tree, a stats-based skip
  * (`!mayMatch` over the chunk's true min/max) implies the
  * decode-and-test path would also skip (`!anyRowMatches`) — i.e. the
  * sidecar can only ever remove chunks that contain no matching row.
  * The converse (mayMatch but no row matches) is allowed: that is the
  * conservative slack the decode pass cleans up. Seeded-random
  * generation, same style as GeometryPropertySpec. */
class ChunkStatsPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260813L)

  private def lit(): Long = rnd.nextInt(101) - 50L

  private def tree(depth: Int): Filter = {
    val pick = if (depth <= 0) rnd.nextInt(9) else rnd.nextInt(12)
    pick match {
      case 0 => EqualTo("x", lit())
      case 1 => GreaterThan("x", lit())
      case 2 => GreaterThanOrEqual("x", lit())
      case 3 => LessThan("x", lit())
      case 4 => LessThanOrEqual("x", lit())
      case 5 => In("x", Array.fill(1 + rnd.nextInt(4))(lit(): Any))
      case 6 => IsNull("x")
      case 7 => IsNotNull("x")
      case 8 => StringStartsWith("x", lit().toString)
      case 9 => And(tree(depth - 1), tree(depth - 1))
      case 10 => Or(tree(depth - 1), tree(depth - 1))
      case _ => Not(tree(depth - 1))
    }
  }

  private def int64Column(vals: Seq[Long]): PrimColumn = {
    val bb = ByteBuffer.allocate(vals.length * 8).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach(bb.putLong)
    new PrimColumn(ZarrType.Int64, bb.array(), ByteOrder.LITTLE_ENDIAN)
  }

  test("chunkSum is the exact mathematical sum or None, never a wrapped value (2000 cases)") {
    (0 until 2000).foreach { i =>
      // mix magnitudes so some chunk sums overflow Long mid-accumulation
      val mag = if (i % 3 == 0) Long.MaxValue / 2 else 1000L
      val vals = Seq.fill(1 + rnd.nextInt(12))(
        (rnd.nextLong() % mag) * (if (rnd.nextBoolean()) 1 else -1))
      val exact = vals.map(BigInt(_)).sum
      ChunkStats.chunkSum(ZarrType.Int64, vals.map(v => v: Any)) match {
        case Some(s) => assert(BigInt(s) == exact, s"vals=$vals")
        case None =>
          // None is only legitimate when SOME prefix accumulation
          // overflows; verify the exact sum cannot be represented by
          // any left-to-right exact accumulation
          val overflows = vals.scanLeft(BigInt(0))(_ + _).exists(p =>
            p < BigInt(Long.MinValue) || p > BigInt(Long.MaxValue))
          assert(overflows, s"declined without overflow: vals=$vals")
      }
    }
  }

  test("a stats skip is always confirmed by the decode-and-test skip (2000 cases)") {
    var skips = 0
    (0 until 2000).foreach { _ =>
      val vals = Seq.fill(1 + rnd.nextInt(12))(rnd.nextInt(121) - 60L)
      val f = tree(3)
      assert(ChunkFilter.supported(f))
      val range = ChunkStats.minMax(ZarrType.Int64, vals)
        .map(r => (_: String) => Some(r))
        .getOrElse((_: String) => None)
      if (!ChunkStats.mayMatch(Seq(f), range)) {
        skips += 1
        val cols = Map("x" -> (int64Column(vals): ChunkColumn, null: Array[Int]))
        assert(!ChunkFilter.anyRowMatches(Seq(f), cols, vals.length),
          s"stats skipped a chunk with a matching row: vals=$vals filter=$f")
      }
    }
    // the property must actually have been exercised, not vacuously true
    assert(skips > 100, s"only $skips stats skips generated — generator too weak")
  }

  test("min/max fold equals brute force on random value sets") {
    (0 until 200).foreach { _ =>
      val vals = Seq.fill(1 + rnd.nextInt(20))(rnd.nextLong())
      assert(ChunkStats.minMax(ZarrType.Int64, vals).contains((vals.min, vals.max)))
    }
  }

  // ---- multilingual string stats (round 9) --------------------------------

  /** Scalar code points spanning every regime the clamp must handle:
    * ASCII, Latin-1, Cyrillic, CJK, the surrogate-gap edges U+D7FF/U+E000,
    * BMP ceiling U+FFFD/U+FFFF, and supplementary (emoji + U+10FFFF). */
  private val cpPool: Array[Int] = Array(
    'a', 'z', '0', '~', 0x7f, 0xe9, 0xfc, 0x430, 0x44f, 0x4e2d, 0x6587,
    0xd7ff, 0xe000, 0xfffd, 0xffff, 0x1f600, 0x1f9d1, 0x10000, 0x10ffff)

  private def randString(maxCps: Int): String = {
    val sb = new java.lang.StringBuilder
    (0 until rnd.nextInt(maxCps + 1)).foreach { _ =>
      sb.appendCodePoint(cpPool(rnd.nextInt(cpPool.length)))
    }
    sb.toString
  }

  test("cmp on strings is exactly Spark's UTF8String (UTF-8 binary) order (5000 pairs)") {
    import org.apache.spark.unsafe.types.UTF8String
    (0 until 5000).foreach { _ =>
      val a = randString(12)
      val b = randString(12)
      val want = Integer.signum(UTF8String.fromString(a).compareTo(UTF8String.fromString(b)))
      val got = Integer.signum(ChunkFilter.cmp(a, b))
      assert(got == want,
        s"cmp disagrees with UTF8String order: ${a.codePoints().toArray.toSeq} vs ${b.codePoints().toArray.toSeq}")
    }
  }

  test("multilingual clamped bounds bracket every value in Spark's order (1000 chunks)") {
    import org.apache.spark.unsafe.types.UTF8String
    var clamped = 0
    (0 until 1000).foreach { _ =>
      // long tails force the clamp path; short strings mix in freely
      val vals = Seq.fill(1 + rnd.nextInt(10))(
        randString(8) + (if (rnd.nextBoolean()) randString(3) * 40 else ""))
      ChunkStats.minMaxBound(ZarrType.Str, vals.map(v => v: Any)).foreach { b =>
        if (!b.exact) clamped += 1
        val lo = UTF8String.fromString(b.lo.asInstanceOf[String])
        val hi = UTF8String.fromString(b.hi.asInstanceOf[String])
        vals.foreach { v =>
          val u = UTF8String.fromString(v)
          assert(lo.compareTo(u) <= 0,
            s"lo bound above a value: lo=${b.lo} v=${v.codePoints().toArray.toSeq}")
          assert(hi.compareTo(u) >= 0,
            s"hi bound below a value: hi=${b.hi} v=${v.codePoints().toArray.toSeq}")
        }
      }
    }
    // the clamp path must actually have been exercised, not vacuously
    assert(clamped > 100, s"only $clamped clamped chunks generated — generator too weak")
  }
}
