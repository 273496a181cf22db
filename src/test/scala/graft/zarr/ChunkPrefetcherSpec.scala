package graft.zarr

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** [[ChunkPrefetcher]] — the concurrent range-prefetch window used by
  * `analyze` and the hybrid aggregate scan. The contract under test:
  * results arrive in SUBMISSION order regardless of completion order,
  * at most `depth` fetches are ever in flight, fetch failures surface
  * as the original exception at the failing item's `next()` (not
  * wrapped, not reordered), and close() is safe mid-range. */
class ChunkPrefetcherSpec extends AnyFunSuite {

  test("results arrive in submission order even when completions invert") {
    // later items complete FASTER (sleep decreasing with index)
    val pf = new ChunkPrefetcher[Int, Int](
      (0 until 16).toIndexedSeq,
      i => { Thread.sleep(math.max(0, 8 - i).toLong); i * 10 },
      depth = 4)
    try {
      val got = (0 until 16).map(_ => pf.next())
      assert(got == (0 until 16).map(_ * 10))
    } finally pf.close()
  }

  test("at most `depth` fetches run concurrently") {
    val inFlight = new AtomicInteger(0)
    val maxSeen = new AtomicInteger(0)
    val pf = new ChunkPrefetcher[Int, Int](
      (0 until 32).toIndexedSeq,
      i => {
        val now = inFlight.incrementAndGet()
        maxSeen.accumulateAndGet(now, math.max)
        Thread.sleep(2)
        inFlight.decrementAndGet()
        i
      },
      depth = 3)
    try {
      (0 until 32).foreach(i => assert(pf.next() == i))
      assert(maxSeen.get() <= 3, s"window overflowed: ${maxSeen.get()} in flight")
    } finally pf.close()
  }

  test("a fetch failure surfaces as the ORIGINAL exception at its item, after good ones") {
    val pf = new ChunkPrefetcher[Int, Int](
      (0 until 8).toIndexedSeq,
      i => if (i == 5) throw new ZarrException("boom at 5") else i,
      depth = 4)
    try {
      (0 until 5).foreach(i => assert(pf.next() == i))
      val e = intercept[ZarrException](pf.next())
      assert(e.getMessage == "boom at 5")
    } finally pf.close()
  }

  test("exhaustion is loud; close mid-range is safe and idempotent") {
    val pf = new ChunkPrefetcher[Int, Int]((0 until 3).toIndexedSeq, identity)
    assert(pf.next() == 0)
    pf.close()
    pf.close() // idempotent
    val pf2 = new ChunkPrefetcher[Int, Int](IndexedSeq(1), identity)
    try {
      assert(pf2.next() == 1)
      intercept[IllegalStateException](pf2.next())
    } finally pf2.close()
  }
}
