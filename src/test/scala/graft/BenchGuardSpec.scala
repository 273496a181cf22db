package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BENCH_BEST replacement rule. The record is the quiet-box
  * per-query comparator the round-over-round perf audit reads; these
  * pins exist because the rule has been wrong twice: r13 fixed min()
  * letting a mid-sweep-degrading run replace a quiet record, and r14's
  * unconditional registry-changed branch let the most contended sweep
  * ever recorded (worst probe 2.43) displace a probe-1.69 record. */
class BenchGuardSpec extends AnyFunSuite {

  test("no stored record: any clean sweep establishes one") {
    assert(Bench.shouldReplaceBest(None, newCal = 9.99, nQueries = 136))
  }

  test("same registry: replace only when at least as quiet") {
    val stored = Some((1.69, 136))
    assert(Bench.shouldReplaceBest(stored, newCal = 1.69, nQueries = 136))
    assert(Bench.shouldReplaceBest(stored, newCal = 1.50, nQueries = 136))
    assert(!Bench.shouldReplaceBest(stored, newCal = 1.70, nQueries = 136))
  }

  test("registry changed: reset allowed only within the quietness band") {
    val stored = Some((1.69, 134))
    // a comparably quiet box may reset a stale record (<= 1.15x)
    assert(Bench.shouldReplaceBest(stored, newCal = 1.69, nQueries = 136))
    assert(Bench.shouldReplaceBest(stored, newCal = 1.90, nQueries = 136))
    // the r14 incident: worst probe 2.43 vs stored 1.69 must NOT reset
    assert(!Bench.shouldReplaceBest(stored, newCal = 2.43, nQueries = 136))
  }
}
