package graft

import org.scalatest.funsuite.AnyFunSuite

/** The acceptance artifact's self-normalization math (r13 verdict order
  * 1): the hot/quiet verdict the driver's BENCH_r{N}.json now carries is
  * only as trustworthy as the ratio/mover computation behind it — pinned
  * here on constructed runs, including the exact r13 adjudication shape
  * (uniform ambient inflation vs a genuine per-query regression).
  */
class BenchSpec extends AnyFunSuite {

  test("median: odd, even (average of middles), empty") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 2.5)
    assert(Bench.median(Nil) == -1.0)
  }

  test("uniform ambient inflation: high anchor ratio, ZERO movers — the r13 signature") {
    val anchor = (1 to 20).map(i => s"q$i" -> 2.0).toMap
    // every query uniformly 1.18x — ambient load, nothing crosses the
    // 1.5x+0.5s mover bar (2.36 < 3.5)
    val secs = (1 to 20).map(i => s"q$i" -> 2.36)
    val (ratio, movers) = Bench.anchorStats(secs, anchor)
    assert(math.abs(ratio - 1.18) < 1e-9)
    assert(movers.isEmpty)
  }

  test("a genuine regression: one mover crosses the bar, median ratio stays quiet") {
    val anchor = (1 to 20).map(i => s"q$i" -> 2.0).toMap
    val secs = (1 to 19).map(i => s"q$i" -> 2.0) :+ ("q20" -> 8.0)
    val (ratio, movers) = Bench.anchorStats(secs, anchor)
    assert(ratio == 1.0) // median over 20 ratios, 19 of them 1.0
    assert(movers == Seq("q20" -> 4.0))
  }

  test("the mover bar is 1.5x PLUS 0.5s: a fast query doubling does not flap") {
    // 0.3s -> 0.7s is 2.33x but under 1.5*0.3+0.5 = 0.95s — noise floor,
    // not a mover; a slow query at the same ratio IS one
    val anchor = Map("fast" -> 0.3, "slow" -> 4.0)
    val (_, movers) = Bench.anchorStats(
      Seq("fast" -> 0.7, "slow" -> 9.4), anchor)
    assert(movers.map(_._1) == Seq("slow"))
  }

  test("new queries and errored queries are excluded from both statistics") {
    val anchor = Map("a" -> 1.0, "b" -> 1.0)
    // "new" absent from anchor; "a" errored upstream (caller drops it by
    // passing -1 — anchorStats filters non-positive)
    val (ratio, movers) = Bench.anchorStats(
      Seq("a" -> -1.0, "b" -> 1.1, "new" -> 99.0), anchor)
    assert(math.abs(ratio - 1.1) < 1e-9)
    assert(movers.isEmpty)
  }

  test("movers sort slowest-ratio first") {
    val anchor = Map("x" -> 1.0, "y" -> 1.0, "z" -> 1.0)
    val (_, movers) = Bench.anchorStats(
      Seq("x" -> 2.1, "y" -> 3.5, "z" -> 2.6), anchor)
    assert(movers.map(_._1) == Seq("y", "z", "x"))
  }

  test("empty intersection (no anchor / all new): ratio -1, no movers") {
    val (ratio, movers) = Bench.anchorStats(Seq("q" -> 1.0), Map.empty)
    assert(ratio == -1.0)
    assert(movers.isEmpty)
  }

  test("verdict: computed ratio decides, loadavg suppressed (quiet tree on a hot-looking host)") {
    // ratio 1.05 on a host whose 5-min loadavg tripped the flag — the
    // measured per-query evidence wins (the r14 back-to-back-runs case)
    assert(Bench.hostVerdictOf(1.05, hotByLoad = true) == (false, "quiet"))
    assert(Bench.hostVerdictOf(1.30, hotByLoad = false) == (true, "hot"))
  }

  test("verdict: NO computed ratio (stale/unreadable/zero-overlap anchor) falls back to loadavg (ADVICE r14)") {
    // anchorStats yields -1 when the anchor shares no query names; that
    // must NOT read as anchor-backed "quiet" on a hot host
    assert(Bench.hostVerdictOf(-1.0, hotByLoad = true) == (true, "hot"))
    assert(Bench.hostVerdictOf(-1.0, hotByLoad = false) ==
      (false, "quiet_no_anchor"))
    // ratio exactly 0 is not evidence either
    assert(Bench.hostVerdictOf(0.0, hotByLoad = true) == (true, "hot"))
  }
}
