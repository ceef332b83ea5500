package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling-pair selection rule (ScalingBench.selectPair): probe-gated,
  * then best combined wall — pinned against the observed 2026-08-19
  * failure where a mid-leg host collapse handed the smallest combined
  * wall to a poisoned pair. */
class ScalingSelectSpec extends AnyFunSuite {
  private def pair(eff: Double, combined: Double, probes: Seq[Double], idx: Int) =
    (combined, ScalingBench.ScalingResult(eff, 500.0, 500.0 * 4 * eff,
      Nil, Nil, probes, idx, 3))

  test("a collapse-tainted pair is excluded even with the best combined wall") {
    // the real 2026-08-19 run: pair 3 won combined wall but closed on a
    // 61 Mops probe (best probe of the run 724) — must be excluded
    val all = List(
      pair(0.899, 1453, Seq(724, 545, 645), 1),
      pair(0.861, 1556, Seq(647, 539, 645), 2),
      pair(0.631, 1362, Seq(640, 656, 61), 3))
    val sel = ScalingBench.selectPair(all)
    assert(sel.pairIdx == 1)
    // full transparency: every pair is in the artifact with its gate verdict
    assert(sel.allPairsJson.contains(""""pair":3""") &&
      sel.allPairsJson.contains(""""excluded_by_probe_gate":true""") &&
      sel.allPairsJson.contains(""""eff":0.899"""))
  }

  test("a probe-INHOMOGENEOUS pair is excluded even with no collapsed probe") {
    // the committed round-4 0.55: probes 513/858/1020 — min 513 >= 0.5*1020
    // passes the collapse gate, but the host ran ~2x slower during the lo
    // leg than the hi leg, poisoning the ratio. The within-pair
    // homogeneity gate (max/min > 1.4) must exclude it; the healthy
    // 724/545/645 pair (ratio 1.33) must survive and win despite a larger
    // combined wall.
    val all = List(
      pair(0.550, 1300, Seq(513, 858, 1020), 1),
      pair(0.899, 1453, Seq(724, 545, 645), 2))
    val sel = ScalingBench.selectPair(all)
    assert(sel.pairIdx == 2)
    assert(sel.allPairsJson.contains(""""pair":1""") &&
      sel.allPairsJson.contains(""""excluded_by_probe_gate":true,"selected":false""") &&
      sel.allPairsJson.contains(""""excluded_by_probe_gate":false,"selected":true"""))
  }

  test("all pairs healthy: smallest combined wall wins") {
    val all = List(
      pair(0.85, 1500, Seq(700, 700, 700), 1),
      pair(0.90, 1400, Seq(650, 690, 710), 2))
    assert(ScalingBench.selectPair(all).pairIdx == 2)
  }

  test("all pairs tainted: falls back to combined wall instead of failing") {
    val all = List(
      pair(0.5, 2000, Seq(700, 100, 700), 1),
      pair(0.6, 1800, Seq(650, 90, 710), 2))
    assert(ScalingBench.selectPair(all).pairIdx == 2)
  }
}
