package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression tripwire's burst adjudication — pure logic, no
  * Spark. Round 11's driver artifact carried a 13× false regression
  * (q_text_stats, all three repeats inflated by an ambient burst the
  * 20-gate sentinel never sampled); the end-of-run retime must clear such
  * bursts in-artifact and confirm real slowdowns. */
class BenchSpec extends AnyFunSuite {
  private val prior = Some(Bench.PriorBench("BENCH_rX.json",
    Map("q_a" -> 0.100, "q_b" -> 1.000, "q_c" -> 2.000, "q_d" -> 0.050),
    sentinelFirst = Some(0.322)))

  test("suspect thresholds: both the ratio and the absolute floor gate") {
    assert(Bench.exceedsPrior(1.0, 2.0))          // 2x and +1s
    assert(!Bench.exceedsPrior(0.1, 0.3))         // 3x but only +0.2s jitter
    assert(!Bench.exceedsPrior(10.0, 11.0))       // +1s but only 1.1x
    assert(!Bench.exceedsPrior(1.0, 1.0))
  }

  test("ambient burst: suspect retimes clean at the tail -> cleared, evidenced") {
    // q_b ran 2.4x slow in the main loop (burst) but retimes at prior speed
    val out = Bench.adjudicatedRegressions(
      Map("q_a" -> 0.105, "q_b" -> 2.400, "q_c" -> 1.900, "q_d" -> 0.049),
      retime = { q => assert(q == "q_b"); Some(1.050) },
      prior = prior)
    assert(out.contains(""""regressions_vs":"BENCH_rX.json""""), out)
    assert(out.contains(""""suspects":{"q_b":[1.000,2.400,1.050]}"""), out)
    assert(out.contains(""""regressions":{},"""), out) // cleared, not flagged
    // the prior sentinel rides along: the cross-round ambient anchor for
    // adjudicating a uniformly slow machine (which no in-run check sees)
    assert(out.contains(""""sentinel_prev":0.322,"""), out)
  }

  test("real regression: suspect reproduces at the tail -> confirmed") {
    val out = Bench.adjudicatedRegressions(
      Map("q_b" -> 2.400, "q_c" -> 3.600),
      retime = Map("q_b" -> 2.350, "q_c" -> 2.050).andThen(Some(_)),
      prior = prior)
    // q_b reproduces (2.35 > 1.5x + 0.25s over 1.0) -> confirmed with the
    // RETIMED value; q_c's tail read 2.05 vs prior 2.0 -> cleared
    assert(out.contains(""""suspects":{"q_b":[1.000,2.400,2.350],"q_c":[2.000,3.600,2.050]}"""), out)
    assert(out.contains(""""regressions":{"q_b":[1.000,2.350]},"""), out)
  }

  test("a failed retime keeps the suspicion (no silent clearing)") {
    val out = Bench.adjudicatedRegressions(
      Map("q_b" -> 2.400), retime = _ => None, prior = prior)
    assert(out.contains(""""regressions":{"q_b":[1.000,2.400]},"""), out)
  }

  test("clean run and no-prior-file shapes are unchanged") {
    val clean = Bench.adjudicatedRegressions(
      Map("q_a" -> 0.100, "q_b" -> 0.900),
      retime = q => fail(s"retime must not run on a clean pass: $q"),
      prior = prior)
    assert(clean.contains(""""suspects":{}""") &&
      clean.contains(""""regressions":{},"""), clean)
    assert(Bench.adjudicatedRegressions(Map("q_a" -> 9.9),
      retime = _ => None, prior = None) == "")
  }
}
