package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench flag-adjudication decision table (`Bench.firstVerdict`
  * / `Bench.secondVerdict`) — the mechanism the round-10 verdict found
  * self-contradicting (q_orphans: a ×0.5 speed-up flag whose isolated
  * re-run measured ×3.05 was stamped "reproduced"). Direction awareness
  * and the error/no-baseline distinctions are contract: the artifact's
  * verdict words must never contradict its own numbers. */
class BenchVerdictSpec extends AnyFunSuite {

  test("dirOf matches the flag guard band in both directions") {
    assert(Bench.dirOf(2.01) == 1)
    assert(Bench.dirOf(2.0) == 0)   // band is strict: flag fires at >2.0
    assert(Bench.dirOf(1.0) == 0)
    assert(Bench.dirOf(0.5) == 0)   // and at <0.5
    assert(Bench.dirOf(0.49) == -1)
  }

  test("agreeing directions keep the direct verdict words") {
    assert(Bench.firstVerdict(suiteRatio = 3.0, iso = 1.0, isoRatio = 2.5)
      == "slowdown_reproduced")
    assert(Bench.firstVerdict(suiteRatio = 0.3, iso = 1.0, isoRatio = 0.4)
      == "speedup_confirmed")
  }

  test("an in-band isolated re-run is suite-context noise") {
    assert(Bench.firstVerdict(suiteRatio = 3.0, iso = 1.0, isoRatio = 1.1)
      == "suite_context_noise")
  }

  test("the q_orphans shape — flag and re-run disagreeing in direction — " +
      "is inconsistent, never 'reproduced'") {
    // r10's record: suite x0.5 (speed-up flag), isolated x3.05 (slower)
    assert(Bench.firstVerdict(suiteRatio = 0.49, iso = 2.172,
      isoRatio = 3.05) == "inconsistent")
    // and the mirror image
    assert(Bench.firstVerdict(suiteRatio = 3.0, iso = 0.1, isoRatio = 0.2)
      == "inconsistent")
  }

  test("a failed isolated re-run is isolated_run_error, not no_baseline") {
    assert(Bench.firstVerdict(suiteRatio = 3.0, iso = -1.0, isoRatio = -0.5)
      == "isolated_run_error")
    assert(Bench.secondVerdict(isoRatio = 3.0, iso2 = -1.0,
      iso2Ratio = -0.5) == "isolated_run_error")
  }

  test("missing baseline is its own marker") {
    assert(Bench.firstVerdict(suiteRatio = 3.0, iso = 1.0, isoRatio = -1.0)
      == "no_baseline")
  }

  test("two isolated runs agreeing against the suite flag say " +
      "isolated_consensus, not reproduced/confirmed") {
    // q_orphans continued: first isolated x3.05, second isolated x2.8 —
    // both slower, both contradicting the x0.5 suite flag
    assert(Bench.secondVerdict(isoRatio = 3.05, iso2 = 2.0, iso2Ratio = 2.8)
      == "slowdown_isolated_consensus")
    assert(Bench.secondVerdict(isoRatio = 0.3, iso2 = 0.1, iso2Ratio = 0.4)
      == "speedup_isolated_consensus")
  }

  test("a second run disagreeing with the first, or landing in-band, " +
      "stays inconsistent with all samples recorded") {
    assert(Bench.secondVerdict(isoRatio = 3.05, iso2 = 0.3, iso2Ratio = 0.4)
      == "inconsistent")
    assert(Bench.secondVerdict(isoRatio = 3.05, iso2 = 1.0, iso2Ratio = 1.2)
      == "inconsistent")
  }
}
