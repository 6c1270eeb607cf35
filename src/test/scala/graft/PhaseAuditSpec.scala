package graft

import graft.metrics.PhaseAudit
import org.scalatest.funsuite.AnyFunSuite

/** Pins the contamination predicate's calibration against the ACTUAL r16
  * artifact pair: the recorded contaminated run (BENCH_r16 /
  * bench_out/latest.json of that round) vs the three same-tree clean runs
  * (r16_full1–3). Every sequence below is copied verbatim from those
  * artifacts — if the bar or scatter factor moves, these cases say which
  * real runs the new calibration would re-classify. */
class PhaseAuditSpec extends AnyFunSuite {

  private val Bar = 4.5

  test("recorded-r16 wal_drain_10x is contaminated (scatter: 54.8 vs min 2.53)") {
    assert(PhaseAudit.contaminated(
      Seq(2.532, 14.939, 9.405, 54.802, 25.078),
      Seq(0.94, 0.95, 1.41, 1.11, 4.17), Bar))
  }

  test("recorded-r16 wal_drain is contaminated (load 5.54 over the bar)") {
    // scatter alone does NOT trip (0.711/0.284 = 2.5 < 3 after the
    // first-trial exemption) — the load clause carries this phase
    assert(PhaseAudit.contaminated(
      Seq(1.025, 0.497, 0.711, 0.338, 0.284),
      Seq(3.46, 3.64, 3.59, 5.54, 5.54), Bar))
  }

  test("recorded-r16 latency_floor is contaminated (loads 6.2-9.2)") {
    assert(PhaseAudit.contaminated(
      Seq(47.0, 48.0, 45.0), // per-pass async p50s (shape only)
      Seq(9.19, 8.53, 8.01, 7.45, 7.01, 6.77, 6.23), Bar))
  }

  test("clean r16_full1 wal_drain passes (first-trial JIT exemption)") {
    // first trial 0.731 is 3.0x the min — exactly the cold-start shape
    // the exemption exists for; later trials are flat, loads self-induced
    assert(!PhaseAudit.contaminated(
      Seq(0.731, 0.320, 0.270, 0.244, 0.251),
      Seq(3.05, 3.05, 3.05, 3.05, 2.89), Bar))
  }

  test("clean r16_full1 wal_drain_10x passes (worst clean scatter 2.69)") {
    assert(!PhaseAudit.contaminated(
      Seq(4.146, 1.972, 3.935, 2.111, 5.302),
      Seq(0.87, 0.88, 0.97, 0.97, 0.97), Bar))
  }

  test("clean r16_full1 live_drain_8db passes (self-load 1.77-3.14)") {
    assert(!PhaseAudit.contaminated(
      Seq(1.732, 1.752, 1.699, 1.783, 1.491),
      Seq(1.77, 2.19, 2.19, 2.19, 3.14), Bar))
  }

  test("r17 suite pass-2 transients are labeled by trialOutliers (calibration)") {
    // copied verbatim from the recorded BENCH_r17 suite_slowest_trials:
    // pass totals scattered only 1.06 (suite verdict clean) while pass 2
    // carried these per-query transients — the exact hole the per-trial
    // audit closes (r17 VERDICT #3)
    assert(PhaseAudit.trialOutliers(Seq(1.417, 11.928, 1.374)) ==
      Seq((1, 11.928, 11.928 / 1.374))) // mm_video_stream: 8.7x flagged
    assert(PhaseAudit.trialOutliers(Seq(1.220, 6.898, 1.245)) ==
      Seq((1, 6.898, 6.898 / 1.220)))   // mm_video_mjpeg: 5.7x flagged
    // mm_sim_recall's 1.9x wobble stays UNDER the calibrated 3x bar —
    // clean-run worst post-first ratios reach 2.7, so flagging it would
    // flag clean runs too
    assert(PhaseAudit.trialOutliers(Seq(1.448, 2.488, 1.287)).isEmpty)
    // flat clean trials: nothing flagged
    assert(PhaseAudit.trialOutliers(Seq(2.120, 1.395, 1.802)).isEmpty)
    // first-trial exemption: a 3.5x cold pass 1 is not an outlier
    assert(PhaseAudit.trialOutliers(Seq(3.5, 1.0, 1.1)).isEmpty)
    // disqualified entries are ignored for the min and never flagged
    assert(PhaseAudit.trialOutliers(Seq(1.0, -1.0, 4.0)) ==
      Seq((2, 4.0, 4.0)))
    assert(PhaseAudit.trialOutliers(Nil).isEmpty)
  }

  test("r18 suite pass-2 is the suiteRetryClean calibration case") {
    // the recorded BENCH_r18 suite: pass totals [167.414, 227.205,
    // 123.980] (scatter 1.83 > 1.45 fired the verdict), pass 2 carried 11
    // trial outliers (dedup_minhash_lsh 31.1×, text_bpe_pairs 16.3×…) —
    // the exact artifact r19's bounded re-pass exists for
    val r18Passes = Seq(167.414, 227.205, 123.980)
    // a retry pass that looks like the best-of-5 clean-run passes
    // (106–140 s band) against a quiet box is clean_after_retry
    assert(PhaseAudit.suiteRetryClean(131.0, r18Passes,
      retryLoad = 1.2, loadBar = 4.5, qualified = 181))
    // bar edge: 1.45 × best original pass (123.98) = 179.77
    assert(PhaseAudit.suiteRetryClean(179.0, r18Passes, 1.2, 4.5, 181))
    assert(!PhaseAudit.suiteRetryClean(181.0, r18Passes, 1.2, 4.5, 181))
    // a retry on a still-dirty box (load over the phase bar) stays
    // contaminated even when its total squeaks under the scatter bar
    assert(!PhaseAudit.suiteRetryClean(131.0, r18Passes, 5.5, 4.5, 181))
    // zero-qualified rule (r17 ADVICE, carried): a retry that measured
    // nothing must not launder the verdict
    assert(!PhaseAudit.suiteRetryClean(0.1, r18Passes, 1.2, 4.5, 0))
    // degenerate original series never divides by zero / picks a bogus bar
    assert(!PhaseAudit.suiteRetryClean(131.0, Seq(-1.0), 1.2, 4.5, 181))
    assert(!PhaseAudit.suiteRetryClean(131.0, Nil, 1.2, 4.5, 181))
  }

  test("r18 pass-2 per-query transients are labeled by trialOutliers") {
    // verbatim from the recorded BENCH_r18 artifact: dedup_lsh_recall's
    // trials (suite_slowest_trials) and dedup_minhash_lsh's flagged row
    // (suite_trial_outliers: pass 2, 4.649 s, 31.1× its 0.1495 min)
    assert(PhaseAudit.trialOutliers(Seq(2.137, 12.324, 4.337)).map(_._1) ==
      Seq(1)) // pass 2 at 5.8× flagged; pass 3's 2.03× stays under the bar
    assert(PhaseAudit.trialOutliers(Seq(0.1495, 4.649, 0.182)).head._1 == 1)
  }

  test("edge cases: empty, all-disqualified, single trial") {
    assert(!PhaseAudit.contaminated(Nil, Nil, Bar))
    assert(!PhaseAudit.contaminated(Seq(-1.0, -1.0), Seq(0.5, 0.5), Bar))
    // one qualified trial: no scatter possible, load clause still applies
    assert(!PhaseAudit.contaminated(Seq(2.0), Seq(1.0), Bar))
    assert(PhaseAudit.contaminated(Seq(2.0), Seq(9.0), Bar))
  }
}
