package graft.metrics

/** The bench's per-phase contamination predicate (r16 VERDICT #1), kept
  * here — not inline in the Bench main — so the calibration is pinned by
  * `PhaseAuditSpec` against the actual r16 artifact pair (the recorded
  * contaminated run vs the three same-tree clean runs).
  *
  * Two clauses, OR'd:
  *  - LOAD: any qualified trial started at 1-min load above `loadBar`.
  *    The bar is NOT the 0.5 quiet-gate threshold: a phase's own 32-core
  *    trials leave 1.5–3.6 of SELF-induced load in the 1-min average on
  *    provably clean runs, so the bar sits above clean self-load maxima
  *    (3.64 observed) and below the contaminated rows (5.5–9.2 observed).
  *  - SCATTER: any qualified trial AFTER the first with wall >
  *    `scatterFactor` × the phase min. The first trial is exempt — the
  *    un-warmed 99k headline's first trial is legitimately JIT-cold at
  *    ~3× min on clean runs.
  */
object PhaseAudit {

  /** `trials` are the phase's qualified wall-clock seconds in run order
    * (disqualified −1/NaN entries already filtered by the caller);
    * `loads` the 1-min load at each qualified trial's start. */
  def contaminated(trials: Seq[Double], loads: Seq[Double],
      loadBar: Double, scatterFactor: Double = 3.0): Boolean = {
    val ok = trials.filter(_ > 0)
    ok.nonEmpty && {
      val mn = ok.min
      ok.drop(1).exists(_ > scatterFactor * mn) ||
        loads.exists(_ > loadBar)
    }
  }

  /** Suite retry-pass verdict (r18 VERDICT #1): the suite was the one
    * phase where a transient pass tainted the round's artifact with no
    * recourse — the drains re-run once when their audit fires; the suite
    * did not because re-running 3 full passes doubles the bench. The
    * bounded middle: ONE re-pass over all queries after the quiet gate,
    * judged clean iff
    *  - at least one query qualified (the r17-ADVICE zero-qualified rule:
    *    a retry that measured nothing must not launder the verdict),
    *  - the 1-min load at retry start sits under the phase load bar
    *    (unlike mid-suite pass loads, retry start follows the quiet gate,
    *    so this prices EXTERNAL load, not suite self-load), and
    *  - the retry pass total lands within `scatterBar` × the best
    *    original pass — the same 1.45 bar the suite's own scatter clause
    *    uses (clean full runs read max/min ≤ 1.27; the r18 contaminated
    *    run read 227.2 vs best 124.0 = 1.83).
    * Merged per-query mins (min over original + retry trials) stand
    * either way — the verdict labels their provenance. */
  def suiteRetryClean(retryTotal: Double, originalPassTotals: Seq[Double],
      retryLoad: Double, loadBar: Double, qualified: Int,
      scatterBar: Double = 1.45): Boolean = {
    val ok = originalPassTotals.filter(_ > 0)
    qualified > 0 && retryLoad <= loadBar && ok.nonEmpty &&
      retryTotal <= scatterBar * ok.min
  }

  /** The SCATTER clause applied per trial (r17 VERDICT #3): which
    * post-first trials sit past `scatterFactor` × the min, as
    * (index-in-`trials`, wall, ratio) rows. The suite runs this over every
    * query's pass trials — the pass-TOTAL scatter bar cannot see a single
    * query's transient (the r17 recorded run carried `mm_video_stream` at
    * 8.7× its min in pass 2 while the pass totals scattered only 1.06).
    * First trial exempt and the bar stays the calibrated 3× — clean-run
    * worst post-first ratios reach 2.7, so a tighter bar (which would
    * also catch the r17 `mm_sim_recall` 1.9× wobble) flags clean runs. */
  def trialOutliers(trials: Seq[Double],
      scatterFactor: Double = 3.0): Seq[(Int, Double, Double)] = {
    val ok = trials.filter(_ > 0)
    if (ok.isEmpty) Seq.empty
    else {
      val mn = ok.min
      trials.zipWithIndex.drop(1).collect {
        case (t, i) if t > 0 && t > scatterFactor * mn => (i, t, t / mn)
      }
    }
  }
}
