package graft

import graft.operators.Routing
import graft.source.wal.{WalFixture, WalLog}
import graft.streaming.{MultiSlot, StreamingPipeline}
import graft.streaming.MultiSlot.SlotSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, concat, lit, max, min, pmod, when}
import java.nio.file.{Files, Paths}

/** Benchmark main (driver contract): one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology:
  *  - `noop` sink writes force full column computation (a bare count() lets
  *    Catalyst prune the serialization/hash work out of the plan)
  *  - one warm-up pass at sf0.001 amortizes JIT + codegen before timing
  *  - `wal_drain` is the CDC headline: events rendered as pgoutput WAL
  *    (setup, untimed, DISTRIBUTED — no driver collect, so the render holds
  *    at any SF), then timed decode → convert → route → serialize → sink
  *    drain through the streaming source in large micro-batches — the
  *    reference's backlog-drain workload (tests/load/README.md). Per-batch
  *    p50/p99 latency rides the listener. `wal_drain_{2,4}slot` drain the
  *    same backlog split across N slots (the scale-out axis) with per-slot
  *    confirmed-LSN isolation asserted; `wal_drain_wire` drains it through
  *    the real wire producer (CRC32C RecordBatches, murmur2, flush-barrier
  *    acks) against the scripted in-process broker, with the delivered
  *    (topic, lsn) set checked against the file-mode sinks'.
  *  - suite trials are INTERLEAVED: 3 round-robin passes over all queries,
  *    min per query — a minutes-long contention window on this box hits all
  *    queries equally instead of corrupting one query's min-of-3
  *  - `wal_drain_10x`: min-of-3 ~1M-event drains (10× replicated backlog,
  *    shifted ids) — the at-scale design point; excluded from the suite total
  *  - `latency_floor_ms`: per-batch wall-clock at trigger=5 ms with 1-event
  *    arrivals — the micro-batch floor quoted next to the reference's <10 ms
  *    push-latency claim
  *  - GRAFT_BENCH_SCALE=N replicates the event backlog N× (shifted ids) for
  *    a larger drain without new fixtures; GRAFT_BENCH_10X=0 skips the 10×
  *    point.
  *  - `live_drain`: where postgres binaries exist, a REAL `wal_level=logical`
  *    server is booted, a 99k-row backlog generated server-side, and the
  *    retained WAL drained over genuine CopyBoth through the wire client +
  *    spooler — the apples-to-apples point against the reference's
  *    real-server load stand. Runs FIRST-IN-PROCESS at fixed trial counts
  *    (5 each for headline and the 10× point) with all trials + a load-average
  *    guard recorded in the artifact. GRAFT_BENCH_LIVE=0 skips it.
  */
object Bench {
  /** Wire-channel wrapper that accounts wall time blocked in `read()` —
    * i.e. waiting on the walsender's logical decode + network. Used by the
    * 10× live point so the artifact carries the server-side share of every
    * recorded trial (the LiveDrainProfile finding, now recorded per-run
    * instead of asserted from a one-off profile). */
  private final class TimedReadChannel(
      inner: graft.source.postgres.CopyBothChannel)
      extends graft.source.postgres.CopyBothChannel {
    var readNanos = 0L
    override def read(): Array[Byte] = {
      val t0 = System.nanoTime()
      val m = inner.read()
      readNanos += System.nanoTime() - t0
      m
    }
    override def write(msg: Array[Byte]): Unit = inner.write(msg)
    override def close(): Unit = inner.close()
  }

  /** Best-effort recursive delete of a per-trial temp dir (children before
    * parents; failures ignored — cleanup must never fail a trial). */
  private def rmRf(dir: String): Unit =
    try {
      val root = Paths.get(dir)
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try {
          import scala.jdk.CollectionConverters._
          walk.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach { p =>
              try Files.deleteIfExists(p)
              catch { case _: java.io.IOException => () }
            }
        } finally walk.close()
      }
    } catch { case _: Throwable => () }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // Object-agg hash capacity (r19): the engine's typed-imperative
      // aggregates (TopK heaps, MinOrd/MaxOrd) carry O(k)-bounded buffers
      // (tens of bytes-to-~2 KB each), but Spark's default
      // objectHashAggregate fallback threshold (128 in-memory keys) demotes
      // them to sort-based on any high-cardinality group — re-introducing
      // exactly the per-group sort the heap form exists to avoid. 64k keys
      // x ~2 KB worst-case heap = ~128 MB per task upper bound, scale-
      // independent (buffer size is bounded by k, not data); env-overridable
      // for A/B (GRAFT_OBJ_AGG_FALLBACK).
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        sys.env.getOrElse("GRAFT_OBJ_AGG_FALLBACK", "65536"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runToNoop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // GRAFT_BENCH_SUITE=0 skips the per-query suite (drain-focused
    // iteration); the driver's full run keeps the default.
    val runSuite = sys.env.getOrElse("GRAFT_BENCH_SUITE", "1") != "0"
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // Per-workload failure REASONS for the artifact: three rounds of bare
    // -1.0 trials proved stderr alone does not survive the driver's tail
    // window. Every catch that disqualifies a trial ALSO records
    // class+message here; the artifact carries them under "errors".
    val errs = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.Buffer[String]]
    def recMsg(tag: String, msg: String): Unit = {
      val m = if (msg.length > 240) msg.take(240) + "…" else msg
      val b = errs.getOrElseUpdate(tag, scala.collection.mutable.Buffer.empty)
      if (b.size < 8) b += m // bounded: the artifact is tail-window-sized
    }
    def recErr(tag: String, e: Throwable): Unit =
      recMsg(tag, s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    // Process-CPU clock (r14 VERDICT #1/#2: the live/latency tier drifted
    // +16–35% and the wal_drain_10x outlier survived the load gate — both
    // with benign gc/load/disk rows, so the recorded variables weren't the
    // cause). Per-trial Δcpu NEXT TO Δwall is the missing discriminator:
    // wall ≫ cpu moving alone says the box starved the process (scheduler,
    // page cache, CPU frequency); cpu and wall moving TOGETHER says the
    // client itself did more work. JMX, zero deps.
    def cpuNanos(): Long =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean => b.getProcessCpuTime
        case _ => -1L
      }
    def fmt3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // One environment row per qualified trial: the r12–r14 attribution
    // lesson is that every headline point needs these or its next swing is
    // a post-hoc hunt. cpu_s/wall_s span the SAME window (trial start →
    // trial end, including per-trial fixture setup/cleanup — the ratio is
    // what discriminates, not the absolute).
    final case class EnvRow(gcMs: Long, load: Double, diskFreeGb: Double,
        cpuS: Double, wallS: Double, srvCpuS: Double = -1.0) {
      def json: String =
        s"""{"gc_ms":$gcMs,"load":${fmt3(load)},""" +
        s""""disk_free_gb":${fmt3(diskFreeGb)},"cpu_s":${fmt3(cpuS)},""" +
        s""""wall_s":${fmt3(wallS)}""" +
        (if (srvCpuS >= 0) s""","srv_cpu_s":${fmt3(srvCpuS)}""" else "") +
        "}"
    }
    // SERVER-side CPU clock for the live points (r15): the client cpu_s
    // sits flat at ~4.3 s while live_drain_10x wall moves 5.4→6.2 s across
    // rounds — the drain is ~90% read-wait, so the moving part is the
    // OUT-OF-PROCESS walsender. Per-trial Δcpu of the postmaster's whole
    // process tree (utime+stime of every live descendant, plus
    // cutime/cstime so reaped walsenders aren't lost) closes the
    // attribution triangle: client cpu names the client, server cpu names
    // the server, and neither moving while wall moves names the box.
    lazy val clkTck: Double =
      try {
        import scala.sys.process._
        Seq("getconf", "CLK_TCK").!!.trim.toDouble
      } catch { case _: Throwable => 100.0 }
    def procTreeCpuTicks(root: Long): Long = {
      import scala.jdk.CollectionConverters._
      val ls = Files.list(Paths.get("/proc"))
      val rows =
        try ls.iterator().asScala
          .filter(_.getFileName.toString.forall(_.isDigit))
          .flatMap { p =>
            try {
              val stat = Files.readString(p.resolve("stat"))
              // comm may contain spaces/parens: parse after the LAST ')'
              val f = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
              // fields (1-based in proc(5)): 4 ppid, 14 utime, 15 stime,
              // 16 cutime, 17 cstime → offsets 1, 11, 12, 13, 14 here
              Some((p.getFileName.toString.toLong, f(1).toLong,
                f(11).toLong + f(12).toLong + f(13).toLong + f(14).toLong))
            } catch { case _: Throwable => None }
          }.toVector
        finally ls.close()
      val children = rows.groupBy(_._2)
      val ticks = rows.map(r => r._1 -> r._3).toMap
      val seen = scala.collection.mutable.Set.empty[Long]
      var acc = 0L
      var frontier = List(root)
      while (frontier.nonEmpty) {
        val h = frontier.head; frontier = frontier.tail
        if (seen.add(h)) {
          acc += ticks.getOrElse(h, 0L)
          frontier = children.getOrElse(h, Vector.empty)
            .map(_._1).toList ::: frontier
        }
      }
      acc
    }
    def srvCpuSDelta(pid: Option[Long], before: Long): Double = pid match {
      case Some(p) =>
        try (procTreeCpuTicks(p) - before) / clkTck
        catch { case _: Throwable => -1.0 }
      case None => -1.0
    }

    // -------- live drain: a REAL walsender backlog over the wire ----------
    // Runs FIRST-IN-PROCESS (before the suite warm-up fills the heap): the
    // r7 live numbers swung 167-416k ev/s across rounds with "contention"
    // as the unmeasured explanation; a fresh-process run at a fixed trial
    // count plus a recorded load average turns that into data. The
    // reference's headline (127,486 ev/s, tests/load/README.md) is measured
    // against a real postgres; this is the apples-to-apples point: boot a
    // real wal_level=logical server (where binaries exist), create the slot
    // FIRST, generate a 99k-row backlog server-side (set-based INSERT — the
    // reference load generator's shape,
    // tests/load/workload/workload_generator.py:27-60, ~128-byte payloads),
    // then START_REPLICATION and time the drain of the retained WAL through
    // CopyBoth into the engine's segment files — genuine walsender, genuine
    // pgoutput, our wire client and spooler. (Wire → spool is the ingest
    // half; the Spark-side decode of the spooled segments is what
    // `wal_drain` times.)
    var liveDrainEvents = 0L
    val liveTrialsRec = scala.collection.mutable.Buffer.empty[Double]
    val live10TrialsRec = scala.collection.mutable.Buffer.empty[Double]
    val live2dbTrialsRec = scala.collection.mutable.Buffer.empty[Double]
    val live4dbTrialsRec = scala.collection.mutable.Buffer.empty[Double]
    val live8dbTrialsRec = scala.collection.mutable.Buffer.empty[Double]
    // r17 (r16 VERDICT #6): split-CLUSTER rung — 2 independent clusters
    // × 4 databases, the single-cluster shared-WAL ceiling's answer
    val live2x4TrialsRec = scala.collection.mutable.Buffer.empty[Double]
    // server-ceiling accounting for the 10× point (r11 VERDICT #1): the
    // drain is ~90% blocked in walsender decode, so the honest bar is the
    // MEASURED ceiling, not a fixed constant — predicted = events ÷ the
    // same-run single-slot decode rate; verdict = measured ≤ 1.15×predicted
    val live10ReadWaitPct = scala.collection.mutable.Buffer.empty[Double]
    // per-trial environment for the live 10× point, symmetric with
    // wal_drain_10x_env: the live band swings 4.7–6.5 s across runs and
    // read-wait alone says "server" without saying WHY — gc/load/disk per
    // trial make the next swing attributable from the artifact
    val live10Env = scala.collection.mutable.Buffer.empty[EnvRow]
    // r13 VERDICT #4: live_drain_2db/4db drifted +6–10 % with nothing
    // recorded to attribute it — only the 10× points carried env fields.
    // Symmetric per-qualified-trial rows. r14 VERDICT #1 then flagged the
    // exact inverse asymmetry: the 2db/4db points sat FLAT while every
    // env-LESS point in the tier (live_drain, wal_drain, the floors)
    // drifted +16–35% unattributably — so r15 extends env rows to ALL of
    // them (liveEnv below, walEnv/floorEnv in the drain/floor sections).
    val live2dbEnv = scala.collection.mutable.Buffer.empty[EnvRow]
    val live4dbEnv = scala.collection.mutable.Buffer.empty[EnvRow]
    val live8dbEnv = scala.collection.mutable.Buffer.empty[EnvRow]
    val live2x4Env = scala.collection.mutable.Buffer.empty[EnvRow]
    val liveEnv = scala.collection.mutable.Buffer.empty[EnvRow]
    var live10Predicted = -1.0
    var live10BestPct = -1.0
    var live10BestClientS = -1.0
    var live10MedianClientS = -1.0
    var live10Ceiling = "unavailable"
    // committed cross-run baseline for the 10× live drain's CLIENT-absolute
    // seconds (wall − walsender read-wait): recorded best-trial values are
    // 0.65–0.84 s across BENCH_r12/r13 — see the gate comment below
    val Live10ClientBaselineS = 0.70
    def loadAvg(): Double =
      try Files.readString(Paths.get("/proc/loadavg")).split(" ")(0).toDouble
      catch { case _: Throwable => -1.0 }
    def diskFreeGb(): Double =
      try Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
        .toFile.getUsableSpace / 1e9
      catch { case _: Throwable => -1.0 }
    // Run one trial under full env accounting. Load is sampled at trial
    // START (the conditions the trial ran under, not the load it induced);
    // gc/cpu/wall are deltas over the trial window.
    def envTrial(run: => Double, srvPid: Option[Long] = None)
        : (Double, EnvRow) = {
      val g0 = gcMs(); val l = loadAvg()
      // a failed BEFORE sample must yield the -1 "absent" sentinel, not a
      // 0-tick baseline (r15 ADVICE: baseline 0 + a successful END sample
      // would report the postmaster tree's lifetime CPU as the trial's
      // delta, silently poisoning the attribution rows)
      val s0 = srvPid.flatMap(p =>
        try Some(procTreeCpuTicks(p)) catch { case _: Throwable => None })
      val c0 = cpuNanos(); val w0 = System.nanoTime()
      val t = run
      (t, EnvRow(gcMs() - g0, l, diskFreeGb(),
        if (c0 < 0) -1.0 else (cpuNanos() - c0) / 1e9,
        (System.nanoTime() - w0) / 1e9,
        s0.map(b => srvCpuSDelta(srvPid, b)).getOrElse(-1.0)))
    }
    // Quiet-box gate, shared by the live phase and (since r14, per r13
    // VERDICT #3) the WAL 10× phase: wait up to `budgetS` for 1-min load
    // below `thresh`, returning (waited s, load at exit, pass|breach). A
    // breach never skips the phase — the artifact carries the verdict so
    // the reader weighs the numbers instead of discovering the load
    // post-hoc. Most of what the gate drains mid-run is SELF-induced load
    // from the previous phase's 32-core trials decaying out of the 1-min
    // average.
    def waitQuiet(thresh: Double, budgetS: Int): (Double, Double, String) = {
      val t0 = System.nanoTime()
      while (loadAvg() >= thresh &&
          (System.nanoTime() - t0) / 1e9 < budgetS)
        Thread.sleep(5000)
      val waited = (System.nanoTime() - t0) / 1e9
      val l = loadAvg()
      (waited, l, if (l >= 0 && l < thresh) "pass" else "breach")
    }
    val loadThresh =
      sys.env.getOrElse("GRAFT_BENCH_LOAD_THRESH", "0.5").toDouble
    val loadWaitBudgetS =
      sys.env.getOrElse("GRAFT_BENCH_LOAD_WAIT_S", "180").toInt
    // ---- per-phase contamination audit (r16 VERDICT #1/#2) ----
    // The recorded BENCH_r16 landed on a box under external load 6–9 and
    // every drain point regressed vs three same-tree clean runs; the load
    // guards only gate phase START, so mid-run contamination was priced by
    // the env rows but gated nothing. Each drain phase now carries a
    // verdict and ONE bounded retry. Two clauses, both calibrated against
    // the recorded-r16 (contaminated) vs r16_full1-3 (clean) artifacts:
    //  - LOAD: any trial starting at 1-min load > contamLoadBar. The bar
    //    is NOT 2× the 0.5 guard threshold — a phase's own 32-core trials
    //    leave 1.5–3.6 of SELF-induced load in the 1-min average on
    //    provably clean runs (wal_drain env 2.8–3.6, 8db 1.5–3.2, floors
    //    up to 3.5), so a 1.0 bar would flag every clean run. Observed
    //    separation: clean maxima ≤3.64, contaminated rows 5.5–9.2 —
    //    bar 4.5 splits them with margin on both sides.
    //  - SCATTER: any trial AFTER the first (the 99k headline's first
    //    trial is legitimately JIT-cold at ~3× min) with wall > 3× the
    //    phase min. Clean-run worst ratios: 2.7 (wal 10×), 1.5 (99k);
    //    contaminated: 5.9–21.7 (10× trials [2.53, 14.9, 9.4, 54.8,
    //    25.1]).
    // A contaminated attempt re-runs ONCE after the quiet gate; headline
    // policy: a clean retry stands alone, both-contaminated keeps the
    // min over all trials WITH the verdict labeling it. Every attempt's
    // trials/env rows stay in the artifact.
    // r18: the 4.5 bar is calibrated on sf0.1 phases whose sub-second
    // trials let self-load decay between trials. A scale>1 drain
    // saturates every core for its whole 12-19 s trial, so each
    // post-first trial STARTS at 1-min self-load 15-20 and the clause
    // reads the workload itself as contamination (observed labeling the
    // r18 100x rung). r19 (r18 ADVICE): disabling the clause outright
    // (r18's 1e9 bar) also blinded the audit to GENUINE external
    // contention at scale — another 32-core process adds ~cpus to the
    // 1-min average on top of any self-load. At scale>1 the bar is now
    // normalized by core count (cpus/2): observed 100×-rung self-load
    // tops out at 4-6 between trials (README r18), well under 16, while
    // a competing saturating process pushes past it; the artifact's
    // contam_load_bar records whichever bar applied.
    val benchScale = sys.env.getOrElse("GRAFT_BENCH_SCALE", "1").toInt
    val contamLoadBar = sys.env.get("GRAFT_BENCH_CONTAM_LOAD_BAR")
      .map(_.toDouble)
      .getOrElse(if (benchScale > 1) cpus.toDouble / 2 else 4.5)
    // (phase, verdict, attempts): verdict ∈ clean | clean_after_retry |
    // contaminated | audit_error; verdict-only phases (no retry) append
    // directly with attempts=1
    val phaseAudits =
      scala.collection.mutable.Buffer.empty[(String, String, Int)]
    def phaseContaminated(trials: Seq[Double], envs: Seq[EnvRow]): Boolean =
      graft.metrics.PhaseAudit.contaminated(
        trials, envs.map(_.load), contamLoadBar)
    // Runs one phase attempt (the closure records its own trials/env rows
    // and sets results(tag) from ITS trials); `dirty` from the closure
    // forces the retry for phase-specific reasons (a non-converged
    // warm-up). Exceptions inside trial loops are already per-trial
    // isolated; a whole-attempt throw records audit_error and rethrows to
    // the phase's existing outer handler.
    // `onRescue` fires when BOTH attempts are contaminated and the min-of-
    // all-trials rescue replaced the headline: phases whose side verdicts
    // price "the same trial the artifact reports" (the live-10× ceiling)
    // re-derive them from the rescued trial there (r17 ADVICE — the rescue
    // could report attempt 1's min while the ceiling priced attempt 2's).
    def auditPhase(tag: String, onRescue: Double => Unit = _ => ())(
        attempt: () => (Seq[Double], Seq[EnvRow], Boolean)): Unit = {
      val (t1, e1, d1) =
        try attempt()
        catch { case e: Throwable =>
          phaseAudits += ((tag, "audit_error", 1)); throw e }
      if (!(d1 || phaseContaminated(t1, e1))) {
        phaseAudits += ((tag, "clean", 1))
        return
      }
      System.err.println(s"[bench] $tag attempt 1 CONTAMINATED " +
        s"(load bar $contamLoadBar / wall >3× min / dirty=$d1) — " +
        "one bounded retry after the quiet gate")
      waitQuiet(loadThresh, loadWaitBudgetS)
      val (t2, e2, d2) =
        try attempt()
        catch { case e: Throwable =>
          phaseAudits += ((tag, "audit_error", 2)); throw e }
      // a retry with ZERO qualified trials is NOT clean (r17 ADVICE): the
      // headline would silently remain attempt 1's contaminated number
      // while the verdict read clean_after_retry — mislabeling which
      // attempt the artifact reports. Keep it contaminated so the verdict
      // implies the headline's provenance (the min-of-all rescue below
      // still applies).
      val c2 = d2 || t2.filter(_ > 0).isEmpty || phaseContaminated(t2, e2)
      phaseAudits += ((tag, if (c2) "contaminated" else "clean_after_retry", 2))
      if (c2) {
        // both attempts contaminated: rescue the min over ALL trials —
        // the verdict labels the number, nothing is hidden. Only phases
        // whose tag IS a results entry (the drains); the floor/ann
        // phases keep their own last-attempt headline vars.
        val all = (t1 ++ t2).filter(_ > 0)
        if (all.nonEmpty && results.contains(tag)) {
          results(tag) = all.min
          onRescue(all.min)
        }
      }
      System.err.println(s"[bench] $tag retry verdict: " +
        s"${phaseAudits.last._2}")
    }
    var wal10LoadWaitS = 0.0; var wal10LoadBefore = -1.0
    var wal10LoadVerdict = "skipped"
    // run-level disk accounting: the r12 wal_drain_10x regression was
    // 25 GB of cross-round tmpdir accumulation — start/end free-GB in the
    // artifact makes that class visible without shell archaeology
    val diskFreeStart = diskFreeGb()
    var liveLoadBefore = -1.0; var liveLoadAfter = -1.0
    var liveLoadWaitS = 0.0; var liveLoadVerdict = "skipped"
    val runLive = sys.env.getOrElse("GRAFT_BENCH_LIVE",
      sys.env.getOrElse("GRAFT_BENCH_DRAIN", "1")) != "0"
    if (runLive && graft.source.postgres.PgServerHarness.binariesPresent) {
      import graft.source.postgres.{PgServerHarness, ReplicationSpooler, WireBootstrap}
      import graft.config.StreamDef
      import graft.model.ChangeEvent
      // Load-average GATE (r8's recorded artifact ran at before=2.12 against
      // the stated <0.5 idle criterion — numbers still cleared baseline, but
      // the artifact contradicted the protocol). Wait up to
      // GRAFT_BENCH_LOAD_WAIT_S (default 180 s) for 1-min load < threshold,
      // recording the wait; if the box never goes idle, the run proceeds and
      // the artifact carries verdict "breach" so the reader weighs the
      // numbers accordingly instead of discovering the load post-hoc.
      val (lw, ll, lv) = waitQuiet(loadThresh, loadWaitBudgetS)
      liveLoadWaitS = lw; liveLoadBefore = ll; liveLoadVerdict = lv
      System.err.println(
        f"[bench] live_drain load gate: waited $liveLoadWaitS%.0f s, " +
          f"load=$liveLoadBefore%.2f (threshold $loadThresh) → $liveLoadVerdict")
      PgServerHarness.start() match {
        case None =>
          System.err.println("[bench] live_drain skipped: server boot failed")
          recMsg("live_drain", "server boot failed")
        case Some(h) => try {
          // sampled around every live trial: Δcpu of the postmaster's
          // whole process tree, the server leg of the attribution triangle
          val srvPid = h.serverPid
          val admin = h.session()
          admin.simpleQuery("CREATE TABLE public.bench_records(" +
            "id bigint PRIMARY KEY, account_id bigint, amount double precision, " +
            "status text, payload text, created_at timestamptz)")
          admin.simpleQuery(
            "ALTER TABLE public.bench_records REPLICA IDENTITY FULL")
          val s = h.session()
          val boot = WireBootstrap.bootstrap(s, "graft_bench_slot",
            "graft_bench_pub",
            Seq(StreamDef("bench_records", "public.bench_records",
              Seq("insert"), "cdc.bench")),
            confirmedLsn = 0L, emit = _ => (), flushDelivery = () => ())
          val n = 99000
          // server-side set-based inserts in ~10k-row transactions
          // (BATCH_SIZE=10,000 in the reference's load parameters)
          (0 until n by 10000).foreach { lo =>
            admin.simpleQuery("INSERT INTO public.bench_records " +
              s"SELECT i, i % 1000, (i % 100000) / 100.0, 'active', " +
              s"repeat('x', 100), now() FROM " +
              s"generate_series(${lo + 1}, ${math.min(lo + 10000, n)}) AS g(i)")
          }
          val endLsn = ChangeEvent.lsnValue(admin.simpleQuery(
            "SELECT pg_current_wal_lsn() AS lsn").single("lsn").get)
          s.close() // the bootstrap session; each trial opens its own
          // FIXED 5 trials (was 3), re-streaming the SAME retained backlog
          // from the consistent point (confirmed_flush never advances: trial
          // spool dirs carry no confirmed LSN, so the status updates report
          // 0 and the slot keeps the WAL). All trials land in the artifact;
          // the headline is the min (the reference's own committed-baseline
          // methodology), the median is the honesty number.
          // the whole trial body is wrapped so the spool dir (70 MB at the
          // 99k point, ~750 MB at 10×) is deleted per trial — the same
          // leftover class as the r12-root-caused livepg data dirs, and
          // deletion sits strictly after the timed window
          def oneTrial(endAt: Long, expect: Int, tag: String): Double = {
            val walDir = Files.createTempDirectory("graft-bench-live").toString
            try oneTrialIn(walDir, endAt, expect, tag)
            finally rmRf(walDir)
          }
          def oneTrialIn(walDir: String, endAt: Long, expect: Int,
              tag: String): Double = {
            // the previous trial's socket close releases the slot
            // ASYNCHRONOUSLY server-side; a back-to-back START_REPLICATION
            // can land while the old walsender still holds it ("slot is
            // active for PID …") — bounded retry instead of failing the
            // trial (observed once per ~10 clean-box runs)
            def openChannel(attempt: Int = 0): graft.source.postgres.SocketCopyBothChannel = {
              val sess = h.session()
              try sess.startReplication("graft_bench_slot",
                "graft_bench_pub", ChangeEvent.lsnText(boot.startLsn),
                readTimeoutMs = 1000)
              catch {
                case e: Exception if attempt < 50 && e.getMessage != null &&
                    e.getMessage.contains("is active for") =>
                  // close the failed attempt's session BEFORE retrying —
                  // retries would otherwise leak up to 50 open connections
                  try sess.close() catch { case _: Throwable => () }
                  Thread.sleep(100); openChannel(attempt + 1)
                case e: Throwable =>
                  try sess.close() catch { case _: Throwable => () }
                  throw e
              }
            }
            // the 10× point gets read-wait accounting (server-ceiling share
            // recorded per trial); the 99k headline stays unwrapped — even a
            // ~1% timing overhead would be visible on a 0.5 s point
            val timed =
              if (tag == "live_drain_10x") Some(new TimedReadChannel(openChannel()))
              else None
            val ch = timed.getOrElse(openChannel())
            val sp = new ReplicationSpooler(ch, walDir)
            val t0 = System.nanoTime()
            val deadline = t0 + 300L * 1000000000L
            // pumpOnce, not pump(): the end condition must run per message,
            // or the drain "ends" only after a full read-timeout of silence
            // and the timing absorbs that idle tail. DELIVERY gate: a
            // logical walsender's keepalive walEnd can run ahead of the
            // data it has actually sent (see ReplicationWire.lastReceivedLsn
            // caveat), so the timed drain gates on insertFrames — every
            // expected insert on the wire — with the LSN only as a
            // fast-path co-condition; the post-hoc spool count below stays
            // as the off-path double check.
            while ((sp.insertFrames < expect ||
                sp.lastReceivedLsn < endAt) && System.nanoTime() < deadline)
              sp.pumpOnce()
            val secs = (System.nanoTime() - t0) / 1e9
            sp.flush()
            // honesty check (off the timed path): every insert really spooled
            val nIns = WalLog.read(walDir, 0L, Long.MaxValue)
              .count(f => f.payload.nonEmpty && f.payload(0) == 'I')
            sp.close()
            if (nIns < expect) {
              System.err.println(
                s"[bench] $tag WARNING: spooled $nIns of $expect inserts")
              recMsg(tag, s"trial disqualified: spooled $nIns of $expect inserts")
              Double.NaN
            } else {
              timed.foreach(t =>
                live10ReadWaitPct += 100.0 * t.readNanos / (secs * 1e9))
              secs
            }
          }
          // per-qualified-trial env rows (r14 VERDICT #1: this point's
          // 0.425→0.552 band-disjoint drift carried no fields to attribute)
          auditPhase("live_drain") { () =>
            val envA = scala.collection.mutable.Buffer.empty[EnvRow]
            val trials = Seq.fill(5) {
              val (t, env) = envTrial(oneTrial(endLsn, n, "live_drain"), srvPid)
              if (!t.isNaN) { liveEnv += env; envA += env }
              t
            }.filterNot(_.isNaN)
            if (trials.nonEmpty) {
              liveTrialsRec ++= trials
              val secs = trials.min
              val med = trials.sorted.apply(trials.size / 2)
              results("live_drain") = secs
              liveDrainEvents = n
              System.err.println(
                f"[bench] live_drain: $n events over the real wire in " +
                  f"$secs%.2f s min / $med%.2f s median = ${n / secs}%.0f " +
                  f"ev/s min of ${trials.size} trials " +
                  f"[${trials.map(t => f"$t%.3f").mkString(", ")}]")
            }
            (trials, envA.toSeq, false)
          }
          // ---- 10× live point: ~1M-row backlog through the same wire ----
          // FIXED 5 trials (was 1 — the single r7 trial is what made the
          // 1.70× swing unexplainable). LiveDrainProfile instrumentation
          // shows identical back-to-back trials swing 2× with gc=0, steal=0,
          // idle load and a 400+ MB/s disk — host-level variance the guest
          // cannot see — so the min needs enough trials to land in the true
          // capability band (~300k ev/s observed). Generation is server-side
          // set-based SQL (the reference's BATCH_SIZE discipline), untimed.
          if (sys.env.getOrElse("GRAFT_BENCH_LIVE_10X", "1") != "0") try {
            val n10 = 999000
            (n until (n + n10) by 111000).foreach { lo =>
              admin.simpleQuery("INSERT INTO public.bench_records " +
                s"SELECT i, i % 1000, (i % 100000) / 100.0, 'active', " +
                s"repeat('x', 100), now() FROM " +
                s"generate_series(${lo + 1}, ${lo + 111000}) AS g(i)")
            }
            val end10 = ChangeEvent.lsnValue(admin.simpleQuery(
              "SELECT pg_current_wal_lsn() AS lsn").single("lsn").get)
            val total10 = n + n10
            // both-contaminated rescue: the ceiling verdict must price the
            // SAME trial the rescued headline reports (r17 ADVICE) — the
            // global live10TrialsRec / live10ReadWaitPct arrays are index-
            // aligned per QUALIFIED trial across both attempts, so the
            // rescued min's read-wait share is recoverable by index.
            auditPhase("live_drain_10x", onRescue = rescuedMin => {
              val i = live10TrialsRec.indexOf(rescuedMin)
              if (i >= 0 && i < live10ReadWaitPct.size) {
                live10BestPct = live10ReadWaitPct(i)
                live10BestClientS = rescuedMin * (1.0 - live10BestPct / 100.0)
                live10Ceiling =
                  if (live10BestPct >= 85.0 ||
                    live10BestClientS <= 1.5 * Live10ClientBaselineS) "pass"
                  else "miss"
              } else live10Ceiling = "unavailable_after_rescue"
            }) { () =>
            val envA = scala.collection.mutable.Buffer.empty[EnvRow]
            // read-wait rows from THIS attempt only: oneTrialIn appends to
            // the global live10ReadWaitPct, so the ceiling index math
            // below slices from this base
            val rwBase = live10ReadWaitPct.size
            val t10 = Seq.fill(5) {
              // env rows are recorded for QUALIFIED trials only (r13
              // ADVICE: a NaN-disqualified trial got an env row but no
              // trials/read-wait row, so the arrays lost the index
              // alignment that attribution-by-index depends on)
              val (t, env) = envTrial(
                oneTrial(end10, total10, "live_drain_10x"), srvPid)
              if (!t.isNaN) { live10Env += env; envA += env }
              t
            }.filterNot(_.isNaN)
            val rwAttempt = live10ReadWaitPct.drop(rwBase).toIndexedSeq
            if (t10.nonEmpty) {
              live10TrialsRec ++= t10
              val secs10 = t10.min
              val med10 = t10.sorted.apply(t10.size / 2)
              results("live_drain_10x") = secs10
              // the bar is the MEASURED server ceiling (r11 VERDICT #1),
              // not a fixed constant — and it is measured IN THIS TRIAL,
              // not extrapolated: the per-trial read()-wait share prices
              // the walsender's decode directly, and the verdict gates the
              // CLIENT's share of wall-clock (wall − read-wait ≤ 15%). A
              // miss means the client regressed; the server moving is just
              // the read-wait number moving. (`predicted` = events ÷ the
              // same run's 99k headline rate stays recorded as the naive
              // cross-scale extrapolation — measured to UNDERESTIMATE by
              // ~15–25% because a ~1M-event WAL span no longer sits in
              // server buffers the way the 99k span does, which is exactly
              // why the recorded bar is same-trial, not extrapolated.)
              results.get("live_drain") match {
                case Some(liveMin) if liveMin > 0 && liveDrainEvents > 0 =>
                  live10Predicted = total10.toDouble * liveMin / liveDrainEvents
                case _ => ()
              }
              // the verdict prices the SAME trial the artifact reports
              // (r12 VERDICT #3 / ADVICE: gating on the MAX share across
              // trials let a single server-bound outlier mask a client
              // regression in the recorded-min trial) — qualified trials
              // append to live10ReadWaitPct in order, so index-of-min in
              // t10 is the recorded trial's read-wait share.
              // TWO-CLAUSE gate (first recorded run of the best-trial gate
              // exposed this): the min trial is often the trial whose
              // SERVER ran fastest, and a faster server mechanically
              // inflates the client's SHARE of wall-clock even when the
              // client's absolute seconds didn't move — a share-only bar
              // flags exactly the best runs. So the verdict passes iff the
              // min trial's client share ≤ 15% OR its client ABSOLUTE
              // seconds (wall − read-wait) ≤ 1.5× a COMMITTED cross-run
              // baseline (r13 ADVICE: the first cut compared against the
              // SAME run's median client absolute, which a uniform client
              // regression moves in lockstep with the min — self-
              // referential, detects only an anomalous trial). Baseline
              // provenance: recorded artifacts put the best-trial client
              // absolute at 0.65 s (BENCH_r13) with ~0.68 s medians and
              // 0.84 s as the worst best-trial observed (the r13 false-
              // alarm run) — 0.70 s is the committed band center, and
              // 1.5× (1.05 s) is the regression bar a real client change
              // crosses while host variance does not. Both absolutes stay
              // recorded next to the shares and the baseline is in the
              // artifact, so a future bar change is itself auditable.
              live10BestPct =
                if (rwAttempt.isEmpty) -1.0
                else rwAttempt(t10.indexOf(secs10))
              val clientAbs = t10.zip(rwAttempt)
                .map { case (w, p) => w * (1.0 - p / 100.0) }
              live10BestClientS =
                if (clientAbs.isEmpty) -1.0 else clientAbs(t10.indexOf(secs10))
              live10MedianClientS =
                if (clientAbs.isEmpty) -1.0
                else clientAbs.sorted.apply(clientAbs.size / 2)
              live10Ceiling =
                if (rwAttempt.isEmpty) "no_trials"
                else if (live10BestPct >= 85.0 ||
                  live10BestClientS <= 1.5 * Live10ClientBaselineS) "pass"
                else "miss"
              System.err.println(
                f"[bench] live_drain_10x: $total10 events over the real " +
                  f"wire in $secs10%.2f s min / $med10%.2f s median = " +
                  f"${total10 / secs10}%.0f ev/s min of ${t10.size} trials " +
                  f"[${t10.map(t => f"$t%.3f").mkString(", ")}]; read-wait " +
                  f"[${live10ReadWaitPct.map(p => f"$p%.0f%%").mkString(", ")}]" +
                  f" → ceiling $live10Ceiling on the min trial's " +
                  f"$live10BestPct%.1f%% share / $live10BestClientS%.2f s " +
                  f"client-absolute (median $live10MedianClientS%.2f s " +
                  f"recorded; share ≤15%% OR absolute ≤1.5×committed " +
                  f"${Live10ClientBaselineS}%.2f s baseline; naive " +
                  f"99k-extrapolated $live10Predicted%.2f s recorded as " +
                  f"informational)")
            }
            (t10, envA.toSeq, false)
            }
          } catch { case e: Throwable =>
            System.err.println(s"[bench] live_drain_10x failed: ${e.getMessage}")
            recErr("live_drain_10x", e)
          }
          // ---- database-sharded live point: the scale answer to the ----
          // ---- measured single-walsender decode bottleneck          ----
          // LiveDrainProfile shows the live drain is ~90% blocked in
          // channel.read(): server-side logical decode is single-threaded
          // per walsender. Slots of the SAME database cannot split that
          // work — every slot decodes the whole WAL and publications only
          // filter the OUTPUT — but WAL records of ANOTHER database are
          // skipped BEFORE tuple decode, so sharding ingest by database
          // hands each walsender a stream that is mostly fast-skips.
          // Here: the 10x backlog split across two databases (549k rows
          // each, same cluster WAL), drained CONCURRENTLY by two
          // independent wire sessions; wall time ≈ max of two ~half
          // decodes, and aggregate ev/s ≈ 2x the single-sender ceiling.
          // This is the deployment shape for >200k ev/s per cluster: shard
          // by database, one slot each — graft's per-slot checkpoint
          // isolation (wal_drain_4slot, MultiSlotSpec) already carries it
          // client-side.
          // Generalized N-database shard drain. The 10× backlog is split
          // across N databases (same cluster WAL), drained CONCURRENTLY by
          // N independent wire sessions; wall time ≈ max of N ~1/N-sized
          // decodes, aggregate ev/s ≈ N× the single-sender ceiling — until
          // the shared WAL read itself saturates, which is exactly what the
          // 2-vs-4 rung pair measures (r11 VERDICT #5: the >200k ev/s
          // deployment claim deserved a second data point).
          def dbShardDrain(nShards: Int, perShard: Int, tag: String,
              trialsRec: scala.collection.mutable.Buffer[Double],
              envRec: scala.collection.mutable.Buffer[EnvRow])
              : Unit = try {
            val dbPrefix = s"graft_shard${nShards}db"
            val shards = (0 until nShards).map { i =>
              val db = s"${dbPrefix}_$i"
              admin.simpleQuery(s"CREATE DATABASE $db")
              val adm = h.session(db)
              adm.simpleQuery("CREATE TABLE public.bench_records(" +
                "id bigint PRIMARY KEY, account_id bigint, " +
                "amount double precision, status text, payload text, " +
                "created_at timestamptz)")
              adm.simpleQuery(
                "ALTER TABLE public.bench_records REPLICA IDENTITY FULL")
              val bsess = h.session(db)
              val boot = WireBootstrap.bootstrap(bsess, s"${dbPrefix}_slot_$i",
                s"${dbPrefix}_pub_$i",
                Seq(StreamDef("bench_records", "public.bench_records",
                  Seq("insert"), "cdc.bench")),
                confirmedLsn = 0L, emit = _ => (), flushDelivery = () => ())
              (0 until perShard by 111000).foreach { lo =>
                adm.simpleQuery("INSERT INTO public.bench_records " +
                  s"SELECT i, i % 1000, (i % 100000) / 100.0, 'active', " +
                  s"repeat('x', 100), now() FROM generate_series(" +
                  s"${lo + 1}, ${math.min(lo + 111000, perShard)}) AS g(i)")
              }
              bsess.close(); adm.close()
              (db, s"${dbPrefix}_slot_$i", s"${dbPrefix}_pub_$i",
                boot.startLsn)
            }
            // LSNs are cluster-wide: one end pointer gates every sender
            val endAll = ChangeEvent.lsnValue(admin.simpleQuery(
              "SELECT pg_current_wal_lsn() AS lsn").single("lsn").get)
            def openShard(db: String, slot: String, pub: String,
                startLsn: Long, attempt: Int = 0)
                : graft.source.postgres.SocketCopyBothChannel = {
              val sess = h.session(db)
              try sess.startReplication(slot, pub,
                ChangeEvent.lsnText(startLsn), readTimeoutMs = 1000)
              catch {
                case e: Exception if attempt < 50 && e.getMessage != null &&
                    e.getMessage.contains("is active for") =>
                  try sess.close() catch { case _: Throwable => () }
                  Thread.sleep(100)
                  openShard(db, slot, pub, startLsn, attempt + 1)
                case e: Throwable =>
                  try sess.close() catch { case _: Throwable => () }
                  throw e
              }
            }
            def shardTrial(): Double = {
              // channels open BEFORE the clock: the trial times the drain,
              // not slot-handoff retries. Spoolers accumulate in a buffer
              // that the finally ALWAYS closes and cleans (r11 ADVICE: a
              // mid-open throw leaked the already-open shard's channel and
              // kept its slot active into the next trial; exists()
              // short-circuited cleanup on the first short shard)
              val pumps = scala.collection.mutable.Buffer
                .empty[(ReplicationSpooler, String)]
              try {
                shards.foreach { case (db, slot, pub, startLsn) =>
                  val walDir =
                    Files.createTempDirectory(s"graft-bench-$tag").toString
                  pumps += ((new ReplicationSpooler(
                    openShard(db, slot, pub, startLsn), walDir), walDir))
                }
                val t0 = System.nanoTime()
                val deadline = t0 + 300L * 1000000000L
                val threads = pumps.map { case (sp, _) =>
                  val t = new Thread(() => {
                    while ((sp.insertFrames < perShard ||
                        sp.lastReceivedLsn < endAll) &&
                        System.nanoTime() < deadline)
                      sp.pumpOnce()
                  }, s"$tag-pump")
                  t.start(); t
                }
                threads.foreach(_.join())
                val secs = (System.nanoTime() - t0) / 1e9
                // honesty check off the timed path — a FULL pass over every
                // shard (never short-circuit: cleanup is in the finally)
                val shorts = pumps.map { case (sp, walDir) =>
                  sp.flush()
                  val nIns = WalLog.read(walDir, 0L, Long.MaxValue)
                    .count(f => f.payload.nonEmpty && f.payload(0) == 'I')
                  if (nIns < perShard) {
                    recMsg(tag,
                      s"trial disqualified: shard spooled $nIns of $perShard")
                    true
                  } else false
                }
                if (shorts.contains(true)) Double.NaN else secs
              } finally pumps.foreach { case (sp, walDir) =>
                try sp.close() catch { case _: Throwable => () }
                rmRf(walDir)
              }
            }
            // per-trial fault isolation: one failed open/drain records its
            // reason and the next trial still runs. Env rows (gc delta,
            // load at trial START, disk free) only for QUALIFIED trials so
            // the env array stays index-aligned with the trials array.
            auditPhase(tag) { () =>
            val envA = scala.collection.mutable.Buffer.empty[EnvRow]
            val ts = Seq.fill(5) {
              val (t, env) = envTrial(
                try shardTrial()
                catch { case e: Throwable => recErr(tag, e); Double.NaN },
                srvPid)
              if (!t.isNaN) { envRec += env; envA += env }
              t
            }.filterNot(_.isNaN)
            if (ts.nonEmpty) {
              trialsRec ++= ts
              val best = ts.min
              val med = ts.sorted.apply(ts.size / 2)
              results(tag) = best
              System.err.println(
                f"[bench] $tag: ${nShards * perShard} events over $nShards " +
                  f"db-sharded walsenders in $best%.2f s min / $med%.2f s " +
                  f"median = ${nShards * perShard / best}%.0f ev/s aggregate, " +
                  f"min of ${ts.size} trials " +
                  f"[${ts.map(t => f"$t%.3f").mkString(", ")}]")
            }
            (ts, envA.toSeq, false)
            }
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $tag failed: ${e.getMessage}")
            recErr(tag, e)
          }
          if (sys.env.getOrElse("GRAFT_BENCH_LIVE_2DB", "1") != "0")
            dbShardDrain(2, 549000, "live_drain_2db", live2dbTrialsRec,
              live2dbEnv)
          if (sys.env.getOrElse("GRAFT_BENCH_LIVE_4DB", "1") != "0")
            dbShardDrain(4, 274500, "live_drain_4db", live4dbTrialsRec,
              live4dbEnv)
          // r14 VERDICT #6: the README asserted ">4 shards should split
          // clusters" from the 2db/4db curve alone — the 8db rung makes
          // the saturation claim recorded data (expect sublinear ~4–5×:
          // every walsender still reads the WHOLE cluster WAL, so the
          // shared WAL scan bounds the curve as nShards grows). Same
          // 1.098M-event backlog split 8 ways; max_replication_slots was
          // raised in PgServerHarness for the 15 slots a full run creates.
          if (sys.env.getOrElse("GRAFT_BENCH_LIVE_8DB", "1") != "0")
            dbShardDrain(8, 137250, "live_drain_8db", live8dbTrialsRec,
              live8dbEnv)
          // r17 (r16 VERDICT #6): the split-CLUSTER rung. The 2db→4db→8db
          // curve measured shared-WAL-scan saturation (4→8 buys only
          // 1.17–1.4×: every walsender still reads the WHOLE cluster WAL
          // and fast-skips other databases' records); the README's
          // conclusion — ">4 shards should split CLUSTERS" — becomes
          // recorded data here: the SAME 1.098M-event backlog split across
          // TWO independent PG clusters × 4 databases each, drained by 8
          // concurrent wire sessions. Each cluster's WAL holds only HALF
          // the backlog, so its 4 walsenders scan half as many bytes — the
          // headroom the single-cluster 8db rung cannot have. This is the
          // >4-shard deployment shape: shard by database within a cluster,
          // then split clusters.
          if (sys.env.getOrElse("GRAFT_BENCH_LIVE_2X4", "1") != "0")
            PgServerHarness.start() match {
              case None =>
                System.err.println(
                  "[bench] live_drain_2x4 skipped: second cluster boot failed")
                recMsg("live_drain_2x4", "second cluster boot failed")
              case Some(h2) => try {
                val tag = "live_drain_2x4"
                val perShard = 137250
                val admin2 = h2.session()
                try {
                  val clusters = IndexedSeq((h, admin), (h2, admin2))
                  val shards = clusters.zipWithIndex.flatMap {
                    case ((hc, adm), c) => (0 until 4).map { i =>
                      val db = s"graft_x4c${c}_$i"
                      adm.simpleQuery(s"CREATE DATABASE $db")
                      val a2 = hc.session(db)
                      a2.simpleQuery("CREATE TABLE public.bench_records(" +
                        "id bigint PRIMARY KEY, account_id bigint, " +
                        "amount double precision, status text, payload text, " +
                        "created_at timestamptz)")
                      a2.simpleQuery(
                        "ALTER TABLE public.bench_records REPLICA IDENTITY FULL")
                      val bs = hc.session(db)
                      val boot2 = WireBootstrap.bootstrap(bs,
                        s"graft_x4c${c}_slot_$i", s"graft_x4c${c}_pub_$i",
                        Seq(StreamDef("bench_records", "public.bench_records",
                          Seq("insert"), "cdc.bench")),
                        confirmedLsn = 0L, emit = _ => (),
                        flushDelivery = () => ())
                      (0 until perShard by 111000).foreach { lo =>
                        a2.simpleQuery("INSERT INTO public.bench_records " +
                          "SELECT i, i % 1000, (i % 100000) / 100.0, " +
                          "'active', repeat('x', 100), now() FROM " +
                          s"generate_series(${lo + 1}, " +
                          s"${math.min(lo + 111000, perShard)}) AS g(i)")
                      }
                      bs.close(); a2.close()
                      (c, db, s"graft_x4c${c}_slot_$i",
                        s"graft_x4c${c}_pub_$i", boot2.startLsn)
                    }
                  }
                  // end pointers are per CLUSTER — LSNs are cluster-local
                  val ends = clusters.map { case (_, adm) =>
                    ChangeEvent.lsnValue(adm.simpleQuery(
                      "SELECT pg_current_wal_lsn() AS lsn").single("lsn").get)
                  }
                  def openX(c: Int, db: String, slot: String, pub: String,
                      startLsn: Long, attempt: Int = 0)
                      : graft.source.postgres.SocketCopyBothChannel = {
                    val sess = clusters(c)._1.session(db)
                    try sess.startReplication(slot, pub,
                      ChangeEvent.lsnText(startLsn), readTimeoutMs = 1000)
                    catch {
                      case e: Exception if attempt < 50 &&
                          e.getMessage != null &&
                          e.getMessage.contains("is active for") =>
                        try sess.close() catch { case _: Throwable => () }
                        Thread.sleep(100)
                        openX(c, db, slot, pub, startLsn, attempt + 1)
                      case e: Throwable =>
                        try sess.close() catch { case _: Throwable => () }
                        throw e
                    }
                  }
                  def x4Trial(): Double = {
                    val pumps = scala.collection.mutable.Buffer
                      .empty[(ReplicationSpooler, String, Int)]
                    try {
                      shards.foreach { case (c, db, slot, pub, startLsn) =>
                        val walDir = Files
                          .createTempDirectory(s"graft-bench-$tag").toString
                        pumps += ((new ReplicationSpooler(
                          openX(c, db, slot, pub, startLsn), walDir),
                          walDir, c))
                      }
                      val t0 = System.nanoTime()
                      val deadline = t0 + 300L * 1000000000L
                      val threads = pumps.map { case (sp, _, c) =>
                        val t = new Thread(() => {
                          while ((sp.insertFrames < perShard ||
                              sp.lastReceivedLsn < ends(c)) &&
                              System.nanoTime() < deadline)
                            sp.pumpOnce()
                        }, s"$tag-pump")
                        t.start(); t
                      }
                      threads.foreach(_.join())
                      val secs = (System.nanoTime() - t0) / 1e9
                      val shorts = pumps.map { case (sp, walDir, _) =>
                        sp.flush()
                        val nIns = WalLog.read(walDir, 0L, Long.MaxValue)
                          .count(f => f.payload.nonEmpty && f.payload(0) == 'I')
                        if (nIns < perShard) {
                          recMsg(tag, s"trial disqualified: shard spooled " +
                            s"$nIns of $perShard")
                          true
                        } else false
                      }
                      if (shorts.contains(true)) Double.NaN else secs
                    } finally pumps.foreach { case (sp, walDir, _) =>
                      try sp.close() catch { case _: Throwable => () }
                      rmRf(walDir)
                    }
                  }
                  auditPhase(tag) { () =>
                    val envA = scala.collection.mutable.Buffer.empty[EnvRow]
                    // srv_cpu_s tracks cluster A's postmaster tree only
                    // (envTrial takes one pid); cluster B's decode cost is
                    // the same backlog shape on an identical server
                    val ts = Seq.fill(5) {
                      val (t, env) = envTrial(
                        try x4Trial()
                        catch { case e: Throwable =>
                          recErr(tag, e); Double.NaN },
                        srvPid)
                      if (!t.isNaN) { live2x4Env += env; envA += env }
                      t
                    }.filterNot(_.isNaN)
                    if (ts.nonEmpty) {
                      live2x4TrialsRec ++= ts
                      val best = ts.min
                      val med = ts.sorted.apply(ts.size / 2)
                      results(tag) = best
                      System.err.println(
                        f"[bench] $tag: ${8 * perShard} events over 2 " +
                          f"clusters × 4 db-sharded walsenders in $best%.2f s" +
                          f" min / $med%.2f s median = " +
                          f"${8 * perShard / best}%.0f ev/s aggregate, min " +
                          f"of ${ts.size} trials " +
                          f"[${ts.map(t => f"$t%.3f").mkString(", ")}]")
                    }
                    (ts, envA.toSeq, false)
                  }
                } finally admin2.close()
              } catch { case e: Throwable =>
                System.err.println(s"[bench] live_drain_2x4 failed: ${e.getMessage}")
                recErr("live_drain_2x4", e)
              } finally h2.stop()
            }
          admin.close()
        } catch { case e: Throwable =>
          System.err.println(s"[bench] live_drain failed: ${e.getMessage}")
          recErr("live_drain", e)
        } finally h.stop()
      }
      liveLoadAfter = loadAvg()
      System.err.println(
        f"[bench] live_drain load-avg guard: before=$liveLoadBefore%.2f " +
          f"after=$liveLoadAfter%.2f (32 cores; >4 shades the numbers)")
    }


    // ---------------- CDC drain workloads ----------------
    // The reference's headline: steady-state backlog drain
    // (tests/load/README.md measures a 70 s drain of a pre-built WAL
    // backlog, excluding process startup).
    var latencyP50 = 0L; var latencyP99 = 0L
    val walTrialsRec = scala.collection.mutable.Buffer.empty[Double]
    val wal10TrialsRec = scala.collection.mutable.Buffer.empty[Double]
    // Per-trial environment for the 10× WAL point (r12 VERDICT #1: its
    // recorded min regressed 2.9× with the bench code unchanged and the
    // artifact carried nothing to attribute it — root-caused to ~25 GB of
    // accumulated graft-livepg-* data dirs that PgServerHarness.stop()
    // never deleted, i.e. exactly the disk-state suspect class). Each
    // trial records (gc_ms delta, 1-min load avg, tmpdir free GB) so the
    // next swing is attributable from the artifact alone.
    val wal10Env = scala.collection.mutable.Buffer.empty[EnvRow]
    // r15: UNTIMED warm-up drains before the recorded 10× trials. The
    // cpu-vs-wall rows attributed the r14 "outlier" class to client JIT
    // warm-up — cpu and wall fall TOGETHER across trials (47.7 → 32.1
    // cpu-s as wall fell 9.6 → 3.6 s in the r15 local run) — so the
    // warm-up transient belongs OUTSIDE the recorded band; its times are
    // still artifact fields, nothing hidden. r16 (r15 VERDICT #2): ONE
    // warm-up demonstrably did not reach steady state — the recorded r15
    // trials still descended through trial 4 ([17.2, 5.2, 3.7, 2.2, 2.4]
    // with cpu_s falling 418 → 28 in lockstep) — so the warm-up now
    // REPEATS until the untimed drain lands within 15 % of its
    // predecessor (cap 3), and the recorded band starts at steady state.
    val wal10WarmupTrials = scala.collection.mutable.Buffer.empty[Double]
    // per-warm-up process-CPU seconds — the convergence signal (r17):
    // JIT warm-up is cpu falling; flat cpu with scattering wall is box
    // noise, not cold code
    val wal10WarmupCpuS = scala.collection.mutable.Buffer.empty[Double]
    var wal10WarmupS = -1.0
    // r17 (r16 VERDICT #2): the warm-up loop's outcome is a recorded
    // verdict (the r16 loop exhausted its cap without converging and the
    // phase recorded anyway); reflects the LAST attempt when retried
    var wal10WarmupConverged = false
    // r15: the headline wal_drain point gets the same rows (it drifted
    // 0.247→0.270 in the r14 tier-wide shift with nothing to attribute)
    val walEnv = scala.collection.mutable.Buffer.empty[EnvRow]
    // r19 (r18 VERDICT #3): the single-slot headline gets the same
    // CPU-converged warm-up the 10× point got in r17 — the r18 recorded
    // trials read [0.68, 0.328, 0.268, …] (trial 1 cold-JIT by 2.5×) and
    // the recorded min breathed 0.224–0.291 across runs with trial-1 JIT
    // state; the warm-up makes the recorded min measure the tree
    val walWarmupTrials = scala.collection.mutable.Buffer.empty[Double]
    val walWarmupCpuS = scala.collection.mutable.Buffer.empty[Double]
    var walWarmupConverged = false
    var drainEvents = 0L
    var drainEvents10 = 0L
    var floorP50 = 0L; var floorP99 = 0L
    var floorSyncP50 = 0L; var floorSyncP99 = 0L
    var floorWireP50 = 0L; var floorWireP99 = 0L
    val walInsuiteTrialsRec = scala.collection.mutable.Buffer.empty[Double]
    // GRAFT_BENCH_DRAIN=0 skips the drain workloads cleanly (suite-focused
    // iteration); the driver's full run keeps the default.
    val runDrain = sys.env.getOrElse("GRAFT_BENCH_DRAIN", "1") != "0"
    // insuite=false: the full headline pass, run BEFORE the suite on a fresh
    // heap (the standalone protocol's conditions). insuite=true: a 3-trial
    // headline-only re-measurement AFTER the suite, recorded as
    // wal_drain_insuite so heap-history drift is data in the artifact.
    def drainWorkloads(insuite: Boolean): Unit = {
      val hdLabel = if (insuite) "wal_drain_insuite" else "wal_drain"
      try {
      val scale = sys.env.getOrElse("GRAFT_BENCH_SCALE", "1").toInt
      val ev0 = WalFixture.eventsUs(spark, sfDir)
      // replicate with shifted ids for scale > 1 (same schema, same op mix;
      // LSNs stay unique because they derive from event_id)
      val idSpan = {
        val r = ev0.agg(min("event_id"), max("event_id")).head()
        r.getLong(1) - r.getLong(0) + 1
      }
      def mkEv(s: Int) = (0 until s).map { k =>
        if (k == 0) ev0
        else ev0.withColumn("event_id", col("event_id") + k * idSpan)
      }.reduce(_ unionByName _)
      val ev = mkEv(scale)
      val bounds = ev.agg(min("event_id"), max("event_id")).head()
      val (minId, maxId) = (bounds.getLong(0), bounds.getLong(1))
      val primeCut = minId + 999 // ~1000 events absorb stream startup
      drainEvents = ev.count() - 1000

      /** Distributed WAL render: range-partition by event_id and write one
        * segment per partition straight from the executors — the driver
        * never holds the backlog (the old collect() render capped the bench
        * at driver memory). Executors write to a shared-visible dir (same
        * box here; DFS on a cluster). Each segment re-announces its
        * relations (fresh `seen` per segment) — required by the reader's
        * segment pruning, as a walsender does per session. Segment index =
        * range-partition id, so file order follows LSN order. */
      def renderRange(src: DataFrame, walDir: String, lo: Long, hi: Long,
          firstSeg: Int, nSegs: Int): Unit = {
        src.filter(col("event_id").between(lo, hi))
          .repartitionByRange(nSegs, col("event_id"))
          .sortWithinPartitions("event_id")
          .foreachPartition { (it: Iterator[Row]) =>
            if (it.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val seen = scala.collection.mutable.Set.empty[String]
              val frames = it.flatMap { r =>
                WalFixture.frames(WalFixture.evFromRow(r), seen)
              }
              // STAGED, not live: executor tasks complete in arbitrary order
              // while the primed query's admission scan polls continuously —
              // r17's recorded wal_drain_10x short deliveries were segments
              // made visible BELOW the already-advanced scan cursor (k+1
              // renamed before k), which the resume listing drops forever.
              WalLog.write(Paths.get(walDir, f"${firstSeg + pid}%08d.stg"), frames)
            }
          }
        // publish in ascending name order once ALL tasks are done — readers
        // observe a gap-free log prefix at every instant (off the timed path)
        WalLog.publishStaged(walDir)
      }

      // -------- single-slot drain (the baseline-comparable headline) -----
      val metrics = new graft.metrics.GraftMetrics
      val listener = new graft.metrics.GraftQueryListener(metrics)
      spark.streams.addListener(listener)
      // The headline drains deliver through the DSv2 frames sink with async
      // progress tracking — the Kafka-FAITHFUL delivery stand-in: framed
      // append + epoch flush barrier, the IO shape of a broker produce,
      // with restart/redelivery pinned in FramesSinkSpec. Async moves only
      // the offset/commit-log bookkeeping off the critical path; every
      // batch's DATA still commits synchronously inside the epoch. The
      // pre-r8 parquet stand-in (a columnar write the reference's Kafka
      // produce never pays) continues as the `wal_drain_parquet` series for
      // cross-round comparability; GRAFT_BENCH_SINK=parquet restores it as
      // the headline.
      // Fixture-truth delivered-set size (r17 VERDICT #1): the expected
      // distinct (topic, lsn) count derives from the GENERATOR — one routed
      // frame per (event × matching stream), computed by the SAME broadcast
      // routing join the pipeline runs, over the events frame itself. LSNs
      // are unique per event and every fixture stream owns its own topic,
      // so the routed pair count IS the delivered distinct count. This is
      // the reference load stand's check-gaps method (expected from the
      // generator, never from a prior run): the old first-trial anchor
      // could not say WHICH trial was right — a short first trial would
      // have disqualified every complete one.
      val expectedByBacklog =
        scala.collection.mutable.Map.empty[(Long, Long), Long]
      def expectedFrames(src: DataFrame): Long = Routing.route(
        src.select(
          concat(lit("public."), col("event_type")).as("resource"),
          when(pmod(col("event_id"), lit(10)) < 6, lit("INSERT"))
            .when(pmod(col("event_id"), lit(10)) < 9, lit("UPDATE"))
            .otherwise(lit("DELETE")).as("op")),
        Routing.streamsDF(spark, Routing.fixtureStreams)).count()
      def oneDrain(src: DataFrame, lo: Long, hi: Long, cut: Long,
          nSegs: Int, frames: Boolean, async: Boolean = true,
          wire: Option[graft.FakeKafkaBroker] = None): Double = {
        // computed once per backlog, BEFORE the trial (off the timed path)
        val expected = expectedByBacklog.getOrElseUpdate(lo -> hi,
          expectedFrames(src))
        val walDir = Files.createTempDirectory("graft-bench-wal").toString
        val outDir = Files.createTempDirectory("graft-bench-out").toString
        val ckptDir = Files.createTempDirectory("graft-bench-ckpt").toString
        try {
        renderRange(src, walDir, lo, cut, 0, 1)
        wire.foreach(_.deliveredLsn.clear())
        // sliceEvents splits the batch into ~32 parallel decode partitions
        // (99k-event backlog / 3000 ≈ one slice per core on this box);
        // GRAFT_BENCH_SLICE overrides for slice-size experiments
        val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
          ckptDir, outDir,
          kafkaBootstrap = wire.map(b => s"wire://localhost:${b.port}"),
          triggerMs = 0L,
          maxEventsPerBatch = Int.MaxValue,
          sliceEvents = sys.env.getOrElse("GRAFT_BENCH_SLICE", "3000").toInt,
          sinkFormat = if (frames) "frames" else "parquet",
          asyncProgress = frames && async)
        q.processAllAvailable() // prime: startup + first segment
        renderRange(src, walDir, cut + 1, hi, 1, nSegs)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        q.stop()
        // honesty check (off the timed path): the delivered SET — distinct
        // routed frames by (topic, lsn) — must equal the FIXTURE-DERIVED
        // expected count on every trial, across BOTH sinks. A mismatch throws;
        // the per-trial isolation in the callers records that trial as -1.0
        // (disqualified — it never enters the min) and runs the next trial,
        // so one lost-frame trial is visible in the trial list without
        // aborting the whole workload. The frames read includes
        // uncommitted-epoch part files: with async progress a stop() can
        // race the FINAL epoch's marker write (data durable, bookkeeping
        // behind — the documented at-least-once window), and the
        // committed-only count showed exactly that trial-to-trial 127-frame
        // wobble. Distinct-by-(lsn, topic) absorbs the redelivery side of
        // the same window.
        val delivered = wire match {
          case Some(b) => b.deliveredLsn.size.toLong // broker-side (topic, lsn) set
          case None if frames => graft.sink.frames.FramesLog
            .read(spark, outDir, includeUncommitted = true)
            .select("topic", "lsn").distinct().count()
          case None => spark.read.parquet(outDir)
            .select("topic", "lsn").distinct().count()
        }
        require(delivered == expected,
          s"trial delivered $delivered frames, fixture expects $expected " +
            s"(${expected - delivered} missing)")
        secs
        // per-trial fixture/sink dirs are transient — at GRAFT_BENCH_SCALE=
        // 100 each rendered WAL dir is ~1.4 GB and a full drain pass leaks
        // ~34 GB without this (observed r11); deletion is off the timed path
        } finally Seq(walDir, outDir, ckptDir).foreach(rmRf)
      }
      val framesHeadline =
        sys.env.getOrElse("GRAFT_BENCH_SINK", "frames") == "frames"
      def headlineDrain(frames: Boolean): Double = oneDrain(ev, minId, maxId,
        primeCut, if (scale > 1) 4 * scale else 1, frames)
      // min of 5 — the reference's own committed-baseline methodology
      // (tests/benchmarks/baseline/components.json is min-of-5); this box's
      // contention makes fewer trials noticeably upward-biased. Per-trial
      // fault isolation: a thrown trial (including a delivered-set
      // disqualification) records -1.0 in the trial list and the next trial
      // still runs.
      def hdAttempt(): (Seq[Double], Seq[EnvRow], Boolean) = {
        val envA = scala.collection.mutable.Buffer.empty[EnvRow]
        // CPU-converged untimed warm-up before the recorded trials (r19 /
        // r18 VERDICT #3) — same loop/verdict shape as the 10× point:
        // repeat the untimed drain until process-CPU is flat trial-over-
        // trial (±15 %), cap 3; non-convergence dirties the attempt so
        // the phase retries instead of recording a cold band. The insuite
        // drift probe deliberately keeps NO warm-up — heap-history drift
        // is the thing it measures.
        var hdConverged = true // vacuously, when disabled or insuite
        if (!insuite &&
            sys.env.getOrElse("GRAFT_BENCH_HD_WARMUP", "1") != "0") {
          var prevWarmCpu = -1.0
          var steady = false
          val warmBase = walWarmupTrials.size // attempt-relative cap
          // cap 5 (the 10× loop's 3 assumes ~40 cpu-s drains whose JIT
          // tail flattens in two passes; the headline's 3-pass trajectory
          // read 28.7 → 8.4 → 4.1 at sf0.01 — still falling at the cap)
          // and a relative-OR-absolute window: at the headline's 2-3
          // cpu-s steady state, ±0.4 cpu-s scheduler jitter is 20 % and
          // a pure 15 % window never closes. Each warm-up drain is
          // ~0.1-0.7 s, so the wider cap costs nothing.
          while (!steady && walWarmupTrials.size - warmBase < 5) {
            val c0 = cpuNanos()
            val t =
              try headlineDrain(framesHeadline)
              catch { case e: Throwable =>
                System.err.println(s"[bench] $hdLabel warm-up failed: $e")
                -1.0
              }
            val cpuS =
              if (c0 < 0 || t < 0) -1.0 else (cpuNanos() - c0) / 1e9
            walWarmupTrials += t
            walWarmupCpuS += cpuS
            System.err.println(
              f"[bench] $hdLabel warm-up " +
                f"${walWarmupTrials.size - warmBase}/5 (untimed): " +
                f"$t%.3f s wall / $cpuS%.1f cpu-s")
            steady = t > 0 && prevWarmCpu > 0 && cpuS > 0 &&
              math.abs(cpuS - prevWarmCpu) <=
                math.max(0.25 * prevWarmCpu, 1.0)
            prevWarmCpu = cpuS
            // r20 (r19 VERDICT #4/#6): decay wait between warm-up drains —
            // the 10× warm-up loop has had this since r14; without it the
            // headline's up-to-5 back-to-back warm-up bursts stack 1-min
            // self-load past the 4.5 contamination bar right at trial 1
            waitQuiet(1.0, 60)
          }
          hdConverged = steady
          walWarmupConverged = steady
          if (!steady) System.err.println(
            s"[bench] $hdLabel warm-up exhausted its cap WITHOUT " +
              "converging — attempt marked dirty")
          // let the warm-up's own burst decay before trial 1's env row
          // (r20: 30 s only decayed a ~5 load to ~3; match the 10× point's
          // 90 s / load < 1.0 budget so trial 1 starts genuinely quiet)
          waitQuiet(1.0, 90)
        }
        val hdTrials = (1 to (if (insuite) 3 else 5)).map { i =>
          // r20 (r19 VERDICT #6): the same inter-trial decay wait the 10×
          // point has had since r14 — trial N's own 32-core burst otherwise
          // shades trial N+1's 1-min load row AND its wall clock (residual
          // contention is where the >3×-min scatter trials come from). The
          // insuite drift probe keeps back-to-back trials on purpose: heap/
          // load history is the thing it measures.
          if (!insuite && i > 1) waitQuiet(1.0, 90)
          val (t, env) = envTrial(
            try headlineDrain(framesHeadline)
            catch { case e: Throwable =>
              System.err.println(s"[bench] $hdLabel trial $i failed: $e")
              e.printStackTrace()
              recErr(hdLabel, e)
              -1.0
            })
          // pre-suite headline only: wal_drain_insuite is a drift probe whose
          // cause (suite heap history) is already recorded via suite_pass_gc_ms.
          // UNCONDITIONAL like wal10Env (r15 review finding): the trials list
          // records -1.0 entries too, so env row i must describe trial i even
          // when trial i failed — a qualified-only append breaks the index
          // alignment attribution-by-index depends on
          if (!insuite) { walEnv += env; envA += env }
          t
        }
        (if (insuite) walInsuiteTrialsRec else walTrialsRec) ++= hdTrials
        val hdOk = hdTrials.filter(_ > 0)
        val secs = if (hdOk.nonEmpty) hdOk.min else -1.0
        results(hdLabel) = secs
        val (p50, p99) = metrics.batchLatencyMs
        if (!insuite) { latencyP50 = p50; latencyP99 = p99 }
        if (hdOk.nonEmpty) System.err.println(
          f"[bench] $hdLabel: $drainEvents events in $secs%.2f s = " +
            f"${drainEvents / secs}%.0f events/s (batch p50=${p50}ms p99=${p99}ms)")
        (hdTrials, envA.toSeq, !hdConverged)
      }
      // the insuite probe is a drift measurement, not a headline — it gets
      // no contamination retry (its cause, suite heap history, is already
      // recorded via suite_pass_gc_ms)
      if (insuite) hdAttempt() else auditPhase("wal_drain")(() => hdAttempt())
      spark.streams.removeListener(listener)
      if (insuite) return // the drift point needs only the headline
      if (framesHeadline) {
        // the pre-r8 parquet-stand-in series, kept for cross-round
        // comparability (min-of-3: it is no longer the headline)
        val pqOk = (1 to 3).map { i =>
          try headlineDrain(frames = false)
          catch { case e: Throwable =>
            System.err.println(s"[bench] wal_drain_parquet trial $i failed: $e")
            recErr("wal_drain_parquet", e)
            -1.0
          }
        }.filter(_ > 0)
        val pq = if (pqOk.nonEmpty) pqOk.min else -1.0
        results("wal_drain_parquet") = pq
        if (pqOk.nonEmpty) System.err.println(
          f"[bench] wal_drain_parquet: $drainEvents events in $pq%.2f s = " +
            f"${drainEvents / pq}%.0f events/s (pre-r8 headline series)")
      }

      // -------- N-slot drain (scale-out axis: near-linear per slot) ------
      // The backlog splits into N contiguous event_id ranges, one slot
      // (independent streaming query + WAL dir + checkpoint + confirmed-LSN
      // file) each — the reference's one-walsender-per-slot unit of
      // parallelism, which the single-process reference cannot scale out at
      // all. Off the timed path, per-slot COMMIT ISOLATION is asserted:
      // every slot's confirmed LSN advanced, and because LSNs derive from
      // event_id, the confirmed values must be strictly increasing across
      // the slots' disjoint ranges — one slot's progress never leaks into
      // another's confirmed file.
      def nSlotDrain(n: Int): Double = {
        val outDir = Files.createTempDirectory("graft-bench-outn").toString
        val ckptDir = Files.createTempDirectory("graft-bench-ckptn").toString
        val cleanup = scala.collection.mutable.Buffer(outDir, ckptDir)
        try {
        val span = maxId - minId + 1
        val ranges = (0 until n).map { i =>
          val lo = minId + i * span / n
          val hi = if (i == n - 1) maxId else minId + (i + 1) * span / n - 1
          (lo, hi)
        }
        val wals = ranges.indices.map(i =>
          Files.createTempDirectory(s"graft-bench-wal$n-$i").toString)
        cleanup ++= wals
        ranges.zip(wals).foreach { case ((lo, _), w) =>
          renderRange(ev, w, lo, lo + 999, 0, 1) }
        val handles = MultiSlot.start(spark,
          wals.zipWithIndex.map { case (w, i) => SlotSpec(s"s$i", w) },
          Routing.fixtureStreams, ckptDir, outDir, triggerMs = 0L,
          maxEventsPerBatch = Int.MaxValue, sliceEvents = 3000,
          sinkFormat = if (framesHeadline) "frames" else "parquet")
        MultiSlot.drainAll(handles) // prime every slot
        val segsPerSlot = if (scale > 1) math.max(1, 4 * scale / n) else 1
        ranges.zip(wals).foreach { case ((lo, hi), w) =>
          renderRange(ev, w, lo + 1000, hi, 1, segsPerSlot) }
        val t0 = System.nanoTime()
        MultiSlot.drainAll(handles)
        val secs = (System.nanoTime() - t0) / 1e9
        // commit isolation (off the timed path)
        val confirmed = handles.map(_.confirmed)
        confirmed.zipWithIndex.foreach { case (c, i) =>
          require(c > 0, s"slot $i never committed (confirmed=$c)") }
        confirmed.sliding(2).foreach { case Seq(a, b) =>
          require(a < b, s"slot confirmed LSNs not isolated: $confirmed")
        case _ => () }
        MultiSlot.stopAll(handles)
        // fixture-truth delivered set (off the timed path), the oneDrain
        // invariant applied to the N-slot shape: all slots append into ONE
        // outDir, and the union of their disjoint ranges is the whole
        // backlog — distinct (topic, lsn) must equal the generator's
        // routed-pair count. The multi-segment-per-slot renders (scale>1)
        // were exposed to the same visibility race oneDrain was.
        val expectedN = expectedByBacklog.getOrElseUpdate(minId -> maxId,
          expectedFrames(ev))
        // each slot appends under outDir/slot=<name>; slot ranges are
        // disjoint (LSNs derive from event_id), so per-slot distinct
        // counts sum to the whole backlog's distinct count
        val deliveredN = ranges.indices.map { i =>
          val d = s"$outDir/slot=s$i"
          if (framesHeadline) graft.sink.frames.FramesLog
            .read(spark, d, includeUncommitted = true)
            .select("topic", "lsn").distinct().count()
          else spark.read.parquet(d)
            .select("topic", "lsn").distinct().count()
        }.sum
        require(deliveredN == expectedN,
          s"$n-slot drain delivered $deliveredN frames, fixture expects " +
            s"$expectedN (${expectedN - deliveredN} missing)")
        secs
        } finally cleanup.foreach(rmRf)
      }
      Seq(2, 4).foreach { n =>
        val label = s"wal_drain_${n}slot"
        val tns = (1 to 2).map { i =>
          try nSlotDrain(n)
          catch { case e: Throwable =>
            System.err.println(s"[bench] $label trial $i failed: $e")
            e.printStackTrace()
            recErr(label, e)
            -1.0
          }
        }
        val ok = tns.filter(_ > 0)
        results(label) = if (ok.nonEmpty) ok.min else -1.0
        if (ok.nonEmpty) System.err.println(
          f"[bench] $label: ~$drainEvents events over $n slots in " +
            f"${ok.min}%.2f s = ${drainEvents / ok.min}%.0f events/s")
      }

      // -------- wire drain: headline backlog through the REAL producer ----
      // The frames-file sink is the IO *shape* of a produce; this point runs
      // the actual K1 path — per-task WireProducer sockets, message-format-v2
      // RecordBatches, CRC32C, murmur2 partitioning, flush-barrier acks —
      // against the scripted in-process broker (which re-verifies CRC32C on
      // every batch). Prices codec + framing + round-trips into a recorded
      // number; the delivered (topic, lsn) SET must equal the file-mode
      // sinks' set for the same backlog (same fixture-derived expected count).
      if (sys.env.getOrElse("GRAFT_BENCH_WIRE", "1") != "0") {
        val broker = new graft.FakeKafkaBroker(Map(
          "cdc.click" -> 4, "cdc.purchase" -> 4, "cdc.signup" -> 4,
          "cdc.view" -> 4), retain = false)
        try {
          val wt = (1 to 3).map { i =>
            try oneDrain(ev, minId, maxId, primeCut,
              if (scale > 1) 4 * scale else 1, frames = true,
              wire = Some(broker))
            catch { case e: Throwable =>
              System.err.println(s"[bench] wal_drain_wire trial $i failed: $e")
              e.printStackTrace()
              recErr("wal_drain_wire", e)
              -1.0
            }
          }
          val wOk = wt.filter(_ > 0)
          results("wal_drain_wire") = if (wOk.nonEmpty) wOk.min else -1.0
          if (wOk.nonEmpty) System.err.println(
            f"[bench] wal_drain_wire: $drainEvents events through the wire " +
              f"producer in ${wOk.min}%.2f s = ${drainEvents / wOk.min}%.0f " +
              f"events/s [${wt.map(t => f"$t%.3f").mkString(", ")}]")
        } finally broker.close()
      }

      // -------- 10× drain (~1M events): the at-scale design point ---------
      // FIXED 3 trials, min + full list in the artifact (was 1 — the same
      // single-trial trap the r7 live_drain_10x fell into: host-level
      // variance swings identical trials 2× with gc=0/steal=0/idle load, so
      // one sample can land anywhere in the band). Skip only when the round
      // already runs at an explicit larger scale, or with GRAFT_BENCH_10X=0.
      if (scale == 1 && sys.env.getOrElse("GRAFT_BENCH_10X", "1") != "0") {
        // Trials are individually fault-isolated: r8's recorded artifact had
        // `wal_drain_10x_trials: []` with a clean `failed` list because one
        // thrown trial aborted the whole Seq.fill AND the block-level catch
        // only told stderr (which the driver's 2000-char tail dropped). Now
        // every failed trial records -1.0 in the trial list, a fully-failed
        // headline lands in the artifact's `failed` list as -1.0, and the
        // first failure's stack trace goes to stderr for root-causing.
        try {
          val ev10 = mkEv(10)
          val b10 = ev10.agg(min("event_id"), max("event_id")).head()
          val (min10, max10) = (b10.getLong(0), b10.getLong(1))
          drainEvents10 = ev10.count() - 1000
          // quiet-box gate (r13 VERDICT #3): the r13 trials ran ungated at
          // load 1.92–2.60 — mostly the preceding drain phases' own load
          // still in the 1-min average — with a 2.1× trial-2 outlier,
          // while the gated live phase's trials sat at 0.64–0.95. Same
          // gate as the live phase before the first trial, and a shorter
          // decay wait (≤90 s for load < 1.0) between trials so trial N's
          // own 32-core burst doesn't shade trial N+1's conditions.
          val (ww, wl, wv) = waitQuiet(loadThresh, loadWaitBudgetS)
          wal10LoadWaitS = ww; wal10LoadBefore = wl; wal10LoadVerdict = wv
          System.err.println(
            f"[bench] wal_drain_10x load gate: waited $ww%.0f s, " +
              f"load=$wl%.2f (threshold $loadThresh) → $wv")
          auditPhase("wal_drain_10x") { () =>
          // warm-up + trials form ONE attempt: a contaminated (or
          // non-converged) attempt re-runs the warm-up loop too, so the
          // retry's recorded band starts at steady state again
          var converged = true // vacuously, when the warm-up is disabled
          if (sys.env.getOrElse("GRAFT_BENCH_10X_WARMUP", "1") != "0") {
            // steady-state warm-up (r15 VERDICT #2): repeat the untimed
            // drain until it lands within 15 % of its predecessor (the
            // trial-over-trial delta is FLAT, i.e. JIT/codegen has
            // converged), cap 3 — every warm-up time is recorded in
            // wal_drain_10x_warmup_trials so "reached steady state" is
            // artifact data, not a claim
            var prevWarmCpu = -1.0
            var steady = false
            val warmBase = wal10WarmupTrials.size // attempt-relative cap
            while (!steady && wal10WarmupTrials.size - warmBase < 3) {
              val c0 = cpuNanos()
              val t =
                try oneDrain(ev10, min10, max10, min10 + 999, 40,
                  framesHeadline, async = false)
                catch { case e: Throwable =>
                  System.err.println(s"[bench] wal_drain_10x warm-up failed: $e")
                  -1.0
                }
              val cpuS =
                if (c0 < 0 || t < 0) -1.0 else (cpuNanos() - c0) / 1e9
              wal10WarmupTrials += t
              wal10WarmupCpuS += cpuS
              System.err.println(
                f"[bench] wal_drain_10x warm-up " +
                  f"${wal10WarmupTrials.size - warmBase}/3 (untimed): " +
                  f"$t%.3f s wall / $cpuS%.1f cpu-s")
              // a FAILED warm-up (t = -1) is NOT steady state (r16 review
              // finding: treating it as steady started the recorded
              // trials cold after one transient hiccup) — keep retrying
              // within the cap. Convergence is CPU-based (r17): the JIT
              // transient IS the cpu signal — r15's own attribution showed
              // warm-up = cpu falling in lockstep with wall (418 → 28
              // cpu-s) while STEADY-state wall still scatters 2× with cpu
              // FLAT at 30–35 (wall≫cpu box noise the env rows price) —
              // so a wall-based window misreads box noise as cold code
              // and triggers needless retries (observed: r17_full1's
              // attempt-1 warm-ups scattered [3.2, 1.5, 3.3] s wall at
              // flat cpu and the phase retried for nothing).
              steady = t > 0 && prevWarmCpu > 0 && cpuS > 0 &&
                math.abs(cpuS - prevWarmCpu) <= 0.15 * prevWarmCpu
              prevWarmCpu = cpuS
              waitQuiet(1.0, 90)
            }
            wal10WarmupS = wal10WarmupTrials.lastOption.getOrElse(-1.0)
            // r17 (r16 VERDICT #2): cap-exhaustion is now a RECORDED
            // verdict, and a non-converged warm-up dirties the attempt —
            // the phase retries once instead of recording a cold band as
            // steady state (the r16 recorded run's [3.38, 18.75, -1])
            converged = steady
            if (!steady) System.err.println(
              "[bench] wal_drain_10x warm-up exhausted its cap WITHOUT " +
                "converging — attempt marked dirty")
          }
          wal10WarmupConverged = converged // vacuously true when disabled
          // 5 trials (r14 VERDICT #2, was 3): r14's trial 3 stalled 2.2×
          // with a benign env row — one unexplained stall in three
          // dominates a min-of-3 narrative; at 5 it's an outlier with
          // company or it isn't. The cpu_s/wall_s pair in the env row is
          // the new discriminator for exactly that stall class.
          val envA = scala.collection.mutable.Buffer.empty[EnvRow]
          val t10 = (1 to 5).map { i =>
            if (i > 1) waitQuiet(1.0, 90)
            val (t, env) = envTrial(
              try oneDrain(ev10, min10, max10, min10 + 999, 40,
                framesHeadline, async = false)
              catch { case e: Throwable =>
                System.err.println(s"[bench] wal_drain_10x trial $i failed: $e")
                e.printStackTrace()
                recErr("wal_drain_10x", e)
                -1.0
              })
            // env rows stay UNCONDITIONAL here: the trials list records
            // -1.0 entries too, so index alignment holds either way
            wal10Env += env; envA += env
            t
          }
          wal10TrialsRec ++= t10
          val ok = t10.filter(_ > 0)
          if (ok.nonEmpty) {
            val secs10 = ok.min
            results("wal_drain_10x") = secs10
            System.err.println(
              f"[bench] wal_drain_10x: $drainEvents10 events in $secs10%.2f s" +
                f" min of ${ok.size} = ${drainEvents10 / secs10}%.0f events/s " +
                f"[${t10.map(t => f"$t%.3f").mkString(", ")}]")
          } else results("wal_drain_10x") = -1.0
          (t10, envA.toSeq, !converged)
          }
        } catch { case e: Throwable => // setup (mkEv/count) failed outright
          System.err.println(s"[bench] wal_drain_10x setup failed: $e")
          e.printStackTrace()
          recErr("wal_drain_10x", e)
          results("wal_drain_10x") = -1.0
        }
      }

      } catch { case e: Throwable =>
        // headline failure must reach the ARTIFACT, not just stderr: -1.0
        // lands it in the `failed` list plus its reason under "errors"
        System.err.println(s"[bench] $hdLabel failed: $e")
        e.printStackTrace()
        recErr(hdLabel, e)
        if (!results.contains(hdLabel)) results(hdLabel) = -1.0
      }
    }
    if (runDrain) drainWorkloads(insuite = false)


    // -------- latency floor: tiny trigger, single-event segments --------
    // The micro-batch latency floor (per-batch wall-clock at trigger=5 ms
    // with one event per arrival) — the honest number to quote next to the
    // reference's <10 ms push-latency design claim: a micro-batch engine
    // cannot beat its per-batch fixed cost, and this measures exactly that.
    // Independently gated (GRAFT_BENCH_FLOOR=1 with the drains off) so a
    // contention-sensitive p99 can be re-measured alone on a quiet box.
    val runFloor = sys.env.getOrElse("GRAFT_BENCH_FLOOR",
      if (runDrain) "1" else "0") != "0"
    // per-(variant, pass) env rows for all three floor variants
    val floorEnv = scala.collection.mutable.Buffer.empty[(String, Int, EnvRow)]
    // per-(variant, pass) (p50, p99) — every pass lands in the artifact
    val floorPassRows =
      scala.collection.mutable.Buffer.empty[(String, Int, Long, Long)]
    // per-(variant, pass) durationMs medians (r18 breakdown)
    val floorBreakdownRows =
      scala.collection.mutable.Buffer.empty[(String, Int, Map[String, Long])]
    var lastFloorBreakdown = Map.empty[String, Long]
    // committed cross-run async-p50 baseline (ms): recorded r13 34, r15
    // provisional band 38–56 — drift beyond 1.3× this trips the gate
    val FloorAsyncP50BaselineMs = 40.0
    var floorGateVerdict = "unavailable"
    if (runFloor) {
      // pass 1 absorbs JIT/codegen/stream-startup (a cold first micro-batch
      // costs seconds and would swallow the whole arrival window into one
      // batch) and is never the headline — r8's recorded 1-pass floor read
      // 207 ms async because cold-start swallowed the win; the suite's
      // warm-up runs queries, not streams, so it does not warm this path.
      // r16 (r15 VERDICT #3): the recorded floors ratcheted up three
      // consecutive rounds (async p50 34 → 46 → 54 ms) while provisional
      // runs spanned 38–56 — the old last-pass-of-2 policy was a SINGLE
      // sample of a wide inter-run band that kept drawing the slow edge.
      // Now: 4 passes default (1 cold + 3 recorded), every pass's
      // per-variant p50/p99 lands in the artifact, the headline is the
      // MIN-p50 recorded pass per variant (its p99 from the same pass),
      // and a committed cross-run baseline gates drift like the live-10×
      // ceiling does.
      val passes = sys.env.getOrElse("GRAFT_BENCH_FLOOR_PASSES", "4").toInt
      // Two floor variants per pass:
      //  - async DSv2 frames sink (the headline `latency_floor_ms`): offset
      //    and commit log writes off the critical path — the directive's
      //    latency fix, valid at the engine's at-least-once contract
      //  - sync parquet stand-in (`latency_floor_sync_ms`): the pre-r8
      //    number, kept so the async win is measured against its own round,
      //    not remembered from a previous one
      //  - wire DSv2 producers against the scripted broker
      //    (`latency_floor_wire_ms`): the end-to-end Kafka-path floor —
      //    real codec + socket + ack round-trip per batch, pooled
      //    connections (WireProducerPool), async progress
      def floorOnce(sinkFormat: String, async: Boolean,
          wire: Option[graft.FakeKafkaBroker] = None): (Long, Long) = {
        val metricsF = new graft.metrics.GraftMetrics
        val listenerF = new graft.metrics.GraftQueryListener(metricsF)
        spark.streams.addListener(listenerF)
        // per-component medians (r18, the ann_serve breakdown applied to
        // the floors): itemizes each pass's batchDuration into
        // latestOffset / getBatch / planning / addBatch / walCommit /
        // commitOffsets so floor drift is attributable to a COMPONENT
        val durRowsF =
          scala.collection.mutable.Buffer.empty[Map[String, Long]]
        val lDurF = new org.apache.spark.sql.streaming.StreamingQueryListener {
          override def onQueryStarted(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryStartedEvent): Unit = ()
          override def onQueryProgress(e: org.apache.spark.sql.streaming
              .StreamingQueryListener.QueryProgressEvent): Unit = {
            import scala.jdk.CollectionConverters._
            // data batches only: idle triggers carry a near-zero
            // triggerExecution that would skew the medians vs the
            // latency metric's population
            if (e.progress.numInputRows > 0) durRowsF.synchronized {
              durRowsF += e.progress.durationMs.asScala
                .map { case (k, v) => k -> v.longValue() }.toMap
            }
          }
          override def onQueryTerminated(e: org.apache.spark.sql.streaming
            .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
        }
        spark.streams.addListener(lDurF)
        val debugL = if (sys.env.get("GRAFT_BENCH_FLOOR_DEBUG").contains("1")) {
          val l = new org.apache.spark.sql.streaming.StreamingQueryListener {
            override def onQueryStarted(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
            override def onQueryProgress(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
              System.err.println(s"[floor-debug $sinkFormat async=$async] " +
                s"total=${e.progress.batchDuration} ${e.progress.durationMs}")
            override def onQueryTerminated(e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          }
          spark.streams.addListener(l); Some(l)
        } else None
        val walDir = Files.createTempDirectory("graft-bench-floor-wal").toString
        val outDir = Files.createTempDirectory("graft-bench-floor-out").toString
        val ckptDir = Files.createTempDirectory("graft-bench-floor-ckpt").toString
        try {
          val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
            ckptDir, outDir,
            kafkaBootstrap = wire.map(b => s"wire://localhost:${b.port}"),
            triggerMs = 5L,
            sinkFormat = sinkFormat, asyncProgress = async)
          var seg = 0
          (1 to 120).foreach { i =>
            // one event per segment, re-announced relations (fresh session shape)
            val seen = scala.collection.mutable.Set.empty[String]
            val frames = WalFixture.frames(WalFixture.Ev(1000000L + i,
              1700000000000000L + i * 1000L, i % 7, "click", i * 0.5, "{}"), seen)
            WalLog.write(Paths.get(walDir, f"$seg%08d.wal"), frames)
            seg += 1
            Thread.sleep(15)
          }
          q.processAllAvailable()
          q.stop()
          lastFloorBreakdown = durRowsF.synchronized {
            durRowsF.flatMap(_.keys).distinct.map { k =>
              val vs = durRowsF.flatMap(_.get(k)).sorted
              k -> (if (vs.isEmpty) 0L else vs(vs.size / 2))
            }.toMap
          }
          metricsF.batchLatencyMs
        } finally {
          debugL.foreach(spark.streams.removeListener)
          spark.streams.removeListener(listenerF)
          spark.streams.removeListener(lDurF)
          Seq(walDir, outDir, ckptDir).foreach(rmRf)
        }
      }
      val floorBroker =
        if (sys.env.getOrElse("GRAFT_BENCH_FLOOR_WIRE", "1") != "0")
          Some(new graft.FakeKafkaBroker(Map(
            "cdc.click" -> 4, "cdc.purchase" -> 4, "cdc.signup" -> 4,
            "cdc.view" -> 4), retain = false))
        else None
      // the whole floor phase (passes + headline + gate) is ONE auditable
      // attempt: the r16 recorded floors ran at load 6.2–9.2 (r15: ~1.0) —
      // the loudest contamination signal in that artifact — and the gate,
      // while honest, priced a loaded box into the committed-baseline
      // comparison. A contaminated attempt re-runs once; headline vars are
      // recomputed from the retry's rows only.
      def floorAttempt(): (Seq[Double], Seq[EnvRow], Boolean) = {
      val prBase = floorPassRows.size
      val envA = scala.collection.mutable.Buffer.empty[EnvRow]
      try (1 to passes).foreach { pass =>
        try {
          // one env row per variant per pass (r14 VERDICT #1: all three
          // floors drifted +23–35% with no fields to attribute it; the
          // floor is ~2 s of wall per variant, so cpu-vs-wall separates a
          // starved box from a client that got slower per batch)
          def floorEnvTrial(variant: String, run: => (Long, Long)): (Long, Long) = {
            var out = (0L, 0L)
            val (_, env) = envTrial { out = run; 0.0 }
            floorEnv += ((variant, pass, env))
            envA += env
            floorPassRows += ((variant, pass, out._1, out._2))
            floorBreakdownRows += ((variant, pass, lastFloorBreakdown))
            out
          }
          val (sp50, sp99) = floorEnvTrial("sync", floorOnce("parquet", async = false))
          val (ap50, ap99) = floorEnvTrial("async", floorOnce("frames", async = true))
          val (wp50, wp99) = floorBroker match {
            case Some(b) =>
              floorEnvTrial("wire", floorOnce("frames", async = true, wire = Some(b)))
            case None => (0L, 0L)
          }
          System.err.println(
            s"[bench] latency_floor pass $pass/$passes (trigger=5ms, " +
              s"1-event batches): async-frames p50=${ap50}ms p99=${ap99}ms, " +
              s"sync-parquet p50=${sp50}ms p99=${sp99}ms, " +
              s"wire p50=${wp50}ms p99=${wp99}ms")
        } catch { case e: Throwable =>
          // p50=0 in the JSON means "not measured", never "sub-ms floor"
          System.err.println(s"[bench] latency_floor failed: ${e.getMessage}")
          recErr("latency_floor", e)
        }
      } catch { case e: Throwable =>
        System.err.println(s"[bench] latency_floor pass loop failed: $e")
        recErr("latency_floor", e)
      }
      // headline per variant = the MIN-p50 RECORDED pass of THIS attempt
      // (pass ≥ 2 when more than one pass ran; its p99 rides from the same
      // pass so the pair stays coherent) — min-of-passes is the drain
      // points' policy applied to the floors
      val attemptRows = floorPassRows.drop(prBase)
      def headlineOf(variant: String): (Long, Long) = {
        val rec = attemptRows.filter(r =>
          r._1 == variant && (passes == 1 || r._2 >= 2) && r._3 > 0)
        if (rec.isEmpty) (0L, 0L)
        else { val best = rec.minBy(_._3); (best._3, best._4) }
      }
      val (ap, ap9) = headlineOf("async"); floorP50 = ap; floorP99 = ap9
      val (sp, sp9) = headlineOf("sync"); floorSyncP50 = sp; floorSyncP99 = sp9
      val (wp, wp9) = headlineOf("wire"); floorWireP50 = wp; floorWireP99 = wp9
      // committed cross-run baseline gate (the live_drain_10x_ceiling
      // pattern): recorded async p50 was 34 ms (r13) with same-day
      // provisional bands 38–56 (r15) — baseline 40 ms, breach at >1.3×.
      // A breach never hides the number; the artifact carries the verdict
      // so three silent ratchets (r13→r15) can't happen again.
      floorGateVerdict =
        if (floorP50 <= 0) "unavailable"
        else if (floorP50 <= FloorAsyncP50BaselineMs * 1.3) "pass"
        else "breach"
      System.err.println(s"[bench] latency_floor headline (min-p50 " +
        s"recorded pass): async p50=${floorP50}ms p99=${floorP99}ms, " +
        s"sync p50=${floorSyncP50}ms, wire p50=${floorWireP50}ms; " +
        s"gate vs ${FloorAsyncP50BaselineMs} ms × 1.3 → $floorGateVerdict")
      // scatter clause input: this attempt's RECORDED async-p50 passes.
      // A committed-baseline gate BREACH dirties the attempt (r17): the
      // r17_full4 run breached at 58 ms with a clean audit (quiet box,
      // flat passes) right after a box-heating full test suite — the
      // transient post-saturation drift class that ratcheted r13–r15
      // gets ONE bounded re-measure; a real regression breaches twice
      // and lands labeled in both the gate verdict and the phase audit.
      (attemptRows.filter(r => r._1 == "async" && r._3 > 0)
        .map(_._3.toDouble).toSeq, envA.toSeq,
        floorGateVerdict == "breach")
      }
      try auditPhase("latency_floor")(() => floorAttempt())
      finally floorBroker.foreach(_.close())
    }

    // -------- ANN streaming serving point (r15 VERDICT #6) --------
    // `AnnServeStream` (the stateless foreachBatch ANN serving twin) gets
    // a MEASURED number next to the reference's <10 ms push-latency
    // design claim: per-batch wall-clock p50/p99 at trigger=5 ms with
    // 1-query arrivals, plus end-to-end queries/s, served against the
    // broadcast TRAINED index. The index builds UNTIMED (serving, not
    // training, is the rung); 2 passes, pass 1 absorbs stream/JIT
    // cold-start and pass 2 records — the floor protocol.
    val runAnn = sys.env.getOrElse("GRAFT_BENCH_ANN",
      if (runFloor) "1" else "0") != "0"
    var annServeQps = -1.0
    var annServeP50 = 0L; var annServeP99 = 0L
    // batched-arrival variant (8 queries per micro-batch): the 1-query
    // point measures the per-batch FIXED cost floor; this one measures
    // how it amortizes — the pair is the micro-batch serving trade-off
    // as recorded data instead of a claim
    var annServeQpsB8 = -1.0
    var annServeB8P50 = 0L; var annServeB8P99 = 0L
    // batch-64 rung (r16 VERDICT #5): completes the amortization curve
    var annServeQpsB64 = -1.0
    var annServeB64P50 = 0L; var annServeB64P99 = 0L
    // machinery floor: the same stream served by a no-op count
    var annServeNoopP50 = 0L; var annServeNoopP99 = 0L
    // sync-progress twin of the noop floor (offset/commit logs on the
    // critical path — the durability-paired number)
    var annServeNoopSyncP50 = 0L; var annServeNoopSyncP99 = 0L
    // per-component medians of the LAST annOnce run (r17 VERDICT #4);
    // the noop runs' maps are the itemized machinery floor in the artifact
    var annLastBreakdown = Map.empty[String, Long]
    var annServeBreakdown = Map.empty[String, Long] // recorded serve pass
    // serving-knob sweep rows (r19 / r18 VERDICT #4):
    // (batch, lut path, codes partitions, p50 ms, qps, env)
    val annSweepRows = scala.collection.mutable.Buffer
      .empty[(Int, String, Int, Long, Double, EnvRow)]
    // ingest-while-serving rung (r19 / r18 VERDICT #2)
    var annIngestP50 = 0L; var annIngestP99 = 0L
    var annIngestQps = -1.0
    var annIngestEnv: Option[EnvRow] = None
    var annIngestDecisions = Seq.empty[String]
    var annIngestFlips = 0
    var annNoopBreakdown = Map.empty[String, Long]
    var annNoopSyncBreakdown = Map.empty[String, Long]
    val annServeEnv = scala.collection.mutable.Buffer.empty[(Int, EnvRow)]
    if (runAnn) {
      try {
        val (_, codes, carr) =
          graft.queries.ExtQueries.pqTrainedIndex(spark, sfDir)
        // r17 (r16 VERDICT #5): the invariant side builds ONCE, off the
        // clock — the prepared index persists the pre-partitioned codes
        // frame and collects the ≤32-row codebook, so a batch no longer
        // re-derives the corpus codes (a corpus groupBy + exchange per
        // batch) or rebuilds the codebook broadcast
        // codes at 4 partitions — matched to the serving session's pinned
        // shuffle width below: every per-batch stage over the codes then
        // launches 4 tasks instead of 32 near-empty ones (the bench-scale
        // corpus is a few thousand cached rows; a 10⁹-vector deployment
        // sizes this to its fleet)
        val idx = graft.streaming.AnnServeStream.prepare(codes, carr,
          numPartitions = 4)
        val nq = 40
        val allQueries = spark.read.parquet(s"$sfDir/embeddings.parquet")
          .select(col("vec_id"), col("label"), col("embedding"))
        val queries = allQueries.filter(col("vec_id") < nq)
        // noop = the micro-batch MACHINERY floor: identical stream, file
        // source, trigger and checkpoint bookkeeping, but the batch is
        // only counted, never served — p50(serve) − p50(noop) is the
        // serving plan's own per-batch cost, so the artifact NAMES the
        // irreducible foreachBatch residual instead of leaving the
        // batch-1 floor unattributed (r16 VERDICT #5)
        // `asyncTrack` (r17 VERDICT #4): the breakdown showed walCommit +
        // commitOffsets ≈ 60-70 ms of the ~160 ms noop floor — offset and
        // commit log writes on the batch's critical path. Spark ships
        // exactly this fix as async progress tracking; its certified sink
        // list is Kafka/Memory, so the foreachBatch serving sink needs the
        // documented override option. That is SOUND here: serving is a
        // read-only side effect (idempotent query answers — at-least-once
        // re-serving after a restart returns the same rows), and batch
        // COMPLETENESS is enforced separately (the served counter must
        // reach n before the clock stops — the wal_drain async lesson,
        // where processAllAvailable may return with commits lagging).
        // The sync twin stays recorded next to it (ann_serve_noop_sync).
        def annOnce(perFile: Int = 1, n: Int = nq, noop: Boolean = false,
            asyncTrack: Boolean = true,
            idxUse: graft.streaming.AnnServeStream.TrainedServeIndex = idx,
            driverLut: Int = 256)
            : (Long, Long, Double) = {
          val qset = if (n == nq) queries
            else allQueries.filter(col("vec_id") < n)
          val m = new graft.metrics.GraftMetrics
          val l = new graft.metrics.GraftQueryListener(m)
          spark.streams.addListener(l)
          // per-component breakdown (r17 VERDICT #4): batchDuration's
          // constituents per batch, so the artifact ITEMIZES the
          // machinery floor (offset-log walCommit, source latestOffset
          // listing, planning, the addBatch job, commit-log write)
          // instead of leaving 170 ms unattributed
          val durRows = scala.collection.mutable
            .Buffer.empty[Map[String, Long]]
          val lDur = new org.apache.spark.sql.streaming.StreamingQueryListener {
            override def onQueryStarted(e: org.apache.spark.sql.streaming
              .StreamingQueryListener.QueryStartedEvent): Unit = ()
            override def onQueryProgress(e: org.apache.spark.sql.streaming
                .StreamingQueryListener.QueryProgressEvent): Unit = {
              import scala.jdk.CollectionConverters._
              // data batches only (see the floor listener's note)
              if (e.progress.numInputRows > 0) durRows.synchronized {
                durRows += e.progress.durationMs.asScala
                  .map { case (k, v) => k -> v.longValue() }.toMap
              }
            }
            override def onQueryTerminated(e: org.apache.spark.sql.streaming
              .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
          }
          spark.streams.addListener(lDur)
          // serving-shaped session tuning (r16 VERDICT #5): a per-batch
          // plan over ≤64 query rows gains nothing from AQE — each
          // adaptive QueryStage materializes sequentially, adding
          // scheduler round-trips to a fixed-shape 3-stage plan — and a
          // 32-partition shuffle for an ≤64-row top-k is 32 near-empty
          // tasks. A real serving deployment pins both; restored in the
          // finally so every other phase keeps the defaults.
          val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
          val shufPrev = spark.conf.get("spark.sql.shuffle.partitions")
          spark.conf.set("spark.sql.adaptive.enabled", "false")
          spark.conf.set("spark.sql.shuffle.partitions", "4")
          val dir = Files.createTempDirectory("graft-bench-annq").toString
          // checkpoint on memory-backed storage where available (r17
          // VERDICT #4): the serving query's offset/commit logs fsync
          // per micro-batch — measured as the dominant machinery-floor
          // term (walCommit + commitOffsets) — and a serving deployment
          // pins its bookkeeping to fast storage exactly like it pins
          // AQE/shuffle width above. The ARRIVAL files stay on disk;
          // only the engine's per-batch bookkeeping moves.
          val shm = Paths.get("/dev/shm")
          val ck = (if (Files.isDirectory(shm) && Files.isWritable(shm))
              Files.createTempDirectory(shm, "graft-bench-annck")
            else Files.createTempDirectory("graft-bench-annck")).toString
          try {
            // one file per ARRIVAL, pre-written: maxFilesPerTrigger=1
            // turns them into n/perFile micro-batches of perFile
            // queries each, served back-to-back
            (0 until n by perFile).foreach { i =>
              qset.filter(col("vec_id") >= i &&
                  col("vec_id") < i + perFile).coalesce(1)
                .write.mode("append").parquet(dir)
            }
            val served = new java.util.concurrent.atomic.AtomicLong(0L)
            val batches = new java.util.concurrent.atomic.AtomicLong(0L)
            val expectedBatches = (n + perFile - 1) / perFile
            val w0 = spark.readStream.schema(qset.schema)
              .option("maxFilesPerTrigger", "1").parquet(dir)
              .writeStream
              .option("checkpointLocation", ck)
              .trigger(org.apache.spark.sql.streaming.Trigger
                .ProcessingTime(5L))
            val w = if (!asyncTrack) w0 else w0
              .option("asyncProgressTrackingEnabled", "true")
              .option("asyncProgressTrackingCheckpointIntervalMs", "1000")
              .option("_asyncProgressTrackingOverrideSinkSupportCheck", "true")
            val q = w.foreachBatch { (b: org.apache.spark.sql.Dataset[Row],
                  _: Long) =>
                val c = if (noop) b.count()
                  else graft.streaming.AnnServeStream
                    .serveFast(b, idxUse, maxDriverLut = driverLut).count()
                served.addAndGet(c)
                if (c > 0) batches.incrementAndGet()
                ()
              }.start()
            val t0 = System.nanoTime()
            try {
              q.processAllAvailable()
              // completeness barrier: with async progress the await above
              // tracks the async commit log, not the batches — the clock
              // stops only once every non-empty micro-batch actually ran
              val deadline = t0 + 120L * 1000 * 1000 * 1000
              while (batches.get() < expectedBatches &&
                  System.nanoTime() < deadline)
                Thread.sleep(2)
            } finally q.stop()
            val wall = (System.nanoTime() - t0) / 1e9
            require(batches.get() >= expectedBatches && served.get() > 0,
              s"ANN serving stream ran ${batches.get()} of $expectedBatches " +
                s"batches (${served.get()} rows)")
            val (p50, p99) = m.batchLatencyMs
            // median per durationMs component over the run's batches
            annLastBreakdown = durRows.synchronized {
              durRows.flatMap(_.keys).distinct.map { k =>
                val vs = durRows.flatMap(_.get(k)).sorted
                k -> (if (vs.isEmpty) 0L else vs(vs.size / 2))
              }.toMap
            }
            (p50, p99, n / wall)
          } finally {
            spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
            spark.conf.set("spark.sql.shuffle.partitions", shufPrev)
            spark.streams.removeListener(l)
            spark.streams.removeListener(lDur)
            rmRf(dir); rmRf(ck)
          }
        }
        auditPhase("ann_serve") { () =>
          val envA = scala.collection.mutable.Buffer.empty[EnvRow]
          // scatter-clause input: ONLY the two comparable serve passes.
          // The b8/b64/noop rungs run under envTrial too (r17 ADVICE) so
          // their LOAD rows join the audit, but their wall-clocks differ
          // from the passes BY DESIGN (fewer/larger batches) — feeding
          // them to the 3× scatter bar flags every clean run (measured:
          // the b64 rung's short wall became the phase min and both pass
          // walls sat >3× above it — a guaranteed false contamination).
          val passWalls = scala.collection.mutable.Buffer.empty[Double]
          (1 to 2).foreach { pass =>
            var out = (0L, 0L, -1.0)
            val (_, env) = envTrial { out = annOnce(); 0.0 }
            annServeEnv += ((pass, env)); envA += env; passWalls += env.wallS
            if (pass == 2) {
              annServeP50 = out._1; annServeP99 = out._2; annServeQps = out._3
              annServeBreakdown = annLastBreakdown
            }
            System.err.println(f"[bench] ann_serve pass $pass/2: " +
              f"p50=${out._1}ms p99=${out._2}ms qps=${out._3}%.1f")
          }
          // the amortization points ride the already-warm serving path —
          // one recorded pass each is the floor protocol's pass-2
          // equivalent. batch=64 (r16 VERDICT #5) completes the curve:
          // 1 → 8 → 64 queries per micro-batch over the same prepared
          // index (128 queries = two 64-query batches, so the p50 is a
          // real sample, not a single batch)
          var b8 = (0L, 0L, -1.0)
          val (_, envB8) = envTrial { b8 = annOnce(perFile = 8); 0.0 }
          annServeEnv += ((3, envB8)); envA += envB8
          annServeB8P50 = b8._1; annServeB8P99 = b8._2; annServeQpsB8 = b8._3
          System.err.println(f"[bench] ann_serve batch=8: " +
            f"p50=${b8._1}ms p99=${b8._2}ms qps=${b8._3}%.1f")
          var b64 = (0L, 0L, -1.0)
          val (_, envB64) = envTrial { b64 = annOnce(perFile = 64, n = 128); 0.0 }
          annServeEnv += ((4, envB64)); envA += envB64
          annServeB64P50 = b64._1; annServeB64P99 = b64._2
          annServeQpsB64 = b64._3
          System.err.println(f"[bench] ann_serve batch=64: " +
            f"p50=${b64._1}ms p99=${b64._2}ms qps=${b64._3}%.1f")
          var noop = (0L, 0L, -1.0)
          val (_, envNoop) = envTrial { noop = annOnce(noop = true); 0.0 }
          annServeEnv += ((5, envNoop)); envA += envNoop
          annServeNoopP50 = noop._1; annServeNoopP99 = noop._2
          annNoopBreakdown = annLastBreakdown
          System.err.println(f"[bench] ann_serve noop (machinery floor): " +
            f"p50=${noop._1}ms p99=${noop._2}ms — serve minus noop is the " +
            "serving plan's own per-batch cost; component medians " +
            annNoopBreakdown.toSeq.sortBy(-_._2)
              .map { case (k, v) => s"$k=$v" }.mkString("[", " ", "]"))
          // the durability-paired twin: identical noop stream with SYNC
          // progress (offset/commit log writes back on the critical
          // path) — the honest pair next to the async serving floor
          var noopSync = (0L, 0L, -1.0)
          val (_, envNS) =
            envTrial { noopSync = annOnce(noop = true, asyncTrack = false); 0.0 }
          annServeEnv += ((6, envNS)); envA += envNS
          annServeNoopSyncP50 = noopSync._1; annServeNoopSyncP99 = noopSync._2
          annNoopSyncBreakdown = annLastBreakdown
          System.err.println(f"[bench] ann_serve noop SYNC progress: " +
            f"p50=${noopSync._1}ms p99=${noopSync._2}ms; component medians " +
            annNoopSyncBreakdown.toSeq.sortBy(-_._2)
              .map { case (k, v) => s"$k=$v" }.mkString("[", " ", "]"))
          // pass-1 is the cold stream/JIT pass (dropped by the scatter
          // clause's first-trial exemption); the load clause reads every
          // rung's env row
          (passWalls.toSeq, envA.toSeq, false)
        }
        // ---- serving-knob sweep (r19 / r18 VERDICT #4): the driver-LUT
        // crossover (maxDriverLut) and the prepare(numPartitions) sizing
        // knob ship with MEASURED defaults — batch {1, 64} × {driver,
        // distributed} LUT × codes partitions {4, 32}, one recorded pass
        // each on the already-warm serving path. Verdict-only audit (the
        // combos' walls differ BY DESIGN, so only the load clause
        // applies).
        if (sys.env.getOrElse("GRAFT_BENCH_ANN_SWEEP", "1") != "0") try {
          val idx32 = graft.streaming.AnnServeStream.prepare(codes, carr,
            numPartitions = 32)
          val sweepEnvs = scala.collection.mutable.Buffer.empty[EnvRow]
          try {
            for (parts <- Seq(4, 32); lutName <- Seq("driver", "dist");
                 batch <- Seq(1, 64)) {
              val ix = if (parts == 4) idx else idx32
              val lut = if (lutName == "driver") 256 else 0
              var out = (0L, 0L, -1.0)
              val (_, env) = envTrial {
                out = annOnce(perFile = batch,
                  n = if (batch == 64) 128 else nq,
                  idxUse = ix, driverLut = lut)
                0.0
              }
              sweepEnvs += env
              annSweepRows += ((batch, lutName, parts, out._1, out._3, env))
              System.err.println(f"[bench] ann_serve sweep b$batch%-2d " +
                f"$lutName%-6s parts=$parts%-2d: p50=${out._1}ms " +
                f"qps=${out._3}%.1f")
            }
            phaseAudits += (("ann_serve_sweep",
              if (sweepEnvs.exists(_.load > contamLoadBar)) "contaminated"
              else "clean", 1))
          } finally idx32.release()
        } catch { case e: Throwable =>
          System.err.println(s"[bench] ann_serve_sweep failed: ${e.getMessage}")
          recErr("ann_serve_sweep", e)
        }
        // ---- ingest-while-serving rung (r19 / r18 VERDICT #2): the
        // deployment shape the lifecycle exists for — an ingest stream
        // pushes drift-gated batches through appendOrRetrain against the
        // LIVE index (two in-distribution appends, then a novel-label
        // batch forcing a retrain that flips CURRENT) while the serving
        // stream answers b8 batches against a ServingHandle that adopts
        // the flip between micro-batches. Recorded: serve p50/qps UNDER
        // ingest (vs the quiet-path b8 point above), the per-batch
        // lifecycle decisions, and the adopted version flips.
        if (sys.env.getOrElse("GRAFT_BENCH_ANN_INGEST", "1") != "0") try {
          val lifeDir = Files.createTempDirectory("graft-bench-annlife")
          val idxDir = s"$lifeDir/idx"; val corpDir = s"$lifeDir/corpus"
          val ingSrc = Files.createDirectories(
            Paths.get(s"$lifeDir/ingest")).toString
          graft.sim.AnnIndexStore.save(codes, carr, idxDir)
          allQueries.write.mode("overwrite").parquet(corpDir)
          val maxId = allQueries.agg(max("vec_id")).head().getLong(0)
          val maxLabel = allQueries.agg(max("label")).head()
            .getAs[Number](0).longValue()
          // 3 pre-written ingest batches: 2 in-distribution resamples +
          // 1 novel-label (forces the retrain + CURRENT flip mid-serve)
          (1 to 2).foreach { i =>
            allQueries.filter(col("vec_id") % 13 === 0)
              .withColumn("vec_id", col("vec_id") + (maxId + 1) * i)
              .coalesce(1).write.mode("append").parquet(ingSrc)
          }
          allQueries.filter(col("vec_id") % 17 === 0)
            .withColumn("vec_id", col("vec_id") + (maxId + 1) * 3)
            .withColumn("label",
              (col("label") + maxLabel + 1L).cast(
                allQueries.schema("label").dataType.simpleString))
            .coalesce(1).write.mode("append").parquet(ingSrc)
          val handle = new graft.streaming.AnnIngestStream.ServingHandle(
            spark, idxDir, numPartitions = 4)
          val decisions = new java.util.concurrent.ConcurrentLinkedQueue[
            graft.streaming.AnnIngestStream.BatchDecision]
          val flips = new java.util.concurrent.atomic.AtomicInteger(0)
          val (_, envIng) = envTrial {
            val ingQ = graft.streaming.AnnIngestStream.ingest(
              spark.readStream.schema(allQueries.schema)
                .option("maxFilesPerTrigger", "1").parquet(ingSrc),
              idxDir, corpDir, barE12 = 1000000000000L)(decisions.add(_))
            try {
              // serve b8 batches WHILE the ingest drains its 3 batches;
              // the handle adopts any flip between serving micro-batches.
              // Latencies are recorded PER QUERY ID and filtered to the
              // serving query after the run — a session-wide listener
              // would fold the ingest query's multi-second retrain batch
              // into the serve p50.
              val dir = Files.createTempDirectory("graft-bench-ingq").toString
              val durById = new java.util.concurrent.ConcurrentLinkedQueue[
                (java.util.UUID, Long)]
              val l2 = new org.apache.spark.sql.streaming.StreamingQueryListener {
                override def onQueryStarted(e: org.apache.spark.sql.streaming
                  .StreamingQueryListener.QueryStartedEvent): Unit = ()
                override def onQueryProgress(e: org.apache.spark.sql.streaming
                    .StreamingQueryListener.QueryProgressEvent): Unit =
                  if (e.progress.numInputRows > 0)
                    durById.add((e.progress.id, e.progress.batchDuration))
                override def onQueryTerminated(e: org.apache.spark.sql.streaming
                  .StreamingQueryListener.QueryTerminatedEvent): Unit = ()
              }
              spark.streams.addListener(l2)
              val aqePrev =
                spark.conf.get("spark.sql.adaptive.enabled", "true")
              val shufPrev = spark.conf.get("spark.sql.shuffle.partitions")
              spark.conf.set("spark.sql.adaptive.enabled", "false")
              spark.conf.set("spark.sql.shuffle.partitions", "4")
              try {
                (0 until nq by 8).foreach { i =>
                  queries.filter(col("vec_id") >= i && col("vec_id") < i + 8)
                    .coalesce(1).write.mode("append").parquet(dir)
                }
                val served = new java.util.concurrent.atomic.AtomicLong(0L)
                val t0 = System.nanoTime()
                val srvQ = spark.readStream.schema(queries.schema)
                  .option("maxFilesPerTrigger", "1").parquet(dir)
                  .writeStream
                  .foreachBatch {
                    (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
                      if (handle.refreshIfFlipped()) flips.incrementAndGet()
                      served.addAndGet(graft.streaming.AnnServeStream
                        .serveFast(b, handle.index).count())
                      ()
                  }.start()
                try {
                  srvQ.processAllAvailable()
                  ingQ.processAllAvailable() // ingest finishes its 3 batches
                  // one more serving batch AFTER the flip is guaranteed
                  // visible — the post-flip side of the boundary is data
                  queries.filter(col("vec_id") < 8).coalesce(1)
                    .write.mode("append").parquet(dir)
                  srvQ.processAllAvailable()
                  if (handle.refreshIfFlipped()) flips.incrementAndGet()
                } finally { srvQ.stop(); }
                val wall = (System.nanoTime() - t0) / 1e9
                import scala.jdk.CollectionConverters._
                val srvDurs = durById.asScala
                  .collect { case (id, d) if id == srvQ.id => d }
                  .toSeq.sorted
                val (p50, p99) =
                  if (srvDurs.isEmpty) (0L, 0L)
                  else (srvDurs(srvDurs.size / 2),
                    srvDurs(math.min(srvDurs.size - 1,
                      (srvDurs.size * 99) / 100)))
                annIngestP50 = p50; annIngestP99 = p99
                annIngestQps = (served.get().toDouble / 5) / wall // k=5 rows/q
                require(served.get() > 0, "ingest-while-serving served 0 rows")
              } finally {
                spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
                spark.conf.set("spark.sql.shuffle.partitions", shufPrev)
                spark.streams.removeListener(l2)
                rmRf(dir)
              }
            } finally ingQ.stop()
            0.0
          }
          annIngestEnv = Some(envIng)
          import scala.jdk.CollectionConverters._
          annIngestDecisions = decisions.asScala.toSeq.sortBy(_.batchId)
            .map(_.decision.action)
          annIngestFlips = flips.get()
          val acts = annIngestDecisions.mkString(",")
          require(annIngestDecisions.count(_ == "retrained") >= 1,
            s"ingest rung must exercise a mid-serve retrain, got [$acts]")
          require(annIngestFlips >= 1,
            s"serving handle must adopt the CURRENT flip, got $annIngestFlips")
          phaseAudits += (("ann_ingest_serve",
            if (envIng.load > contamLoadBar) "contaminated" else "clean", 1))
          System.err.println(f"[bench] ann_ingest_serve: p50=${annIngestP50}ms" +
            f" p99=${annIngestP99}ms qps=$annIngestQps%.1f under ingest " +
            s"[$acts], flips=$annIngestFlips")
          handle.release()
          org.apache.commons.io.FileUtils.deleteDirectory(lifeDir.toFile)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] ann_ingest_serve failed: ${e.getMessage}")
          recErr("ann_ingest_serve", e)
        }
        idx.release()
      } catch { case e: Throwable =>
        System.err.println(s"[bench] ann_serve failed: ${e.getMessage}")
        recErr("ann_serve", e)
      } finally graft.util.Checkpoints.releaseOwned(spark)
    }

    // ---------------- per-query suite (AFTER the headline drains) ---------
    // The drain/floor headlines above run in this fresh forked JVM BEFORE
    // the suite touches the heap — the same conditions as the standalone
    // protocol (GRAFT_BENCH_SUITE=0), so their bands are comparable to the
    // README ladder and immune to suite heap history (r9/r10 observed
    // +10-60% run-level drift and 18.5 s pass-1 GC corrupting in-suite
    // headline numbers).
    // Warm-up: JIT, codegen, parquet footers — not timed, small SF.
    // GRAFT_BENCH_ONLY also filters the warm-up (iteration aid, r19): a
    // focused suite run should not pay a full 181-query warm-up pass. The
    // driver's full run leaves ONLY unset, so its warm-up is unchanged.
    // GRAFT_BENCH_WARM_ALL=1 (r20, iteration aid): keep the FULL warm-up
    // pass even under GRAFT_BENCH_ONLY — for A/B runs against pre-r19
    // trees whose warm-up never filtered (JIT state must match or the
    // focused comparison measures warm-up breadth, not the tree). The
    // driver's full run leaves both unset: warm-up unchanged.
    val onlyWarm =
      if (sys.env.getOrElse("GRAFT_BENCH_WARM_ALL", "0") == "1") None
      else sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    if (runSuite) SparkEntry.queries
      .filter { case (n, _) => onlyWarm.forall(_.contains(n)) }
      .foreach { case (_, fn) =>
        try runToNoop(fn(spark, "/root/testdata/sf0.001"))
        catch { case _: Throwable => () }
        finally graft.util.Checkpoints.releaseOwned(spark)
      }

    // min of 3 runs per query — the reference's component baseline is
    // min-of-5 (tests/benchmarks/baseline/components.json). The 3 passes are
    // INTERLEAVED round-robin across queries (pass 1 over all queries, then
    // pass 2, then 3): this box's contention windows last minutes, so three
    // back-to-back trials of one query all land inside the same window and
    // min() can't absorb it — round-robin spreads a window across every
    // query equally, keeping round-over-round deltas comparable.
    spark.catalog.clearCache() // drop warm-up-SF caches before timing
    // GRAFT_BENCH_ONLY=name1,name2 restricts the suite (iteration aid; the
    // driver's full run leaves it unset).
    val only = sys.env.get("GRAFT_BENCH_ONLY").map(_.split(",").toSet)
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val trials = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    val failedQ = scala.collection.mutable.Set.empty[String]
    // Per-PASS totals + GC time: r9 observed whole-suite run-level drift
    // (+10-25% across untouched queries between same-code full runs);
    // recording each round-robin pass's wall-clock sum and its GC delta
    // makes intra-run drift and GC pressure DATA in the artifact instead
    // of a post-hoc hypothesis.
    val passTotals = scala.collection.mutable.Buffer.empty[Double]
    val passGcMs = scala.collection.mutable.Buffer.empty[Long]
    // r16 (r15 VERDICT #5): per-pass heap + cached-block gauges next to
    // the pass totals — the r15 in-suite mm_video_stream +38 % band shift
    // (no code diff, suite gc 3×) could only be HYPOTHESIZED to be
    // checkpoint-traffic heap history; these make it attributable from
    // the artifact (storage climbing across passes = leaked/lingering
    // checkpoint blocks; heap climbing with flat storage = plain heap
    // history)
    val passHeapMb = scala.collection.mutable.Buffer.empty[Long]
    val passStorageMb = scala.collection.mutable.Buffer.empty[Long]
    // r17 (r16 VERDICT #3): the gauge measures RETENTION, not uncollected
    // allocation — the raw totalMemory−freeMemory read 8.5→11.4 GB
    // "growth" on the loaded recorded run vs ~350 MB flat on clean runs of
    // identical code (GC timing under load, not a leak), i.e. the raw
    // gauge can manufacture leak narratives. Force a full collection and
    // read the post-GC MemoryMXBean figure; the System.gc() sits BETWEEN
    // passes, off every timed window. The storage gauge is unchanged
    // (cached blocks flat at 7 MB per pass is the genuinely useful
    // signal; it disconfirmed the r15 checkpoint-leak hypothesis).
    def usedHeapMb: Long = {
      System.gc()
      (java.lang.management.ManagementFactory.getMemoryMXBean
        .getHeapMemoryUsage.getUsed / 1e6).toLong
    }
    def cachedBlockMb: Long =
      (spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1e6).toLong
    // per-pass 1-min load at pass START (r16 VERDICT #1: the recorded
    // suite ran at load 6.2–7.0 with pass-1 177.9 s vs 112–118 clean, and
    // only the floor env rows nearby priced it) — the suite's own
    // contamination verdict derives from these
    val passLoad = scala.collection.mutable.Buffer.empty[Double]
    // (total s, 1-min load at start, qualified count) of the bounded
    // suite retry pass, when one ran (r19 / r18 VERDICT #1)
    var suiteRetryRec: Option[(Double, Double, Int)] = None
    // GRAFT_BENCH_PASSES (iteration aid, r19): more interleaved passes for
    // focused A/B runs — min-of-N absorbs this box's cross-minute drift far
    // better than min-of-3. The driver's full run leaves it unset (3).
    val suitePasses = sys.env.getOrElse("GRAFT_BENCH_PASSES", "3").toInt
    if (runSuite) (1 to suitePasses).foreach { _ =>
      passLoad += loadAvg()
      val p0 = System.nanoTime(); val g0 = gcMs()
      ordered.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try runToNoop(fn(spark, sfDir))
        catch { case e: Throwable =>
          failedQ += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          recErr(s"suite:$name", e)
        }
        trials(name) = ((System.nanoTime() - t0) / 1e9) :: trials(name)
        // release query-owned checkpoints AFTER the timing capture: the
        // blocks' lifetime ends with the consumed output, so 183 queries
        // × 3 passes no longer accumulate pinned superseded frames
        graft.util.Checkpoints.releaseOwned(spark)
      }
      passTotals += (System.nanoTime() - p0) / 1e9
      passGcMs += gcMs() - g0
      passHeapMb += usedHeapMb
      passStorageMb += cachedBlockMb
    }
    if (runSuite && passTotals.nonEmpty) System.err.println(
      f"[bench] suite passes: [${passTotals.map(t => f"$t%.1f").mkString(", ")}] s, " +
        f"gc [${passGcMs.mkString(", ")}] ms")
    // suite contamination verdict. The load clause does NOT apply
    // here — the suite keeps all 32 cores busy continuously, so load at
    // pass start prices the suite itself; the discriminator is pass-total
    // scatter: clean runs read max/min ≤1.27 (r16_full1-3: [136,138,133],
    // [133,124,122], [152,119,139]) while the contaminated recorded run
    // read 1.50 ([178,119,119]) — bar 1.45.
    // r19 (r18 VERDICT #1): a contaminated verdict now triggers ONE
    // bounded re-pass over all queries — the suite was the one phase
    // where a transient pass (r18's pass 2: 227.2 s vs best 124.0, 11
    // trial outliers up to 31×) tainted the round's artifact with no
    // recourse. One re-pass is +⅓ of the suite, not the 2× that kept
    // r17 label-only; its trials merge into each query's min and the
    // verdict carries the provenance (clean_after_retry semantics,
    // zero-qualified rule included — see PhaseAudit.suiteRetryClean).
    if (runSuite && passTotals.nonEmpty) {
      val scatter = passTotals.max / passTotals.min
      if (scatter <= 1.45) phaseAudits += (("suite", "clean", 1))
      else {
        System.err.println(
          f"[bench] suite pass scatter $scatter%.2f > 1.45 — one bounded " +
            "re-pass after the quiet gate")
        waitQuiet(loadThresh, loadWaitBudgetS)
        val retryLoad = loadAvg()
        var retryQualified = 0
        val p0 = System.nanoTime(); val g0 = gcMs()
        ordered.foreach { case (name, fn) =>
          val t0 = System.nanoTime()
          val ok =
            try { runToNoop(fn(spark, sfDir)); true }
            catch { case e: Throwable =>
              // a retry-pass failure marks the query failed like any pass
              failedQ += name
              System.err.println(s"[bench] $name retry failed: ${e.getMessage}")
              recErr(s"suite_retry:$name", e); false
            }
          if (ok) {
            retryQualified += 1
            trials(name) = ((System.nanoTime() - t0) / 1e9) :: trials(name)
          }
          graft.util.Checkpoints.releaseOwned(spark)
        }
        val retryTotal = (System.nanoTime() - p0) / 1e9
        val clean = graft.metrics.PhaseAudit.suiteRetryClean(
          retryTotal, passTotals.toSeq, retryLoad, contamLoadBar,
          retryQualified)
        suiteRetryRec = Some((retryTotal, retryLoad, retryQualified))
        // the retry pass's rows land NEXT TO the originals so the
        // artifact's per-pass series stays parallel (pass 4 = retry)
        passTotals += retryTotal
        passGcMs += gcMs() - g0
        passHeapMb += usedHeapMb
        passStorageMb += cachedBlockMb
        passLoad += retryLoad
        phaseAudits +=
          (("suite", if (clean) "clean_after_retry" else "contaminated", 2))
        System.err.println(f"[bench] suite retry pass $retryTotal%.1f s " +
          f"(best original ${passTotals.dropRight(1).min}%.1f, load " +
          f"$retryLoad%.2f, qualified $retryQualified) — verdict " +
          (if (clean) "clean_after_retry" else "contaminated"))
      }
    }
    if (runSuite) ordered.foreach { case (name, _) =>
      // a failed query must not masquerade as a fast success
      results(name) = if (failedQ(name)) -1.0 else trials(name).min
    }
    // trial-aware suite audit (r17 VERDICT #3): the pass-TOTAL bar cannot
    // see one query's transient — r17's recorded pass 2 carried
    // mm_video_stream 11.93 s (8.7× its min) and mm_video_mjpeg 6.90 s
    // (5.7×) under a 1.06 pass-total scatter. Run the phase audit's
    // calibrated per-trial scatter clause over EVERY query's pass trials;
    // outliers land in the artifact as (query, pass, wall, ratio) rows
    // plus a per-pass count. Label-only like the suite verdict: the
    // interleaved min-of-3 already defends each headline min, and the
    // per-pass load rows + run verdict price the box.
    val suiteTrialOutliers =
      scala.collection.mutable.Buffer.empty[(String, Int, Double, Double)]
    if (runSuite) ordered.foreach { case (name, _) =>
      val ts = trials(name).reverse // prepended ⇒ reverse = pass order
      graft.metrics.PhaseAudit.trialOutliers(ts).foreach { case (i, t, x) =>
        suiteTrialOutliers += ((name, i + 1, t, x))
      }
    }
    val suitePassOutliers =
      if (runSuite && passTotals.nonEmpty)
        (1 to passTotals.size).map(p => suiteTrialOutliers.count(_._2 == p))
      else Seq.empty[Int]
    if (suiteTrialOutliers.nonEmpty) System.err.println(
      s"[bench] suite trial outliers (>3× own min, pass 1 exempt): " +
        suiteTrialOutliers.sortBy(-_._4).take(8).map { case (n, p, t, x) =>
          f"$n pass $p $t%.2f s (${x}%.1f×)" }.mkString("; "))

    // In-suite drift point: 3 more headline-drain trials AFTER the suite
    // has filled the heap, recorded as wal_drain_insuite — the fresh-vs-
    // dirty-heap delta becomes DATA in the artifact instead of a post-hoc
    // hypothesis about why rounds disagree.
    if (runDrain && runSuite) drainWorkloads(insuite = true)


    // The driver records only the LAST 2000 characters of stdout (BENCH_r06:
    // "tail" is exactly 2000 chars and sbt's "[success] Total time" epilogue
    // eats ~75 of them). The 118-query map is ~3 KB, so any single line that
    // carries it has its HEAD cut out of the window → parsed:null in r5 AND
    // r6. Structural fix: TWO lines. The full artifact goes first (and to a
    // file), then a compact summary line — bounded at headline metrics plus
    // the top-12 slowest suite queries, well under 1 KB — goes LAST so it
    // always survives the tail window whole, no matter how the suite grows.
    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + r3(v) }
        .mkString("{", ",", "}")
    // Exclusions from the summed "value": the 10× points are a different
    // workload scale, and live_drain only runs where postgres binaries exist
    // — summing any of them breaks round-over-round / cross-machine
    // comparability. They stay as individual query entries. Failed queries
    // (recorded as -1.0) must not be summed either: they'd subtract from the
    // total and corrupt it — list them separately instead.
    val nonComparable = Set("wal_drain_10x", "live_drain_10x", "live_drain",
      "live_drain_2db", "live_drain_4db", "live_drain_8db", "live_drain_2x4",
      "wal_drain_insuite") // a re-measurement, not a new workload
    val failed = results.collect { case (k, v) if v < 0 => k }.toSeq.sorted
    val total = results
      .filterNot { case (k, v) => nonComparable(k) || v < 0 }.values.sum
    // The 12 slowest suite queries, with PER-PASS times (pass order) in the
    // artifact: r12's in-suite sim_knn_graph swing (1.70→3.64 s) could only
    // be argued to be heap-history, not shown — per-pass values make a
    // min-of-3 swing attributable (all passes slow = plan/regime change;
    // later passes slow = heap/GC history) without changing the protocol.
    val slowest = results.toSeq
      .filterNot { case (k, v) => nonComparable(k) ||
        k.startsWith("wal_drain") || v < 0 }
      .sortBy(-_._2).take(12)
    val slowestTrials = slowest.flatMap { case (k, _) =>
      trials.get(k).map(ts => k -> ts.reverse) } // prepended ⇒ reverse = pass order
    val summaryKeys =
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""n_queries":${results.size},""" +
      s""""wal_drain_latency_ms":{"p50":$latencyP50,"p99":$latencyP99},""" +
      s""""wal_drain_trials":[${walTrialsRec.map(r3).mkString(",")}],""" +
      s""""wal_drain_insuite_trials":[${walInsuiteTrialsRec.map(r3).mkString(",")}],""" +
      s""""headline_isolation":"drains+floor run pre-suite on the fresh forked JVM; wal_drain_insuite re-measures post-suite",""" +
      s""""errors":${errs.map { case (k, v) =>
        jstr(k) + ":" + v.map(jstr).mkString("[", ",", "]")
      }.mkString("{", ",", "}")},""" +
      s""""wal_drain_env":[${walEnv.map(_.json).mkString(",")}],""" +
      s""""wal_drain_warmup_trials":[${
        walWarmupTrials.map(r3).mkString(",")}],""" +
      s""""wal_drain_warmup_cpu_s":[${
        walWarmupCpuS.map(r3).mkString(",")}],""" +
      s""""wal_drain_warmup_converged":$walWarmupConverged,""" +
      s""""wal_drain_10x_events":$drainEvents10,""" +
      s""""wal_drain_10x_trials":[${wal10TrialsRec.map(r3).mkString(",")}],""" +
      s""""wal_drain_10x_env":[${wal10Env.map(_.json).mkString(",")}],""" +
      s""""wal_drain_10x_warmup_s":${r3(wal10WarmupS)},""" +
      s""""wal_drain_10x_warmup_trials":[${
        wal10WarmupTrials.map(r3).mkString(",")}],""" +
      s""""wal_drain_10x_warmup_cpu_s":[${
        wal10WarmupCpuS.map(r3).mkString(",")}],""" +
      s""""wal_drain_10x_warmup_converged":$wal10WarmupConverged,""" +
      s""""wal_drain_10x_load_guard":{"wait_s":${r3(wal10LoadWaitS)},""" +
      s""""load":${r3(wal10LoadBefore)},"verdict":"$wal10LoadVerdict"},""" +
      s""""live_drain_events":$liveDrainEvents,""" +
      s""""live_drain_trials":[${liveTrialsRec.map(r3).mkString(",")}],""" +
      s""""live_drain_env":[${liveEnv.map(_.json).mkString(",")}],""" +
      s""""live_drain_10x_trials":[${live10TrialsRec.map(r3).mkString(",")}],""" +
      s""""live_drain_10x_predicted":${r3(live10Predicted)},""" +
      s""""live_drain_10x_ceiling":{"client_share_bound_pct":15,""" +
      s""""client_abs_baseline_s":${r3(Live10ClientBaselineS)},""" +
      s""""best_trial_read_wait_pct":${r3(live10BestPct)},""" +
      s""""best_trial_client_s":${r3(live10BestClientS)},""" +
      s""""median_trial_client_s":${r3(live10MedianClientS)},""" +
      s""""max_trial_read_wait_pct":${
        r3(if (live10ReadWaitPct.isEmpty) -1.0 else live10ReadWaitPct.max)
      },"verdict":"$live10Ceiling"},""" +
      s""""live_drain_10x_read_wait_pct":[${live10ReadWaitPct.map(r3).mkString(",")}],""" +
      s""""live_drain_10x_env":[${live10Env.map(_.json).mkString(",")}],""" +
      s""""live_drain_2db_trials":[${live2dbTrialsRec.map(r3).mkString(",")}],""" +
      s""""live_drain_2db_env":[${live2dbEnv.map(_.json).mkString(",")}],""" +
      s""""live_drain_4db_trials":[${live4dbTrialsRec.map(r3).mkString(",")}],""" +
      s""""live_drain_4db_env":[${live4dbEnv.map(_.json).mkString(",")}],""" +
      s""""live_drain_8db_trials":[${live8dbTrialsRec.map(r3).mkString(",")}],""" +
      s""""live_drain_8db_env":[${live8dbEnv.map(_.json).mkString(",")}],""" +
      s""""live_drain_2x4_trials":[${live2x4TrialsRec.map(r3).mkString(",")}],""" +
      s""""live_drain_2x4_env":[${live2x4Env.map(_.json).mkString(",")}],""" +
      s""""live_load_avg":{"before":${r3(liveLoadBefore)},"after":${r3(liveLoadAfter)}},""" +
      s""""live_load_guard":{"wait_s":${r3(liveLoadWaitS)},"verdict":"$liveLoadVerdict"},""" +
      s""""latency_floor_ms":{"p50":$floorP50,"p99":$floorP99},""" +
      s""""latency_floor_sync_ms":{"p50":$floorSyncP50,"p99":$floorSyncP99},""" +
      s""""latency_floor_wire_ms":{"p50":$floorWireP50,"p99":$floorWireP99},""" +
      s""""ann_serve_qps":${r3(annServeQps)},""" +
      s""""ann_serve_batch_ms":{"p50":$annServeP50,"p99":$annServeP99},""" +
      s""""ann_serve_qps_b8":${r3(annServeQpsB8)},""" +
      s""""ann_serve_batch_ms_b8":{"p50":$annServeB8P50,"p99":$annServeB8P99},""" +
      s""""ann_serve_qps_b64":${r3(annServeQpsB64)},""" +
      s""""ann_serve_batch_ms_b64":{"p50":$annServeB64P50,"p99":$annServeB64P99},""" +
      s""""ann_serve_noop_ms":{"p50":$annServeNoopP50,"p99":$annServeNoopP99},""" +
      // itemized machinery floor (r17 VERDICT #4): median ms per
      // durationMs component of the noop runs' batches, async serving
      // config + the sync durability-paired twin
      s""""ann_serve_breakdown":{${annServeBreakdown.toSeq
        .sortBy(-_._2).map { case (k, v) => s"${jstr(k)}:$v" }
        .mkString(",")}},""" +
      s""""ann_serve_noop_breakdown":{${annNoopBreakdown.toSeq
        .sortBy(-_._2).map { case (k, v) => s"${jstr(k)}:$v" }
        .mkString(",")}},""" +
      s""""ann_serve_noop_sync_ms":{"p50":$annServeNoopSyncP50,""" +
      s""""p99":$annServeNoopSyncP99},""" +
      s""""ann_serve_noop_sync_breakdown":{${annNoopSyncBreakdown.toSeq
        .sortBy(-_._2).map { case (k, v) => s"${jstr(k)}:$v" }
        .mkString(",")}},""" +
      s""""ann_serve_env":[${annServeEnv.map { case (pass, env) =>
        s"""{"pass":$pass,${env.json.tail}"""
      }.mkString(",")}],""" +
      // serving-knob sweep (r19): measured defaults for maxDriverLut ×
      // prepare(numPartitions)
      s""""ann_serve_sweep":[${annSweepRows.map {
        case (batch, lut, parts, p50, qps, env) =>
          s"""{"batch":$batch,"lut":"$lut","parts":$parts,"p50":$p50,""" +
            s""""qps":${r3(qps)},"env":${env.json}}"""
      }.mkString(",")}],""" +
      // ingest-while-serving rung (r19): serve latency under a live
      // lifecycle ingest, the per-batch decisions, adopted version flips
      s""""ann_ingest_serve":{"p50":$annIngestP50,"p99":$annIngestP99,""" +
      s""""qps":${r3(annIngestQps)},"decisions":[${annIngestDecisions
        .map(jstr).mkString(",")}],"flips":$annIngestFlips""" +
      annIngestEnv.fold("")(e => s""","env":${e.json}""") + "}," +
      s""""latency_floor_passes_ms":[${floorPassRows.map {
        case (variant, pass, p50, p99) =>
          s"""{"variant":"$variant","pass":$pass,"p50":$p50,"p99":$p99}"""
      }.mkString(",")}],""" +
      s""""latency_floor_gate":{"async_p50_baseline_ms":${
        r3(FloorAsyncP50BaselineMs)},"factor":1.3,""" +
      s""""recorded_p50":$floorP50,"verdict":"$floorGateVerdict"},""" +
      s""""latency_floor_env":[${floorEnv.map { case (variant, pass, env) =>
        s"""{"variant":"$variant","pass":$pass,${env.json.tail}"""
      }.mkString(",")}],""" +
      // r18: per-(variant, pass) durationMs medians — floor drift is now
      // attributable to a batch COMPONENT, not just an env row
      s""""latency_floor_breakdown":[${floorBreakdownRows
        .map { case (variant, pass, bd) =>
          s"""{"variant":"$variant","pass":$pass,"ms":{${bd.toSeq
            .sortBy(-_._2).map { case (k, v) => s"${jstr(k)}:$v" }
            .mkString(",")}}}"""
        }.mkString(",")}],""" +
      s""""suite_pass_totals":[${passTotals.map(r3).mkString(",")}],""" +
      s""""suite_pass_load":[${passLoad.map(r3).mkString(",")}],""" +
      s""""suite_pass_gc_ms":[${passGcMs.mkString(",")}],""" +
      s""""suite_pass_heap_mb":[${passHeapMb.mkString(",")}],""" +
      s""""suite_pass_storage_mb":[${passStorageMb.mkString(",")}],""" +
      s""""suite_slowest_trials":${slowestTrials.map { case (k, ts) =>
        "\"" + k + "\":[" + ts.map(r3).mkString(",") + "]"
      }.mkString("{", ",", "}")},""" +
      // per-query transient rows (r17 VERDICT #3) — capped at the 20
      // largest ratios so a fully-contaminated run cannot bloat the
      // artifact; the per-pass counts stay uncapped
      s""""suite_trial_outliers":[${suiteTrialOutliers.sortBy(-_._4)
        .take(20).map { case (n, p, t, x) =>
          s"""{"q":${jstr(n)},"pass":$p,"s":${r3(t)},"x":${r3(x)}}"""
        }.mkString(",")}],""" +
      s""""suite_pass_outliers":[${suitePassOutliers.mkString(",")}],""" +
      // provenance of the bounded suite retry pass, when one ran — its
      // per-pass rows are already the LAST entries of the suite_pass_*
      // series above
      suiteRetryRec.fold("") { case (t, l, q) =>
        s""""suite_retry":{"total_s":${r3(t)},"load":${r3(l)},""" +
          s""""qualified":$q},"""
      } +
      s""""disk_free_gb":{"start":${r3(diskFreeStart)},"end":${r3(diskFreeGb())}},""" +
      // r17 (r16 VERDICT #1): the run's numbers carry their own
      // credibility — per-phase contamination verdicts (each phase's
      // trials/env rows stay recorded across retries) and the run-level
      // roll-up: clean ⟺ no phase ended contaminated or audit_error
      s""""contam_load_bar":${r3(contamLoadBar)},""" +
      s""""phase_audits":[${phaseAudits.map { case (p, v, a) =>
        s"""{"phase":"$p","verdict":"$v","attempts":$a}"""
      }.mkString(",")}],""" +
      s""""run_env_verdict":"${
        if (phaseAudits.exists(pa =>
          pa._2 == "contaminated" || pa._2 == "audit_error"))
          "contaminated" else "clean"}",""" +
      s""""sf":"$sfDir""""
    val fullJson =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      summaryKeys + s""","queries":${jmap(results.toSeq)}}"""
    // Compact map: the drain/latency headline points plus the 12 slowest
    // suite queries (the ones worth comparing round-over-round by eye).
    val headline = Seq("wal_drain", "wal_drain_wire", "wal_drain_2slot",
      "wal_drain_4slot", "wal_drain_10x", "live_drain", "live_drain_10x",
      "live_drain_2db", "live_drain_4db", "live_drain_8db", "live_drain_2x4")
      .flatMap(k => results.get(k).map(k -> _))
    val compactJson =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""queries":${jmap(headline ++ slowest)},""" + summaryKeys +
      s""","full_queries":"bench_out/latest.json"}"""
    // Full artifact to a file the judge/driver can open: bench_out/ in the
    // CWD (the driver runs sbt from the repo root; the dir is gitignored so
    // the write never dirties `git status`). GRAFT_BENCH_OUT overrides.
    val outPath = sys.env.getOrElse("GRAFT_BENCH_OUT", {
      Files.createDirectories(Paths.get("bench_out"))
      "bench_out/latest.json"
    })
    Files.writeString(Paths.get(outPath), fullJson + "\n")
    // r13 regression: the "compact" line embeds summaryKeys, which has
    // grown past the 2000-char tail window (env arrays, read-wait arrays,
    // per-pass slowest-trials) — its HEAD got cut and the driver recorded
    // parsed:null, the exact r5/r6 failure mode returning through summary
    // growth. Structural fix: a third MICRO line goes LAST — headline
    // metrics + the slowest suite queries ONLY, no summaryKeys, with a
    // hard size budget enforced by dropping slowest-entries until it
    // fits. The full artifact is the file + first stdout line; the
    // compact line stays for humans scanning mid-stream.
    // the micro line's failed list is BOUNDED (r14 ADVICE: a run with many
    // failed queries could push even microLine(0) past the 1.5 KB window
    // through the unbounded failed array — reproducing the exact
    // parsed:null failure the micro line exists to fix): first 8 names
    // plus a count; the full list lives in the file artifact.
    val failedMicro = (
      failed.take(8).map("\"" + _ + "\"") ++
        (if (failed.size > 8) Seq("\"+" + (failed.size - 8) + " more\"")
         else Nil)
      ).mkString("[", ",", "]")
    // the run-level env verdict rides even the micro line: a reader of
    // the 2000-char tail learns whether the numbers are clean or labeled
    val runEnvVerdict =
      if (phaseAudits.exists(pa =>
        pa._2 == "contaminated" || pa._2 == "audit_error"))
        "contaminated" else "clean"
    def microLine(nSlowest: Int): String =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""queries":${jmap(headline ++ slowest.take(nSlowest))},""" +
      s""""failed":$failedMicro,"failed_count":${failed.size},""" +
      s""""run_env_verdict":"$runEnvVerdict",""" +
      s""""n_queries":${results.size},"sf":"$sfDir",""" +
      s""""full_queries":"$outPath"}"""
    // last-resort fallback stays valid JSON and bounded: no queries map,
    // no failed names — never a mid-string truncation
    val microMinimal =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec",""" +
      s""""queries":${jmap(headline)},"failed_count":${failed.size},""" +
      s""""run_env_verdict":"$runEnvVerdict",""" +
      s""""n_queries":${results.size},"sf":"$sfDir",""" +
      s""""full_queries":"$outPath"}"""
    val microJson = (12 to 0 by -1).map(microLine)
      .find(_.length <= 1500).getOrElse(microMinimal)
    // stdout (fork + StdoutOutput keep the lines unprefixed): full first,
    // micro LAST — a bounded tail-window scanner always finds the micro
    // line whole, no matter how the summary fields grow.
    println(fullJson)
    println(compactJson)
    println(microJson)
    graft.queries.ExtQueries.invalidateKnnEdges(spark) // release checkpoint blocks
    spark.stop()
  }
}
