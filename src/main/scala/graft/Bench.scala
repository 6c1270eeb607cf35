package graft

import graft.operators.Routing
import graft.source.wal.{WalFixture, WalLog}
import graft.streaming.{MultiSlot, StreamingPipeline}
import graft.streaming.MultiSlot.SlotSpec
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.{col, max, min}
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
  *    p50/p99 latency rides the listener. `wal_drain_2slot` drains the same
  *    backlog split across two slots (the scale-out axis).
  *  - GRAFT_BENCH_SCALE=N replicates the event backlog N× (shifted ids) for
  *    an order-of-magnitude drain point without new fixtures.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runToNoop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm-up: JIT, codegen, parquet footers — not timed, small SF.
    SparkEntry.queries.foreach { case (_, fn) =>
      try runToNoop(fn(spark, "/root/testdata/sf0.001"))
      catch { case _: Throwable => () }
    }

    // min of 3 runs per query — the reference's component baseline is
    // min-of-5 (tests/benchmarks/baseline/components.json); min absorbs GC
    // and machine-contention spikes (this box swings ~2x under contention)
    spark.catalog.clearCache() // drop warm-up-SF caches before timing
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      var failed = false
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        try runToNoop(fn(spark, sfDir))
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must not masquerade as a fast success
      results(name) = if (failed) -1.0 else times.min
    }

    // ---------------- CDC drain workloads ----------------
    // The reference's headline: steady-state backlog drain
    // (tests/load/README.md measures a 70 s drain of a pre-built WAL
    // backlog, excluding process startup).
    var latencyP50 = 0L; var latencyP99 = 0L
    var drainEvents = 0L
    try {
      val scale = sys.env.getOrElse("GRAFT_BENCH_SCALE", "1").toInt
      val ev0 = spark.read.parquet(s"$sfDir/events.parquet")
      // replicate with shifted ids for GRAFT_BENCH_SCALE > 1 (same schema,
      // same op mix; LSNs stay unique because they derive from event_id)
      val idSpan = {
        val r = ev0.agg(min("event_id"), max("event_id")).head()
        r.getLong(1) - r.getLong(0) + 1
      }
      val ev = (0 until scale).map { k =>
        if (k == 0) ev0
        else ev0.withColumn("event_id", col("event_id") + k * idSpan)
      }.reduce(_ unionByName _)
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
      def renderRange(walDir: String, lo: Long, hi: Long, firstSeg: Int,
          nSegs: Int): Unit = {
        ev.filter(col("event_id").between(lo, hi))
          .repartitionByRange(nSegs, col("event_id"))
          .sortWithinPartitions("event_id")
          .foreachPartition { (it: Iterator[Row]) =>
            if (it.hasNext) {
              val pid = org.apache.spark.TaskContext.getPartitionId()
              val seen = scala.collection.mutable.Set.empty[String]
              val frames = it.flatMap { r =>
                WalFixture.frames(WalFixture.Ev(r.getLong(0), r.getLong(1) / 1000L,
                  r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)),
                  seen)
              }
              WalLog.write(Paths.get(walDir, f"${firstSeg + pid}%08d.wal"), frames)
            }
          }
      }

      // -------- single-slot drain (the baseline-comparable headline) -----
      val metrics = new graft.metrics.GraftMetrics
      val listener = new graft.metrics.GraftQueryListener(metrics)
      spark.streams.addListener(listener)
      def oneDrain(): Double = {
        val walDir = Files.createTempDirectory("graft-bench-wal").toString
        val outDir = Files.createTempDirectory("graft-bench-out").toString
        val ckptDir = Files.createTempDirectory("graft-bench-ckpt").toString
        renderRange(walDir, minId, primeCut, 0, 1)
        // sliceEvents splits the batch into ~32 parallel decode partitions
        // (99k-event backlog / 3000 ≈ one slice per core on this box)
        val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
          ckptDir, outDir, kafkaBootstrap = None, triggerMs = 0L,
          maxEventsPerBatch = Int.MaxValue, sliceEvents = 3000)
        q.processAllAvailable() // prime: startup + first segment
        renderRange(walDir, primeCut + 1, maxId, 1, if (scale > 1) 4 * scale else 1)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        q.stop()
        secs
      }
      val secs = Seq(oneDrain(), oneDrain(), oneDrain()).min
      results("wal_drain") = secs
      val (p50, p99) = metrics.batchLatencyMs
      latencyP50 = p50; latencyP99 = p99
      spark.streams.removeListener(listener)
      System.err.println(
        f"[bench] wal_drain: $drainEvents events in $secs%.2f s = " +
          f"${drainEvents / secs}%.0f events/s (batch p50=${p50}ms p99=${p99}ms)")

      // -------- 2-slot drain (scale-out axis: near-linear per slot) ------
      def twoSlotDrain(): Double = {
        val walA = Files.createTempDirectory("graft-bench-wal2a").toString
        val walB = Files.createTempDirectory("graft-bench-wal2b").toString
        val outDir = Files.createTempDirectory("graft-bench-out2").toString
        val ckptDir = Files.createTempDirectory("graft-bench-ckpt2").toString
        val mid = minId + (maxId - minId) / 2
        renderRange(walA, minId, primeCut, 0, 1)
        renderRange(walB, mid + 1, mid + 1000, 0, 1)
        val handles = MultiSlot.start(spark,
          Seq(SlotSpec("a", walA), SlotSpec("b", walB)),
          Routing.fixtureStreams, ckptDir, outDir, triggerMs = 0L,
          maxEventsPerBatch = Int.MaxValue, sliceEvents = 3000)
        MultiSlot.drainAll(handles) // prime both slots
        renderRange(walA, primeCut + 1, mid, 1, if (scale > 1) 2 * scale else 1)
        renderRange(walB, mid + 1001, maxId, 1, if (scale > 1) 2 * scale else 1)
        val t0 = System.nanoTime()
        MultiSlot.drainAll(handles)
        val secs = (System.nanoTime() - t0) / 1e9
        MultiSlot.stopAll(handles)
        secs
      }
      val secs2 = Seq(twoSlotDrain(), twoSlotDrain()).min
      results("wal_drain_2slot") = secs2
      System.err.println(
        f"[bench] wal_drain_2slot: ~$drainEvents events over 2 slots in " +
          f"$secs2%.2f s = ${drainEvents / secs2}%.0f events/s")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] wal_drain failed: ${e.getMessage}")
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec",""" +
      s""""queries":$qs,""" +
      s""""wal_drain_latency_ms":{"p50":$latencyP50,"p99":$latencyP99},""" +
      s""""sf":"$sfDir"}"""
    // stdout line for the driver (fork + StdoutOutput keep it unprefixed) AND
    // a file copy — under tmp or GRAFT_BENCH_OUT, never the repo CWD (a CWD
    // write lands untracked in git status and concurrent runs clobber it)
    println(json)
    val outPath = sys.env.getOrElse("GRAFT_BENCH_OUT",
      s"${sys.props("java.io.tmpdir")}/graft_bench_out.json")
    Files.writeString(Paths.get(outPath), json + "\n")
    spark.stop()
  }
}
