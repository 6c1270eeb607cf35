package graft

import graft.operators.Routing
import graft.source.wal.WalFixture
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.Files

/** Benchmark main (driver contract): one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology:
  *  - `noop` sink writes force full column computation (a bare count() lets
  *    Catalyst prune the serialization/hash work out of the plan)
  *  - one warm-up pass at sf0.001 amortizes JIT + codegen before timing
  *  - `wal_drain` is the CDC headline: events rendered as pgoutput WAL
  *    (setup, untimed), then timed decode → convert → route → serialize →
  *    sink drain through the streaming source in large micro-batches — the
  *    reference's backlog-drain workload (tests/load/README.md)
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

    // CDC drain: the reference's headline workload — steady-state backlog
    // drain (tests/load/README.md measures a 70 s drain of a pre-built WAL
    // backlog, excluding process startup). Prime the running query on a
    // small first segment (absorbs stream/codegen startup), then time the
    // drain of the real backlog appended behind it. min-of-2 full cycles —
    // the box this runs on shows 2x contention swings.
    try {
      val rows = spark.read.parquet(s"$sfDir/events.parquet").orderBy("event_id")
        .collect()
      def toEv(r: org.apache.spark.sql.Row) =
        WalFixture.Ev(r.getLong(0), r.getLong(1) / 1000L, r.getLong(2),
          r.getString(3), r.getDouble(4), r.getString(5))
      val (prime, backlog) = rows.splitAt(1000)
      def oneDrain(): Double = {
        val walDir = Files.createTempDirectory("graft-bench-wal").toString
        val outDir = Files.createTempDirectory("graft-bench-out").toString
        val ckptDir = Files.createTempDirectory("graft-bench-ckpt").toString
        // each segment re-announces its relations (fresh `seen`) — required
        // by the reader's segment pruning, as a walsender does per session
        def writeSegment(idx: Int, seg: Array[org.apache.spark.sql.Row]): Unit = {
          val seen = scala.collection.mutable.Set.empty[String]
          graft.source.wal.WalLog.write(
            java.nio.file.Paths.get(walDir, f"$idx%08d.wal"),
            seg.iterator.flatMap(r => WalFixture.frames(toEv(r), seen)))
        }
        writeSegment(0, prime)
        // sliceEvents splits the batch into ~32 parallel decode partitions
        // (99k-event backlog / 3000 ≈ one slice per core on this box)
        val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
          ckptDir, outDir, kafkaBootstrap = None, triggerMs = 0L,
          maxEventsPerBatch = Int.MaxValue, sliceEvents = 3000)
        q.processAllAvailable() // prime: startup + first segment
        writeSegment(1, backlog)
        val t0 = System.nanoTime()
        q.processAllAvailable()
        val secs = (System.nanoTime() - t0) / 1e9
        q.stop()
        secs
      }
      val secs = Seq(oneDrain(), oneDrain(), oneDrain()).min
      results("wal_drain") = secs
      System.err.println(
        f"[bench] wal_drain: ${backlog.length} events in $secs%.2f s = " +
          f"${backlog.length / secs}%.0f events/s")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] wal_drain failed: ${e.getMessage}")
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout line for the driver (fork + StdoutOutput keep it unprefixed) AND
    // a file copy in case the driver prefers to read one
    println(json)
    java.nio.file.Files.writeString(java.nio.file.Paths.get("bench_out.json"), json + "\n")
    spark.stop()
  }
}
