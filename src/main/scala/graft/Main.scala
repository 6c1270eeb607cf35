package graft

import graft.config.ConfigLoader
import graft.metrics.{GraftMetrics, GraftQueryListener, MetricsHttp, StallWatchdog}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.SparkSession

/** Application entry point — the reference's `main` flow
  * (reference: src/main.zig:42-177): load config → validate → wire source,
  * sink, metrics → run until signalled.
  *
  * {{{
  *   runMain graft.Main <config.json> <walDir> <checkpointDir> [outDir]
  * }}}
  *
  * With `sink.type=kafka` and GRAFT_KAFKA_BOOTSTRAP set, frames go to Kafka
  * with the reference's producer semantics; otherwise the file sink stands
  * in. Metrics HTTP (/metrics /healthz /readyz) serves on GRAFT_HTTP_PORT
  * (default: ephemeral).
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: graft.Main <config.json> <walDir> <checkpointDir> [outDir]")
    val Array(configPath, walDir, ckptDir) = args.take(3)
    val outDir = args.lift(3).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-out").toString)

    // config load + validation is fail-fast, before any connection is made
    val config = ConfigLoader.fromJsonFile(configPath)

    val spark = SparkSession.builder()
      .appName("graft")
      .master(sys.env.getOrElse("SPARK_MASTER",
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val metrics = new GraftMetrics
    spark.streams.addListener(new GraftQueryListener(metrics, config.streams))
    val http = new MetricsHttp(metrics,
      sys.env.getOrElse("GRAFT_HTTP_PORT", "0").toInt)
    val port = http.start()
    println(s"[graft] metrics on :$port — streams: " +
      config.streams.map(s => s"${s.name}(${s.resource}→${s.destination})")
        .mkString(", "))

    // live wire: with a postgres block in the config AND its connection env
    // var set, open the replication socket and pump the walsender into the
    // WAL dir the source reads (reference: src/main.zig:179-238 wiring).
    // Without it, walDir is expected to be fed externally (tests, replays).
    val spooler = config.postgres.flatMap { pg =>
      pg.connectionUri.map { uri =>
        val ep = graft.source.postgres.SocketCopyBothChannel.parseUri(uri)
        val ch = graft.source.postgres.SocketCopyBothChannel.connect(
          ep, pg.slotName, pg.publicationName,
          startLsn = graft.model.ChangeEvent.lsnText(
            graft.source.wal.WalLog.confirmed(walDir)))
        val sp = new graft.source.postgres.ReplicationSpooler(ch, walDir)
        val t = new Thread(() => {
          try while (true) { sp.pump(); metrics.heartbeat(); Thread.sleep(10) }
          catch { case e: Throwable =>
            metrics.lastError.compareAndSet(null, s"replication wire: ${e.getMessage}")
          }
        }, "graft-replication-pump")
        t.setDaemon(true)
        t.start()
        sp
      }
    }

    val query = StreamingPipeline.start(
      spark, walDir, config.streams, ckptDir, outDir,
      kafkaBootstrap = sys.env.get("GRAFT_KAFKA_BOOTSTRAP"),
      triggerMs = sys.env.getOrElse("GRAFT_TRIGGER_MS", "100").toLong)

    // stall fail-fast: silent wire past the liveness window stops the query
    // and we exit nonzero so the supervisor restarts from the checkpoint
    val watchdog = StallWatchdog(metrics, query).start()

    sys.addShutdownHook { query.stop(); http.stop() }
    if (sys.env.contains("GRAFT_DRAIN_AND_EXIT")) {
      query.processAllAvailable()
      query.stop()
      watchdog.close()
      println(s"[graft] drained; events=${metrics.eventsProcessed.get()} " +
        s"batches=${metrics.batchesProcessed.get()}")
      http.stop()
      spark.stop()
    } else {
      query.awaitTermination()
      watchdog.close()
      if (watchdog.stalled) {
        System.err.println(s"[graft] ${metrics.lastError.get()}")
        sys.exit(1)
      }
    }
  }
}
