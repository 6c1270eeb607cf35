package graft

import graft.operators.Routing
import graft.sink.frames.{FramesLog, FramesSink}
import graft.source.wal.{WalFixture, WalLog}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** The DSv2 frames sink ([[graft.sink.frames.FramesSink]]): file-mode
  * broker-style append with the epoch-marker flush barrier, at-least-once
  * redelivery on a lost commit ack, wire-mode delivery to a scripted broker,
  * and Spark's async progress tracking accepted on the DSv2 path (the
  * latency-floor fix — ForeachBatchSink is rejected by
  * AsyncProgressTrackingMicroBatchExecution, pinned below). */
class FramesSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def writeBacklog(walDir: String, n: Int): Unit = {
    val seen = scala.collection.mutable.Set.empty[String]
    val events = (1L to n.toLong).map(i => WalFixture.Ev(i,
      1700000000000000L + i * 1000000L, i % 5,
      Seq("click", "purchase", "signup", "view")(i.toInt % 4), i * 0.5, "{}"))
    WalLog.write(Paths.get(walDir, "00000000.wal"),
      events.iterator.flatMap(e => WalFixture.frames(e, seen)))
  }

  test("file mode delivers the same frame set as the parquet stand-in") {
    val walDir = Files.createTempDirectory("graft-fr-wal").toString
    writeBacklog(walDir, 120)

    def drain(sinkFormat: String): org.apache.spark.sql.DataFrame = {
      val out = Files.createTempDirectory(s"graft-fr-$sinkFormat-out").toString
      val ckpt = Files.createTempDirectory(s"graft-fr-$sinkFormat-ck").toString
      val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
        ckpt, out, triggerMs = 25L, sinkFormat = sinkFormat)
      try q.processAllAvailable() finally q.stop()
      if (sinkFormat == "frames") FramesLog.read(spark, out)
        .select("topic", "key", "value", "lsn")
      else spark.read.parquet(out).select("topic", "key", "value", "lsn")
    }

    val frames = drain("frames")
    val parquet = drain("parquet")
    assert(frames.count() == parquet.count())
    assert(frames.exceptAll(parquet).isEmpty && parquet.exceptAll(frames).isEmpty,
      "frames sink must deliver byte-identical (topic,key,value,lsn) frames")
  }

  test("lost commit ack: epoch fails loudly, restart redelivers, lsn dedup collapses") {
    val walDir = Files.createTempDirectory("graft-fr2-wal").toString
    writeBacklog(walDir, 80)
    val out = Files.createTempDirectory("graft-fr2-out").toString
    val ckpt = Files.createTempDirectory("graft-fr2-ck").toString
    val token = "frames-spec-" + System.nanoTime()
    FramesSink.registerCommitFailures(token, 1)

    def run(): Unit = {
      val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
        ckpt, out, triggerMs = 25L, sinkFormat = "frames",
        failCommitsToken = Some(token))
      try q.processAllAvailable() finally q.stop()
    }
    // first run: files + epoch marker land, THEN the ack is lost → the
    // query dies loudly (fail-fast, no silent drop)
    val ex = intercept[StreamingQueryException] { run() }
    assert(ex.getMessage.contains("injected") ||
      Option(ex.getCause).exists(_.getMessage.contains("injected")))
    // restart from the same checkpoint: the unconfirmed epoch REDELIVERS
    run()
    val log = FramesLog.read(spark, out).cache()
    try {
      val total = log.count()
      val distinct = log.dropDuplicates("lsn").count()
      assert(total > distinct, s"expected redelivered duplicates, log=$total")
      // redelivered frames byte-identical per lsn (consumer dedup is sound)
      assert(log.groupBy("lsn").agg(countDistinct("value").as("nv"))
        .filter(col("nv") > 1).count() == 0)
      // deduped set == one clean delivery
      val cleanOut = Files.createTempDirectory("graft-fr2b-out").toString
      val cleanCk = Files.createTempDirectory("graft-fr2b-ck").toString
      val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
        cleanCk, cleanOut, triggerMs = 25L, sinkFormat = "frames")
      try q.processAllAvailable() finally q.stop()
      assert(distinct == FramesLog.read(spark, cleanOut).count())
    } finally log.unpersist()
  }

  test("async progress tracking: accepted on the DSv2 sink, full delivery, restart safe") {
    val walDir = Files.createTempDirectory("graft-fr3-wal").toString
    writeBacklog(walDir, 100)
    val out = Files.createTempDirectory("graft-fr3-out").toString
    val ckpt = Files.createTempDirectory("graft-fr3-ck").toString
    val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
      ckpt, out, triggerMs = 5L, sinkFormat = "frames", asyncProgress = true)
    try q.processAllAvailable() finally q.stop()
    val first = FramesLog.read(spark, out).dropDuplicates("lsn").count()
    val routed = first
    assert(routed > 0, "async drain must deliver the routed backlog")

    // restart: async checkpointing may replay a suffix (wider redelivery
    // window — the documented trade); dedup on lsn still collapses exactly
    val q2 = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
      ckpt, out, triggerMs = 5L, sinkFormat = "frames", asyncProgress = true)
    try q2.processAllAvailable() finally q2.stop()
    assert(FramesLog.read(spark, out).dropDuplicates("lsn").count() == routed,
      "restart must not invent or lose frames after lsn dedup")
  }

  test("async progress tracking is structurally unavailable to foreachBatch (why the DSv2 sink exists)") {
    val walDir = Files.createTempDirectory("graft-fr4-wal").toString
    writeBacklog(walDir, 5)
    val out = Files.createTempDirectory("graft-fr4-out").toString
    val ckpt = Files.createTempDirectory("graft-fr4-ck").toString
    // same async options, v1 foreachBatch sink: Spark rejects the sink at
    // start — the pinned blocker that motivates the frames sink
    val frame = StreamingPipeline.kafkaFrame(
      StreamingPipeline.walStream(spark, walDir), Routing.fixtureStreams)
    val ex = intercept[Exception] {
      val q = frame.writeStream
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .option(FramesSink.AsyncEnabled, "true")
        .option(FramesSink.AsyncOverrideSinkCheck, "false")
        .option("checkpointLocation", ckpt)
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex.getMessage.toLowerCase.contains("async progress tracking") ||
      Option(ex.getCause).exists(
        _.getMessage.toLowerCase.contains("async progress tracking")),
      s"expected the async sink-support rejection, got: ${ex.getMessage}")
  }

  test("wire mode: DSv2 per-task producers deliver to a scripted broker with flush barrier") {
    val broker = new FakeKafkaBroker(Map("cdc.click" -> 2, "cdc.purchase" -> 2,
      "cdc.signup" -> 1, "cdc.view" -> 1))
    try {
      val walDir = Files.createTempDirectory("graft-fr5-wal").toString
      writeBacklog(walDir, 60)
      val out = Files.createTempDirectory("graft-fr5-out").toString
      val ckpt = Files.createTempDirectory("graft-fr5-ck").toString
      val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
        ckpt, out, kafkaBootstrap = Some(s"wire://localhost:${broker.port}"),
        triggerMs = 25L, sinkFormat = "frames")
      try q.processAllAvailable() finally q.stop()
      // every routed frame is on the broker exactly once (no epoch failed):
      // compare against a file-mode drain of the same backlog
      val out2 = Files.createTempDirectory("graft-fr5b-out").toString
      val ck2 = Files.createTempDirectory("graft-fr5b-ck").toString
      val q2 = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
        ck2, out2, triggerMs = 25L, sinkFormat = "frames")
      try q2.processAllAvailable() finally q2.stop()
      import spark.implicits._
      val routed = FramesLog.read(spark, out2)
        .select("topic", "value").as[(String, String)].collect().toSeq.sorted
      val onBroker = broker.receivedSeq.map(r => (r._1, r._4)).sorted
      assert(onBroker == routed,
        s"broker holds ${onBroker.size} frames, routed ${routed.size}")
    } finally broker.close()
  }
}
