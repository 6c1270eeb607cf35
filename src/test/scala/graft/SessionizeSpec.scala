package graft

import graft.source.wal.WalFixture
import graft.streaming.Sessionize
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming sessionization must converge to the batch events_sessionize
  * result once all sessions are closed. */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("event-time sessions close on gap/timeout and match the batch query") {
    // events as a file stream (two file batches so sessions span triggers),
    // plus one far-future sentinel event per user that pushes the watermark
    // past every real session's horizon, closing them all
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), col("ts").as("ts_us"))
    val maxUs = ev.agg(max("ts_us")).head().getLong(0)
    val sentinels = ev.select(col("user_id")).distinct()
      .withColumn("ts_us", lit(maxUs + 86400L * 1000000L))
    val dir = Files.createTempDirectory("graft-sess-src").toString
    ev.coalesce(1).write.mode("append").parquet(dir)
    sentinels.coalesce(1).write.mode("append").parquet(dir)

    val stream = Sessionize.sessions(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(dir),
      watermarkDelay = "1 minute")
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions")
        .select("user_id", "session_start_us", "session_end_us", "n_events")
      val batch = graft.queries.AnalyticsQueries.eventsSessionize._1(spark, SparkTestBase.sf)
        .select("user_id", "session_start_us", "session_end_us", "n_events")
      // every real (non-sentinel) session must match the batch result
      val gotReal = got.filter(col("session_start_us") <= maxUs)
      assert(gotReal.count() == batch.count())
      assert(gotReal.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(gotReal).count() == 0)
    } finally q.stop()
  }

  test("an admitted event far behind the eviction watermark must not kill the query") {
    // Spark 3.4+ splits the watermark: late-event filtering uses the
    // PREVIOUS batch's value, state eviction the CURRENT one. An event can
    // therefore be admitted while sitting more than `gap` behind the
    // eviction watermark — session_end + gap is then EARLIER than the
    // watermark, and an unclamped setTimeoutTimestamp throws, failing the
    // whole query. Repro: batch 1 pushes the watermark 3h ahead (user 2),
    // batch 2 delivers a user-1 event only 10min in (admitted — the late
    // filter still holds batch 0's watermark), batch 3's sentinel closes
    // everything.
    import spark.implicits._
    val t0 = 1700000000L * 1000000L // arbitrary epoch µs
    val h = 3600L * 1000000L
    val dir = Files.createTempDirectory("graft-sess-clamp").toString
    def writeBatch(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "ts_us").coalesce(1).write.mode("append").parquet(dir)
    // both files exist BEFORE the query starts: batch 1 (user 2, t0+3h)
    // advances the eviction watermark, batch 2 (user 1, t0+10min) is still
    // admitted because the late filter lags one batch behind
    writeBatch(Seq((2L, t0 + 3 * h)))
    writeBatch(Seq((1L, t0 + 600L * 1000000L)))

    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", "long").add("ts_us", "long")
    val stream = Sessionize.sessions(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(dir),
      watermarkDelay = "1 minute")
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions_clamp").start()
    try {
      q.processAllAvailable() // unclamped: IllegalArgumentException here
      writeBatch(Seq((3L, t0 + 30 * h))) // sentinel: close everything
      q.processAllAvailable()
      val got = spark.table("sessions_clamp")
      // user 2's session closed; user 1's was either admitted (clamped
      // timeout, closed by the sentinel) or legitimately late-filtered —
      // but the query itself must survive either way
      assert(got.filter(col("user_id") === 2L).count() == 1)
      assert(q.exception.isEmpty)
    } finally q.stop()
  }

  test("watermarkDelay > gap: a late event opens its own past session (batch parity)") {
    // delay 3 h, gap 30 min: an event 2 h older than the open session is
    // ADMITTED by the watermark but more than a gap away — it must become
    // its own session in the past, exactly as the batch query sessionizes
    // it, not be silently absorbed into the newer session
    import spark.implicits._
    val t0 = 1700000000L * 1000000L
    val h = 3600L * 1000000L
    val dir = Files.createTempDirectory("graft-sess-late").toString
    def writeBatch(rows: Seq[(Long, Long)]): Unit =
      rows.toDF("user_id", "ts_us").coalesce(1).write.mode("append").parquet(dir)
    writeBatch(Seq((1L, t0 + 2 * h)))  // opens session at t0+2h
    writeBatch(Seq((1L, t0)))          // 2h late — admitted (delay 3h)
    writeBatch(Seq((1L, t0 + 48 * h))) // sentinel: seals everything real

    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", "long").add("ts_us", "long")
    val stream = Sessionize.sessions(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(dir),
      watermarkDelay = "3 hours")
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("sessions_late").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions_late")
        .filter(col("session_start_us") < t0 + 48 * h)
        .select("session_start_us", "session_end_us", "n_events")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((t0, t0, 1L), (t0 + 2 * h, t0 + 2 * h, 1L)),
        s"late event must form its own session; got $got")
      assert(q.exception.isEmpty)
    } finally q.stop()
  }
}
