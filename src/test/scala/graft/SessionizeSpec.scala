package graft

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
    val ev = spark.read.parquet(s"${SparkTestBase.sf}/events.parquet")
      .select(col("user_id"), expr("ts div 1000").as("ts_us"))
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
}
