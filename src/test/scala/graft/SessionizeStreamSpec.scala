package graft

import graft.source.wal.WalFixture
import graft.streaming.SessionizeStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The native-session-window streaming twin must produce exactly the batch
  * `events_sessionize` sessions — same (user, start, event count) set —
  * after the watermark finalizes them, including sessions that MERGE
  * across micro-batch boundaries (the time-split replay guarantees some
  * sessions span files).
  */
class SessionizeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed session windows equal the batch sessionization") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), expr("timestamp_micros(ts)").as("ts"),
        col("event_id"))
    val dir = Files.createTempDirectory("graft-sess-stream-src").toString
    val Array(lo, hi) = ev.selectExpr("unix_micros(ts) AS us")
      .stat.approxQuantile("us", Array(0.33, 0.66), 0.01)
    ev.filter(expr(s"unix_micros(ts) < ${lo.toLong}")).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(expr(s"unix_micros(ts) >= ${lo.toLong} AND unix_micros(ts) < ${hi.toLong}"))
      .coalesce(1).write.mode("append").parquet(dir)
    ev.filter(expr(s"unix_micros(ts) >= ${hi.toLong}")).coalesce(1)
      .write.mode("append").parquet(dir)
    // sentinel far past every session's close: advances the watermark so
    // append mode finalizes and emits ALL real sessions
    val maxUs = ev.agg(max(expr("unix_micros(ts)"))).head().getLong(0)
    spark.range(1).select(lit(-1L).as("user_id"),
        expr(s"timestamp_micros(${maxUs + 86400000000L})").as("ts"),
        lit(-1L).as("event_id"))
      .coalesce(1).write.mode("append").parquet(dir)

    val q = SessionizeStream.sessions(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir))
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sess_stream").filter(col("user_id") >= 0)
      val want = graft.queries.AnalyticsQueries.eventsSessionize
        ._1(spark, SparkTestBase.sf)
        .select(col("user_id"), col("session_start_us"), col("n_events"))
      assert(got.count() == want.count(),
        s"session counts: stream ${got.count()} vs batch ${want.count()}")
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
        "streamed sessions must equal the batch sessions row-for-row")
    } finally q.stop()
  }
}
