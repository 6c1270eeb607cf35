package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Watermarked windowed aggregation over the live change stream — the
  * streaming twin of the batch `events_window_agg` query. */
class StreamingAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("watermarked tumbling-window counts over the WAL stream match batch") {
    import graft.source.wal.WalFixture
    val walDir = Files.createTempDirectory("graft-aggwal").toString
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .orderBy("event_id").collect().iterator
      .map(WalFixture.evFromRow)
    WalFixture.writeLog(ev, walDir)

    val stream = StreamingPipeline.walStream(spark, walDir)
      .withColumn("event_time", col("commit_ts").cast("timestamp"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour"), col("resource"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("win_agg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg")
        .select(col("window.start").cast("long").as("w"), col("resource"), col("n"))
      val batch = graft.cdc.ChangeLog.changelog(spark, SparkTestBase.sf)
        .groupBy((col("commit_ts") - col("commit_ts") % 3600).as("w"), col("resource"))
        .agg(count(lit(1)).as("n"))
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0)
    } finally q.stop()
  }

  test("watermarked hopping-window (1h slide 30min) counts match the batch " +
      "2-slot explode formula") {
    import graft.source.wal.WalFixture
    val walDir = Files.createTempDirectory("graft-hopwal").toString
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .orderBy("event_id").collect().iterator
      .map(WalFixture.evFromRow)
    WalFixture.writeLog(ev, walDir)

    val stream = StreamingPipeline.walStream(spark, walDir)
      .withColumn("event_time", col("commit_ts").cast("timestamp"))
      .withWatermark("event_time", "1 hour")
      .groupBy(window(col("event_time"), "1 hour", "30 minutes"),
        col("resource"))
      .agg(count(lit(1)).as("n"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("hop_agg").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hop_agg")
        .select(col("window.start").cast("long").as("w"), col("resource"),
          col("n"))
      // the batch side of events_hop_window's expansion: each event lands in
      // size/slide = 2 windows starting at (ts div slide − k) · slide
      val batch = graft.cdc.ChangeLog.changelog(spark, SparkTestBase.sf)
        .select(col("commit_ts"), col("resource"),
          explode(array(lit(0L), lit(1L))).as("k"))
        .select(((expr("commit_ts div 1800") - col("k")) * lit(1800L))
          .as("w"), col("resource"))
        .groupBy(col("w"), col("resource"))
        .agg(count(lit(1)).as("n"))
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0)
    } finally q.stop()
  }
}
