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

  test("streaming HLL distinct users per resource lands within 10% of batch exact") {
    // the sketch family's streaming twin (r12, completing the
    // events_approx_distinct contract): approx_count_distinct's HLL buffers
    // are mergeable streaming state, so the one-pass sketch the batch query
    // runs carries to the stream unchanged — constant state per group where
    // an exact streaming distinct would hold every key. The gate mirrors
    // the batch query's in-band oracle: each streamed estimate within 10%
    // of the batch EXACT distinct (HLL rsd 0.02 ⇒ ~5× margin).
    import graft.source.wal.WalFixture
    val walDir = Files.createTempDirectory("graft-hllwal").toString
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .orderBy("event_id").collect().iterator
      .map(WalFixture.evFromRow)
    WalFixture.writeLog(ev, walDir)

    // user_id rides the envelope's data JSON on the stream side; restrict
    // both sides to INSERTs so the contract doesn't depend on which row
    // image DELETE events carry
    val stream = StreamingPipeline.walStream(spark, walDir)
      .filter(col("op") === "INSERT")
      .select(col("resource"),
        get_json_object(col("data"), "$.user_id").cast("long").as("user_id"))
      .groupBy(col("resource"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx"))
    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("hll_distinct").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hll_distinct").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = graft.cdc.ChangeLog.changelog(spark, SparkTestBase.sf)
        .filter(col("op") === "INSERT")
        .groupBy(col("resource"))
        .agg(countDistinct(col("user_id")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.keySet == exact.keySet, s"resources ${got.keySet} vs ${exact.keySet}")
      got.foreach { case (res, a) =>
        val e = exact(res).toDouble
        assert(math.abs(a - e) <= 0.10 * e, s"$res: stream HLL $a vs exact $e")
      }
    } finally q.stop()
  }
}
