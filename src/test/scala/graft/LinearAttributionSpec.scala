package graft

import graft.source.wal.WalFixture
import graft.streaming.LinearAttribution
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming linear attribution must converge to the batch
  * events_attribution_linear rollup when events arrive in event-time
  * order, and the per-type lookback state must credit/expire exactly. */
class LinearAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed credits aggregate to the batch attribution rollup") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), col("ts").as("ts_us"),
        col("event_id"), col("event_type"))
    // value-range batch splits (same rationale as AsofAttributionSpec): a
    // µs tie straddling a row-split boundary would replay a same-µs touch
    // AFTER the purchase the batch rule says it precedes
    val Array(lo, hi) = ev.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.01)
    val dir = Files.createTempDirectory("graft-linattr-src").toString
    ev.filter(col("ts_us") < lo.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= lo.toLong && col("ts_us") < hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = LinearAttribution.attribute(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(dir))
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("lin_attr").start()
    try {
      q.processAllAvailable()
      val got = spark.table("lin_attr")
        .groupBy(col("touch_type"))
        .agg(sum(col("credit_e6")).as("total_credit_e6"),
          count(lit(1)).as("n_conversions"))
      val batch = graft.queries.AnalyticsQueries
        .eventsAttributionLinear._1(spark, SparkTestBase.sf)
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0,
        "stream credit rollup diverges from the batch attribution")
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("lookback expiry and per-type dedup: one credit per type in window, " +
      "none outside it, state carries across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-linattr-state").toString
    def writeBatch(rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("user_id", "ts_us", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    val t0 = 1700000000L * 1000000L
    val wk = LinearAttribution.LookbackUs
    // batch 1: an error-touch far outside the lookback, then two views and
    // a click inside it; batch 2: the purchase — credits view+click (2
    // types, the double view deduped) and NOT the expired error type
    writeBatch(Seq(
      (7L, t0 - wk - 5L, 1L, "error"),
      (7L, t0 + 10L, 2L, "view"),
      (7L, t0 + 20L, 3L, "view"),
      (7L, t0 + 30L, 4L, "click")))
    writeBatch(Seq((7L, t0 + 40L, 5L, "purchase")))

    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", "long").add("ts_us", "long")
      .add("event_id", "long").add("event_type", "string")
    val stream = LinearAttribution.attribute(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(dir))
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("lin_attr_state").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("lin_attr_state").collect()
        .sortBy(_.getAs[String]("touch_type"))
      assert(rows.length == 2, s"expected view+click only: ${rows.toSeq}")
      assert(rows.map(_.getAs[String]("touch_type")).toSeq ==
        Seq("click", "view"))
      rows.foreach { r =>
        assert(r.getAs[Long]("conv_id") == 5L)
        assert(r.getAs[Long]("n_types") == 2L)
        assert(r.getAs[Long]("credit_e6") == 500000L)
      }
    } finally q.stop()
  }
}
