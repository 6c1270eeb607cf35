package graft

import graft.source.wal.WalFixture
import graft.streaming.AsofAttribution
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Streaming last-touch attribution must converge to the batch
  * events_asof_join result when events arrive in event-time order, and the
  * single-row click state must survive batch boundaries. */
class AsofAttributionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed attribution over ordered arrivals matches the batch as-of join") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), col("ts").as("ts_us"),
        col("event_id"), col("event_type"))
    // three file batches split by VALUE ranges of ts_us (never row ranges:
    // a µs tie straddling a batch boundary would reorder a click behind
    // the purchase it should attribute)
    val Array(lo, hi) = ev.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.01)
    val dir = Files.createTempDirectory("graft-asof-src").toString
    ev.filter(col("ts_us") < lo.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= lo.toLong && col("ts_us") < hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val stream = AsofAttribution.attribute(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(dir))
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("asof_attr").start()
    try {
      q.processAllAvailable()
      val got = spark.table("asof_attr")
        .select("event_id", "user_id", "p_us", "click_id", "click_us", "gap_us")
      val batch = graft.queries.AnalyticsQueries.eventsAsofJoin._1(spark, SparkTestBase.sf)
        .select("event_id", "user_id", "p_us", "click_id", "click_us", "gap_us")
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0,
        "stream attributed a purchase differently from the batch as-of")
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("click state carries across batches; a late older click cannot regress it") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-asof-state").toString
    def writeBatch(rows: Seq[(Long, Long, Long, String)]): Unit =
      rows.toDF("user_id", "ts_us", "event_id", "event_type")
        .coalesce(1).write.mode("append").parquet(dir)
    val t0 = 1700000000L * 1000000L
    // batch 1: the user's click; batch 2: an OLDER straggler click plus the
    // purchase — attribution must use batch 1's newer click
    writeBatch(Seq((7L, t0 + 100L, 10L, "click")))
    writeBatch(Seq((7L, t0 + 50L, 11L, "click"), (7L, t0 + 200L, 12L, "purchase")))

    val schema = new org.apache.spark.sql.types.StructType()
      .add("user_id", "long").add("ts_us", "long")
      .add("event_id", "long").add("event_type", "string")
    val stream = AsofAttribution.attribute(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false").parquet(dir))
    val q = stream.toDF().writeStream.outputMode("append")
      .format("memory").queryName("asof_state").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("asof_state").collect()
      assert(rows.length == 1)
      val r = rows.head
      assert(r.getAs[Long]("event_id") == 12L)
      assert(r.getAs[Long]("click_id") == 10L,
        "must attribute to the batch-1 click, not the older straggler")
      assert(r.getAs[Long]("gap_us") == 100L)
    } finally q.stop()
  }
}
