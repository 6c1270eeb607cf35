package graft

import graft.source.wal.WalFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The NATIVE stream-stream interval join (build rule: compose built-ins
  * when semantics allow, custom state only when they don't): purchases
  * joined to the same user's clicks within the preceding 30 minutes, both
  * sides watermarked so Spark bounds the join state — click state older
  * than the interval + delay is evicted, which is what makes a
  * stream-stream join viable on an unbounded stream. Result must converge
  * to the equivalent batch range join.
  */
class StreamIntervalJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("watermarked stream-stream interval join converges to the batch range join") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), col("ts").as("ts_us"),
        col("event_id"), col("event_type"))
    val dir = Files.createTempDirectory("graft-ssj-src").toString
    // two event-time-ordered file batches (value split, never row split)
    val Array(mid) = ev.stat.approxQuantile("ts_us", Array(0.5), 0.01)
    ev.filter(col("ts_us") < mid.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= mid.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").option("latestFirst", "false")
      .parquet(dir)
      .withColumn("event_time", (col("ts_us") / 1000000L).cast("timestamp"))
    val clicks = src.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts_us").as("click_us"),
        col("event_id").as("click_id"), col("event_time").as("c_time"))
      .withWatermark("c_time", "1 minute")
    val purchases = src.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts_us").as("p_us"),
        col("event_id").as("p_id"), col("event_time").as("p_time"))
      .withWatermark("p_time", "1 minute")

    val joined = purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_time") >= col("p_time") - expr("interval 30 minutes") &&
        col("c_time") < col("p_time"))
      .select(col("p_id"), col("p_user"), col("p_us"),
        col("click_id"), col("click_us"))

    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ssj")

      // batch truth: the IDENTICAL timestamp cast and interval predicate,
      // joined directly — only execution differs, never semantics
      val evT = ev.withColumn("event_time",
        (col("ts_us") / 1000000L).cast("timestamp"))
      val c = evT.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_us").as("click_us"),
          col("event_id").as("click_id"), col("event_time").as("c_time"))
      val p = evT.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts_us").as("p_us"),
          col("event_id").as("p_id"), col("event_time").as("p_time"))
      val batch = p.join(c,
        col("p_user") === col("c_user") &&
          col("c_time") >= col("p_time") - expr("interval 30 minutes") &&
          col("c_time") < col("p_time"))
        .select(col("p_id"), col("p_user"), col("p_us"),
          col("click_id"), col("click_us"))

      assert(got.count() == batch.count(),
        s"stream=${got.count()} batch=${batch.count()}")
      assert(got.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }
}
