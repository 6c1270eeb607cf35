package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Consumer-side streaming dedup with dropDuplicatesWithinWatermark — the
  * SURVEY §7E at-least-once consumer pattern: redelivered envelopes (same
  * meta.lsn) inside the watermark horizon collapse to one, with bounded
  * state (the watermark evicts old keys — the property that makes LSN dedup
  * viable on an unbounded stream). */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("redelivered envelopes dedup by lsn within the watermark") {
    // changelog, then its last 10% AGAIN as a separate file — with
    // maxFilesPerTrigger=1 the redelivery arrives in a LATER micro-batch, so
    // dedup must happen across batches through the watermark state store
    // (within one batch any batch-local distinct would pass vacuously)
    val cl = graft.cdc.ChangeLog.changelog(spark, SparkTestBase.sf)
      .withColumn("event_time", col("commit_ts").cast("timestamp"))
    val maxLsn = cl.agg(max("lsn_num")).head().getLong(0)
    val dir = Files.createTempDirectory("graft-dedup-src").toString
    cl.coalesce(1).write.mode("append").parquet(dir)
    cl.filter(col("lsn_num") >= maxLsn * 9 / 10)
      .coalesce(1).write.mode("append").parquet(dir)

    val stream = spark.readStream.schema(cl.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark(Seq("lsn"))
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream").start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_stream")
      assert(got.count() == cl.count(), "each LSN delivered exactly once")
      assert(got.groupBy("lsn").count().filter(col("count") > 1).count() == 0)
    } finally q.stop()
  }
}
