package graft

import graft.source.wal.WalFixture
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The fixture harness has written `events.ts` with DIFFERENT physical
  * types across rounds — TIMESTAMP(NANOS) (reads as a ns Long under
  * `nanosAsLong`) through r6, TIMESTAMP(MICROS) (reads as TimestampNTZ)
  * from r7 — and the first flip broke 27 tests. This spec pins BOTH
  * branches of the two adaptive funnels so the next flip is a no-op:
  * whatever the physical type, `WalFixture.eventsUs` yields the same
  * µs-Long `ts` and `AnalyticsQueries` queries the same results. */
class EventsTsAdaptivitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  /** One fixture dir per branch, same logical rows: `ts` as a raw ns Long
    * (what a NANOS file looks like through the nanosAsLong flag) and as a
    * genuine timestamp column (what a MICROS file reads as). */
  private lazy val (nsDir, usDir, expectUs) = {
    val base = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .orderBy("event_id").limit(500)
    val expect = base.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val ns = Files.createTempDirectory("graft-ts-ns").toString
    base.withColumn("ts", col("ts") * 1000L)
      .write.parquet(s"$ns/events.parquet")

    val us = Files.createTempDirectory("graft-ts-us").toString
    base.withColumn("ts", timestamp_micros(col("ts")))
      .write.parquet(s"$us/events.parquet")
    (ns, us, expect)
  }

  test("eventsUs normalizes a Long ts column to the same µs values") {
    val got = WalFixture.eventsUs(spark, nsDir)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expectUs)
  }

  test("eventsUs normalizes a timestamp ts column to the same µs values") {
    val tsType = spark.read.parquet(s"$usDir/events.parquet")
      .schema("ts").dataType
    assert(tsType != org.apache.spark.sql.types.LongType,
      s"fixture must exercise the non-Long branch, got $tsType")
    val got = WalFixture.eventsUs(spark, usDir)
      .select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expectUs)
  }

  test("an AnalyticsQueries window aggregate is identical on both forms") {
    val q = graft.queries.AnalyticsQueries.eventsWindowAgg._1
    val a = q(spark, nsDir).orderBy("window_start_us", "event_type").collect()
    val b = q(spark, usDir).orderBy("window_start_us", "event_type").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
