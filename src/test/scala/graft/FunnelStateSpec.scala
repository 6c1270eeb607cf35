package graft

import graft.source.wal.WalFixture
import graft.streaming.FunnelState
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streamed funnel's final per-user states must fold to exactly the
  * batch `events_funnel` counts, and the status stream must be bounded by
  * two emissions per user (entered, converted). */
class FunnelStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed funnel state folds to the batch conversion counts") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), col("event_type"), col("ts").as("ts_us"),
        col("event_id"))
    val dir = Files.createTempDirectory("graft-funnel-src").toString
    // three event-time-ordered file batches (value split, never row split)
    val Array(lo, hi) = ev.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.01)
    ev.filter(col("ts_us") < lo.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= lo.toLong && col("ts_us") < hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val q = FunnelState.statuses(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir))
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("funnel_status").start()
    try {
      q.processAllAvailable()
      val statuses = spark.table("funnel_status")
      // ≤2 status changes per user, monotone: signup before converted
      val perUser = statuses.groupBy("user_id")
        .agg(count(lit(1)).as("n"), sum(col("converted").cast("int")).as("nc"))
      assert(perUser.filter(col("n") > 2).count() == 0)

      // fold: last status per user (converted is monotone, so max() is it)
      val finalState = statuses.groupBy("user_id")
        .agg(max(col("converted").cast("int")).as("conv"))
      val nSignup = finalState.count()
      val nConv = finalState.filter(col("conv") === 1).count()

      val batch = graft.queries.AnalyticsQueries.eventsFunnel
        ._1(spark, SparkTestBase.sf).head()
      assert(nSignup == batch.getLong(0),
        s"signup users: stream $nSignup vs batch ${batch.getLong(0)}")
      assert(nConv == batch.getLong(1),
        s"converted: stream $nConv vs batch ${batch.getLong(1)}")
    } finally q.stop()
  }

  test("a purchase at exactly the first-signup microsecond does not convert") {
    import spark.implicits._
    val st0 = FunnelState.FState(-1L, converted = false)
    val evs = Seq(
      FunnelState.FEvent(7L, "signup", 1000L, 1L),
      FunnelState.FEvent(7L, "purchase", 1000L, 2L), // tie: NOT strictly after
      FunnelState.FEvent(7L, "purchase", 999L, 3L))  // before: never converts
    val out = new TestGroupState(st0)
    val emitted = FunnelState.update(7L, evs.iterator, out).toList
    assert(emitted.map(_.converted) == List(false)) // entered funnel only
    assert(!out.value.converted && out.value.firstSignupUs == 1000L)
  }

  /** Minimal GroupState stand-in for direct update() unit tests. */
  private class TestGroupState[T](init: T)
      extends org.apache.spark.sql.streaming.GroupState[T] {
    var value: T = init
    private var defined = false
    override def exists: Boolean = defined
    override def get: T = value
    override def getOption: Option[T] = if (defined) Some(value) else None
    override def update(newValue: T): Unit = { value = newValue; defined = true }
    override def remove(): Unit = defined = false
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(durationMs: Long): Unit = ()
    override def setTimeoutDuration(duration: String): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long): Unit = ()
    override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }

  test("funnel_steps single-scan form equals the three-slice form (sf0.001)") {
    val spark = SparkTestBase.spark
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.AnalyticsQueries.funnelStepsThreeSlice(spark, dir).head()
    val b = graft.queries.AnalyticsQueries.funnelStepsSingleScan(spark, dir).head()
    assert(a == b, s"three-slice $a != single-scan $b")
  }
}
