package graft

import graft.source.wal.WalFixture
import graft.streaming.SequenceMatch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streamed sequence matcher's stage-advancement counts must equal the
  * batch `events_funnel_steps` stage counts, and the strictly-after
  * semantics must hold at microsecond ties. */
class SequenceMatchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed stage counts equal the batch three-stage funnel") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("user_id"), col("event_type"), col("ts").as("ts_us"),
        col("event_id"))
    val dir = Files.createTempDirectory("graft-seq-src").toString
    val Array(lo, hi) = ev.stat.approxQuantile("ts_us", Array(0.33, 0.66), 0.01)
    ev.filter(col("ts_us") < lo.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= lo.toLong && col("ts_us") < hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val q = SequenceMatch.matches(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir), Seq("view", "click", "purchase"))
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("seq_match").start()
    try {
      q.processAllAvailable()
      val prog = spark.table("seq_match")
      // exactly one advancement per (user, stage)
      assert(prog.groupBy("user_id", "stage").count()
        .filter(col("count") > 1).count() == 0)
      def reached(k: Int): Long =
        prog.filter(col("stage") === k).select("user_id").distinct().count()

      val batch = graft.queries.AnalyticsQueries.eventsFunnelSteps
        ._1(spark, SparkTestBase.sf).head()
      assert(reached(1) == batch.getLong(0), "stage 1 = n_viewed")
      assert(reached(2) == batch.getLong(1), "stage 2 = n_clicked")
      assert(reached(3) == batch.getLong(2), "stage 3 = n_purchased")
    } finally q.stop()
  }

  test("strictly-after semantics: a same-microsecond next stage does not match") {
    val stages = IndexedSeq("view", "click")
    var st: Option[SequenceMatch.SState] = None
    val gs = new org.apache.spark.sql.streaming.GroupState[SequenceMatch.SState] {
      override def exists: Boolean = st.isDefined
      override def get: SequenceMatch.SState = st.get
      override def getOption: Option[SequenceMatch.SState] = st
      override def update(v: SequenceMatch.SState): Unit = st = Some(v)
      override def remove(): Unit = st = None
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
    val evs = Seq(
      SequenceMatch.SEvent(1L, "view", 1000L, 1L),
      SequenceMatch.SEvent(1L, "click", 1000L, 2L), // tie: must NOT match
      SequenceMatch.SEvent(1L, "click", 1001L, 3L)) // strictly after: matches
    val out = SequenceMatch.update(stages)(1L, evs.iterator, gs).toList
    assert(out.map(_.stage) == List(1L, 2L))
    assert(out.last.ts_us == 1001L)
  }
}
