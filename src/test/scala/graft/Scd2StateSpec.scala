package graft

import graft.cdc.ChangeLog
import graft.streaming.Scd2State
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streamed SCD2 emissions, folded per (resource, id, lsn_num) by
  * keeping the closed row over the open one, must equal the batch
  * `cdc_scd2` query VALUE-EXACT — same rows, same validity windows — and
  * the emission volume must be ≤ 2 rows per change.
  */
class Scd2StateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed SCD2 folds to the batch history value-exact") {
    val cl = ChangeLog.changelog(spark, SparkTestBase.sf)
      .select(col("resource"), col("id"), col("op"), col("lsn_num"),
        col("commit_ts"), col("user_id"), col("value"))
    val nChanges = cl.count()
    val dir = Files.createTempDirectory("graft-scd2-src").toString
    // three lsn-ordered file batches (split on lsn VALUE, so per-key order
    // across micro-batches matches the log order)
    val Array(lo, hi) = cl.stat.approxQuantile("lsn_num", Array(0.33, 0.66), 0.01)
    cl.filter(col("lsn_num") < lo.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    cl.filter(col("lsn_num") >= lo.toLong && col("lsn_num") < hi.toLong)
      .coalesce(1).write.mode("append").parquet(dir)
    cl.filter(col("lsn_num") >= hi.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val q = Scd2State.history(
      spark.readStream.schema(cl.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir))
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("scd2_hist").start()
    try {
      q.processAllAvailable()
      val emitted = spark.table("scd2_hist")
      assert(emitted.count() <= 2 * nChanges,
        "emission volume must be bounded by 2 rows per change")

      // fold: closed row (is_current=false) supersedes the open emission
      val folded = emitted.groupBy("resource", "id", "lsn_num")
        .agg(min(struct(col("is_current"), col("valid_to_ts"), col("op"),
          col("user_id"), col("value"), col("valid_from_ts"))).as("r"))
        .select(col("resource"), col("id"), col("r.op").as("op"),
          col("lsn_num"), col("r.user_id").as("user_id"),
          col("r.value").as("value"),
          col("r.valid_from_ts").as("valid_from_ts"),
          col("r.valid_to_ts").as("valid_to_ts"),
          col("r.is_current").as("is_current"))

      val batch = graft.queries.CdcQueries.cdcScd2._1(spark, SparkTestBase.sf)
      assert(folded.count() == batch.count(),
        s"row counts: stream ${folded.count()} vs batch ${batch.count()}")
      assert(folded.exceptAll(batch).isEmpty && batch.exceptAll(folded).isEmpty,
        "streamed fold must equal the batch history row-for-row")
    } finally q.stop()
  }

  test("a DELETE closes the open version and the next INSERT reopens") {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    val changes = Seq(
      Scd2State.Change("t", 7L, "INSERT", 10L, 100L, 1L, 1.0),
      Scd2State.Change("t", 7L, "UPDATE", 20L, 200L, 1L, 2.0),
      Scd2State.Change("t", 7L, "DELETE", 30L, 300L, 1L, 0.0),
      Scd2State.Change("t", 7L, "INSERT", 40L, 400L, 2L, 3.0))
    val state = new TestGroupState[Scd2State.Open]
    val out = Scd2State.update(("t", 7L), changes.iterator, state).toSeq
    // emissions: open(10), close(10@200), open(20), close(20@300), open(40)
    assert(out.map(r => (r.lsn_num, r.is_current, r.valid_to_ts)) == Seq(
      (10L, true, Scd2State.OpenTs), (10L, false, 200L),
      (20L, true, Scd2State.OpenTs), (20L, false, 300L),
      (40L, true, Scd2State.OpenTs)))
    assert(state.value.exists(_.lsn_num == 40L))
  }
}

/** Minimal in-memory GroupState for direct update() unit tests. */
final class TestGroupState[T] extends org.apache.spark.sql.streaming.GroupState[T] {
  var value: Option[T] = None
  private var removed = false
  override def exists: Boolean = value.isDefined
  override def get: T = value.get
  override def getOption: Option[T] = value
  override def update(newValue: T): Unit = { value = Some(newValue); removed = false }
  override def remove(): Unit = { value = None; removed = true }
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
