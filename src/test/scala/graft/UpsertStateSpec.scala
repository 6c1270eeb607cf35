package graft

import graft.streaming.{StreamingPipeline, UpsertState}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Stateful streaming upsert over the WAL stream must converge to the same
  * final table state as the batch window materialization. */
class UpsertStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("flatMapGroupsWithState materialization matches batch upsert state") {
    import graft.source.wal.WalFixture
    val walDir = Files.createTempDirectory("graft-upsert-wal").toString
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .orderBy("event_id").collect().iterator
      .map(WalFixture.evFromRow)
    WalFixture.writeLog(ev, walDir)

    // small batches so state persists across many micro-batches
    val stream = UpsertState.materialize(
      StreamingPipeline.walStream(spark, walDir, maxEventsPerBatch = 500))
    val q = stream.toDF().writeStream.outputMode("update")
      .format("memory").queryName("upsert_state").start()
    try {
      q.processAllAvailable()
      // final state per key = the highest-LSN update emitted
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("resource", "id").orderBy(col("lsn_num").desc)
      val finalState = spark.table("upsert_state")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("live"))
        .select(col("resource"), col("id"), col("last_op"))
      val batch = graft.queries.CdcQueries.cdcUpsertState._1(spark, SparkTestBase.sf)
        .select(col("resource"), col("id"), col("last_op"))
      assert(finalState.count() == batch.count())
      assert(finalState.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(finalState).count() == 0)
    } finally q.stop()
  }
}
