package graft

import graft.streaming.{StreamingPipeline, UpsertState}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The scale claim "RocksDB state store slots in without code changes" must
  * actually hold: run the stateful upsert materialization under the RocksDB
  * provider and get the same converged state. */
class RocksDbStateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("stateful upsert converges identically under the RocksDB state store") {
    import graft.source.wal.WalFixture
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val walDir = Files.createTempDirectory("graft-rocks-wal").toString
      val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
        .orderBy("event_id").collect().iterator
        .map(WalFixture.evFromRow)
      WalFixture.writeLog(ev, walDir)
      val stream = UpsertState.materialize(
        StreamingPipeline.walStream(spark, walDir, maxEventsPerBatch = 500))
      val q = stream.toDF().writeStream.outputMode("update")
        .format("memory").queryName("rocks_upsert").start()
      try {
        q.processAllAvailable()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("resource", "id").orderBy(col("lsn_num").desc)
        val finalState = spark.table("rocks_upsert")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("live"))
          .select("resource", "id", "last_op")
        val batch = graft.queries.CdcQueries.cdcUpsertState._1(spark, SparkTestBase.sf)
          .select("resource", "id", "last_op")
        assert(finalState.count() == batch.count())
        assert(finalState.exceptAll(batch).count() == 0)
      } finally q.stop()
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
