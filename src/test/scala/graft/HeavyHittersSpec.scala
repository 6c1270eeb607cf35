package graft

import graft.source.wal.WalFixture
import graft.streaming.HeavyHitters
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** SpaceSaving trending: (a) when every hour's distinct-user count fits the
  * summary capacity the streamed top-k is EXACT and equals the batch
  * `events_trending_topk` result; (b) under capacity pressure the
  * guarantees still hold: overestimates bounded by err, and every true
  * heavy hitter (count > N/m) is retained. */
class HeavyHittersSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed summary equals the batch top-k when capacity suffices") {
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(expr("ts div 3600000000").as("hr"), col("user_id"),
        col("ts").as("ts_us"), col("event_id"))
    // capacity must dominate every hour's distinct users for exactness
    val worst = ev.groupBy("hr").agg(countDistinct(col("user_id")).as("d"))
      .agg(max(col("d"))).head().getLong(0)
    assert(worst <= HeavyHitters.Capacity,
      s"fixture has an hour with $worst distinct users > capacity")

    val dir = Files.createTempDirectory("graft-hh-src").toString
    val Array(mid) = ev.stat.approxQuantile("ts_us", Array(0.5), 0.01)
    ev.filter(col("ts_us") < mid.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= mid.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val q = HeavyHitters.trending(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir))
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("hh_trending").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("hh_trending")
      // latest emission per hour; exact summaries carry err = 0
      val latest = rows.withColumn("mx", max(col("seq")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("hr")))
        .filter(col("seq") === col("mx"))
      assert(latest.filter(col("err") =!= 0).count() == 0)

      val got = latest.select(col("hr"), col("rank"), col("user_id"),
        col("est").as("n_events"))
      val batch = graft.queries.AnalyticsQueries.eventsTrendingTopk
        ._1(spark, SparkTestBase.sf)
        .select(col("hr"), col("rank"), col("user_id"), col("n_events"))
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("overestimate and heavy-hitter guarantees under capacity pressure") {
    val m = 4
    // 8 distinct ids over capacity 4; id 100 is the true heavy hitter
    val streamIds = Seq.fill(20)(100L) ++ (1L to 7L) ++ Seq.fill(10)(100L) ++
      (1L to 7L).flatMap(i => Seq(i, i))
    val truth = streamIds.groupBy(identity).view.mapValues(_.size.toLong).toMap
    var items = Map.empty[Long, (Long, Long)]
    streamIds.foreach(id => items = HeavyHitters.observe(items, id, m))
    assert(items.size <= m)
    // every estimate is within [true, true + err]
    items.foreach { case (id, (est, err)) =>
      val t = truth(id)
      assert(est >= t && est - err <= t, s"id $id: est $est err $err true $t")
    }
    // any id with true count > N/m must be in the summary
    val n = streamIds.size
    truth.collect { case (id, c) if c > n / m => id }.foreach { hh =>
      assert(items.contains(hh), s"heavy hitter $hh evicted")
    }
    // the dominant item's estimate is exact (never evicted)
    assert(items(100L)._1 == truth(100L) && items(100L)._2 == 0L)
  }
}
