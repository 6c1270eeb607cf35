package graft
import graft.operators.Routing
import graft.source.wal.{WalFixture, WalLog}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Drain cost breakdown: full pipeline to parquet vs foreachBatch-count-only
  * (no sink IO) vs raw source scan. */
object DrainBreakdown {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = WalFixture.eventsUs(spark, sfDir).orderBy("event_id").collect()
    def toEv(r: org.apache.spark.sql.Row) = WalFixture.evFromRow(r)
    def mkWal(): String = {
      val d = Files.createTempDirectory("bdwal").toString
      val (p, b) = rows.splitAt(1000)
      Seq(p, b).zipWithIndex.foreach { case (seg, i) =>
        val seen = scala.collection.mutable.Set.empty[String]
        WalLog.write(Paths.get(d, f"$i%08d.wal"), seg.iterator.flatMap(r => WalFixture.frames(toEv(r), seen)))
      }
      d
    }
    def timed(label: String)(mk: (String, String) => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val wal = mkWal()
      // hide segment 1, prime on segment 0, then reveal and time
      val seg1 = Paths.get(wal, "00000001.wal")
      val hidden = Paths.get(wal, "seg1.hide")
      Files.move(seg1, hidden)
      val ckpt = Files.createTempDirectory("bdckpt").toString
      val q = mk(wal, ckpt)
      q.processAllAvailable()
      Files.move(hidden, seg1)
      val t0 = System.nanoTime()
      q.processAllAvailable()
      val s = (System.nanoTime()-t0)/1e9
      q.stop()
      println(f"$label: $s%.2f s (${99000/s}%.0f ev/s)")
    }
    timed("full->parquet") { (wal, ckpt) =>
      StreamingPipeline.start(spark, wal, Routing.fixtureStreams, ckpt,
        Files.createTempDirectory("bdout").toString, None, 0L, Int.MaxValue) }
    Seq(750, 1500, 3000, 6000).foreach { se =>
      timed(s"full->parquet sliced($se)") { (wal, ckpt) =>
        StreamingPipeline.start(spark, wal, Routing.fixtureStreams, ckpt,
          Files.createTempDirectory("bdout").toString, None, 0L, Int.MaxValue,
          sliceEvents = se) }
    }
    timed("frame->count") { (wal, ckpt) =>
      StreamingPipeline.kafkaFrame(StreamingPipeline.walStream(spark, wal, Int.MaxValue), Routing.fixtureStreams)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
        .option("checkpointLocation", ckpt).start() }
    timed("source->count") { (wal, ckpt) =>
      StreamingPipeline.walStream(spark, wal, Int.MaxValue)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) => b.count(); () }
        .option("checkpointLocation", ckpt).start() }
    spark.stop()
  }
}
// appended experiments run via DrainBreakdown2
object DrainBreakdown2 {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rows = WalFixture.eventsUs(spark, sfDir).orderBy("event_id").collect()
    def toEv(r: org.apache.spark.sql.Row) = graft.source.wal.WalFixture.evFromRow(r)
    import java.nio.file.{Files, Paths}
    def mkWal(): String = {
      val d = Files.createTempDirectory("bd2wal").toString
      val (p, b) = rows.splitAt(1000)
      Seq(p, b).zipWithIndex.foreach { case (seg, i) =>
        val seen = scala.collection.mutable.Set.empty[String]
        graft.source.wal.WalLog.write(Paths.get(d, f"$i%08d.wal"), seg.iterator.flatMap(r => graft.source.wal.WalFixture.frames(toEv(r), seen)))
      }
      d
    }
    import org.apache.spark.sql.DataFrame
    def timed(label: String)(write: DataFrame => Unit): Unit = {
      val wal = mkWal()
      val seg1 = Paths.get(wal, "00000001.wal"); val hid = Paths.get(wal, "s.hide")
      Files.move(seg1, hid)
      val ckpt = Files.createTempDirectory("bd2ckpt").toString
      val q = graft.streaming.StreamingPipeline.kafkaFrame(
        graft.streaming.StreamingPipeline.walStream(spark, wal, Int.MaxValue), graft.operators.Routing.fixtureStreams)
        .writeStream.foreachBatch { (b: DataFrame, _: Long) => write(b) }
        .option("checkpointLocation", ckpt).start()
      q.processAllAvailable()
      Files.move(hid, seg1)
      val t0 = System.nanoTime(); q.processAllAvailable()
      val s = (System.nanoTime()-t0)/1e9; q.stop()
      println(f"$label: $s%.2f s (${99000/s}%.0f ev/s)")
    }
    timed("parquet-snappy") { b => b.write.mode("append").parquet(Files.createTempDirectory("o1").toString) }
    timed("parquet-none") { b => b.write.mode("append").option("compression","none").parquet(Files.createTempDirectory("o2").toString) }
    timed("text-json") { b => b.selectExpr("value").write.mode("append").option("compression","none").text(Files.createTempDirectory("o3").toString) }
    spark.stop()
  }
}
