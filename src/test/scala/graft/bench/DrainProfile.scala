package graft
import graft.source.pgoutput._
import graft.source.wal._
/** Standalone hot-path profiler: read / decode / convert throughput without
  * Spark, over a WAL rendered from the events fixture. */
object DrainProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val walDir = java.nio.file.Files.createTempDirectory("graft-prof-wal").toString
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = WalFixture.eventsUs(spark, sfDir).orderBy("event_id")
      .collect().iterator
      .map(WalFixture.evFromRow)
    WalFixture.writeLog(ev, walDir)
    spark.stop()
    (1 to 3).foreach { round =>
      var t0 = System.nanoTime(); var n = 0L
      WalLog.read(walDir, 0L, Long.MaxValue).foreach(_ => n += 1)
      val tRead = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime(); var d = 0L
      WalLog.read(walDir, 0L, Long.MaxValue).foreach(f => { PgOutputDecoder.decode(f.payload); d += 1 })
      val tDec = (System.nanoTime()-t0)/1e9
      t0 = System.nanoTime(); var e = 0L
      val reg = new RelationRegistry; val conv = new Converter(reg)
      WalLog.read(walDir, 0L, Long.MaxValue).foreach { f =>
        if (conv.convert(PgOutputDecoder.decode(f.payload), f.lsn).isDefined) e += 1 }
      val tConv = (System.nanoTime()-t0)/1e9
      println(f"round $round: read $n%d=${tRead}%.3fs decode=${tDec}%.3fs decode+convert($e%d ev)=${tConv}%.3fs -> ${e/tConv}%.0f ev/s")
    }
  }
}
