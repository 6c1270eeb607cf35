package graft
import graft.source.wal.WalFixture
import org.apache.spark.sql.SparkSession
object RenderWal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = WalFixture.eventsUs(spark, args(1)).orderBy("event_id").collect().iterator
      .map(WalFixture.evFromRow)
    println("rendered " + graft.source.wal.WalFixture.writeLog(ev, args(0)))
    spark.stop()
  }
}
