package graft
import org.apache.spark.sql.SparkSession
object RenderWal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"${args(1)}/events.parquet").orderBy("event_id").collect().iterator
      .map(r => graft.source.wal.WalFixture.Ev(r.getLong(0), r.getLong(1)/1000L, r.getLong(2), r.getString(3), r.getDouble(4), r.getString(5)))
    println("rendered " + graft.source.wal.WalFixture.writeLog(ev, args(0)))
    spark.stop()
  }
}
