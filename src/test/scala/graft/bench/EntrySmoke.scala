package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver's smoke check: vanilla session (no graft-specific
  * configs), SparkEntry.entry must return rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[smoke] entry rows: $n")
    require(n > 0)
    spark.stop()
  }
}
