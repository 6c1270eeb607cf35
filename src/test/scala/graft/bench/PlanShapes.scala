package graft.bench

import org.apache.spark.sql.SparkSession

/** Quick plan-shape dump for a set of queries: join strategies, exchanges,
  * parquet scans. `Test/runMain graft.bench.PlanShapes
  * [sfDir] [name,name,...]` (default: every SparkEntry query). */
object PlanShapes {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = args.lift(1).map(_.split(",").toSeq)
      .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
    names.foreach { n =>
      val p = graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      def c(s: String) = p.linesIterator.count(_.contains(s))
      println(f"$n%-28s bhj=${c("BroadcastHashJoin")} smj=${c("SortMergeJoin")} " +
        s"exch=${c("Exchange")} bnl=${c("BroadcastNestedLoopJoin")} " +
        s"scans=${c("Scan parquet")}")
    }
    spark.stop()
  }
}
