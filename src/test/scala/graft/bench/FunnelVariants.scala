package graft.bench

import graft.queries.AnalyticsQueries
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured comparison for the r7 VERDICT item: events_funnel_steps as
  * three pushed-filter fact slices vs one scan + one user-key shuffle.
  * Runs both at sf0.1 and at a 10× replicated rung (shifted user ids so
  * the user population scales too), checks value equality, prints min-of-5
  * per variant. */
object FunnelVariants {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sf = "/root/testdata/sf0.1"
    // 10× rung: replicate events with shifted user ids (stage mix intact)
    val big = java.nio.file.Files.createTempDirectory("funnel10x").toString
    val ev = spark.read.parquet(s"$sf/events.parquet")
    val maxU = ev.agg(max("user_id")).head().getLong(0) + 1
    (0 until 10).map(k => ev.withColumn("user_id",
        col("user_id") + lit(k * maxU)))
      .reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$big/events.parquet")

    def time(label: String, f: () => org.apache.spark.sql.DataFrame): Double = {
      (1 to 2).foreach(_ => f().write.format("noop").mode("overwrite").save())
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s min=${ts.min}%.3f s  trials=[${ts.map(t => f"$t%.3f").mkString(", ")}]")
      ts.min
    }

    Seq(("sf0.1", sf), ("sf~1 (10x users)", big)).foreach { case (tag, dir) =>
      val a = AnalyticsQueries.funnelStepsThreeSlice(spark, dir)
      val b = AnalyticsQueries.funnelStepsSingleScan(spark, dir)
      val ra = a.head(); val rb = b.head()
      require(ra == rb, s"variant mismatch at $tag: $ra vs $rb")
      println(s"== $tag  (both variants agree: $ra)")
      time(s"  three-slice",
        () => AnalyticsQueries.funnelStepsThreeSlice(spark, dir))
      time(s"  single-scan",
        () => AnalyticsQueries.funnelStepsSingleScan(spark, dir))
    }
    spark.stop()
  }
}
