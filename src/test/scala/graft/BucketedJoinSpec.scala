package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Proof of the co-located-join scale claim: bucketing both sides of the
  * orders⋈lineitem join on the join key at WRITE time removes the join's
  * exchanges at READ time — at 100 TB that is the difference between
  * re-shuffling the fact tables on every analytical run and shuffling them
  * once when they land. The assertion is on the physical plan, not timing:
  * a SortMergeJoin with NO Exchange on either input.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("a join between tables bucketed on the join key plans without exchanges") {
    val wh = Files.createTempDirectory("graft-bucket-wh").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '$wh'")
    try {
      spark.read.parquet(s"${SparkTestBase.sf}/orders.parquet")
        .write.format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("bucketdemo.orders_b")
      spark.read.parquet(s"${SparkTestBase.sf}/lineitem.parquet")
        .write.format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("bucketdemo.lineitem_b")

      val joined = spark.table("bucketdemo.lineitem_b")
        .join(spark.table("bucketdemo.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      // force a large-join plan: disable broadcast so the test proves the
      // bucketing (not a broadcast) removed the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = try joined.queryExecution.executedPlan.toString
      finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      assert(p.contains("SortMergeJoin"), s"expected a sort-merge join in:\n$p")
      val joinIdx = p.indexOf("SortMergeJoin")
      val joinSubtree = p.substring(joinIdx)
      val aggExchangeIdx = p.indexOf("Exchange")
      // the only exchange allowed is ABOVE the join (for the final groupBy,
      // if its key differs from the bucket key); the join inputs themselves
      // must read bucketed files with no repartitioning
      assert(!joinSubtree.contains("Exchange hashpartitioning(l_orderkey") &&
        !joinSubtree.contains("Exchange hashpartitioning(o_orderkey"),
        s"join inputs were re-shuffled despite bucketing:\n$p")
      assert(p.contains("Bucketed: true"),
        s"scan did not recognize the bucketing:\n$p")

      // and the answer is the same as the unbucketed join
      val plain = spark.read.parquet(s"${SparkTestBase.sf}/lineitem.parquet")
        .join(spark.read.parquet(s"${SparkTestBase.sf}/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(plain).count() == 0 &&
        plain.exceptAll(joined).count() == 0)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS bucketdemo CASCADE")
    }
  }
}
