package graft

import graft.queries.ExtQueries
import graft.streaming.AnnServeStream
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The streaming ANN serving twin must produce EXACTLY the batch
  * `sim_ivfpq_trained` rows for the same query set, no matter how the
  * query stream is chopped into micro-batches: serving is stateless
  * (each query answered within its own batch against the broadcast
  * index), so the streamed union is the batch result by construction —
  * this pins that the twin's from-raw-embedding LUT derivation really is
  * bit-identical to the batch query's corpus-side derivation. */
class AnnServeStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("streamed top-k equals the batch serving query under 1- and 3-batch splits") {
    val truth = SparkEntry.queries("sim_ivfpq_trained")(spark, SparkTestBase.sf)
      .collect().toSet
    graft.util.Checkpoints.releaseOwned(spark)
    assert(truth.nonEmpty, "batch serving query returned no rows")

    // the index is built ONCE; every micro-batch serves against it
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val queries = spark.read
      .parquet(s"${SparkTestBase.sf}/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .filter(col("vec_id") < 10) // the batch query's probe convention

    Seq(1, 3).foreach { nFiles =>
      val dir = Files.createTempDirectory(s"graft-annserve-$nFiles").toString
      (0 until nFiles).foreach { i =>
        queries.filter(col("vec_id") % nFiles === i)
          .coalesce(1).write.mode("append").parquet(dir)
      }
      val got = scala.collection.mutable.Set.empty[Row]
      var batches = 0
      val q = spark.readStream.schema(queries.schema)
        .option("maxFilesPerTrigger", "1").parquet(dir)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
          got ++= AnnServeStream.serve(b, codes, carr).collect()
          batches += 1
        }
        .start()
      try q.processAllAvailable() finally q.stop()
      assert(batches >= nFiles, s"expected ≥$nFiles micro-batches, got $batches")
      assert(got == truth,
        s"$nFiles-batch streamed serving diverged from the batch query: " +
          s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    }
    graft.util.Checkpoints.releaseOwned(spark)
  }

  test("serveFast (prepared index) equals the batch serving query") {
    // the amortized path (r16 VERDICT #5): invariant side prepared once —
    // pre-partitioned codes + collected literal codebook — must stay
    // bit-identical to the reference serve()/batch query, per micro-batch
    val truth = SparkEntry.queries("sim_ivfpq_trained")(spark, SparkTestBase.sf)
      .collect().toSet
    graft.util.Checkpoints.releaseOwned(spark)
    val (_, codes, carr) = ExtQueries.pqTrainedIndex(spark, SparkTestBase.sf)
    val idx = AnnServeStream.prepare(codes, carr)
    val queries = spark.read
      .parquet(s"${SparkTestBase.sf}/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .filter(col("vec_id") < 10)
    val dir = Files.createTempDirectory("graft-annserve-fast").toString
    (0 until 3).foreach { i =>
      queries.filter(col("vec_id") % 3 === i)
        .coalesce(1).write.mode("append").parquet(dir)
    }
    val got = scala.collection.mutable.Set.empty[Row]
    val q = spark.readStream.schema(queries.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Row], _: Long) =>
        got ++= AnnServeStream.serveFast(b, idx).collect(); ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(got == truth,
      s"serveFast diverged from the batch query: " +
        s"missing=${(truth -- got).take(3)} extra=${(got -- truth).take(3)}")
    // the per-batch ADC sum must NOT re-shuffle the corpus: the prepared
    // codes frame is hash-partitioned by vec_id (LogicalRDD preserves the
    // partitioning through the checkpoint), which satisfies the
    // groupBy(qid, vec_id) distribution — so the ONLY shuffle in the
    // serving plan is the small per-query top-k groupBy(qid)
    val served = AnnServeStream.serveFast(queries, idx)
    served.collect() // finalize the adaptive plan
    // tree walk, NOT a plan-string grep: the string embeds the cached
    // InMemoryRelation's one-time BUILD plan (whose exchanges already ran
    // at prepare() time); InMemoryTableScan is a leaf here, so the walk
    // counts only per-batch shuffles
    def shuffles(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val self = p match { case _: ShuffleExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(shuffles).sum
    }
    val n = shuffles(served.queryExecution.executedPlan)
    assert(n <= 1,
      s"serveFast must shuffle only the per-query top-k, found $n:\n" +
        served.queryExecution.executedPlan)
    // r18: BOTH serving plans must be output-identical and ≤1-shuffle —
    // the driver-LUT fast path (default, taken above for this 10-query
    // batch) and the distributed-LUT backfill path (forced via
    // maxDriverLut = 0). The driver path additionally must plan ZERO
    // broadcast exchanges: the LUT is a literal, so the only exchange
    // anywhere is the per-query top-k shuffle.
    val servedDist = AnnServeStream.serveFast(queries, idx, maxDriverLut = 0)
    assert(servedDist.collect().toSet == truth,
      "distributed-LUT serveFast diverged from the batch query")
    assert(shuffles(servedDist.queryExecution.executedPlan) <= 1)
    def broadcasts(p: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{
        AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
      val self = p match { case _: BroadcastExchangeLike => 1; case _ => 0 }
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case _ => p.children
      }
      self + kids.map(broadcasts).sum
    }
    assert(broadcasts(served.queryExecution.executedPlan) == 0,
      "driver-LUT serveFast must not broadcast anything:\n" +
        served.queryExecution.executedPlan)
    // r19 (r18 ADVICE): a NON-INTEGRAL label column must route to the
    // distributed-LUT path (the driver path's long cast would null out
    // and silently return zero neighbors) and still produce the exact
    // result set. String labels on both sides: the truth set is label-
    // value-independent since the label only gates candidate matching.
    val qStr = queries.withColumn("label",
      concat(lit("L"), col("label").cast("string")))
    val codesStr = codes.withColumn("label",
      concat(lit("L"), col("label").cast("string")))
    val idxStr = AnnServeStream.prepare(codesStr, carr)
    try {
      val servedStr = AnnServeStream.serveFast(qStr, idxStr)
      assert(servedStr.collect().toSet == truth,
        "string-label serving must fall back to the distributed path " +
          "and stay exact")
    } finally idxStr.release()
    idx.release()
    graft.util.Checkpoints.releaseOwned(spark)
  }
}
