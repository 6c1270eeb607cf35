package graft

import graft.functions.{TopKBuffer, TopKByScore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("heap buffer: bounded, ordered, tie-break toward smaller id") {
    val b = new TopKBuffer(3)
    Seq((0.5, 10L), (0.9, 2L), (0.9, 1L), (0.1, 7L), (0.7, 4L), (0.9, 30L))
      .foreach { case (s, i) => b.add(s, i) }
    assert(b.sortedDesc.toSeq == Seq((0.9, 1L), (0.9, 2L), (0.9, 30L)))
    val b2 = new TopKBuffer(3)
    b2.add(1.0, 99L)
    b2.merge(b)
    assert(b2.sortedDesc.toSeq == Seq((1.0, 99L), (0.9, 1L), (0.9, 2L)))
  }

  test("aggregate matches the window top-k on the fixture embeddings") {
    val agg = graft.queries.ExtQueries.simTopkAgg._1(spark, SparkTestBase.sf)
    val win = graft.queries.ExtQueries.simTopkBruteforce._1(spark, SparkTestBase.sf)
    assert(agg.count() == win.count())
    assert(agg.exceptAll(win).count() == 0)
    assert(win.exceptAll(agg).count() == 0)
  }

  test("partial aggregation appears in the plan (no global sort)") {
    val plan = graft.queries.ExtQueries.simTopkAgg._1(spark, SparkTestBase.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_top_k_by_score") || plan.contains("ObjectHashAggregate")
      || plan.contains("SortAggregate"))
    assert(!plan.contains("Window"))
  }
}
