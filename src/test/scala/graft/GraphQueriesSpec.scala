package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the graph-analytics and journey queries — the
  * properties that must hold on ANY input, complementing the DuckDB
  * value-exactness gate (which pins one fixture).
  */
class GraphQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("graph_pagerank conserves total mass up to division remainders") {
    val pr = SparkEntry.queries("graph_pagerank")(spark, sf)
    val n = pr.count()
    val total = pr.agg(sum(col("pr_e12"))).head().getLong(0)
    // every integer floor-div loses < 1 unit per node per term; two
    // iterations with a base term + damped shares bound the loss well
    // under ~200 units per node (generous; the observed loss is tiny)
    assert(total <= 1000000000000L, s"mass created: $total")
    assert(total >= 1000000000000L - 200L * n,
      s"mass lost beyond remainder bound: $total (n=$n)")
    // every node gets at least the undamped base share
    val minP = pr.agg(min(col("pr_e12"))).head().getLong(0)
    assert(minP >= (1000000000000L * 15 / 100) / n)
  }

  test("graph_triangles: corner credits sum to a multiple of 3") {
    val tri = SparkEntry.queries("graph_triangles")(spark, sf)
    val total = tri.agg(sum(col("n_triangles"))).head().getLong(0)
    assert(total > 0, "fixture knn graph should close at least one triangle")
    assert(total % 3 == 0,
      s"each triangle must credit exactly 3 corners (got $total)")
  }

  test("events_path_trigrams: dense ranks 1..k, counts non-increasing") {
    val rows = SparkEntry.queries("events_path_trigrams")(spark, sf)
      .orderBy("rank").collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[Long]("rank")).toSeq ==
      (1L to rows.length.toLong))
    val ns = rows.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse, "counts must be non-increasing by rank")
  }

  test("events_dau_mau: dau <= mau and stickiness in (0, 1e6]") {
    val rows = SparkEntry.queries("events_dau_mau")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dau = r.getAs[Long]("dau"); val mau = r.getAs[Long]("mau")
      val pm = r.getAs[Long]("stickiness_pm")
      assert(dau >= 1 && dau <= mau, s"dau=$dau mau=$mau")
      assert(pm == dau * 1000000 / mau && pm >= 1 && pm <= 1000000)
    }
  }

  test("text_top_terms: at most 3 terms per doc, scores non-increasing") {
    val rows = SparkEntry.queries("text_top_terms")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val sorted = rs.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to rs.length.toLong))
      val scores = sorted.map(_.getAs[Long]("score_e6")).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }
}
