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

  test("graph_bfs_levels: seeds at 0, every level-l node has a level-(l-1) " +
      "neighbor, nothing past depth 4") {
    val lv = SparkEntry.queries("graph_bfs_levels")(spark, sf)
    val rows = lv.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("level")).toMap
    assert(rows.nonEmpty && rows.values.forall(l => l >= 0 && l <= 4))
    // level 0 ⟺ seed (vec_id % 97 = 0); seeds are always in the output
    assert(rows.filter(_._2 == 0).keySet == rows.keySet.filter(_ % 97 == 0))
    // BFS optimality: a node at level l must have SOME neighbor at l-1 and
    // NO neighbor at < l-1 (else its own level would be smaller)
    val e = graft.queries.ExtQueries.all("sim_knn_graph")._1(spark, sf)
      .select(col("src"), col("dst")).collect()
      .flatMap(r => Seq(r.getLong(0) -> r.getLong(1), r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    rows.filter(_._2 > 0).foreach { case (n, l) =>
      val nbrLevels = e.getOrElse(n, Set.empty).flatMap(rows.get)
      assert(nbrLevels.contains(l - 1), s"node $n level $l lacks an l-1 neighbor")
      assert(!nbrLevels.exists(_ < l - 1), s"node $n level $l not minimal")
    }
  }

  test("graph_kcore: every survivor has degree >= 4 within the survivor set") {
    val core = SparkEntry.queries("graph_kcore")(spark, sf)
    val deg = core.collect().map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("deg")).toMap
    assert(deg.nonEmpty && deg.values.forall(_ >= 4))
    // the reported degree counts neighbors inside the round-1 survivor
    // set, so it can never exceed the node's full-graph undirected degree
    val e = graft.queries.ExtQueries.all("sim_knn_graph")._1(spark, sf)
      .selectExpr("least(src, dst) u", "greatest(src, dst) v").distinct()
      .collect().flatMap(r => Seq(r.getLong(0) -> r.getLong(1),
        r.getLong(1) -> r.getLong(0)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    deg.foreach { case (n, d) =>
      assert(d <= e.getOrElse(n, Set.empty).size,
        s"node $n reports deg $d above its full-graph degree")
    }
  }

  test("events_attribution_linear: per-conversion credit never exceeds 1e6 " +
      "and touch types are the non-purchase set") {
    val rows = SparkEntry.queries("events_attribution_linear")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val types = rows.map(_.getAs[String]("touch_type")).toSet
    assert(!types.contains("purchase"))
    rows.foreach { r =>
      val credit = r.getAs[Long]("total_credit_e6")
      val n = r.getAs[Long]("n_conversions")
      // each conversion contributes at most 1e6/1 and at least 1e6/4
      // (4 non-purchase types exist) to any single type it touched
      assert(credit <= n * 1000000 && credit >= n * 250000,
        s"type ${r.getAs[String]("touch_type")}: credit=$credit n=$n")
    }
  }

  test("graph_modularity: contributions non-negative (label-partitioned knn " +
      "has no cross-community edges), Q in (0, 1e9), d_c = 2 e_in") {
    val rows = SparkEntry.queries("graph_modularity")(spark, sf).collect()
    assert(rows.nonEmpty)
    var q = 0L
    rows.foreach { r =>
      val eIn = r.getAs[Long]("e_in"); val dC = r.getAs[Long]("d_c")
      val c = r.getAs[Long]("contrib_e9")
      assert(dC == 2 * eIn, "every edge must be intra-community here")
      assert(c >= 0, s"negative contribution $c — the sign-safety premise broke")
      q += c
    }
    assert(q > 0 && q < 1000000000L, s"Q_e9=$q out of range")
  }

  test("graph_jaccard_suggest: suggested pairs are non-edges with j in (0, 1e6]") {
    val rows = SparkEntry.queries("graph_jaccard_suggest")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val edges = graft.queries.ExtQueries.all("sim_knn_graph")._1(spark, sf)
      .selectExpr("least(src, dst) u", "greatest(src, dst) v").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val u = r.getAs[Long]("u"); val v = r.getAs[Long]("v")
      assert(u < v && !edges.contains((u, v)), s"($u,$v) is an existing edge")
      val j = r.getAs[Long]("j_e6")
      assert(j > 0 && j <= 1000000L)
    }
  }

  test("mm_scene_cuts: cuts bounded by transitions, frame counts match the " +
      "doc_id formula") {
    val rows = SparkEntry.queries("mm_scene_cuts")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val doc = r.getAs[Long]("doc_id")
      val nf = r.getAs[Long]("n_frames")
      assert(nf == 4 + doc % 3, s"doc $doc: n_frames=$nf")
      assert(r.getAs[Long]("n_cuts") <= nf - 1)
      val mh = r.getAs[Long]("max_ham")
      assert(mh >= 0 && mh <= 12)
    }
  }

  test("events_ab_lift: arms partition the user population, lift consistent " +
      "with the reported rates") {
    val r = SparkEntry.queries("events_ab_lift")(spark, sf).collect().head
    val direct = graft.source.wal.WalFixture.eventsUs(spark, sf)
      .select("user_id").distinct().count()
    assert(r.getAs[Long]("n_ctrl") + r.getAs[Long]("n_treat") == direct,
      s"arms must partition the $direct users")
    assert(r.getAs[Long]("conv_ctrl") <= r.getAs[Long]("n_ctrl"))
    assert(r.getAs[Long]("conv_treat") <= r.getAs[Long]("n_treat"))
    assert(r.getAs[Long]("lift_pm") ==
      r.getAs[Long]("treat_pm") - r.getAs[Long]("ctrl_pm"))
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
