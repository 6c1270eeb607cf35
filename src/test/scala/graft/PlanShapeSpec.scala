package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the plan SHAPES that distinguish a 100-TB-viable operator from one
  * that merely passes at test scale — the two regressions the round-1 audit
  * flagged (global unpartitioned window; unsampled all-pairs join) must not
  * come back.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, SparkTestBase.sf)
      .queryExecution.executedPlan.toString

  test("text_vocab_stats ranks via distributed top-k, not a global window sort") {
    val p = plan("text_vocab_stats")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected a distributed partial top-k (TakeOrderedAndProject); got:\n$p")
    // the rank window must run AFTER the limit (over <= 100 rows), never
    // over the full vocabulary: no Window directly over the aggregate
    val windowIdx = p.indexOf("Window")
    val topKIdx = p.indexOf("TakeOrderedAndProject")
    assert(windowIdx >= 0 && windowIdx < topKIdx,
      "rank window must sit above the top-k limit in the plan")
  }

  test("text_ngram_topk uses the bounded heap aggregate, no per-group sort window") {
    val p = plan("text_ngram_topk")
    assert(p.contains("top_k_str_by_score"), s"expected TopKStrByScore in:\n$p")
    assert(!p.contains("Window"), s"per-lang sort window crept back into:\n$p")
  }

  test("sim_ann_recall truth side is sampled, not all-pairs over the corpus") {
    val p = plan("sim_ann_recall")
    assert(p.contains("% 20") || p.contains("% 20)"),
      s"expected the deterministic vec_id % 20 query sample in:\n$p")
  }

  test("dedup_embedding_cosine joins on (label, LSH band bucket), never label alone") {
    val p = plan("dedup_embedding_cosine")
    // every equi-join line must carry a band-bucket key next to the label:
    // a label-only block is all-pairs within the block and goes n² on a
    // hot label (AQE wraps the plan, so assert on the string form)
    val joinLines = p.linesIterator.filter(l =>
      l.contains("Join") && l.contains("label_a")).toList
    assert(joinLines.nonEmpty, s"expected band-bucket equi-joins in:\n$p")
    joinLines.foreach { l =>
      assert(l.matches(".*\\bb\\d+_.*") || l.contains("substring"),
        s"join keyed on label only — LSH band bucket missing:\n$l")
    }
    // and no nested-loop fallback anywhere (an OR-join would produce one)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"non-equi join fallback crept into:\n$p")
  }

  test("sim_topk_agg carries only k rows per partition across the shuffle") {
    val p = plan("sim_topk_agg")
    assert(p.contains("top_k_by_score") && p.contains("partial_top_k_by_score"),
      s"expected map-side partial top-k aggregate in:\n$p")
  }
}
