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

  test("pipeline_decontaminate broadcasts the benchmark gram set") {
    val p = plan("pipeline_decontaminate")
    // the eval-set side must be the broadcast build side: a shuffle of the
    // corpus gram multiset against a megabyte benchmark is wasted motion
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"expected a broadcast join on the benchmark grams in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in:\n$p")
  }

  test("olap_ship_priority takes its top-10 distributively, dims broadcast") {
    val p = plan("olap_ship_priority")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected distributed top-k (TakeOrderedAndProject) in:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"expected the BUILDING-segment customer dim broadcast in:\n$p")
    // rank window runs over the 10 surviving rows, above the limit
    val windowIdx = p.indexOf("Window")
    val topKIdx = p.indexOf("TakeOrderedAndProject")
    assert(windowIdx >= 0 && windowIdx < topKIdx,
      "rank window must sit above the top-k limit in the plan")
  }

  test("olap_promo_revenue pushes the ship-date filter to the parquet scan") {
    val df = SparkEntry.queries("olap_promo_revenue")(spark, SparkTestBase.sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"expected the part dim broadcast in:\n$p")
    // the µs-range predicate must reach the lineitem scan as a data filter
    // (PushedFilters renders on the scan node for native-expressible ones;
    // the unix_micros cast keeps it a post-scan Filter — assert it at least
    // sits under the join, before any shuffle)
    val scanIdx = p.indexOf("Scan parquet")
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(scanIdx >= 0 && joinIdx >= 0 && joinIdx < scanIdx,
      s"scan must feed the join directly in:\n$p")
  }

  test("dedup_chunk aggregates on the chunk hash with a map-side partial") {
    val p = plan("dedup_chunk")
    assert(p.contains("HashAggregate"), s"expected hash aggregation in:\n$p")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      s"unexpected global operator in:\n$p")
  }

  test("events_asof_join is the union+window form: one shuffle, zero joins") {
    val p = plan("events_asof_join")
    // the whole point of the distributed as-of: NO join node at all — a
    // per-row probe join would be quadratic in a hot user's event count
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), s"expected the running-last window in:\n$p")
    assert(p.contains("Union"), s"expected the tagged two-side union in:\n$p")
  }

  test("events_range_join hash-joins on (user, bin), never a range nested loop") {
    val p = plan("events_range_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"range probe fell back to a non-equi join:\n$p")
    assert(p.contains("Join"), s"expected the binned equi-join in:\n$p")
    assert(p.contains("Generate") || p.contains("explode"),
      s"expected the probe-side bin explode in:\n$p")
  }

  test("cluster_assign broadcasts centroids and argmaxes via partial aggregate") {
    val p = plan("cluster_assign")
    // centroid table rides a broadcast (tiny k × corpus — nested-loop over a
    // broadcast IS the right plan for an all-centroids score)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"expected broadcast centroids in:\n$p")
    // argmax must be the partial-aggregable max(struct), never a k×N window
    assert(!p.contains("Window"), s"argmax window over scored pairs in:\n$p")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"),
      s"expected aggregate argmax in:\n$p")
  }

  test("emb_quantize is a shuffle-free projection straight off the scan") {
    val p = plan("emb_quantize")
    // higher-order lambdas (transform/aggregate) evaluate as interpreted
    // projections — acceptable here because the op is embarrassingly
    // parallel; the property that matters at scale is NO shuffle
    assert(!p.contains("Exchange"), s"quantization must not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"unexpected wide operator in:\n$p")
  }

  test("events_salted_agg spreads a hot key over salt partitions, top-k distributed") {
    val p = plan("events_salted_agg")
    // two aggregation phases: (user, salt) then user — the first exchange
    // must carry the salt so a hot user spans 16 partitions
    assert(p.contains("salt"), s"salt key missing from the plan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected distributed top-k in:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges >= 2, s"expected two hash exchanges (salted then re-agg):\n$p")
  }

  test("events_quantiles is one partial-aggregable pass per event type") {
    val p = plan("events_quantiles")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"unexpected wide operator in:\n$p")
    assert(p.contains("percentile"), s"expected percentile aggregate in:\n$p")
  }

  test("events_approx_distinct: HLL side stays expand-free; in-band accuracy flag holds") {
    val approx = plan("events_approx_distinct")
    assert(approx.contains("approx_count_distinct"),
      s"HLL aggregate missing from:\n$approx")
    // the query now carries an exact twin FOR THE ORACLE GATE (r12): the
    // whole plan may pay at most the exact side's single distinct rewrite —
    // a second Expand would mean the sketch side regressed to expand
    assert(approx.linesIterator.count(_.contains("Expand")) <= 1,
      s"more than one distinct expand — the HLL side regressed:\n$approx")
    // the in-band verdict must actually PASS (both sketches ~2% off exact)
    val spark2 = SparkTestBase.spark
    SparkEntry.queries("events_approx_distinct")(spark2, SparkTestBase.sf)
      .collect().foreach { r =>
        assert(r.getAs[Long]("within_10pct") == 1L,
          s"${r.getAs[String]("event_type")}: sketch outside the 10% band")
      }
  }

  test("events_approx_quantiles: sketch pass + broadcast rank audit; flags hold") {
    val p = plan("events_approx_quantiles")
    assert(!p.contains("Window"), s"unexpected window in:\n$p")
    assert(p.contains("approx_percentile"), s"expected the sketch aggregate in:\n$p")
    assert(p.contains("percentile("), s"expected the exact twin aggregate in:\n$p")
    // the rank audit joins the 5-row sketch frame back — it must broadcast,
    // never shuffle-join the events fact against a 5-row side
    assert(p.contains("BroadcastHashJoin"),
      s"rank-audit join is not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"rank-audit join shuffled a 5-row side:\n$p")
    val spark2 = SparkTestBase.spark
    SparkEntry.queries("events_approx_quantiles")(spark2, SparkTestBase.sf)
      .collect().foreach { r =>
        Seq("p50", "p95", "p99").foreach { t =>
          assert(r.getAs[Long](s"${t}_rank_ok") == 1L,
            s"${r.getAs[String]("event_type")} $t: sketch rank outside 2%")
        }
        // quantiles are ordered — the exact twin estimates the right thing
        assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p95_exact") &&
          r.getAs[Double]("p95_exact") <= r.getAs[Double]("p99_exact"))
      }
  }

  test("pipeline_pack_sequences windows per (lang, shard), packs conserve tokens") {
    val p = plan("pipeline_pack_sequences")
    assert(p.contains("Window"), s"expected the cumulative-sum window in:\n$p")
    // the sort/shuffle key must carry the shard — a lang-only partition is
    // one giant sorted stream per language at 100 TB
    assert(p.contains("shard"), s"shard key missing from the window plan:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"unexpected join in:\n$p")
    // conservation: pack token totals must re-add to the corpus token total
    val spark2 = SparkTestBase.spark
    val packs = SparkEntry.queries("pipeline_pack_sequences")(spark2, SparkTestBase.sf)
    val packed = packs.agg(org.apache.spark.sql.functions.sum("pack_tokens"))
      .head().getLong(0)
    val corpus = SparkEntry.queries("text_tokens")(spark2, SparkTestBase.sf)
      .agg(org.apache.spark.sql.functions.sum("n_tokens")).head().getLong(0)
    assert(packed == corpus, s"packed $packed tokens vs corpus $corpus")
    // every (lang, shard) stream starts at pack 0
    import org.apache.spark.sql.functions.{col, min => fmin}
    val badStart = packs.groupBy(col("lang"), col("shard"))
      .agg(fmin("pack_id").as("first")).filter(col("first") =!= 0L).count()
    assert(badStart == 0, "a (lang, shard) stream does not start at pack 0")
  }

  test("sim_knn_graph equi-joins on the cell key, exactly <=3 ranked neighbors") {
    val p = plan("sim_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"knn candidate join fell back to all-pairs:\n$p")
    assert(p.contains("Join"), s"expected the label-cell equi-join in:\n$p")
    // ranking must be the heap aggregate (k rows/src cross the shuffle),
    // never a per-src sort window over the full candidate list
    assert(p.contains("partial_top_k_by_score"),
      s"expected map-side partial top-k in:\n$p")
    assert(!p.contains("Window"), s"rank window crept back into:\n$p")
    import org.apache.spark.sql.functions.{col, count => fcount, max => fmax}
    val g = SparkEntry.queries("sim_knn_graph")(SparkTestBase.spark, SparkTestBase.sf)
    val per = g.groupBy(col("src"))
      .agg(fcount(org.apache.spark.sql.functions.lit(1)).as("n"),
        fmax("rank").as("maxr"))
    assert(per.filter(col("n") > 3 || col("maxr") > 3).count() == 0,
      "a src carries more than 3 neighbors")
    assert(g.filter(col("src") === col("dst")).count() == 0, "self-edge in knn graph")
  }

  test("events_user_gaps: one user-partitioned window, gaps non-negative") {
    val p = plan("events_user_gaps")
    assert(p.contains("Window"), s"expected the lag window in:\n$p")
    assert(!p.contains("Join"), s"unexpected join in:\n$p")
    import org.apache.spark.sql.functions.col
    val g = SparkEntry.queries("events_user_gaps")(SparkTestBase.spark, SparkTestBase.sf)
    assert(g.filter(col("min_gap_us") < 0L).count() == 0,
      "negative inter-event gap — ordering key broken")
  }

  test("events_cube: one Expand pass; grand total equals the base count") {
    val p = plan("events_cube")
    assert(p.contains("Expand"), s"cube must plan a single Expand in:\n$p")
    import org.apache.spark.sql.functions.col
    val c = SparkEntry.queries("events_cube")(SparkTestBase.spark, SparkTestBase.sf)
    val grand = c.filter(col("event_type").isNull && col("hr").isNull)
      .select("n").head().getLong(0)
    val base = c.filter(col("event_type").isNotNull && col("hr").isNotNull)
      .agg(org.apache.spark.sql.functions.sum("n")).head().getLong(0)
    assert(grand == base, s"cube grand total $grand != base rollup $base")
  }

  test("olap_set_ops: intersect/except counts partition the year-1997 buyer set") {
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("olap_set_ops")(SparkTestBase.spark, SparkTestBase.sf)
      .head()
    val (nBoth, n97, n98) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nBoth >= 0 && n97 >= 0 && n98 >= 0)
    // |k97| = both + only97 — recompute the left set independently
    val orders = graft.cdc.ChangeLog.table(SparkTestBase.spark, SparkTestBase.sf, "orders")
    val k97 = orders
      .filter(org.apache.spark.sql.functions.expr(
        "unix_micros(cast(o_orderdate as timestamp)) >= 852076800000000 and " +
          "unix_micros(cast(o_orderdate as timestamp)) < 883612800000000"))
      .select(col("o_custkey")).distinct().count()
    assert(nBoth + n97 == k97, s"$nBoth + $n97 != |k97| $k97")
  }

  test("mm_resize / mm_resize_plan / mm_feature_dct are shuffle-free partition-wise") {
    // r19 refinement: ScanFanout may insert ONE exchange of SOURCE rows
    // (doc_id, text) ahead of the codec kernels — only when the input
    // plans below a single scan split (the fixture's one-task-scan
    // pathology), never of encoded payloads, and never at scale. Assert
    // both halves: (a) at gate scale the plan has at most that one
    // pre-codec exchange and stays partition-wise; (b) with a scan that
    // plans ≥1 split (maxPartitionBytes shrunk under the input size) the
    // fan is the identity and the plan is exchange-free as before.
    Seq("mm_resize", "mm_resize_plan", "mm_feature_ppm", "mm_feature_dct",
        "mm_decode_raster").foreach { name =>
      val p = plan(name)
      val nEx = "(?<!Reused)Exchange".r.findAllIn(p).size
      assert(nEx <= 1, s"$name must add at most the one fan-out exchange:\n$p")
      assert(p.contains("MapPartitions"),
        s"$name must run partition-wise (one codec/encoder handle per partition):\n$p")
    }
    val spark = SparkTestBase.spark
    val prevMpb = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      Seq("mm_resize", "mm_resize_plan", "mm_feature_ppm", "mm_feature_dct",
          "mm_decode_raster").foreach { name =>
        val p = plan(name)
        assert(!p.contains("Exchange"),
          s"$name must not shuffle once the scan plans multiple splits " +
            s"(the at-scale shape):\n$p")
      }
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prevMpb)
    // resize geometry invariant: output fits the 224 box on the long side
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("mm_resize_plan")(SparkTestBase.spark, SparkTestBase.sf)
    assert(r.filter(col("out_w") > 224 || col("out_h") > 224).count() == 0,
      "resize exceeded the target box")
    // real-resize invariant: every output channel value is a valid byte
    val rr = SparkEntry.queries("mm_resize")(SparkTestBase.spark, SparkTestBase.sf)
    assert(rr.filter(col("r") < 0 || col("r") > 255 ||
      col("g") < 0 || col("g") > 255 || col("b") < 0 || col("b") > 255)
      .count() == 0, "resized channel value out of byte range")
  }

  test("sim_ivfpq_topk: broadcast LUTs, cell-pruned ADC, heap top-k; agrees with flat ADC") {
    val p = plan("sim_ivfpq_topk")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"IVF-PQ join fell back to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"codebook/LUT sides must broadcast:\n$p")
    assert(p.contains("partial_top_k_by_score"),
      s"expected map-side partial top-k in:\n$p")
    import org.apache.spark.sql.functions.col
    val spark2 = SparkTestBase.spark
    val ivfpq = SparkEntry.queries("sim_ivfpq_topk")(spark2, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // every IVF-PQ pair must carry the SAME ADC distance the flat PQ scan
    // assigns it (cell pruning changes the candidate SET, never a score)
    val flat = SparkEntry.queries("sim_pq_adc_topk")(spark2, SparkTestBase.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val disagree = ivfpq.collect {
      case (k, v) if flat.contains(k) && flat(k) != v => (k, v, flat(k))
    }
    assert(disagree.isEmpty, s"ADC scores diverge between IVF-PQ and flat: $disagree")
    // and the candidates really are cell-mates of their query
    val labels = graft.cdc.ChangeLog.table(spark2, SparkTestBase.sf, "embeddings")
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    ivfpq.keys.foreach { case (q, c) =>
      assert(labels(q) == labels(c), s"pair ($q, $c) crosses IVF cells")
    }
  }

  test("mm_sim_dct: bucketed equi-join (never all-pairs), heap top-k, <=3 per src") {
    val p = plan("mm_sim_dct")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"descriptor candidate join fell back to all-pairs:\n$p")
    assert(p.contains("partial_top_k_by_score"),
      s"expected map-side partial top-k in:\n$p")
    assert(!p.contains("Window"), s"rank window crept into:\n$p")
    // the descriptor frame must be checkpoint-materialized: one PNG
    // encode→decode→DCT pass feeds BOTH self-join sides
    assert(!p.contains("Scan parquet"),
      s"self-join re-evaluates the raw subtree instead of the checkpoint:\n$p")
    import org.apache.spark.sql.functions.{col, count => fcount, max => fmax}
    val g = SparkEntry.queries("mm_sim_dct")(SparkTestBase.spark, SparkTestBase.sf)
    val per = g.groupBy(col("src_doc"))
      .agg(fcount(org.apache.spark.sql.functions.lit(1)).as("n"),
        fmax("rank").as("maxr"))
    assert(per.filter(col("n") > 3 || col("maxr") > 3).count() == 0,
      "a src carries more than 3 neighbors")
    assert(g.filter(col("src_doc") === col("dst_doc")).count() == 0,
      "self-match in the similarity output")
    assert(g.filter(col("l1_dist") < 0).count() == 0, "negative L1 distance")
  }

  test("mm_sim_recall: retrieval legs stay equi-joins; multi-probe hits dominate") {
    val p = plan("mm_sim_recall")
    // the ONE all-pairs shape allowed is the broadcast sampled-truth side
    // (sample × corpus, linear in n — the sim_ann_recall mold); the two
    // retrieval legs must be hash equi-joins on the (fp, band) bucket key
    assert(!p.contains("CartesianProduct"),
      s"truth side lost its broadcast (non-broadcast cartesian):\n$p")
    val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnl <= 1, s"a retrieval leg fell back to all-pairs ($bnl BNL):\n$p")
    val r = SparkEntry.queries("mm_sim_recall")(SparkTestBase.spark, SparkTestBase.sf)
      .collect().head
    val (nEval, nHits, nHitsMp, nHitsFpmp, nHitsFp2) =
      (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(7))
    val (candR0, candMp, candFpmp, candFp2) =
      (r.getLong(9), r.getLong(10), r.getLong(11), r.getLong(12))
    // every 20th doc below the deterministic cap is a probe, each with
    // exactly one truth row — the cap keeps the exact-truth leg linear in
    // the corpus (≤1000 probes regardless of n)
    assert(nEval > 0 && nEval <= 1000 && nHits >= 0 && nHits <= nEval)
    // each probe rung's candidates are a SUPERSET of the previous rung's
    // (band ±1 ⊇ band-exact; Hamming-1 fp ring ⊇ the exact fp key;
    // Hamming-2 ⊇ Hamming-1) and truth's top-1 is unique under the
    // (l1, id) tie-break, so a hit can never become a miss as probing
    // widens — monotone by construction, pinned so a probe-leg refactor
    // cannot silently break it. The recorded candidate volumes must be
    // monotone for the same reason: each rung's cost is data.
    assert(nHitsMp >= nHits,
      s"band multi-probe recall fell below single-probe: $nHitsMp < $nHits")
    assert(nHitsFpmp >= nHitsMp,
      s"fp multi-probe recall fell below band multi-probe: $nHitsFpmp < $nHitsMp")
    assert(nHitsFp2 >= nHitsFpmp,
      s"Hamming-2 recall fell below Hamming-1: $nHitsFp2 < $nHitsFpmp")
    assert(candR0 <= candMp && candMp <= candFpmp && candFpmp <= candFp2,
      s"candidate volumes not monotone: $candR0, $candMp, $candFpmp, $candFp2")
  }

  test("sim_ivfpq_rerank: exact refine touches only the shortlist; ranks by exact") {
    val p = plan("sim_ivfpq_rerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs fallback in the rerank plan:\n$p")
    assert(p.contains("partial_top_k_by_score"),
      s"expected the map-side heap for both stages in:\n$p")
    assert(!p.contains("Window"), s"rank window crept into:\n$p")
    // the refine join must stream the corpus against a BROADCAST shortlist
    // — a sort-merge here shuffles the whole corpus for a k'×queries-row
    // probe side (the measured 2M-vector regression this pin prevents)
    assert(!p.contains("SortMergeJoin"),
      s"shortlist→corpus refine join demoted to a corpus shuffle:\n$p")
    import org.apache.spark.sql.functions.col
    val r = SparkEntry.queries("sim_ivfpq_rerank")(SparkTestBase.spark, SparkTestBase.sf)
      .collect()
    graft.util.Checkpoints.releaseOwned(SparkTestBase.spark)
    // <=5 per query, exact_e8 ascends with rank (rank is BY exact distance),
    // and every reranked candidate still carries its ADC score
    val byQ = r.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q carries ${rows.length} rows")
      val sorted = rows.sortBy(_.getLong(4))
      val ex = sorted.map(_.getLong(3))
      assert(ex.zip(ex.drop(1)).forall { case (a, b) => a <= b },
        s"exact_e8 not ascending with rank for query $q: ${ex.toSeq}")
      assert(rows.forall(_.getLong(2) >= 0))
    }
    // the refine stage must be able to REORDER vs ADC somewhere (that is
    // its purpose); with zero disagreement the stage would be vacuous on
    // this corpus — an equality-only check, not a flakiness risk, because
    // the fixture's PQ error is deterministic
    val anyReorder = byQ.exists { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(4)).map(_.getLong(2))
      byRank.zip(byRank.drop(1)).exists { case (a, b) => a > b }
    }
    assert(anyReorder, "rerank never disagreed with ADC order — vacuous refine")
  }

  test("sim_ivfpq_trained: broadcasts survive the trained codebook; training converges") {
    // the trained centroids are a checkpointed LogicalRDD whose size AQE
    // cannot estimate — without explicit broadcasts the codebook/LUT joins
    // would demote to corpus shuffles (the exact regression
    // sim_ivfpq_rerank measured at the 2M rung); this pins that the
    // serving plan keeps sim_ivfpq_topk's shape under the TRAINED codebook
    val p = plan("sim_ivfpq_trained")
    graft.util.Checkpoints.releaseOwned(spark) // the trainer's checkpoints
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"trained IVF-PQ join fell back to all-pairs:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"trained codebook/LUT sides must broadcast:\n$p")
    assert(p.contains("partial_top_k_by_score"),
      s"expected map-side partial top-k in:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"codebook or LUT join demoted to a corpus shuffle:\n$p")
    // and the codebook really is TRAINED: Lloyd's algorithm must strictly
    // reduce per-subspace inertia on this corpus (measured ~30% per
    // subspace at both gate SFs — deterministic fixture, not a flake), and
    // round-2 assigns against MOVED centroids (checksums differ)
    val rows = SparkEntry.queries("sim_pq_train")(spark, SparkTestBase.sf)
      .collect()
    graft.util.Checkpoints.releaseOwned(spark)
    val bySub = rows.groupBy(r => (r.getLong(0), r.getLong(1))) // (iter, subspace)
      .view.mapValues(rs => (rs.map(_.getLong(4)).sum, rs.map(_.getLong(5)).sum))
      .toMap
    val subspaces = rows.map(_.getLong(1)).distinct
    assert(subspaces.length == 4, s"expected 4 subspaces, got $subspaces")
    subspaces.foreach { ss =>
      val (i1, cs1) = bySub((1L, ss))
      val (i2, cs2) = bySub((2L, ss))
      assert(i2 < i1,
        s"subspace $ss: round-2 inertia $i2 did not drop below round-1 $i1")
      assert(cs1 != cs2,
        s"subspace $ss: recentering never moved the centroids (sum $cs1)")
    }
  }

  test("sim_ivfpq_rerank_trained: trained shortlist broadcasts into the exact refine") {
    // the two-stage serving pair under the TRAINED codebook: same pins as
    // sim_ivfpq_rerank — heap top-k both stages, no rank windows, and the
    // checkpointed shortlist must BROADCAST into the refine join (AQE
    // cannot size a LogicalRDD; an un-hinted join demotes to a sort-merge
    // that shuffles the corpus for a k'×queries probe side)
    val p = plan("sim_ivfpq_rerank_trained")
    graft.util.Checkpoints.releaseOwned(spark)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"all-pairs fallback in the trained rerank plan:\n$p")
    assert(p.contains("partial_top_k_by_score"),
      s"expected the map-side heap for both stages in:\n$p")
    assert(!p.contains("Window"), s"rank window crept into:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"shortlist→corpus refine join demoted to a corpus shuffle:\n$p")
    val r = SparkEntry.queries("sim_ivfpq_rerank_trained")(
      spark, SparkTestBase.sf).collect()
    graft.util.Checkpoints.releaseOwned(spark)
    val byQ = r.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 5, s"query $q carries ${rows.length} rows")
      val ex = rows.sortBy(_.getLong(4)).map(_.getLong(3))
      assert(ex.zip(ex.drop(1)).forall { case (a, b) => a <= b },
        s"exact_sq_e12 not ascending with rank for query $q: ${ex.toSeq}")
      assert(rows.forall(_.getLong(2) >= 0))
    }
    // the refine must disagree with trained-ADC order somewhere — a
    // vacuous refine means the stage tests nothing (deterministic
    // fixture, so this is an exactness property, not a flake)
    val anyReorder = byQ.exists { case (_, rows) =>
      val byRank = rows.sortBy(_.getLong(4)).map(_.getLong(2))
      byRank.zip(byRank.drop(1)).exists { case (a, b) => a > b }
    }
    assert(anyReorder,
      "trained rerank never disagreed with ADC order — vacuous refine")
  }

  test("sim_ivfpq_recall: capped probes; hits AND candidate costs monotone in nprobe") {
    // the one all-pairs shape allowed is the broadcast capped-truth side
    // (≤500 probes × corpus — linear in n with a fixed factor); the
    // candidate leg must reach the corpus through the trained-cell
    // equi-join, never a second cartesian
    val p = plan("sim_ivfpq_recall")
    graft.util.Checkpoints.releaseOwned(spark)
    assert(!p.contains("CartesianProduct"),
      s"truth side lost its broadcast (non-broadcast cartesian):\n$p")
    val bnl = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnl <= 1, s"the candidate leg fell back to all-pairs ($bnl BNL):\n$p")
    val r = SparkEntry.queries("sim_ivfpq_recall")(spark, SparkTestBase.sf)
      .collect().head
    graft.util.Checkpoints.releaseOwned(spark)
    val nEval = r.getLong(0)
    assert(nEval > 0 && nEval <= 500,
      s"probe cap violated: n_eval=$nEval (must be a fixed ≤500)")
    val (h1, h2, h4, h8) =
      (r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(7))
    // nprobe rung r+1's candidates are a superset of rung r's (cells are
    // ranked, rungs are prefixes) and the exact top-1 under the (d2, id)
    // tie-break is unique — widening can never turn a hit into a miss
    assert(h1 <= h2 && h2 <= h4 && h4 <= h8,
      s"recall not monotone in nprobe: $h1, $h2, $h4, $h8")
    assert(h8 >= 0 && h8 <= nEval)
    val (c1, c2, c4, c8) =
      (r.getLong(9), r.getLong(10), r.getLong(11), r.getLong(12))
    assert(c1 <= c2 && c2 <= c4 && c4 <= c8 && c8 > 0,
      s"candidate costs not monotone: $c1, $c2, $c4, $c8")
    // REAL pruning power (r15 VERDICT #1): with the 64-cell trained
    // quantizer the cheapest rung must scan a small corpus fraction —
    // ~1/64 ≈ 1.6 % expected, ≤5 % allowed for cell-size skew — and even
    // nprobe=8 must stay well under the old 8-cell geometry's floor
    // (12.5 % at nprobe=1). Measured at both gate SFs: rung 1 scans
    // 1.6–1.7 %, rung 8 12.7–14.3 %.
    val corpus = SparkTestBase.spark.read
      .parquet(s"${SparkTestBase.sf}/embeddings.parquet").count()
    assert(c1.toDouble / nEval <= corpus * 0.05,
      s"nprobe=1 scans ${c1.toDouble / nEval / corpus * 100}% of the " +
        s"corpus — the coarse quantizer is not pruning")
    assert(c8.toDouble / nEval <= corpus * 0.25,
      s"nprobe=8 scans ${c8.toDouble / nEval / corpus * 100}% of the corpus")
  }

  test("olap_nation_share broadcasts every dimension; facts join hash once") {
    val p = plan("olap_nation_share")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast dims in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi fallback in:\n$p")
    // exactly one shuffled join is allowed: lineitem ⋈ orders on the order key
    val shuffled = p.linesIterator.count(l =>
      l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
    assert(shuffled <= 1, s"more than one shuffled join in:\n$p")
  }

  test("events_retention_cohort aggregates without a window over the log") {
    val p = plan("events_retention_cohort")
    assert(!p.contains("Window"), s"window crept into the cohort plan:\n$p")
    // value sanity: age-0 of each cohort is its largest (retention can only
    // lose users), and every user lands in exactly one cohort
    import org.apache.spark.sql.functions.{col, max => fmax, sum => fsum}
    val c = SparkEntry.queries("events_retention_cohort")(
      SparkTestBase.spark, SparkTestBase.sf)
    val bad = c.groupBy(col("cohort_wk"))
      .agg(fmax(org.apache.spark.sql.functions.when(col("age_wk") === 0,
        col("n_users")).otherwise(0L)).as("w0"),
        fmax("n_users").as("peak"))
      .filter(col("peak") > col("w0")).count()
    assert(bad == 0, "a cohort's later week exceeds its week-0 user count")
  }

  test("events_pivot_dow compiles to one aggregation pass (no discovery job)") {
    val p = plan("events_pivot_dow")
    assert(p.contains("HashAggregate"), s"expected hash aggregation in:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"),
      s"unexpected wide operator in the pivot plan:\n$p")
    // explicit value list ⇒ the two-phase pivot aggregate, and nothing
    // else — the domain-discovery variant would add a collect job and a
    // third pass (jobs don't show in the plan; the shuffle count does)
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2, s"pivot shuffled more than twice:\n$p")
  }

  test("olap_unpivot_metrics expands without a shuffle beyond the aggregate") {
    val p = plan("olap_unpivot_metrics")
    assert(p.contains("Expand"), s"expected the unpivot Expand in:\n$p")
    assert(!p.contains("Union"), s"unpivot fell back to self-unions:\n$p")
  }

  test("events_trailing_window uses a RANGE frame on the user partition") {
    val p = plan("events_trailing_window")
    assert(p.contains("RangeFrame"), s"expected a RANGE frame in:\n$p")
    // exact under ties: two events at the same (user, ts) must see the
    // same trailing sum — the property a ROWS frame breaks
    import org.apache.spark.sql.functions.{col, countDistinct}
    val t = SparkEntry.queries("events_trailing_window")(
      SparkTestBase.spark, SparkTestBase.sf)
    val bad = t.groupBy(col("user_id"), col("ts_us"))
      .agg(countDistinct(col("trail_1h_e4")).as("d"))
      .filter(col("d") > 1).count()
    assert(bad == 0, "tied timestamps saw different trailing sums")
  }

  test("pii_pseudonymize is shuffle-free whole-stage-codegen'd projection") {
    val p = plan("pii_pseudonymize")
    assert(!p.contains("Exchange"), s"pseudonymization must not shuffle:\n$p")
    // `*(n)` is toString's WholeStageCodegen marker — the md5/regex/floor
    // projection must fuse with the scan
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("Project")),
      s"expected a codegen'd Project in:\n$p")
  }

  test("pipeline_sample_rate is a zero-shuffle scan-speed filter") {
    val p = plan("pipeline_sample_rate")
    assert(!p.contains("Exchange"), s"rate sampling must not shuffle:\n$p")
    assert(!p.contains("Window"), s"rate sampling must not window:\n$p")
  }

  test("olap_large_orders: HAVING reduces the fact before joins; top-20 distributed") {
    val p = plan("olap_large_orders")
    assert(p.contains("TakeOrderedAndProject"),
      s"expected distributed top-k, not a global sort, in:\n$p")
    // the qty_e2 > threshold filter must sit on the aggregate, upstream of
    // both joins — the group-filter-then-join shape
    assert(p.indexOf("25000") >= 0, s"qty threshold filter missing from:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }

  test("olap_dormant_customers plans a hash LeftAnti, scalar agg broadcast") {
    val p = plan("olap_dormant_customers")
    assert(p.contains("LeftAnti"), s"expected a left-anti hash join in:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row global aggregate must broadcast in:\n$p")
  }

  test("events_skew_join: the join key carries the salt; no cartesian") {
    val p = plan("events_skew_join")
    // both join sides must key on (user_id, salt) — a plain user_id join
    // means the salting silently fell out of the plan
    val joinLine = p.linesIterator.find(l =>
      l.contains("Join") && l.contains("user_id"))
    assert(joinLine.exists(_.contains("salt")),
      s"join must include the salt key:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }

  test("olap_small_qty_revenue broadcasts brand keys; fact scanned once") {
    val p = plan("olap_small_qty_revenue")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
    // the checkpointed brand slice feeds both aggregate and probe — the
    // raw fact parquet must appear at most once (zero when the checkpoint
    // fully hides it from this plan)
    val factScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(factScans <= 1, s"fact scanned $factScans times in:\n$p")
  }

  test("olap_top_supplier: per-supplier frame materialized; fact scanned once") {
    val p = plan("olap_top_supplier")
    val factScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(factScans <= 1, s"fact scanned $factScans times in:\n$p")
    assert(!p.contains("CartesianProduct") || p.contains("BroadcastExchange"),
      s"the one-row max must broadcast in:\n$p")
  }

  test("olap_volume_shipping: nation filters cut dims pre-broadcast; facts join once") {
    val p = plan("olap_volume_shipping")
    assert(p.contains("BroadcastHashJoin"),
      s"nation-filtered dims must broadcast in:\n$p")
    // the two-nation IN-list must land on the dimension scan side, not as a
    // post-join residual over the fact
    assert(p.contains("NATION_3"), s"nation filter missing from:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }

  test("olap_waiting_suppliers: decorrelated — no fact self-join, distributed top-k") {
    val p = plan("olap_waiting_suppliers")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a distributed partial top-k in:\n$p")
    // the raw lineitem parquet must be scanned exactly once — the
    // exists/not-exists pair is aggregation + window over one scan, not a
    // self-join of the fact against itself
    val factScans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(factScans == 1, s"expected one lineitem scan, got $factScans in:\n$p")
    assert(p.contains("Window"), s"per-order window sums missing from:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }

  test("olap_disjunctive_revenue: brand IN-list prunes the broadcast dim") {
    val p = plan("olap_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin"),
      s"brand-filtered part dim must broadcast in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"disjunction must stay a residual on ONE equi-join, not degrade to:\n$p")
  }

  test("pipeline_bloom_decontaminate: bitmap probe below the exact join; result = exact") {
    val p = plan("pipeline_bloom_decontaminate")
    // the might_contain probe must sit BELOW the broadcast join — bloom
    // survivors only reach the exact verification, never the full corpus
    val probeIdx = p.linesIterator.indexWhere(_.contains("might_contain"))
    val joinIdx = p.linesIterator.indexWhere(_.contains("BroadcastHashJoin"))
    assert(probeIdx >= 0, s"bloom probe missing from:\n$p")
    assert(joinIdx >= 0 && joinIdx < probeIdx,
      s"bloom probe must be below (after in text) the exact join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
    // equivalence: the prefilter must not change the answer
    val exact = SparkEntry.queries("pipeline_decontaminate")(spark, SparkTestBase.sf)
    val bloom = SparkEntry.queries("pipeline_bloom_decontaminate")(spark, SparkTestBase.sf)
    assert(bloom.exceptAll(exact).isEmpty && exact.exceptAll(bloom).isEmpty,
      "bloom-prefiltered result diverged from exact decontamination")
  }

  test("events_hop_window: explode then one aggregate — no self-join") {
    val p = plan("events_hop_window")
    assert(p.contains("Generate") || p.contains("explode"),
      s"expected the 2-slot explode in:\n$p")
    assert(!p.contains("Join"), s"hop windows must not self-join:\n$p")
    assert(p.contains("HashAggregate"), s"expected hash aggregation in:\n$p")
  }

  test("sim_pq_adc_topk: LUT broadcasts; heap ranking, never a per-qid window") {
    val p = plan("sim_pq_adc_topk")
    assert(p.contains("BroadcastHashJoin"),
      s"the 4x8-per-query LUT must broadcast in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"ADC must stay an equi-join on (subspace, code):\n$p")
    assert(p.contains("top_k_by_score") && !p.contains("Window"),
      s"ranking must be the heap aggregate, not a corpus-wide window:\n$p")
  }

  test("pipeline_sample_per_group: heap top-k per stratum, no per-group sort window") {
    val p = plan("pipeline_sample_per_group")
    assert(p.contains("top_k_by_score") && !p.contains("Window"),
      s"per-stratum sample must use the heap aggregate, not a window:\n$p")
    assert(!p.contains("Join"), s"sampling is one scan + one aggregate:\n$p")
  }

  test("olap_market_basket: pair generation is an in-task explode, not a self-join") {
    val p = plan("olap_market_basket")
    assert(!p.contains("Join"), s"basket pairs must not self-join:\n$p")
    assert(p.contains("Generate") || p.contains("explode"),
      s"expected the in-task pair explode in:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be distributed in:\n$p")
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans == 1, s"one lineitem scan expected, got $scans in:\n$p")
  }

  test("events_rolling_wau: fact reduced to user-days BEFORE the 7-slot explode") {
    val p = plan("events_rolling_wau")
    val scans = p.linesIterator.count(l =>
      l.contains("Scan parquet") && l.contains("events"))
    assert(scans == 1, s"one events scan expected, got $scans in:\n$p")
    assert(!p.contains("Join"), s"sliding distinct must not self-join:\n$p")
    // the distinct aggregate must sit BELOW the explode (later in plan text)
    val genIdx = p.linesIterator.indexWhere(l =>
      l.contains("Generate") || l.contains("explode"))
    val distinctBelow = p.linesIterator.toSeq.drop(genIdx + 1)
      .exists(_.contains("HashAggregate"))
    assert(genIdx >= 0 && distinctBelow,
      s"distinct(user, day) must run before the slot explode in:\n$p")
  }

  test("olap_forecast_revenue: range predicates reach the parquet scan") {
    val p = plan("olap_forecast_revenue")
    val pushed = p.linesIterator.find(l => l.contains("PushedFilters") &&
      l.contains("lineitem"))
      .orElse(p.linesIterator.find(_.contains("PushedFilters")))
    assert(pushed.exists(l => l.contains("l_discount") &&
      l.contains("l_quantity")),
      s"discount/quantity ranges must push to the scan:\n$p")
    assert(!p.contains("Join"), s"Q6 is a single scan, no join:\n$p")
  }

  test("olap_returned_items: return-flag pushed, dims broadcast, distributed top-20") {
    val p = plan("olap_returned_items")
    assert(p.linesIterator.exists(l => l.contains("PushedFilters") &&
      l.contains("l_returnflag")),
      s"return-flag equality must push to the lineitem scan:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be distributed in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"dims must broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }

  test("text_collocations: unigram totals broadcast, top-25 distributed") {
    val p = plan("text_collocations")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-25 must be TakeOrderedAndProject, not a global sort:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the |vocab|-sized positional totals must broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }

  test("graph_jaccard_suggest: top-20 distributed, no cartesian candidates") {
    val p = plan("graph_jaccard_suggest")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrderedAndProject in:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidate generation must stay an equi-join (wedges), got:\n$p")
  }

  test("pipeline_epoch_order and mm_scene_cuts: no global single-partition " +
      "window — ranks/lags are shard- and doc-local") {
    Seq("pipeline_epoch_order", "mm_scene_cuts").foreach { name =>
      val p = plan(name)
      assert(p.contains("Window"), s"$name should rank/lag via a window:\n$p")
      assert(!p.contains("SinglePartition"),
        s"$name must never collapse to one partition:\n$p")
    }
  }

  test("olap_customer_distribution aggregates orders before the left join") {
    val p = plan("olap_customer_distribution")
    // the left join's right side must be the pre-aggregated per-custkey
    // counts: an aggregate must appear BELOW the join in the plan text
    val joinIdx = p.linesIterator.indexWhere(_.contains("LeftOuter"))
    val aggBelow = p.linesIterator.toSeq.drop(joinIdx + 1)
      .exists(_.contains("HashAggregate"))
    assert(joinIdx >= 0 && aggBelow,
      s"orders must pre-aggregate below the left join in:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian crept into:\n$p")
  }
}
