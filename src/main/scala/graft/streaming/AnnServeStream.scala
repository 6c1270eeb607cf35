package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ANN serving — the streaming twin of the batch
  * `sim_ivfpq_trained` query: an unbounded stream of raw query vectors
  * served against the TRAINED product-quantization index.
  *
  * The production pattern is `foreachBatch`: the index (codes frame +
  * codebook arrays from `ExtQueries.pqTrainedIndex`) is built ONCE and
  * broadcast; every micro-batch of queries runs [[serve]] as a plain
  * batch plan against it. Serving is STATELESS — each query row is
  * answered entirely within its own micro-batch, so there is no state
  * store at all, memory is bounded by the batch size, and throughput
  * scales horizontally with executors. At 100 TB the corpus lives in the
  * codes frame (4 bytes of codes per vector per subspace); a query
  * touches its broadcast 4×8 LUT plus the label-pruned inverted list,
  * never a raw vector.
  *
  * Exactness: the query's LUT is computed from its RAW embedding with the
  * SAME quantization expression and codegen kernel the trainer uses, so a
  * corpus-member query produces bit-identical LUT entries to the batch
  * query's corpus-side derivation — `AnnServeStreamSpec` pins the
  * streamed top-k equal to `sim_ivfpq_trained`'s rows under 1- and
  * 3-batch splits of the query stream.
  */
object AnnServeStream {

  /** Invariant serving state, built ONCE per trained index (r16 VERDICT
    * #5: the batch-1 serving floor was dominated by per-batch rebuild of
    * frames that do not change per batch).
    *
    *  - `codes`: the corpus codes frame, pre-partitioned by `vec_id` and
    *    locally checkpointed. Two per-batch costs die here: (a) the codes
    *    derivation (a corpus-sized groupBy + exchange over the scored
    *    checkpoint) re-ran EVERY batch in [[serve]]; (b) the per-query ADC
    *    sum's groupBy(qid, vec_id) needed a corpus-sized exchange —
    *    HashPartitioning(vec_id) satisfies ClusteredDistribution(qid,
    *    vec_id), so the aggregate now runs in place on the cached blocks.
    *  - `carrBySub`: the collected codebook (≤ nSub×8 rows — bounded by
    *    construction, never corpus-sized), as a driver-side map baked into
    *    a LITERAL per batch. Kills the per-batch BroadcastExchange build
    *    of the codebook join; the one remaining broadcast per batch is
    *    the query LUT, which is irreducibly query-dependent.
    */
  final class TrainedServeIndex(
      val codes: DataFrame,
      val carrBySub: Map[Int, Seq[(Long, Seq[Long])]]) {
    /** Drop the cached corpus blocks (serving teardown). */
    def release(): Unit = codes.unpersist()
  }

  /** Materialize the invariant side of the serving plan. Call OUTSIDE
    * foreachBatch, once per index (re-train ⇒ re-prepare). The collect is
    * the ≤32-row codebook, not data. The codes frame is persist()ed, not
    * checkpointed: an InMemoryRelation PRESERVES the repartition's
    * HashPartitioning(vec_id) so the per-batch aggregate plans without an
    * exchange, where a LogicalRDD under AQE reports unknown partitioning
    * and every batch re-shuffles the corpus (measured: 4 exchanges/batch
    * vs 1). Call [[TrainedServeIndex.release]] when serving ends. */
  /** @param numPartitions partition count for the cached codes frame — a
    *   SERVING-deployment sizing knob: every per-batch stage over the
    *   codes runs one task per partition, so at bench/edge scale a small
    *   count avoids paying 32 near-empty task launches per micro-batch,
    *   while a 10⁹-vector deployment sizes it to its executor fleet.
    *   0 (default) keeps the session's shuffle parallelism. Partitioning
    *   stays HashPartitioning(vec_id) either way — the exchange-free
    *   per-batch ADC plan is unchanged. */
  def prepare(codes: DataFrame, carr: DataFrame,
      numPartitions: Int = 0): TrainedServeIndex = {
    val byS = carr.collect().map { r =>
      (r.getAs[Number]("subspace").intValue(),
        r.getAs[Number]("cid").longValue(),
        r.getSeq[Long](r.fieldIndex("carr")).toIndexedSeq)
    }.groupBy(_._1).map { case (s, rows) =>
      s -> rows.sortBy(_._2).map(t => (t._2, t._3: Seq[Long])).toSeq
    }
    val codesPart = (if (numPartitions > 0)
        codes.repartition(numPartitions, col("vec_id"))
      else codes.repartition(col("vec_id"))).persist()
    codesPart.count() // materialize off the serving clock
    new TrainedServeIndex(codesPart, byS)
  }

  /** [[serve]] against a prepared index. Two plans, identical output:
    *
    *  - **driver-LUT** (batches ≤ `maxDriverLut` queries — the serving
    *    steady state): the per-query ADC LUT is only nSub×8 longs, so it
    *    computes WHERE THE QUERY ARRIVES — quantize the batch through THE
    *    trainer's `pqSubspaceSplit` expression (a bounded collect), take
    *    exact integer distances against the already-collected codebook on
    *    the driver (plain Σ(a−b)² over longs — bit-identical to the
    *    `L2SqLong` kernel's wraparound arithmetic, same element order),
    *    and bake the LUTs into a LITERAL the codes scan explodes against.
    *    The per-batch plan then has ZERO broadcast exchanges and zero LUT
    *    jobs — this is the standard production split (the LUT belongs to
    *    the query host; the cluster only sums 4 lookups per candidate).
    *  - **distributed-LUT** (larger batches — the backfill shape, or
    *    `maxDriverLut = 0`): the original plan — LUT computed as a tiny
    *    DataFrame with the same expression + `L2SqLong` kernels and
    *    broadcast into the ADC join.
    *
    * Both paths: an exchange-free ADC sum on the pre-partitioned codes
    * (HashPartitioning(vec_id) satisfies the (qid, vec_id) clustering)
    * and the small per-query top-k exchange — ≤ 1 shuffle per batch,
    * pinned with output equality for BOTH paths in `AnnServeStreamSpec`. */
  def serveFast(queries: DataFrame, idx: TrainedServeIndex, k: Int = 5,
      maxDriverLut: Int = 256): DataFrame = {
    val qsub = queries.select(col("vec_id").as("qid"),
        col("label").as("qlabel"),
        explode(graft.queries.ExtQueries
          .pqSubspaceSplit(4, "l_subspace", "qarr")).as("p"))
      .select(col("qid"), col("qlabel"), col("p.l_subspace").as("l_subspace"),
        col("p.qarr").as("qarr"))
    val cap = 4 * maxDriverLut // one qsub row per (query, subspace)
    // the driver-LUT path keys queries to candidates through a long cast
    // of the label column (r18 ADVICE): a non-integral label (string,
    // decimal…) would null out the cast, silently matching nothing — the
    // distributed path joins on the label natively and handles any type,
    // so non-integral labels route there instead of failing quietly
    def integral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.ByteType |
           _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType |
           _: org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    val driverEligible = maxDriverLut > 0 &&
      integral(queries.schema("label").dataType) &&
      integral(idx.codes.schema("label").dataType)
    val head =
      if (driverEligible) qsub.limit(cap + 1).collect()
      else Array.empty[org.apache.spark.sql.Row]
    val perPair =
      if (!driverEligible || head.length > cap) {
        val carrLit = typedLit(idx.carrBySub)
        val lut = qsub
          .select(col("qid"), col("qlabel"), col("l_subspace"), col("qarr"),
            explode(element_at(carrLit, col("l_subspace"))).as("ce"))
          .select(col("qid"), col("qlabel"), col("l_subspace"),
            col("ce._1").as("l_cid"),
            graft.functions.L2SqLong(col("qarr"), col("ce._2")).as("d2"))
        idx.codes.join(broadcast(lut),
            col("subspace") === col("l_subspace") &&
              col("code") === col("l_cid") && col("label") === col("qlabel"))
          .filter(col("qid") =!= col("vec_id"))
          .select(col("qid"), col("vec_id"), col("d2"))
      } else {
        // flat LUT per query: index subspace·8 + cid (cids are 0..7 by
        // construction; codewords emptied by a Lloyd round simply never
        // appear as a stored code, so their slots are unreachable)
        val qrows: Seq[(Long, Long, Seq[Long])] = head.toSeq
          .groupBy(r => (r.getLong(r.fieldIndex("qid")),
            r.getAs[Number]("qlabel").longValue()))
          .map { case ((qid, qlabel), rs) =>
            val flat = new Array[Long](4 * 8)
            rs.foreach { r =>
              val s = r.getAs[Number]("l_subspace").intValue()
              val qarr = r.getSeq[Long](r.fieldIndex("qarr"))
              idx.carrBySub.getOrElse(s, Seq.empty).foreach {
                case (cid, carr) =>
                  require(carr.length == qarr.length,
                    s"ADC LUT: dimension mismatch (${qarr.length} vs " +
                      s"${carr.length})")
                  var acc = 0L
                  var i = 0
                  while (i < qarr.length) { // = L2SqLong's loop, verbatim
                    val d = qarr(i) - carr(i)
                    acc += d * d
                    i += 1
                  }
                  flat(s * 8 + cid.toInt) = acc
              }
            }
            (qid, qlabel, flat.toSeq)
          }.toSeq.sortBy(_._1)
        idx.codes
          .select(col("vec_id"), col("label").cast("long").as("label_l"),
            col("subspace"), col("code"),
            explode(typedLit(qrows)).as("q"))
          .filter(col("q._2") === col("label_l") &&
            col("q._1") =!= col("vec_id"))
          .select(col("q._1").as("qid"), col("vec_id"),
            element_at(col("q._3"),
              (col("subspace") * 8 + col("code") + 1).cast("int")).as("d2"))
      }
    perPair
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_sq_e12"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(
        (-col("adc_sq_e12")).cast("double"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("qid"), col("t.id").as("cid"),
        (-col("t.score")).cast("long").as("adc_sq_e12"),
        (col("pos") + 1).cast("long").as("rank"))
  }

  /** Serve one (micro-)batch of raw query vectors `(vec_id, label,
    * embedding)` against the trained index: per-query LUT from the
    * broadcast codebook arrays, label-matched ADC scoring over the codes
    * frame, exact-integer e12 distances, heap top-k. Output shape is the
    * batch query's: (qid, cid, adc_sq_e12, rank). */
  def serve(queries: DataFrame, codes: DataFrame, carr: DataFrame,
      k: Int = 5): DataFrame = {
    // THE trainer's quantization expression, not a copy (r15 review
    // finding): the exactness contract rides on both sides deriving
    // subvectors through the same code path
    val qsub = queries.select(col("vec_id").as("qid"),
        col("label").as("qlabel"),
        explode(graft.queries.ExtQueries
          .pqSubspaceSplit(4, "l_subspace", "qarr")).as("p"))
      .select(col("qid"), col("qlabel"), col("p.l_subspace").as("l_subspace"),
        col("p.qarr").as("qarr"))
    // per-query LUT: one fused kernel call per (query, subspace, codeword)
    val lut = qsub.join(
        broadcast(carr.withColumnRenamed("subspace", "l_subspace")),
        Seq("l_subspace"))
      .select(col("qid"), col("qlabel"), col("l_subspace"),
        col("cid").as("l_cid"),
        graft.functions.L2SqLong(col("qarr"), col("carr")).as("d2"))
    codes.join(broadcast(lut),
        col("subspace") === col("l_subspace") &&
          col("code") === col("l_cid") && col("label") === col("qlabel"))
      .filter(col("qid") =!= col("vec_id"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("d2")).as("adc_sq_e12"))
      .groupBy(col("qid"))
      .agg(graft.functions.TopKByScore.topK(
        (-col("adc_sq_e12")).cast("double"), col("vec_id"), k).as("top"))
      .select(col("qid"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("qid"), col("t.id").as("cid"),
        (-col("t.score")).cast("long").as("adc_sq_e12"),
        (col("pos") + 1).cast("long").as("rank"))
  }
}
