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
