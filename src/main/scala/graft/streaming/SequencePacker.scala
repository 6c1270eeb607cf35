package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sequence packing — the streaming twin of the batch
  * `pipeline_pack_sequences` query (concat-and-chunk: documents laid
  * end-to-end, split every `BudgetTokens` tokens).
  *
  * State per (lang, shard) is ONE running token offset, so the store is
  * bounded by the number of packing streams (lang × 16), not by documents —
  * each arriving doc is assigned `pack_id = offset div budget`, then the
  * offset advances. Assignments are therefore STABLE across micro-batch
  * boundaries: however the stream is chopped into batches, every doc gets
  * the same pack as the batch query gives it (the spec proves equality for
  * two different batch splits).
  *
  * Ordering contract: input must arrive log-ordered per (lang, shard) —
  * true for a CDC/WAL-fed ingest, which is the source this engine feeds it
  * from (within one micro-batch, arrival order is restored by the doc_id
  * sort below; across batches the source's log order is the guarantee).
  * Feeding it an unordered stream would interleave offsets
  * non-deterministically — that input wants the batch packer after an
  * explicit sort.
  *
  * At 100 TB the shard key is the parallelism axis (more shards = more
  * groups = more state-store partitions), exactly like the batch window's
  * (lang, shard) partitioning.
  */
object SequencePacker {

  final case class Doc(lang: String, shard: Long, doc_id: Long, n_tokens: Long)
  final case class Packed(lang: String, shard: Long, doc_id: Long,
      n_tokens: Long, pack_id: Long)
  final case class Offset(cum: Long)

  val BudgetTokens: Long = 2048L

  def update(key: (String, Long), batch: Iterator[Doc],
      state: GroupState[Offset]): Iterator[Packed] = {
    var cum = state.getOption.map(_.cum).getOrElse(0L)
    // restore log order within the batch; across batches the source's log
    // order is the contract (see Scaladoc)
    val out = batch.toSeq.sortBy(_.doc_id).map { d =>
      val p = Packed(d.lang, d.shard, d.doc_id, d.n_tokens, cum / BudgetTokens)
      cum += d.n_tokens
      p
    }
    state.update(Offset(cum))
    out.iterator
  }

  /** docs(lang, doc_id, n_tokens) → per-doc pack assignment. */
  def pack(docs: DataFrame): Dataset[Packed] = {
    import docs.sparkSession.implicits._
    docs.select(col("lang"), (col("doc_id") % 16).as("shard"),
        col("doc_id"), col("n_tokens"))
      .as[Doc]
      .groupByKey(d => (d.lang, d.shard))
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }
}
