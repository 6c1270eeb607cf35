package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming consumer-side upsert materialization — the stateful-streaming
  * twin of the batch `cdc_upsert_state` query.
  *
  * Semantics (reference: src/processor/processor.zig:300-304 — READ is an
  * upsert; UPDATE carries the new row; a final DELETE removes the row;
  * out-of-order redelivery is resolved by LSN, the at-least-once dedup key):
  * keyed state per (resource, id) holding the latest (lsn, op, row); each
  * micro-batch emits the keys whose state changed.
  *
  * Scale shape: `groupByKey` hash-partitions by the state key — the same
  * partitioning the batch window uses — and the state store holds one small
  * record per touched row (DELETE leaves an LSN-guard tombstone; see
  * [[upsert]]). At 100 TB the state is bounded by touched-key cardinality,
  * not stream length; RocksDB state store + a timeout evicting tombstones
  * past the redelivery horizon slot in without structural changes.
  */
object UpsertState {

  final case class Change(resource: String, id: Long, op: String,
      lsn_num: Long, data: String)

  /** Row state + tombstone marker (deleted rows emit op=DELETE once). */
  final case class RowState(resource: String, id: Long, last_op: String,
      lsn_num: Long, data: String, live: Boolean)

  /** Project the WAL envelope stream to typed changes (id from the JSON
    * payload via the routing key column `id`). A row without the key column
    * cannot be materialized and is a hard error, matching the reference's
    * missing-routing-key semantics (processor.zig:247-251) — silently
    * keying on null would merge unrelated rows. */
  def changes(events: DataFrame): Dataset[Change] = {
    import events.sparkSession.implicits._
    val id = get_json_object(col("data"), "$.id").cast("long")
    events.select(
      col("resource"),
      when(id.isNull,
        raise_error(concat(lit("upsert state: row has no 'id' key: "), col("data")))
          .cast("long"))
        .otherwise(id).as("id"),
      col("op"), col("lsn_num"), col("data"))
      .as[Change]
  }

  def upsert(key: (String, Long), batch: Iterator[Change],
      state: GroupState[RowState]): Iterator[RowState] = {
    // apply in LSN order; stale redeliveries (lsn ≤ state.lsn) are no-ops
    // and — like a batch containing only them — must not re-emit or rewrite
    // unchanged state
    val sorted = batch.toSeq.sortBy(_.lsn_num)
    val prior = state.getOption.orNull
    var cur = prior
    sorted.foreach { c =>
      if (cur == null || c.lsn_num > cur.lsn_num) {
        cur = RowState(c.resource, c.id, c.op, c.lsn_num, c.data,
          live = c.op != "DELETE")
      }
    }
    if (cur == null || (cur eq prior)) Iterator.empty
    else {
      // DELETE keeps a tombstone (not state.remove): the LSN guard must
      // survive so a late redelivered INSERT cannot resurrect the row. State
      // is therefore bounded by touched-key cardinality; production evicts
      // tombstones past the redelivery horizon with a state timeout.
      state.update(cur)
      Iterator.single(cur)
    }
  }

  /** Materialized state stream: one output row per changed key per batch. */
  def materialize(events: DataFrame): Dataset[RowState] = {
    import events.sparkSession.implicits._
    changes(events)
      .groupByKey(c => (c.resource, c.id))
      .flatMapGroupsWithState[RowState, RowState](
        OutputMode.Update(), GroupStateTimeout.NoTimeout())(upsert)
  }
}
