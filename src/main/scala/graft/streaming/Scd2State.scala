package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD type-2 materialization — the stateful twin of the batch
  * `cdc_scd2` query: the changelog folds into dimension HISTORY rows, each
  * version valid from its own commit to the next change's commit.
  *
  * Per-key state is the single OPEN version (or none after a DELETE). Each
  * incoming change, applied in lsn order:
  *   - closes the open version, emitting its finished history row
  *     (valid_to = the new change's commit, is_current = false);
  *   - a non-DELETE change then emits its own OPEN row (sentinel valid_to,
  *     is_current = true) and becomes the state; a DELETE leaves no open
  *     version.
  * A version therefore produces ≤2 emissions ever (open, then its close) —
  * output is bounded by change volume, and a consumer folds to the exact
  * batch result by keeping, per (resource, id, lsn_num), the closed row
  * over the open one (`Scd2StateSpec` pins this fold against `cdc_scd2`
  * value-exact).
  *
  * Scale shape: one hash-partition pass per micro-batch on the same
  * (resource, id) key the batch window shuffles on; state is one row per
  * LIVE key — the same cardinality a keyed state store holds for the
  * upsert materialization.
  */
object Scd2State {

  /** Matches the open-ended sentinel the batch query uses (9999-12-31). */
  val OpenTs = 253402300800L

  final case class Change(resource: String, id: Long, op: String,
      lsn_num: Long, commit_ts: Long, user_id: Long, value: Double)
  final case class Open(op: String, lsn_num: Long, commit_ts: Long,
      user_id: Long, value: Double)
  final case class HistoryRow(resource: String, id: Long, op: String,
      lsn_num: Long, user_id: Long, value: Double, valid_from_ts: Long,
      valid_to_ts: Long, is_current: Boolean)

  def update(key: (String, Long), batch: Iterator[Change],
      state: GroupState[Open]): Iterator[HistoryRow] = {
    val (resource, id) = key
    var cur = state.getOption
    val out = scala.collection.mutable.ArrayBuffer.empty[HistoryRow]
    batch.toSeq.sortBy(_.lsn_num).foreach { e =>
      cur.foreach { v =>
        out += HistoryRow(resource, id, v.op, v.lsn_num, v.user_id, v.value,
          v.commit_ts, e.commit_ts, is_current = false)
      }
      if (e.op == "DELETE") cur = None
      else {
        cur = Some(Open(e.op, e.lsn_num, e.commit_ts, e.user_id, e.value))
        out += HistoryRow(resource, id, e.op, e.lsn_num, e.user_id, e.value,
          e.commit_ts, OpenTs, is_current = true)
      }
    }
    cur match {
      case Some(v) => state.update(v)
      case None => state.remove()
    }
    out.iterator
  }

  /** changelog(resource, id, op, lsn_num, commit_ts, user_id, value) →
    * history-row emissions; fold per (resource, id, lsn_num) keeping the
    * closed row over the open one. */
  def history(changes: DataFrame): Dataset[HistoryRow] = {
    import changes.sparkSession.implicits._
    changes.select(col("resource"), col("id"), col("op"), col("lsn_num"),
      col("commit_ts"), col("user_id"), col("value")).as[Change]
      .groupByKey(c => (c.resource, c.id))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update)
  }
}
