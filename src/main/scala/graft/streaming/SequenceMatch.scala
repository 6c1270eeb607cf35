package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-sequence matching (CEP) — the stateful twin of the
  * batch `events_funnel_steps` query, generalized to ANY stage list: a
  * user advances from stage i to i+1 on the first stage-(i+1) event
  * STRICTLY after the event that completed stage i.
  *
  * Greedy earliest-first matching over event-time-ordered arrivals is
  * exactly the batch semantics (t₁ = first stage-1 event; tᵢ₊₁ = first
  * stage-(i+1) event with ts > tᵢ): at every point the matcher holds the
  * minimal completion time of the current prefix, so any future stage has
  * the widest possible window. State per user is two numbers (stage
  * reached, its event time); one advancement row is emitted per stage per
  * user, so output is bounded by |stages|·|users| regardless of stream
  * length. Production would expire users via event-time timeout once the
  * funnel window passes; the match contract is timeout-independent.
  */
object SequenceMatch {

  final case class SEvent(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long)
  final case class SState(stage: Int, ts: Long)
  final case class SProgress(user_id: Long, stage: Long, ts_us: Long)

  def update(stages: IndexedSeq[String])(userId: Long,
      batch: Iterator[SEvent],
      state: GroupState[SState]): Iterator[SProgress] = {
    var st = state.getOption.getOrElse(SState(0, Long.MinValue))
    val out = scala.collection.mutable.ArrayBuffer.empty[SProgress]
    batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      if (st.stage < stages.length && e.event_type == stages(st.stage) &&
        (st.stage == 0 || e.ts_us > st.ts)) {
        st = SState(st.stage + 1, e.ts_us)
        out += SProgress(userId, st.stage.toLong, e.ts_us)
      }
    }
    state.update(st)
    out.iterator
  }

  /** events(user_id, event_type, ts_us, event_id) → one row per stage
    * advancement per user. */
  def matches(events: DataFrame, stages: Seq[String]): Dataset[SProgress] = {
    import events.sparkSession.implicits._
    val idx = stages.toIndexedSeq
    events.select(col("user_id"), col("event_type"), col("ts_us"),
      col("event_id")).as[SEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update(idx))
  }
}
