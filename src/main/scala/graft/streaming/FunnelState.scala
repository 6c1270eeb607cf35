package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming funnel conversion — the stateful twin of the batch
  * `events_funnel` query (signup → later purchase, strictly after the
  * FIRST signup).
  *
  * Per-user state is two fields: the first signup's event time (or -1) and
  * whether a qualifying purchase has been seen. Each micro-batch applies
  * its events in (ts_us, event_id) order and emits the user's status only
  * when it CHANGES — entered the funnel, or converted — so output volume
  * is bounded by 2·|users|, not by event count. The batch query's counts
  * are the fold of the final per-user states:
  * n_signup_users = |state with signup|, n_converted = |converted|.
  *
  * Scale shape: one hash partition pass per batch on the user key (the
  * same shuffle the batch groupBy runs), state is 17 bytes per ACTIVE
  * funnel user, and a production deployment would add an event-time
  * timeout to expire users whose funnel window has passed — the contract
  * (strictly-after-first-signup) is timeout-independent.
  */
object FunnelState {

  final case class FEvent(user_id: Long, event_type: String, ts_us: Long,
      event_id: Long)
  final case class FState(firstSignupUs: Long, converted: Boolean)
  final case class FStatus(user_id: Long, first_signup_us: Long,
      converted: Boolean)

  def update(userId: Long, batch: Iterator[FEvent],
      state: GroupState[FState]): Iterator[FStatus] = {
    var st = state.getOption.getOrElse(FState(-1L, converted = false))
    val out = scala.collection.mutable.ArrayBuffer.empty[FStatus]
    batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      val next = e.event_type match {
        case "signup" if st.firstSignupUs < 0 => FState(e.ts_us, st.converted)
        case "purchase" if st.firstSignupUs >= 0 && !st.converted &&
          e.ts_us > st.firstSignupUs => FState(st.firstSignupUs, converted = true)
        case _ => st
      }
      if (next != st) {
        st = next
        out += FStatus(userId, st.firstSignupUs, st.converted)
      }
    }
    state.update(st)
    out.iterator
  }

  /** events(user_id, event_type, ts_us, event_id) → per-user status
    * changes; the LAST status per user is the funnel state. */
  def statuses(events: DataFrame): Dataset[FStatus] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("event_type"), col("ts_us"),
      col("event_id")).as[FEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update)
  }
}
