package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming last-touch attribution — the streaming twin of the batch
  * `events_asof_join` query (purchase → the user's latest click at or
  * before it).
  *
  * Per-user state is ONE row: the latest click seen. That is the whole
  * trick — the batch as-of needs a sort per user; the stream folds arrivals
  * into a single-value state, so memory is bounded by ACTIVE USERS, not
  * events, and a hot user costs the same as a cold one. Purchases emit on
  * arrival with whatever click state holds (attribution is by stream order
  * per user; within a batch events are replayed in event-time order with
  * clicks winning µs ties, matching the batch `>=` semantics).
  *
  * A production deployment would add an attribution window via
  * `EventTimeTimeout` to expire dormant users' clicks; the state here is
  * already bounded by the user population, which is the quantity that
  * matters for a state store.
  */
object AsofAttribution {

  final case class In(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class LastClick(click_id: Long, click_us: Long)
  final case class Attribution(event_id: Long, user_id: Long, p_us: Long,
      click_id: Option[Long], click_us: Option[Long], gap_us: Option[Long])

  def update(userId: Long, batch: Iterator[In],
      state: GroupState[LastClick]): Iterator[Attribution] = {
    // event-time replay order; clicks before purchases on a µs tie (the
    // batch query's ">=") and same-µs clicks resolved by highest event_id
    val events = batch.toSeq.sortBy(e =>
      (e.ts_us, if (e.event_type == "click") 0 else 1, e.event_id))
    val out = Seq.newBuilder[Attribution]
    var last = state.getOption.orNull
    events.foreach { e =>
      e.event_type match {
        case "click" =>
          // keep the LATEST click only — a late (older) click must not
          // regress the state another batch already advanced
          if (last == null || e.ts_us > last.click_us ||
            (e.ts_us == last.click_us && e.event_id > last.click_id))
            last = LastClick(e.event_id, e.ts_us)
        case "purchase" =>
          out += (if (last == null)
            Attribution(e.event_id, userId, e.ts_us, None, None, None)
          else
            Attribution(e.event_id, userId, e.ts_us, Some(last.click_id),
              Some(last.click_us), Some(e.ts_us - last.click_us)))
        case _ => // other event types carry no attribution signal
      }
    }
    if (last != null) state.update(last)
    out.result().iterator
  }

  /** Attributed purchases as an append stream. `events` must carry
    * `user_id`, `event_id`, `event_type` and µs `ts_us`. */
  def attribute(events: DataFrame): Dataset[Attribution] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[LastClick, Attribution](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
