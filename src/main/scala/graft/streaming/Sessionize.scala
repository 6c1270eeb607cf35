package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with event-time timeouts — the streaming twin of
  * the batch `events_sessionize` query.
  *
  * Per-user state holds the open session; an event within the gap extends
  * it, an event beyond the gap (or an event-time timeout once the watermark
  * passes sessionEnd + gap) closes and emits it. This is the
  * `flatMapGroupsWithState` + `EventTimeTimeout` pattern: state is bounded
  * by ACTIVE users — closed sessions leave the store the moment the
  * watermark passes them, which is what makes sessionization viable on an
  * unbounded stream.
  */
object Sessionize {

  /** Carries the event-time column through the typed boundary — the
    * watermark attribute must survive into flatMapGroupsWithState for
    * EventTimeTimeout to resolve. */
  final case class Event(user_id: Long, ts_us: Long,
      event_time: java.sql.Timestamp)
  final case class Session(user_id: Long, session_start_us: Long,
      session_end_us: Long, n_events: Long)

  val GapUs: Long = 1800000000L // 30 min, matches the batch query

  def update(userId: Long, batch: Iterator[Event],
      state: GroupState[Session]): Iterator[Session] = {
    val events = batch.toSeq.sortBy(_.ts_us)
    var open = state.getOption.orNull
    val closed = Seq.newBuilder[Session]
    if (events.isEmpty) {
      // event-time timeout: watermark passed the open session's horizon
      if (state.hasTimedOut && open != null) {
        closed += open
        state.remove()
      }
    } else {
      events.foreach { e =>
        if (open == null) {
          open = Session(userId, e.ts_us, e.ts_us, 1L)
        } else if (e.ts_us - open.session_end_us > GapUs) {
          closed += open
          open = Session(userId, e.ts_us, e.ts_us, 1L)
        } else {
          open = open.copy(
            session_end_us = math.max(open.session_end_us, e.ts_us),
            n_events = open.n_events + 1)
        }
      }
      state.update(open)
      // close the session once the watermark passes its end + gap. Clamp to
      // just above the current watermark: an event admitted by the late
      // filter (previous batch's watermark) can still sit more than `gap`
      // behind the CURRENT watermark — e.g. an out-of-order backlog drain
      // with watermarkDelay > gap — and Spark throws if the timeout
      // timestamp is not strictly later than the watermark, killing the
      // whole query. The clamped session times out at the next batch, which
      // is exactly when the unclamped one would have fired anyway.
      val wmMs = state.getCurrentWatermarkMs()
      state.setTimeoutTimestamp(
        math.max(open.session_end_us / 1000L + GapUs / 1000L, wmMs + 1L))
    }
    closed.result().iterator
  }

  /** Closed sessions as an append stream. `events` must carry `user_id` and
    * an event-time `ts_us` (µs); the watermark drives session closure. */
  def sessions(events: DataFrame, watermarkDelay: String = "1 hour"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("ts_us"),
        (col("ts_us") / 1000000L).cast("timestamp").as("event_time"))
      .withWatermark("event_time", watermarkDelay)
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
