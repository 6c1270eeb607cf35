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

  /** State is the user's OPEN sessions, sorted by start and pairwise
    * separated by more than the gap — a LIST, not a single session, because
    * a watermark delay larger than the gap admits late events that open (or
    * merge into) sessions strictly in the past of the newest one. A session
    * is emitted only once the watermark passes its end + gap, so no
    * admissible late event can still change it — matching the batch query
    * on any (delay, gap) combination, not just delay < gap.
    *
    * MIGRATION: the state encoding changed from a single Session to
    * List[Session] — a checkpoint written by the earlier single-session
    * build cannot be restarted against this one (Spark's state schema check
    * fails the query); discard the checkpoint and reprocess. */
  def update(userId: Long, batch: Iterator[Event],
      state: GroupState[List[Session]]): Iterator[Session] = {
    var opens = state.getOption.getOrElse(Nil)
    batch.toSeq.sortBy(_.ts_us).foreach { e =>
      // sessions strictly more than a gap BEFORE e stay untouched on the left
      val (left, rest) = opens.span(_.session_end_us < e.ts_us - GapUs)
      rest match {
        case s :: tail if s.session_start_us <= e.ts_us + GapUs =>
          var merged = Session(userId,
            math.min(s.session_start_us, e.ts_us),
            math.max(s.session_end_us, e.ts_us), s.n_events + 1)
          // the extension may bridge to following sessions — coalesce them
          var t = tail
          while (t.nonEmpty &&
            t.head.session_start_us - merged.session_end_us <= GapUs) {
            merged = Session(userId, merged.session_start_us,
              math.max(merged.session_end_us, t.head.session_end_us),
              merged.n_events + t.head.n_events)
            t = t.tail
          }
          opens = left ++ (merged :: t)
        case _ =>
          opens = left ++ (Session(userId, e.ts_us, e.ts_us, 1L) :: rest)
      }
    }
    // emit every session the watermark has sealed; keep the live tail.
    // Seal STRICTLY in µs: Spark admits events with event_time == watermark
    // (only `< watermark` is late), and the batch query merges an event at
    // exactly end + gap (it splits only on diff > gap) — so a session is
    // still extendable while end + gap >= wm and must not be emitted yet.
    val wmMs = state.getCurrentWatermarkMs()
    val wmUs = wmMs * 1000L
    val (sealedS, live) =
      opens.partition(s => s.session_end_us + GapUs < wmUs)
    if (live.isEmpty) state.remove()
    else {
      state.update(live)
      // next closure check just past the earliest live horizon (+1 ms so
      // the ms-truncated timer lands strictly beyond end + gap). Clamp to
      // just above the current watermark: an event admitted by the late
      // filter (previous batch's watermark) can sit more than `gap` behind
      // the CURRENT one, and Spark throws if the timeout timestamp is not
      // strictly later than the watermark, killing the whole query.
      val horizon =
        live.map(s => (s.session_end_us + GapUs) / 1000L + 1L).min
      state.setTimeoutTimestamp(math.max(horizon, wmMs + 1L))
    }
    sealedS.iterator
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
      .flatMapGroupsWithState[List[Session], Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(update)
  }
}
