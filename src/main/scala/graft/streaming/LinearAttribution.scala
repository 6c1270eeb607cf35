package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming linear multi-touch attribution — the streaming twin of the
  * batch `events_attribution_linear` query (each purchase splits 1e6
  * credit equally across the distinct touch TYPES in its 7-day lookback).
  *
  * Per-user state is the latest timestamp PER TOUCH TYPE — at most
  * |event types| entries, so state is bounded by (active users × type
  * cardinality) no matter how hot a user is; the batch form joins every
  * conversion against the user's full windowed history. Within a batch,
  * events replay in (ts, event_id) order — exactly the batch query's
  * strictly-before composite rule, so an equal-µs touch with a smaller id
  * is already folded into state when its purchase processes, and one with
  * a larger id is not. Entries older than the lookback relative to the
  * current event can never credit a FUTURE conversion (event time is
  * non-decreasing under ordered replay), so they are trimmed in-line —
  * the state-expiry a production deployment needs is the semantics here,
  * not a bolt-on.
  *
  * Like [[AsofAttribution]], attribution is by stream order per user: a
  * cross-batch straggler (an old touch arriving after the purchase it
  * should have credited) attributes nothing retroactively — at-least-once
  * replay from the WAL source re-delivers in order, which is why the spec
  * splits batches by event-time VALUE ranges.
  */
object LinearAttribution {

  /** Lookback window (µs) — matches the batch query's 7 days. */
  val LookbackUs: Long = 604800000000L

  final case class In(user_id: Long, ts_us: Long, event_id: Long,
      event_type: String)
  final case class TouchState(lastTsByType: Map[String, Long])
  final case class Credit(conv_id: Long, user_id: Long, conv_us: Long,
      touch_type: String, n_types: Long, credit_e6: Long)

  def update(userId: Long, batch: Iterator[In],
      state: GroupState[TouchState]): Iterator[Credit] = {
    val events = batch.toSeq.sortBy(e => (e.ts_us, e.event_id))
    val out = Seq.newBuilder[Credit]
    var touches = state.getOption.map(_.lastTsByType).getOrElse(Map.empty)
    events.foreach { e =>
      // expire entries the lookback can never reach again — ts is
      // non-decreasing from here on, so (e.ts_us - t) only grows
      touches = touches.filter { case (_, t) => e.ts_us - t <= LookbackUs }
      e.event_type match {
        case "purchase" =>
          val n = touches.size.toLong
          if (n > 0) {
            val credit = 1000000L / n
            touches.keysIterator.toSeq.sorted.foreach { tp =>
              out += Credit(e.event_id, userId, e.ts_us, tp, n, credit)
            }
          }
        case tp =>
          // keep the LATEST touch per type; an older straggler within the
          // batch cannot regress state another event already advanced
          if (touches.get(tp).forall(_ <= e.ts_us))
            touches = touches.updated(tp, e.ts_us)
      }
    }
    if (touches.isEmpty) state.remove() else state.update(TouchState(touches))
    out.result().iterator
  }

  /** Per-conversion credit rows as an append stream. `events` must carry
    * `user_id`, `event_id`, `event_type` and µs `ts_us`. */
  def attribute(events: DataFrame): Dataset[Credit] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .as[In]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TouchState, Credit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(update)
  }
}
