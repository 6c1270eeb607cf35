package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming sessionization — the stateful twin of the batch
  * `events_sessionize` query, built on Spark's NATIVE `session_window`
  * aggregation (dynamic-gap session state merging across micro-batches is
  * exactly what the built-in operator owns; a hand-rolled
  * flatMapGroupsWithState would re-implement its merge logic worse).
  *
  * Gap parity: the batch rule starts a new session when the inter-event
  * gap is STRICTLY greater than 30 min (`ts - prev > 1800000000 µs`), i.e.
  * an exactly-30:00.000000 gap still merges. `session_window` merges while
  * `next.start < prev.end = prev.ts + gap`, a strict `<`, so the twin
  * passes gap = 30 min + 1 µs — the two rules then agree on every input.
  *
  * Scale shape: one shuffle on the user key per micro-batch (the same
  * partitioning the batch window uses), session state per ACTIVE session
  * only, finalized sessions emitted in append mode once the watermark
  * passes their close — bounded state, bounded emission.
  */
object SessionizeStream {

  /** Batch gap is `> 1800000000 µs` (strictly greater starts a session);
    * session_window's strict `<` merge needs the +1. */
  val Gap = "1800000001 microseconds"

  /** events(user_id, ts TIMESTAMP, event_id) → finalized sessions
    * (user_id, session_start_us, n_events). */
  def sessions(events: DataFrame): DataFrame =
    events.withWatermark("ts", "0 seconds")
      .groupBy(col("user_id"), session_window(col("ts"), Gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("w.start")).as("session_start_us"),
        col("n_events"))
}
