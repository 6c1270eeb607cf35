package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming heavy hitters per hour — the bounded-state counterpart of the
  * batch `events_trending_topk` query, via the SpaceSaving algorithm
  * (Metwally, Agrawal, El Abbadi, "Efficient Computation of Frequent and
  * Top-k Elements in Data Streams", ICDT'05 — the public stream-summary
  * construction every production top-k monitor uses).
  *
  * The batch query can afford the exact (hour, user) rollup; an unbounded
  * stream cannot hold one counter per user per hour, so the keyed state is
  * a CAPACITY-BOUNDED summary of m counters. A hit increments its counter;
  * a miss EVICTS the minimum counter (deterministic tie: smaller count,
  * then larger id) and inherits its count as the new item's error bound.
  * SpaceSaving's guarantees (all on ANY input): estimate ∈ [true,
  * true + err]; any item with true count > N/m is present; and when the
  * hour's distinct-user count never exceeds m the summary is EXACT — the
  * spec pins that case against the oracle-gated batch query, and the
  * adversarial case against the guarantee itself.
  *
  * Scale shape: state is m pairs per ACTIVE hour (closed hours would be
  * evicted by an event-time timeout in production); one hash partition
  * pass per batch on the hour key. Emission is the current top-k per
  * touched hour each batch, sequence-stamped so consumers (and the spec)
  * can take the latest row per hour.
  */
object HeavyHitters {

  final case class HEvent(hr: Long, user_id: Long, ts_us: Long, event_id: Long)
  /** items: user -> (count, err); n = events observed; seq = batches. */
  final case class HState(items: Map[Long, (Long, Long)], n: Long, seq: Long)
  final case class HRow(hr: Long, seq: Long, rank: Long, user_id: Long,
      est: Long, err: Long)

  val Capacity = 64

  /** One SpaceSaving observation. */
  def observe(items: Map[Long, (Long, Long)], user: Long,
      m: Int): Map[Long, (Long, Long)] =
    items.get(user) match {
      case Some((c, e)) => items.updated(user, (c + 1, e))
      case None if items.size < m => items.updated(user, (1L, 0L))
      case None =>
        // evict the weakest: smallest count, then LARGEST id (deterministic)
        val (victim, (vc, _)) = items.minBy { case (id, (c, _)) => (c, -id) }
        (items - victim).updated(user, (vc + 1, vc))
    }

  /** Top-k of a summary: estimate desc, then smaller id — the same contract
    * as the batch query and the heap aggregate. */
  def topK(items: Map[Long, (Long, Long)], k: Int): Seq[(Long, Long, Long)] =
    items.toSeq.map { case (id, (c, e)) => (id, c, e) }
      .sortBy { case (id, c, _) => (-c, id) }.take(k)

  def update(hr: Long, batch: Iterator[HEvent],
      state: GroupState[HState]): Iterator[HRow] = {
    var st = state.getOption.getOrElse(HState(Map.empty, 0L, 0L))
    batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
      st = HState(observe(st.items, e.user_id, Capacity), st.n + 1, st.seq)
    }
    st = st.copy(seq = st.seq + 1)
    state.update(st)
    topK(st.items, 5).zipWithIndex.map { case ((id, c, e), i) =>
      HRow(hr, st.seq, i + 1L, id, c, e)
    }.iterator
  }

  /** events(hr, user_id, ts_us, event_id) → per-batch top-5 per touched
    * hour; latest seq per hour is the current answer. */
  def trending(events: DataFrame): Dataset[HRow] = {
    import events.sparkSession.implicits._
    events.select(col("hr"), col("user_id"), col("ts_us"), col("event_id"))
      .as[HEvent]
      .groupByKey(_.hr)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update)
  }
}
