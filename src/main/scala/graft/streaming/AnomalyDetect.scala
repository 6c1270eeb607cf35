package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Online per-key anomaly detection — the streaming twin of the batch
  * `events_anomaly_zscore` query, with the same EXACT integer contract.
  *
  * Each event is judged against the running statistics of everything seen
  * so far for its key (prefix semantics — the only semantics an online
  * detector can have; the batch query is the degenerate case where the
  * prefix is the whole corpus). The test is the identical cross-multiplied
  * form: z² > 9  ⇔  (n·v − s)² > 9·(n·q − s²) — no float mean, no float
  * stddev, so a replay produces bit-identical flags.
  *
  * State per key is four longs: n, s = Σv (both fit a Long far past any
  * realistic key cardinality) and q = Σv² carried as an UNSIGNED 128-BIT
  * pair (qHi, qLo) — v² alone is ~3e17 for the fixture's value range, so a
  * Long q would overflow within ~30 events; the 128-bit form holds ~1.8e21
  * maximal squares. The flag comparison lifts the compact state into BigInt
  * per event (exactness over micro-optimization; the state itself stays 32
  * bytes — what the state store scales by).
  *
  * Scale shape: `groupByKey(event_type)` hash-partitions the stream by key;
  * state is O(keys), not O(events). Within a micro-batch events apply in
  * (ts_us, event_id) order so replays and repartitions are deterministic.
  */
object AnomalyDetect {

  final case class VEvent(event_type: String, event_id: Long, ts_us: Long,
      v_e6: Long)
  final case class ZState(n: Long, s: Long, qHi: Long, qLo: Long)
  final case class Flag(event_type: String, event_id: Long, n_seen: Long,
      is_anomaly: Boolean)

  /** q as a BigInt from the unsigned 128-bit state pair. */
  def q128(st: ZState): BigInt =
    (BigInt(st.qHi) << 64) | (BigInt(st.qLo) & ((BigInt(1) << 64) - 1))

  /** st + one observation. The square is formed as a full 128-bit product
    * (`Math.multiplyHigh` supplies the high word), so the accumulator is
    * exact for ANY Long v — no |v| ≤ ~3e9 precondition; the 128-bit claim
    * holds unconditionally even if a future fixture widens the value range. */
  def observe(st: ZState, v: Long): ZState = {
    val sqLo = v * v                    // low 64 bits of v²
    val sqHi = Math.multiplyHigh(v, v)  // high 64 bits (v² ≥ 0, so signed = value)
    val lo = st.qLo + sqLo
    val carry = if (java.lang.Long.compareUnsigned(lo, st.qLo) < 0) 1L else 0L
    ZState(st.n + 1, st.s + v, st.qHi + sqHi + carry, lo)
  }

  /** The exact batch predicate on the prefix INCLUDING v. */
  def isAnomaly(st: ZState, v: Long): Boolean = {
    val n = BigInt(st.n); val s = BigInt(st.s); val q = q128(st)
    val d = n * v - s
    d * d > (n * q - s * s) * 9
  }

  def update(key: String, batch: Iterator[VEvent],
      state: GroupState[ZState]): Iterator[Flag] = {
    var st = state.getOption.getOrElse(ZState(0L, 0L, 0L, 0L))
    val out = batch.toSeq.sortBy(e => (e.ts_us, e.event_id)).map { e =>
      st = observe(st, e.v_e6)
      Flag(key, e.event_id, st.n, isAnomaly(st, e.v_e6))
    }
    state.update(st)
    out.iterator
  }

  /** events(event_type, event_id, ts_us, v_e6) → per-event online flags. */
  def flags(events: DataFrame): Dataset[Flag] = {
    import events.sparkSession.implicits._
    events.select(col("event_type"), col("event_id"), col("ts_us"),
      col("v_e6")).as[VEvent]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        update)
  }
}
