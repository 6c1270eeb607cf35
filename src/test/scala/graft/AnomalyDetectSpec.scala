package graft

import graft.streaming.AnomalyDetect
import graft.streaming.AnomalyDetect.{Flag, VEvent, ZState}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Online anomaly detection must (a) replay deterministically with exact
  * prefix semantics — every flag equals a sequential BigInt reference
  * computation — and (b) end with per-key statistics identical to the
  * batch `events_anomaly_zscore` stats frame, so the last-seen event is
  * judged against exactly the batch query's global statistics. */
class AnomalyDetectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def eventsUs() = {
    import graft.source.wal.WalFixture
    WalFixture.eventsUs(spark, SparkTestBase.sf)
      .select(col("event_type"), col("event_id"), col("ts").as("ts_us"),
        floor(col("value") * 1000000).cast("long").as("v_e6"))
  }

  test("streamed flags equal the exact sequential prefix reference") {
    val ev = eventsUs()
    val dir = Files.createTempDirectory("graft-anom-src").toString
    // two event-time-ordered file batches (value split so no µs tie spans
    // a batch boundary out of order)
    val Array(mid) = ev.stat.approxQuantile("ts_us", Array(0.5), 0.01)
    ev.filter(col("ts_us") < mid.toLong).coalesce(1)
      .write.mode("append").parquet(dir)
    ev.filter(col("ts_us") >= mid.toLong).coalesce(1)
      .write.mode("append").parquet(dir)

    val q = AnomalyDetect.flags(
      spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1")
        .parquet(dir))
      .toDF().writeStream.outputMode("update")
      .format("memory").queryName("anom_flags").start()
    try {
      q.processAllAvailable()
      val got = spark.table("anom_flags")
        .select("event_type", "event_id", "n_seen", "is_anomaly")
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getBoolean(3))).toMap

      // sequential exact reference over the same (ts, id) order
      var st = Map.empty[String, ZState].withDefaultValue(ZState(0, 0, 0, 0))
      val rows = ev.orderBy("ts_us", "event_id").collect()
      var checked = 0
      rows.foreach { r =>
        val (t, id, v) = (r.getString(0), r.getLong(1), r.getLong(3))
        val next = AnomalyDetect.observe(st(t), v)
        st = st.updated(t, next)
        val expect = (next.n, AnomalyDetect.isAnomaly(next, v))
        assert(got((t, id)) == expect, s"event $id ($t)")
        checked += 1
      }
      assert(checked == rows.length && got.size == rows.length)
    } finally q.stop()
  }

  test("final per-key state equals the batch query's global statistics") {
    val ev = eventsUs()
    // batch stats: n, s, q per key — q recomputed in BigInt
    val batch = ev.collect().groupBy(_.getString(0)).map { case (t, rs) =>
      val vs = rs.map(_.getLong(3))
      t -> (vs.length.toLong, vs.sum,
        vs.map(v => BigInt(v) * BigInt(v)).sum)
    }
    // streaming state after observing everything, any order per key
    batch.keys.foreach { t =>
      val vs = ev.filter(col("event_type") === t).collect().map(_.getLong(3))
      val fin = vs.foldLeft(ZState(0, 0, 0, 0))(AnomalyDetect.observe)
      val (n, s, q) = batch(t)
      assert(fin.n == n && fin.s == s && AnomalyDetect.q128(fin) == q,
        s"key $t")
    }
  }

  test("128-bit q accumulation carries correctly past Long overflow") {
    val big = 3000000000L // v² = 9e18, near Long.Max — carries within 3 adds
    val st = (1 to 10).foldLeft(ZState(0, 0, 0, 0))((s, _) =>
      AnomalyDetect.observe(s, big))
    assert(AnomalyDetect.q128(st) == BigInt(big) * BigInt(big) * 10)
    assert(st.qHi > 0, "expected a carry into the high word")
  }

  test("square is exact for any Long v — no |v| bound on the accumulator") {
    // Values whose square itself exceeds a Long (the old v*v form silently
    // overflowed past |v| ≈ 3.037e9); multiplyHigh makes the 128-bit claim
    // unconditional. Mix signs: (-v)² must accumulate identically.
    val vs = Seq(4000000000L, -4000000000L, 1000000000000L, -987654321987L,
      Long.MaxValue / 3, 3037000001L)
    val st = vs.foldLeft(ZState(0, 0, 0, 0))(AnomalyDetect.observe)
    assert(AnomalyDetect.q128(st) == vs.map(v => BigInt(v) * BigInt(v)).sum)
    assert(st.n == vs.length && st.s == vs.sum)
  }
}
