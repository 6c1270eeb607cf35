package graft

import graft.operators.Routing
import graft.source.postgres.{CopyBothChannel, ReplicationSpooler, ReplicationWire}
import graft.source.wal.{WalFixture, WalLog}
import graft.streaming.StreamingPipeline
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.collection.mutable

/** The live-wire CopyBoth loop against a fake walsender: XLogData spooling,
  * keepalive/status protocol, commit feedback, and the full engine running
  * unchanged over a wire-fed WAL directory. */
class ReplicationWireSpec extends AnyFunSuite {
  import ReplicationWire._

  /** In-memory walsender: a scripted queue of server messages plus a log of
    * everything the standby wrote back. */
  class FakeChannel extends CopyBothChannel {
    val toSend = mutable.Queue.empty[Array[Byte]]
    val written = mutable.ArrayBuffer.empty[Array[Byte]]
    var closed = false
    override def read(): Array[Byte] =
      if (toSend.nonEmpty) toSend.dequeue() else null
    override def write(msg: Array[Byte]): Unit = written += msg
    override def close(): Unit = closed = true
  }

  private def statusOf(msg: Array[Byte]): (Long, Long, Long, Long, Boolean) = {
    val bb = java.nio.ByteBuffer.wrap(msg)
    assert(bb.get() == 'r'.toByte)
    (bb.getLong(), bb.getLong(), bb.getLong(), bb.getLong(), bb.get() != 0)
  }

  test("message codec round-trips and fails fast on unknown tags") {
    val x = XLogData(42L, 99L, 123456L, Array[Byte](1, 2, 3))
    val Data(back) = decode(encodeXLogData(x)): @unchecked
    assert(back.walStart == 42L && back.walEnd == 99L &&
      back.serverClock == 123456L && back.payload.toSeq == Seq[Byte](1, 2, 3))
    val Ping(k) = decode(encodeKeepalive(Keepalive(7L, 8L, replyRequested = true))): @unchecked
    assert(k.walEnd == 7L && k.serverClock == 8L && k.replyRequested)
    intercept[IllegalStateException] { decode(Array[Byte]('z', 0, 0)) }
    intercept[IllegalArgumentException] { decode(Array[Byte]('w', 1, 2)) }
  }

  test("XLogData frames spool into WalLog-readable segments; keepalives answered") {
    val walDir = Files.createTempDirectory("graft-wire-wal").toString
    val ch = new FakeChannel
    var now = 1000L * 1000000L
    val sp = new ReplicationSpooler(ch, walDir,
      statusIntervalMicros = 10L * 1000000, nowMicros = () => now)

    // a real pgoutput frame sequence (BEGIN/INSERT/COMMIT per event)
    val seen = mutable.Set.empty[String]
    val ev = WalFixture.Ev(1L, 1700000000000000L, 7L, "click", 1.5, "{}")
    val frames = WalFixture.frames(ev, seen)
    frames.foreach { f =>
      ch.toSend += encodeXLogData(XLogData(f.lsn, f.lsn, 0L, f.payload))
    }
    ch.toSend += encodeKeepalive(Keepalive(frames.last.lsn, 0L, replyRequested = true))
    sp.pump()

    // spooled segments are byte-compatible with the file WAL
    val spooled = WalLog.read(walDir, 0L, Long.MaxValue).toVector
    assert(spooled.map(_.lsn) == frames.map(_.lsn).toVector)
    assert(spooled.zip(frames).forall { case (a, b) => a.payload.sameElements(b.payload) })
    assert(sp.lastReceivedLsn == frames.last.lsn)
    // the demanded reply went out, with flushed = confirmed (nothing yet: 0)
    val replies = ch.written.map(statusOf)
    assert(replies.nonEmpty && replies.exists(_._2 == 0L))
    // clock is on the Postgres epoch
    assert(replies.head._4 == now - PgEpochShiftMicros)
  }

  test("maxTransactionBytes: a transaction past the bound fails loudly " +
      "mid-stream; bounded transactions reset at COMMIT and keep flowing") {
    def payload(tag: Char, size: Int): Array[Byte] = {
      val p = new Array[Byte](size); p(0) = tag.toByte; p
    }
    def feed(ch: FakeChannel, lsn: Long, p: Array[Byte]): Unit =
      ch.toSend += encodeXLogData(XLogData(lsn, lsn, 0L, p))

    // three back-to-back transactions, each ~300 payload bytes — the
    // per-transaction counter must RESET at COMMIT, or legitimate traffic
    // would accumulate into a false trip
    val okDir = Files.createTempDirectory("graft-txguard-ok").toString
    val okCh = new FakeChannel
    val okSp = new ReplicationSpooler(okCh, okDir, maxTransactionBytes = 500L)
    (0 until 3).foreach { t =>
      val base = 100L * (t + 1)
      feed(okCh, base, payload('B', 20))
      feed(okCh, base + 1, payload('I', 260))
      feed(okCh, base + 2, payload('C', 20))
    }
    okSp.pump()
    assert(WalLog.read(okDir, 0L, Long.MaxValue).size == 9,
      "bounded transactions must all spool")

    // one transaction whose cumulative payload crosses the bound: the THIRD
    // insert trips it — loudly, with the position in the message
    val badDir = Files.createTempDirectory("graft-txguard-bad").toString
    val badCh = new FakeChannel
    val badSp = new ReplicationSpooler(badCh, badDir, maxTransactionBytes = 500L)
    feed(badCh, 900L, payload('B', 20))
    (1 to 3).foreach(i => feed(badCh, 900L + i, payload('I', 200)))
    val e = intercept[IllegalStateException] { badSp.pump() }
    assert(e.getMessage.contains("maxTransactionBytes"), e.getMessage)
    assert(e.getMessage.contains("lsn=903"), e.getMessage)
    // frames BELOW the bound reached disk before the trip — restart from the
    // confirmed LSN re-streams the transaction, nothing is half-written past
    // the failure point
    badSp.flush()
    assert(WalLog.read(badDir, 0L, Long.MaxValue).map(_.lsn).toSeq ==
      Seq(900L, 901L, 902L))
  }

  test("status cadence fires without traffic; commit advances the reported flush LSN") {
    val walDir = Files.createTempDirectory("graft-wire-wal2").toString
    val ch = new FakeChannel
    var now = 0L
    val sp = new ReplicationSpooler(ch, walDir,
      statusIntervalMicros = 5L * 1000000, nowMicros = () => now)
    sp.pumpOnce() // first call: cadence fires immediately (lastStatus unset)
    val n0 = ch.written.size
    assert(n0 == 1)
    sp.pumpOnce() // same instant: no extra status
    assert(ch.written.size == n0)
    now += 5L * 1000000 // past the cadence
    sp.pumpOnce()
    assert(ch.written.size == n0 + 1)
    // the engine commits an epoch (what PgWalMicroBatchStream.commit does);
    // the next status must report it as flushed — the at-least-once handoff
    WalLog.confirm(walDir, 1234L)
    now += 5L * 1000000
    sp.pumpOnce()
    val (w, f, a, _, _) = statusOf(ch.written.last)
    assert(w == 1234L && f == 1234L && a == 1234L)
    sp.close()
    assert(ch.closed)
  }

  test("silent wire solicits a keepalive reply after the threshold " +
      "(wal_sender_timeout=0 must not read as a stall); traffic resets it") {
    val walDir = Files.createTempDirectory("graft-wire-solicit").toString
    val ch = new FakeChannel
    var now = 0L
    val sp = new ReplicationSpooler(ch, walDir,
      statusIntervalMicros = 10L * 1000000,
      solicitAfterMicros = 30L * 1000000, nowMicros = () => now)
    sp.pumpOnce() // immediate first status — wire just attached, no demand
    assert(!statusOf(ch.written.last)._5)
    now = 20L * 1000000 // quiet, but under the silence threshold
    sp.pumpOnce()
    assert(!statusOf(ch.written.last)._5)
    now = 35L * 1000000 // silent past it: a keepalive-less server needs asking
    sp.pumpOnce()
    assert(statusOf(ch.written.last)._5,
      "cadence status on a long-silent wire must request a reply")
    // an alive server answers; received traffic resets the silence clock
    ch.toSend += encodeKeepalive(Keepalive(1L, 0L, replyRequested = false))
    now = 45L * 1000000
    sp.pumpOnce()
    assert(!statusOf(ch.written.last)._5)
    now = 55L * 1000000 // 10 s since the answer: cadence yes, solicit no
    sp.pumpOnce()
    assert(!statusOf(ch.written.last)._5)
  }

  test("the unchanged engine runs end-to-end over a wire-fed WAL directory") {
    val walDir = Files.createTempDirectory("graft-wire-e2e").toString
    val outDir = Files.createTempDirectory("graft-wire-out").toString
    val ckptDir = Files.createTempDirectory("graft-wire-ckpt").toString
    val spark = SparkTestBase.spark
    val ch = new FakeChannel
    val sp = new ReplicationSpooler(ch, walDir, segmentBytes = 4096)

    val seen = mutable.Set.empty[String]
    val events = (1L to 200L).map(i =>
      WalFixture.Ev(i, 1700000000000000L + i * 1000000L, i % 13,
        Seq("click", "purchase", "signup", "view")(i.toInt % 4), i * 0.5, "{}"))
    events.foreach { e =>
      WalFixture.frames(e, seen).foreach { f =>
        ch.toSend += encodeXLogData(XLogData(f.lsn, f.lsn, 0L, f.payload))
      }
    }
    sp.pump() // rolls several 4 KiB segments

    val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
      ckptDir, outDir, kafkaBootstrap = None, triggerMs = 50L,
      maxEventsPerBatch = 64, sliceEvents = 16)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(outDir)
    // every event routes (4 resources all subscribed; DELETE drops only
    // from s_signup/s_view which don't subscribe it) — count must match the
    // batch routing query's semantics: recompute expected from the fixture
    val expected = events.count { e =>
      val op = WalFixture.opFor(e.eventId).toLowerCase
      Routing.fixtureStreams.exists(s =>
        s.normalized.resource == s"public.${e.eventType}" &&
          s.normalized.operations.contains(op))
    }
    assert(got.count() == expected)
    // the engine's commit wrote the confirmed LSN; the spooler reports it
    sp.sendStatus()
    val (_, flushed, _, _, _) = statusOf(ch.written.last)
    assert(flushed == WalLog.confirmed(walDir))
  }

  test("close on a dead wire neither throws nor leaks: farewell status " +
      "failure still closes segment file and channel") {
    val walDir = Files.createTempDirectory("graft-deadwire").toString
    val ch = new FakeChannel {
      var dead = false
      override def write(msg: Array[Byte]): Unit = {
        if (dead) throw new java.io.IOException("broken pipe")
        super.write(msg)
      }
    }
    val sp = new ReplicationSpooler(ch, walDir)
    ch.toSend += encodeXLogData(XLogData(100L, 100L, 0L, Array[Byte](1, 2, 3)))
    sp.pump()
    ch.dead = true
    sp.close() // farewell status throws inside — must be swallowed
    assert(ch.closed, "channel must close even when the farewell fails")
    // the spooled frame survived the ugly shutdown (file handle was closed)
    val frames = WalLog.read(walDir, afterLsn = -1L, untilLsn = Long.MaxValue)
    assert(frames.exists(_.lsn == 100L))
  }
}
