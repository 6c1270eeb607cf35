package graft

import graft.config.StreamDef
import graft.model.{ChangeEvent, Op}
import graft.source.pgoutput.{Converter, PgOutputDecoder, RelationRegistry}
import graft.source.postgres.{PgSession, ReplicationSpooler, SnapshotBootstrap, WireBootstrap}
import graft.source.wal.WalLog
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.collection.mutable.ArrayBuffer

/** The full wire stack against a REAL PostgreSQL walsender — the live tier
  * that FakeWalsender approximates (reference: integration + e2e tiers,
  * src/source/postgres/integration_test.zig, src/e2e/snapshot_test.zig).
  * What only a real server can prove:
  *
  *  - the actual SASL SCRAM-SHA-256 exchange, server signature included;
  *  - `CREATE_REPLICATION_SLOT … USE_SNAPSHOT` visibility: the snapshot scan
  *    sees exactly the pre-boundary rows, the stream exactly the
  *    post-boundary DML — the exactly-once handoff, on genuine snapshot
  *    machinery rather than our fake's frozen tables;
  *  - real pgoutput framing from a real decoder plugin (Relation/Begin/
  *    Insert/Update/Delete/Commit), REPLICA IDENTITY FULL old rows,
  *    in-stream schema change via a fresh Relation message;
  *  - standby-status feedback actually moving `confirmed_flush_lsn` in
  *    `pg_replication_slots`.
  *
  * Skips cleanly (assume) where no postgres binaries exist.
  */
class PgLiveWireSpec extends AnyFunSuite {

  private def live(): Unit =
    assume(LivePostgres.available, "no usable postgres server in this environment")

  private def lsn(text: String): Long = ChangeEvent.lsnValue(text)

  /** Pump the spooler until `want` decoded data events (or timeout), then
    * convert spooled frames exactly the way the DSv2 source does. */
  private def drainEvents(sp: ReplicationSpooler, walDir: String, want: Int,
      timeoutMs: Long = 20000): Seq[(ChangeEvent, Long)] = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    def decodeAll(): Seq[(ChangeEvent, Long)] = {
      val reg = new RelationRegistry
      val conv = new Converter(reg)
      WalLog.read(walDir, afterLsn = -1L, untilLsn = Long.MaxValue).flatMap {
        f => conv.convert(PgOutputDecoder.decode(f.payload), f.lsn)
          .map(_ -> f.lsn)
      }.toSeq
    }
    var out = Seq.empty[(ChangeEvent, Long)]
    while (out.size < want && System.nanoTime() < deadline) {
      sp.pump()
      out = decodeAll()
      if (out.size < want) Thread.sleep(100)
    }
    out
  }

  test("live auth: trust, SCRAM with verified server signature, wrong " +
      "password refused with the server's SQLSTATE") {
    live()
    val s = LivePostgres.session()
    try {
      val r = s.simpleQuery(
        "SELECT current_user AS u, current_setting('wal_level') AS wl")
      assert(r.single("u").contains("graft"))
      assert(r.single("wl").contains("logical"))
      // replication-command grammar on the same session (walsender mode)
      val ident = s.simpleQuery("IDENTIFY_SYSTEM")
      assert(ident.single("systemid").exists(_.nonEmpty))
      assert(ident.single("xlogpos").exists(p => lsn(p) > 0L))
    } finally s.close()

    // SCRAM against the real SASL implementation: our client verifies the
    // server signature derived from the genuine SCRAM verifier
    val sc = PgSession.connect(LivePostgres.endpoint(
      LivePostgres.ScramUser, Some(LivePostgres.ScramPassword)))
    try assert(sc.simpleQuery("SELECT current_user AS u").single("u")
      .contains(LivePostgres.ScramUser))
    finally sc.close()

    val bad = intercept[IllegalStateException] {
      PgSession.connect(LivePostgres.endpoint(
        LivePostgres.ScramUser, Some("wrong-password")))
    }
    assert(bad.getMessage.contains("28P01"), s"got: ${bad.getMessage}")
  }

  test("live cold start: snapshot READs see exactly pre-boundary rows; " +
      "CopyBoth streams exactly the post-boundary DML; confirmed_flush_lsn " +
      "advances on standby status") {
    live()
    val admin = LivePostgres.session()
    admin.simpleQuery("CREATE TABLE public.live_orders(" +
      "o_id bigint PRIMARY KEY, status text, total double precision)")
    admin.simpleQuery("ALTER TABLE public.live_orders REPLICA IDENTITY FULL")
    admin.simpleQuery("INSERT INTO public.live_orders VALUES " +
      "(1, 'new', 10.5), (2, 'paid', 20)")

    val streams = Seq(StreamDef("live_orders", "public.live_orders",
      Seq("insert", "update", "delete", "read"), "cdc.live_orders"))
    val s = LivePostgres.session()
    val reads = ArrayBuffer.empty[ChangeEvent]
    var flushed = false
    val boot = WireBootstrap.bootstrap(s, "graft_live_slot", "graft_live_pub",
      streams, confirmedLsn = 0L, emit = reads += _,
      flushDelivery = () => flushed = true)
    val snappedAt = boot.outcome match {
      case SnapshotBootstrap.Snapshotted(pt, res) =>
        assert(res == Seq("public.live_orders")); pt
      case other => fail(s"expected Snapshotted, got $other")
    }
    assert(snappedAt > 0L && boot.startLsn == snappedAt)
    assert(flushed)
    // exactly the two pre-boundary rows, stamped with the consistent point,
    // column values promoted from the REAL RowDescription OIDs
    assert(reads.map(_.data).toSeq == Seq(
      """{"o_id":1,"status":"new","total":10.5}""",
      """{"o_id":2,"status":"paid","total":20.0}"""))
    assert(reads.forall(e => e.op == Op.Read && lsn(e.meta.lsn) == snappedAt))
    // catalog state on the real catalog
    assert(admin.simpleQuery("SELECT 1 FROM pg_publication " +
      "WHERE pubname = 'graft_live_pub'").rows.nonEmpty)
    assert(admin.simpleQuery("SELECT 1 FROM pg_replication_slots " +
      "WHERE slot_name = 'graft_live_slot'").rows.nonEmpty)

    // post-boundary DML — these must arrive via the STREAM only
    admin.simpleQuery(
      "INSERT INTO public.live_orders VALUES (3, 'new', NULL)")
    admin.simpleQuery(
      "UPDATE public.live_orders SET status = 'shipped' WHERE o_id = 1")
    admin.simpleQuery("DELETE FROM public.live_orders WHERE o_id = 2")

    val walDir = Files.createTempDirectory("live_wal").toString
    val ch = s.startReplication("graft_live_slot", "graft_live_pub",
      ChangeEvent.lsnText(boot.startLsn), readTimeoutMs = 300)
    val sp = new ReplicationSpooler(ch, walDir)
    try {
      val evs = drainEvents(sp, walDir, want = 3)
      assert(evs.size == 3, s"expected 3 streamed events, got ${evs.map(_._1)}")
      val (e1, l1) = evs(0); val (e2, l2) = evs(1); val (e3, l3) = evs(2)
      assert(e1.op == Op.Insert &&
        e1.data == """{"o_id":3,"status":"new","total":null}""")
      assert(e2.op == Op.Update &&
        e2.data == """{"o_id":1,"status":"shipped","total":10.5}""")
      // REPLICA IDENTITY FULL: the delete carries the complete old row
      assert(e3.op == Op.Delete &&
        e3.data == """{"o_id":2,"status":"paid","total":20.0}""")
      assert(evs.forall { case (e, l) => l > 0L &&
        e.meta.resource == "public.live_orders" }, "stream frame sanity")
      assert(l1 <= l2 && l2 <= l3, "WAL order preserved")
      // commit timestamps come from the real BEGIN messages — now-ish
      val nowS = System.currentTimeMillis() / 1000
      assert(evs.forall { case (e, _) => math.abs(e.meta.timestamp - nowS) < 3600 })

      // at-least-once handoff: confirm after (simulated) sink delivery,
      // send standby status, and watch the REAL slot advance
      WalLog.confirm(walDir, l3)
      sp.sendStatus()
      var advanced = false
      val deadline = System.nanoTime() + 10L * 1000000000L
      while (!advanced && System.nanoTime() < deadline) {
        val c = admin.simpleQuery("SELECT confirmed_flush_lsn AS c FROM " +
          "pg_replication_slots WHERE slot_name = 'graft_live_slot'")
          .single("c")
        advanced = c.exists(v => v.nonEmpty && lsn(v) >= l3)
        if (!advanced) { sp.sendStatus(); Thread.sleep(200) }
      }
      assert(advanced, "confirmed_flush_lsn never reached the delivered LSN")
    } finally { sp.close(); admin.close() }
  }

  test("live restart: ledger-complete resume streams from the confirmed LSN " +
      "without rescanning") {
    live()
    val streams = Seq(StreamDef("live_orders", "public.live_orders",
      Seq("insert", "update", "delete", "read"), "cdc.live_orders"))
    val s = LivePostgres.session()
    try {
      val boot = WireBootstrap.bootstrap(s, "graft_live_slot", "graft_live_pub",
        streams, confirmedLsn = 0xABCDEL,
        emit = _ => fail("resume must not re-snapshot"),
        flushDelivery = () => ())
      assert(boot.outcome == SnapshotBootstrap.Resumed)
      assert(boot.startLsn == 0xABCDEL)
    } finally s.close()
  }

  test("live in-stream DDL: ALTER TABLE ADD COLUMN re-sends Relation; " +
      "subsequent inserts carry the new column") {
    live()
    val admin = LivePostgres.session()
    admin.simpleQuery(
      "CREATE TABLE public.live_evolve(id bigint PRIMARY KEY, v text)")
    admin.simpleQuery("INSERT INTO public.live_evolve VALUES (1, 'a')")
    val streams = Seq(StreamDef("live_evolve", "public.live_evolve",
      Seq("insert", "update"), "cdc.live_evolve")) // no read: stream-only
    val s = LivePostgres.session()
    val boot = WireBootstrap.bootstrap(s, "graft_evolve_slot",
      "graft_evolve_pub", streams, confirmedLsn = 0L,
      emit = _ => fail("stream-only bootstrap must not snapshot"),
      flushDelivery = () => ())
    assert(boot.outcome.isInstanceOf[SnapshotBootstrap.NoSnapshotNeeded])

    admin.simpleQuery("INSERT INTO public.live_evolve VALUES (2, 'b')")
    admin.simpleQuery("ALTER TABLE public.live_evolve ADD COLUMN note text")
    admin.simpleQuery(
      "INSERT INTO public.live_evolve VALUES (3, 'c', 'fresh')")

    val walDir = Files.createTempDirectory("live_wal_ddl").toString
    val ch = s.startReplication("graft_evolve_slot", "graft_evolve_pub",
      ChangeEvent.lsnText(boot.startLsn), readTimeoutMs = 300)
    val sp = new ReplicationSpooler(ch, walDir)
    try {
      val evs = drainEvents(sp, walDir, want = 2)
      assert(evs.size == 2, s"expected 2 events, got ${evs.map(_._1)}")
      assert(evs(0)._1.data == """{"id":2,"v":"b"}""")
      // the real decoder plugin announced the widened relation in-stream
      assert(evs(1)._1.data == """{"id":3,"v":"c","note":"fresh"}""")
    } finally { sp.close(); admin.close() }
  }
}
