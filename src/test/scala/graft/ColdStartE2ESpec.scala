package graft

import graft.config.StreamDef
import graft.model.ChangeEvent
import graft.operators.Routing
import graft.source.pgoutput.{PgOutputEncoder, PgOutputMessage}
import graft.source.pgoutput.PgOutputMessage._
import graft.source.pgoutput.PgOutputMessages._
import graft.source.postgres.{PgSession, ReplicationSpooler, ReplicationWire, SocketCopyBothChannel, WireBootstrap, WirePump}
import graft.source.wal.WalLog
import graft.streaming.{SnapshotDelivery, StreamingPipeline}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** THE library-switch e2e: a fresh database (scripted walsender), no slot,
  * no publication — one cold start delivers the complete consistent table
  * view to the sink: every pre-slot row exactly once as READ at the boundary
  * LSN (via [[SnapshotDelivery]]), every post-slot change streamed through
  * the full engine (socket → spooler → DSv2 source → routing → sink), with
  * the consumer reading the union of the snapshot and stream directories
  * (reference whole-flow: src/e2e/snapshot_test.zig + cdc_test.zig).
  */
class ColdStartE2ESpec extends AnyFunSuite {
  import FakeWalsender._
  import ReplicationWire._
  import SocketCopyBothChannel.Endpoint

  test("fresh database → bootstrap → snapshot + stream → sink union is the " +
      "complete consistent state") {
    val spark = SparkTestBase.spark
    val walDir = Files.createTempDirectory("graft-cold-wal").toString
    val outDir = Files.createTempDirectory("graft-cold").toString + "/out"
    val ckptDir = Files.createTempDirectory("graft-cold-ckpt").toString

    val srv = new FakeWalsender(Trust)
    srv.strictSlots = true
    srv.nextConsistentPoint = 0x800L
    srv.tables.put("public.signup",
      (Seq(("id", 20), ("name", 25)), Seq(
        Seq("1", "alice"), Seq("2", "bob"), Seq("3", "carol"))))

    // post-slot traffic, above the consistent point
    val rel = Relation(55, "public", "signup", 'd'.toByte, Vector(
      ColumnDef(1, "id", 20, -1), ColumnDef(0, "name", 25, -1)))
    val changes: Seq[(Long, PgOutputMessage)] = Seq(
      0x900L -> rel,
      0x901L -> Begin(0x910L, 820454400000000L, 7),
      0x902L -> Insert(55, TupleData(Vector(TextDatum("4"), TextDatum("dave")))),
      0x910L -> Commit(0, 0x910L, 0x910L, 820454400000000L))
    changes.foreach { case (lsn, m) =>
      srv.send(encodeXLogData(XLogData(lsn, lsn, 0L, PgOutputEncoder.encode(m))))
    }

    val streams = Seq(StreamDef("s_signup", "public.signup",
      Seq("insert", "read"), "cdc.signup"))
    val session = PgSession.connect(
      Endpoint(srv.host, srv.port, "graft_user", "appdb", None))
    val delivery = new SnapshotDelivery(spark, streams, producer = None, outDir)
    val boot = WireBootstrap.bootstrap(session, "graft_slot", "graft_pub",
      streams, confirmedLsn = 0L,
      emit = delivery.emit, flushDelivery = () => delivery.flush())
    assert(boot.startLsn == 0x800L)
    assert(delivery.deliveredCount == 3)

    val ch = session.startReplication("graft_slot", "graft_pub",
      ChangeEvent.lsnText(boot.startLsn), readTimeoutMs = 50)
    val sp = new ReplicationSpooler(ch, walDir)
    val query = StreamingPipeline.start(spark, walDir, streams,
      ckptDir, outDir, kafkaBootstrap = None, triggerMs = 50L)
    val pump = new WirePump(sp, onFatal = _ => query.stop()).start()
    try {
      srv.awaitCopyBoth()
      val deadline = System.nanoTime() + 15000000000L
      while (WalLog.maxLsn(walDir) < 0x910L && System.nanoTime() < deadline)
        Thread.sleep(20)
      query.processAllAvailable()
    } finally {
      pump.close(); query.stop(); sp.close(); srv.close()
    }

    // the consumer view: snapshot dir ∪ stream dir = full consistent state
    val all = spark.read.parquet(delivery.snapshotOutDir)
      .unionByName(spark.read.parquet(outDir))
      .selectExpr("op", "key", "lsn").collect()
    val reads = all.filter(_.getString(0) == "READ")
    val inserts = all.filter(_.getString(0) == "INSERT")
    assert(reads.map(_.getString(1)).sorted.toSeq == Seq("1", "2", "3"),
      "every pre-slot row exactly once as READ")
    assert(reads.forall(_.getString(2) == "0/800"),
      "READs stamped with the boundary LSN")
    assert(inserts.map(_.getString(1)).toSeq == Seq("4"),
      "post-slot change streamed exactly once")
    assert(inserts.forall(r => ChangeEvent.lsnValue(r.getString(2)) > 0x800L))
    assert(all.length == 4)
  }

  test("config grows a read-opted table mid-life: restart delta-snapshots " +
      "exactly the new table, keeps earlier state, resumes the stream") {
    val spark = SparkTestBase.spark
    val walDir = Files.createTempDirectory("graft-grow-wal").toString
    val outDir = Files.createTempDirectory("graft-grow").toString + "/out"
    val ckptDir = Files.createTempDirectory("graft-grow-ckpt").toString

    // ---- life 1: signup only ----
    val srv1 = new FakeWalsender(Trust)
    srv1.strictSlots = true
    srv1.nextConsistentPoint = 0x800L
    srv1.tables.put("public.signup",
      (Seq(("id", 20), ("name", 25)), Seq(Seq("1", "alice"), Seq("2", "bob"))))
    val relSignup = Relation(55, "public", "signup", 'd'.toByte, Vector(
      ColumnDef(1, "id", 20, -1), ColumnDef(0, "name", 25, -1)))
    Seq[(Long, PgOutputMessage)](
      0x900L -> relSignup,
      0x901L -> Begin(0x910L, 820454400000000L, 7),
      0x902L -> Insert(55, TupleData(Vector(TextDatum("3"), TextDatum("carol")))),
      0x910L -> Commit(0, 0x910L, 0x910L, 820454400000000L)
    ).foreach { case (lsn, m) =>
      srv1.send(encodeXLogData(XLogData(lsn, lsn, 0L, PgOutputEncoder.encode(m))))
    }

    val streams1 = Seq(StreamDef("s_signup", "public.signup",
      Seq("insert", "read"), "cdc.signup"))
    val session1 = PgSession.connect(
      Endpoint(srv1.host, srv1.port, "graft_user", "appdb", None))
    val delivery1 = new SnapshotDelivery(spark, streams1, producer = None, outDir)
    val boot1 = WireBootstrap.bootstrap(session1, "graft_slot", "graft_pub",
      streams1, confirmedLsn = 0L,
      emit = delivery1.emit, flushDelivery = () => delivery1.flush())
    assert(delivery1.deliveredCount == 2)
    val ch1 = session1.startReplication("graft_slot", "graft_pub",
      ChangeEvent.lsnText(boot1.startLsn), readTimeoutMs = 50)
    val sp1 = new ReplicationSpooler(ch1, walDir)
    val q1 = StreamingPipeline.start(spark, walDir, streams1,
      ckptDir, outDir, kafkaBootstrap = None, triggerMs = 50L)
    val p1 = new WirePump(sp1, onFatal = _ => q1.stop()).start()
    try {
      srv1.awaitCopyBoth()
      val deadline = System.nanoTime() + 15000000000L
      while (WalLog.maxLsn(walDir) < 0x910L && System.nanoTime() < deadline)
        Thread.sleep(20)
      q1.processAllAvailable()
    } finally { p1.close(); q1.stop(); sp1.close(); srv1.close() }

    // ---- restart: same database (catalog carried over), grown config ----
    val srv2 = new FakeWalsender(Trust)
    srv2.strictSlots = true
    srv2.publications.addAll(srv1.publications)
    srv1.publicationTables.forEach((k, v) => srv2.publicationTables.put(k, v))
    srv1.slots.forEach((k, v) => srv2.slots.put(k, v))
    srv1.tables.forEach((k, v) => srv2.tables.put(k, v))
    srv2.currentWalLsn = 0xA00L
    srv2.tables.put("public.orders",
      (Seq(("id", 20), ("item", 25)), Seq(Seq("1", "anvil"), Seq("2", "rope"))))
    // a real walsender re-announces relations on every new session
    val relOrders = Relation(56, "public", "orders", 'd'.toByte, Vector(
      ColumnDef(1, "id", 20, -1), ColumnDef(0, "item", 25, -1)))
    Seq[(Long, PgOutputMessage)](
      0xB00L -> relSignup,
      0xB01L -> relOrders,
      0xB02L -> Begin(0xB20L, 820454400000000L, 8),
      0xB03L -> Insert(55, TupleData(Vector(TextDatum("4"), TextDatum("dave")))),
      0xB04L -> Insert(56, TupleData(Vector(TextDatum("3"), TextDatum("tnt")))),
      0xB20L -> Commit(0, 0xB20L, 0xB20L, 820454400000000L)
    ).foreach { case (lsn, m) =>
      srv2.send(encodeXLogData(XLogData(lsn, lsn, 0L, PgOutputEncoder.encode(m))))
    }

    val streams2 = streams1 :+ StreamDef("s_order", "public.orders",
      Seq("insert", "read"), "cdc.orders")
    val session2 = PgSession.connect(
      Endpoint(srv2.host, srv2.port, "graft_user", "appdb", None))
    val delivery2 = new SnapshotDelivery(spark, streams2, producer = None, outDir)
    val boot2 = WireBootstrap.bootstrap(session2, "graft_slot", "graft_pub",
      streams2, confirmedLsn = WalLog.confirmed(walDir),
      emit = delivery2.emit, flushDelivery = () => delivery2.flush())
    assert(boot2.outcome == graft.source.postgres.SnapshotBootstrap
      .DeltaSnapshotted(0xA00L, Seq("public.orders")))
    assert(delivery2.deliveredCount == 2, "exactly the NEW table's rows")
    assert(!srv2.queriesSeen.toArray.map(_.toString)
      .exists(q => q.startsWith("DECLARE") && q.endsWith("public.signup")),
      "the already-delivered table must not be rescanned")

    val ch2 = session2.startReplication("graft_slot", "graft_pub",
      ChangeEvent.lsnText(boot2.startLsn), readTimeoutMs = 50)
    val sp2 = new ReplicationSpooler(ch2, walDir)
    val q2 = StreamingPipeline.start(spark, walDir, streams2,
      ckptDir, outDir, kafkaBootstrap = None, triggerMs = 50L)
    val p2 = new WirePump(sp2, onFatal = _ => q2.stop()).start()
    try {
      srv2.awaitCopyBoth()
      val deadline = System.nanoTime() + 15000000000L
      while (WalLog.maxLsn(walDir) < 0xB20L && System.nanoTime() < deadline)
        Thread.sleep(20)
      q2.processAllAvailable()
    } finally { p2.close(); q2.stop(); sp2.close(); srv2.close() }

    // consumer view across both lives: snapshot dir ∪ stream dir
    val all = spark.read.parquet(delivery2.snapshotOutDir)
      .unionByName(spark.read.parquet(outDir))
      .selectExpr("op", "resource", "key", "lsn").collect()
    def rows(op: String, res: String) =
      all.filter(r => r.getString(0) == op && r.getString(1) == res)
    assert(rows("READ", "public.signup").map(r => (r.getString(2), r.getString(3)))
      .sorted.toSeq == Seq(("1", "0/800"), ("2", "0/800")),
      "life-1 snapshot kept, not re-delivered on restart")
    assert(rows("READ", "public.orders").map(r => (r.getString(2), r.getString(3)))
      .sorted.toSeq == Seq(("1", "0/A00"), ("2", "0/A00")),
      "the grown table's initial state at the delta boundary")
    assert(rows("INSERT", "public.signup").map(_.getString(2)).sorted.toSeq ==
      Seq("3", "4"), "changes from both lives exactly once")
    assert(rows("INSERT", "public.orders").map(_.getString(2)).toSeq == Seq("3"))
    assert(all.length == 7)
  }
}
