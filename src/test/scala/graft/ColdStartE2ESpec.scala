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
}
