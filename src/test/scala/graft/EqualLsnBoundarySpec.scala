package graft

import graft.operators.Routing
import graft.source.pgoutput.PgOutputEncoder
import graft.source.pgoutput.PgOutputMessage._
import graft.source.pgoutput.PgOutputMessages._
import graft.source.wal.WalLog
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Postgres fans one heap2 multi-insert WAL record out into MANY pgoutput
  * Insert messages at the SAME position — so equal-LSN frame runs are a fact
  * of the live wire. Batch and slice boundaries are LSNs and readers filter
  * on `lsn > boundary`: a cut landing inside an equal-LSN run would silently
  * drop the run's tail. This spec drives the source with the most hostile
  * settings (every new LSN is a budget/slice cut) over a log full of
  * equal-LSN runs and requires exactly-once delivery of every row.
  */
class EqualLsnBoundarySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val relation = Relation(1, "public", "click", 'f'.toByte, Vector(
    ColumnDef(1, "id", 20, -1),
    ColumnDef(0, "user_id", 20, -1),
    ColumnDef(0, "value", 701, -1),
    ColumnDef(0, "props", 25, -1)))

  private def ins(id: Long): Insert = Insert(1, TupleData(Vector(
    TextDatum(id.toString), TextDatum("7"), TextDatum("1.5"),
    TextDatum("{}"))))

  test("equal-LSN runs never straddle a batch or slice boundary") {
    val walDir = Files.createTempDirectory("graft-eqlsn").toString
    val out = Files.createTempDirectory("graft-eqlsn-out").toString
    val ckpt = Files.createTempDirectory("graft-eqlsn-ckpt").toString
    // one transaction: BEGIN, then multi-insert runs sharing LSNs —
    // [100 x3] [200 x2] [300 x1] [400 x4] — then COMMIT
    val begin = WalLog.Frame(90L,
      PgOutputEncoder.encode(Begin(500L, 700000000000000L, 42)))
    val rel = WalLog.Frame(80L, PgOutputEncoder.encode(relation))
    val runs = Seq(100L -> 3, 200L -> 2, 300L -> 1, 400L -> 4)
    var id = 0L
    val data = runs.flatMap { case (lsn, k) =>
      (1 to k).map { _ =>
        id += 1
        WalLog.Frame(lsn, PgOutputEncoder.encode(ins(id)))
      }
    }
    val commit = WalLog.Frame(500L,
      PgOutputEncoder.encode(Commit(0, 500L, 500L, 700000000000000L)))
    WalLog.write(Paths.get(walDir, "00000000.wal"),
      Seq(rel, begin) ++ data ++ Seq(commit))

    // maxEventsPerBatch=1 and sliceEvents=1: every new LSN is both a batch
    // cut and a slice cut — the worst case for a boundary splitting a run
    val q = StreamingPipeline.start(spark, walDir, Routing.fixtureStreams,
      ckpt, out, kafkaBootstrap = None, triggerMs = 0L,
      maxEventsPerBatch = 1, sliceEvents = 1)
    try { q.processAllAvailable() } finally q.stop()

    val got = spark.read.parquet(out)
    assert(got.count() == 10, s"expected all 10 multi-insert rows, got ${got.count()}")
    // every id delivered exactly once (drops and dupes both fail)
    val ids = got.select(get_json_object(col("value"), "$.data.id").cast("long")
      .as("id"))
    assert(ids.distinct().count() == 10, "duplicate or missing ids")
    assert(ids.agg(min("id"), max("id")).head() ==
      org.apache.spark.sql.Row(1L, 10L))
  }

  test("no tail run is provably complete: data runs retreat, and a trailing " +
      "COMMIT must not become the boundary (real pgoutput reuses its LSN " +
      "for the next transaction)") {
    // the appender's buffer can flush PART of an equal-LSN data run; the
    // admission scan must not plan a boundary at that LSN until a higher
    // frame proves the run complete. The same holds for a trailing COMMIT:
    // a real walsender starts the NEXT transaction at exactly the previous
    // commit's walStart (observed live against PostgreSQL 15: C@x, B@x,
    // I@x), so a boundary ON the commit LSN silently loses that next
    // transaction's first change once it arrives.
    val walDir = Files.createTempDirectory("graft-midflush").toString
    val seg = Paths.get(walDir, "00000000.wal")
    val rel = WalLog.Frame(10L, PgOutputEncoder.encode(relation))
    val begin = WalLog.Frame(20L,
      PgOutputEncoder.encode(Begin(200L, 700000000000000L, 7)))
    def insAt(lsn: Long, ids: Range) =
      ids.map(i => WalLog.Frame(lsn, PgOutputEncoder.encode(ins(i.toLong))))

    val stream = new graft.source.wal.PgWalMicroBatchStream(walDir, 1000)
    // flush 1: only 2 of the run's 3 frames are on disk, no higher frame
    WalLog.write(seg, Seq(rel, begin) ++ insAt(100L, 1 to 2))
    val b1 = stream.latestOffset().asInstanceOf[graft.source.wal.LsnOffset].lsn
    assert(b1 < 100L, s"boundary must stay below the unproven run, got $b1")
    // flush 2: the full run plus its COMMIT appears. The run at 100 is now
    // proven (a higher frame follows) and must deliver; the trailing COMMIT
    // at 200 is itself unproven — the boundary stops BELOW it
    WalLog.write(seg, Seq(rel, begin) ++ insAt(100L, 1 to 3) :+
      WalLog.Frame(200L,
        PgOutputEncoder.encode(Commit(0, 200L, 200L, 700000000000000L))))
    val b2 = stream.latestOffset().asInstanceOf[graft.source.wal.LsnOffset].lsn
    assert(b2 == 100L,
      s"boundary must deliver the proven run but stay below the trailing " +
        s"commit, got $b2")
    // the batch (b1, b2] must deliver all 3 rows of the run exactly once
    val readerFactory = stream.createReaderFactory()
    def rowsIn(lo: Long, hi: Long): Seq[Long] = stream.planInputPartitions(
      graft.source.wal.LsnOffset(lo), graft.source.wal.LsnOffset(hi))
      .flatMap { pt =>
        val r = readerFactory.createReader(pt)
        val buf = scala.collection.mutable.Buffer.empty[Long]
        try while (r.next()) buf += r.get().getLong(6) finally r.close()
        buf
      }.toSeq
    val rows = rowsIn(b1, b2)
    assert(rows.count(_ == 100L) == 3,
      s"expected the full 3-frame run at lsn 100, got $rows")

    // flush 3: the live-discovered shape — the next transaction CONTINUES
    // AT THE COMMIT'S LSN (B@200, I@200), its own commit at 300. The run at
    // 200 is now proven; its data row must be delivered, not lost below an
    // already-planned boundary.
    WalLog.write(seg, Seq(rel, begin) ++ insAt(100L, 1 to 3) ++ Seq(
      WalLog.Frame(200L,
        PgOutputEncoder.encode(Commit(0, 200L, 200L, 700000000000000L))),
      WalLog.Frame(200L,
        PgOutputEncoder.encode(Begin(300L, 700000000000001L, 8))),
      WalLog.Frame(200L, PgOutputEncoder.encode(ins(4L))),
      WalLog.Frame(300L,
        PgOutputEncoder.encode(Commit(0, 300L, 300L, 700000000000001L)))))
    val b3 = stream.latestOffset().asInstanceOf[graft.source.wal.LsnOffset].lsn
    assert(b3 == 200L,
      s"boundary must admit the proven continuation run at 200, got $b3")
    val rows3 = rowsIn(b2, b3)
    assert(rows3 == Seq(200L),
      s"the next transaction's first change (riding the previous commit's " +
        s"LSN) must be delivered exactly once, got $rows3")
  }
}
