package graft

import graft.source.wal.WalLog
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths, StandardOpenOption}

/** WAL segment-log invariants under concurrent writers: torn tails stop the
  * scan (never skip a segment's remaining bytes), and whole-segment writes
  * appear atomically.
  */
class WalLogSpec extends AnyFunSuite {

  private def frame(lsn: Long, n: Int) = WalLog.Frame(lsn, Array.fill(n)('I'.toByte))

  test("a torn frame stops the scan instead of skipping to the next segment") {
    val dir = Files.createTempDirectory("graft-wallog").toString
    val seg0 = Paths.get(dir, "00000000.wal")
    val seg1 = Paths.get(dir, "00000001.wal")
    WalLog.write(seg0, Seq(frame(10, 4), frame(20, 4)))
    WalLog.write(seg1, Seq(frame(40, 4)))
    // a live appender's flush boundary: seg0 grows a PARTIAL frame header
    Files.write(seg0, Array[Byte](0, 0, 0, 0, 0), StandardOpenOption.APPEND)

    // the scan must yield seg0's two complete frames and STOP — consuming
    // seg1's frame here would mean the torn tail is lost once completed
    val scan = WalLog.scanFrames(dir)
    val seen = try scan.map(e => e.lsn).toVector finally scan.close()
    assert(seen == Vector(10L, 20L),
      s"scan must stop at the torn tail, saw $seen")

    // FrameIterator (the executor read path) has the same contract
    val it = WalLog.read(dir, 0L, Long.MaxValue)
    val read = it.map(_.lsn).toVector
    assert(read == Vector(10L, 20L), s"reader must stop too, saw $read")
  }

  test("completed tail resumes from the saved cursor") {
    val dir = Files.createTempDirectory("graft-wallog2").toString
    val seg0 = Paths.get(dir, "00000000.wal")
    WalLog.write(seg0, Seq(frame(10, 4)))
    val scan1 = WalLog.scanFrames(dir)
    val first = try scan1.toVector finally scan1.close()
    assert(first.map(_.lsn) == Vector(10L))
    // writer completes the segment (atomic replace with the fuller version)
    WalLog.write(seg0, Seq(frame(10, 4), frame(20, 4), frame(30, 4)))
    // resume from the saved (segment, offset) cursor — only the tail appears
    val scan2 = WalLog.scanFrames(dir, first.last.segment, first.last.nextByteOffset)
    val rest = try scan2.map(_.lsn).toVector finally scan2.close()
    assert(rest == Vector(20L, 30L), s"expected the completed tail, saw $rest")
  }

  test("repair truncates a crashed appender's torn tail, restoring liveness") {
    val dir = Files.createTempDirectory("graft-wallog-repair").toString
    val seg0 = Paths.get(dir, "00000000.wal")
    WalLog.write(seg0, Seq(frame(10, 4), frame(20, 4)))
    // crash artifact: a torn frame (header + partial payload) at the tail
    Files.write(seg0, Array[Byte](0, 0, 0, 0, 0, 0, 0, 30, 0, 0, 0, 9, 'x'),
      StandardOpenOption.APPEND)
    val sizeBefore = Files.size(seg0)
    val dropped = WalLog.repair(dir)
    assert(dropped == 13L, s"expected 13 torn bytes dropped, got $dropped")
    assert(Files.size(seg0) == sizeBefore - 13L)
    // a restarted appender rolls to a NEW segment; the old tear must no
    // longer stop the scan from reaching it
    WalLog.write(Paths.get(dir, "00000001.wal"), Seq(frame(40, 4)))
    val scan = WalLog.scanFrames(dir)
    val seen = try scan.map(_.lsn).toVector finally scan.close()
    assert(seen == Vector(10L, 20L, 40L), s"post-repair scan saw $seen")
    // idempotent on a clean log
    assert(WalLog.repair(dir) == 0L)
  }

  test("repair sweeps stale *.tmp orphans from a hard crash") {
    val dir = Files.createTempDirectory("graft-wallog-tmp").toString
    WalLog.write(Paths.get(dir, "00000000.wal"), Seq(frame(10, 4)))
    // kill -9 between temp-open and atomic rename leaves the orphan behind
    // (write()'s exception path can't run); readers never see it, but it
    // accumulates forever without the startup sweep
    Files.write(Paths.get(dir, "00000001.wal.tmp"), Array[Byte](1, 2, 3))
    WalLog.repair(dir)
    assert(!Files.exists(Paths.get(dir, "00000001.wal.tmp")))
    // the completed segment is untouched
    val it = WalLog.read(dir, 0L, Long.MaxValue)
    assert(it.map(_.lsn).toVector == Vector(10L))
  }

  test("publishStaged makes out-of-order task writes visible in ascending order") {
    val dir = Files.createTempDirectory("graft-wallog-staged").toString
    // tasks complete in arbitrary order: segment 2 staged before 1
    WalLog.write(Paths.get(dir, "00000002.stg"), Seq(frame(50, 4)))
    WalLog.write(Paths.get(dir, "00000000.wal"), Seq(frame(10, 4)))
    WalLog.write(Paths.get(dir, "00000001.stg"), Seq(frame(30, 4)))
    // staged segments are invisible to readers until published
    assert(WalLog.segmentFiles(dir).map(_.getFileName.toString) ==
      Seq("00000000.wal"))
    assert(WalLog.publishStaged(dir) == 2)
    val names = WalLog.segmentFiles(dir).map(_.getFileName.toString)
    assert(names == Seq("00000000.wal", "00000001.wal", "00000002.wal"))
    val scan = WalLog.scanFrames(dir)
    val seen = try scan.map(_.lsn).toVector finally scan.close()
    assert(seen == Vector(10L, 30L, 50L))
    // idempotent when nothing is staged
    assert(WalLog.publishStaged(dir) == 0)
  }

  test("a segment appearing below the scan cursor fails the trigger loudly") {
    // r17 wal_drain_10x root cause: concurrent render tasks made segment
    // k+1 visible before segment k while the admission scan polled; the
    // late segment landed below the cursor and its frames were silently
    // confirmed past. The source must turn that into an ERROR.
    val dir = Files.createTempDirectory("graft-wallog-order").toString
    WalLog.write(Paths.get(dir, "00000000.wal"), Seq(frame(10, 4), frame(20, 4)))
    WalLog.write(Paths.get(dir, "00000002.wal"), Seq(frame(40, 4), frame(50, 4)))
    val stream = new graft.source.wal.PgWalMicroBatchStream(dir, Int.MaxValue)
    // scan passes the gap (nothing marks segment 1 as pending) — the tail
    // run at lsn 50 retreats, leaving the cursor inside segment 2
    val off1 = stream.latestOffset()
    assert(off1.asInstanceOf[graft.source.wal.LsnOffset].lsn == 40L)
    // the missing segment becomes visible BELOW the cursor: loud failure,
    // never a short delivery
    WalLog.write(Paths.get(dir, "00000001.wal"), Seq(frame(30, 4)))
    val e = intercept[IllegalStateException](stream.latestOffset())
    assert(e.getMessage.contains("00000001.wal"))
    // a segment appearing ABOVE the cursor stays the normal append path
    val dir2 = Files.createTempDirectory("graft-wallog-order2").toString
    WalLog.write(Paths.get(dir2, "00000000.wal"), Seq(frame(10, 4), frame(20, 4)))
    val s2 = new graft.source.wal.PgWalMicroBatchStream(dir2, Int.MaxValue)
    assert(s2.latestOffset().asInstanceOf[graft.source.wal.LsnOffset].lsn == 10L)
    WalLog.write(Paths.get(dir2, "00000001.wal"), Seq(frame(30, 4), frame(40, 4)))
    assert(s2.latestOffset().asInstanceOf[graft.source.wal.LsnOffset].lsn == 30L)
  }

  test("visibility guard memory is bounded and still fires across eviction") {
    // r19 (r18 VERDICT #5): seenSegs holds only the CURRENT listing's
    // names, so a long-lived stream's guard memory is O(on-disk
    // segments), not O(segments ever). The guard must keep firing after
    // evictions: (a) a still-listed below-cursor segment stays benign
    // across many triggers; (b) a segment DELETED from disk (evicted)
    // that re-appears below the cursor trips the guard — a recreated
    // file breaks the same ascending-visibility contract as a late one.
    val dir = Files.createTempDirectory("graft-wallog-evict").toString
    val seg0 = Paths.get(dir, "00000000.wal")
    WalLog.write(seg0, Seq(frame(10, 4), frame(20, 4)))
    WalLog.write(Paths.get(dir, "00000001.wal"), Seq(frame(30, 4), frame(40, 4)))
    val stream = new graft.source.wal.PgWalMicroBatchStream(dir, Int.MaxValue)
    // cursor advances into segment 1; segment 0 is below it but was
    // listed — benign on every subsequent trigger
    assert(stream.latestOffset().asInstanceOf[graft.source.wal.LsnOffset]
      .lsn == 30L)
    stream.latestOffset(); stream.latestOffset() // repeated listings: no throw
    // delete segment 0 (drained + cleaned up) — its name evicts
    Files.delete(seg0)
    stream.latestOffset() // listing without seg0: guard memory drops it
    // the deleted segment re-appears below the cursor: loud failure
    WalLog.write(seg0, Seq(frame(10, 4)))
    val e = intercept[IllegalStateException](stream.latestOffset())
    assert(e.getMessage.contains("00000000.wal"))
  }

  test("maxLsn reads the last segment only but still reflects the head") {
    val dir = Files.createTempDirectory("graft-wallog3").toString
    WalLog.write(Paths.get(dir, "00000000.wal"), Seq(frame(10, 4), frame(20, 4)))
    WalLog.write(Paths.get(dir, "00000001.wal"), Seq(frame(30, 4), frame(40, 4)))
    assert(WalLog.maxLsn(dir) == 40L)
    assert(WalLog.maxLsn(Files.createTempDirectory("graft-empty").toString) == 0L)
  }
}
