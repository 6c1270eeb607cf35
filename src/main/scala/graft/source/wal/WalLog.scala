package graft.source.wal

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, EOFException, FileInputStream, FileOutputStream}
import java.nio.file.{Files, Path, Paths}

/** Replayable WAL segment files: the harness stand-in for a live walsender
  * socket. Each segment is a sequence of frames `[lsn:8][len:4][payload]`,
  * where payload is one raw pgoutput message. Segments are named
  * `NNNNNNNN.wal` and replayed in name order — the same ordered, resumable
  * byte stream a replication slot provides, minus the network.
  */
object WalLog {

  final case class Frame(lsn: Long, payload: Array[Byte])

  def segmentFiles(dir: String): Seq[Path] = {
    val d = Paths.get(dir)
    if (!Files.isDirectory(d)) Seq.empty
    else {
      val it = Files.list(d)
      try it.filter(p => p.getFileName.toString.endsWith(".wal"))
        .sorted().iterator().asScala.toVector // ascending segment order
      finally it.close()
    }
  }

  private implicit class JIter[A](val it: java.util.Iterator[A]) extends AnyVal {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }

  def write(path: Path, frames: IterableOnce[Frame]): Unit = {
    Files.createDirectories(path.getParent)
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path.toFile)))
    try frames.iterator.foreach { f =>
      out.writeLong(f.lsn); out.writeInt(f.payload.length); out.write(f.payload)
    } finally out.close()
  }

  /** Stream frames with lsn in (afterLsn, untilLsn]. */
  def read(dir: String, afterLsn: Long, untilLsn: Long): Iterator[Frame] =
    segmentFiles(dir).iterator.flatMap(readSegment).filter(f =>
      f.lsn > afterLsn && f.lsn <= untilLsn)

  /** First frame's lsn of a segment (12-byte peek), or Long.MaxValue for an
    * empty segment. */
  def segmentStartLsn(path: Path): Long = {
    val it = readSegment(path)
    if (it.hasNext) it.next().lsn else Long.MaxValue
    // note: readSegment closes its stream on EOF; early abandonment leaks a
    // descriptor until GC — acceptable for the 12-byte peek, files are few
  }

  /** Frames of all segments that may contain data past `afterLsn` —
    * segments wholly below the boundary are pruned without reading them
    * (frames ascend across segment files, so segment k is prunable when
    * segment k+1 starts at or below afterLsn+1). Frames below the boundary
    * inside the FIRST surviving segment are still yielded so the caller can
    * replay that segment's RELATION/BEGIN state cheaply. */
  def readForBatch(dir: String, afterLsn: Long, untilLsn: Long): Iterator[Frame] = {
    val files = segmentFiles(dir)
    if (files.isEmpty) return Iterator.empty
    val starts = files.map(segmentStartLsn)
    // keep segment k unless the next segment starts at/below the boundary+1
    val keep = files.indices.filter(k =>
      k == files.length - 1 || starts(k + 1) > afterLsn + 1)
    val firstKept = keep.headOption.getOrElse(files.length - 1)
    files.drop(firstKept).iterator.flatMap(readSegment)
      .filter(_.lsn <= untilLsn)
  }

  def readSegment(path: Path): Iterator[Frame] = new Iterator[Frame] {
    private val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path.toFile)))
    private var nextFrame: Frame = advance()
    private def advance(): Frame =
      try {
        val lsn = in.readLong()
        val len = in.readInt()
        val buf = new Array[Byte](len)
        in.readFully(buf)
        Frame(lsn, buf)
      } catch { case _: EOFException => in.close(); null }
    def hasNext: Boolean = nextFrame != null
    def next(): Frame = { val f = nextFrame; nextFrame = advance(); f }
  }

  def maxLsn(dir: String): Long =
    segmentFiles(dir).foldLeft(0L)((m, p) =>
      readSegment(p).foldLeft(m)((mm, f) => math.max(mm, f.lsn)))

  /** Lightweight frame scan for driver-side admission control: yields
    * (lsn, segment path, byte offset of the NEXT frame, payload tag,
    * payload bytes only for RELATION/BEGIN frames — data payloads are
    * skipped, not allocated). One sequential pass, no Frame objects. */
  final case class ScanEntry(lsn: Long, segment: Path, nextByteOffset: Long,
      tag: Byte, statePayload: Array[Byte])

  def scanFrames(dir: String, fromSegment: Path = null,
      fromOffset: Long = 0L): Iterator[ScanEntry] = {
    val files0 = segmentFiles(dir)
    val files = if (fromSegment == null) files0
      else files0.dropWhile(_.compareTo(fromSegment) < 0)
    files.iterator.zipWithIndex.flatMap { case (p, idx) =>
      val skipTo = if (idx == 0 && fromSegment != null) fromOffset else 0L
      new Iterator[ScanEntry] {
        private val in = new DataInputStream(new BufferedInputStream(
          new FileInputStream(p.toFile)))
        private var pos = 0L
        locally {
          // skipNBytes: exact positioning (plain skip() may return 0
          // transiently, which a naive loop would misread as EOF)
          if (skipTo > 0) { in.skipNBytes(skipTo); pos = skipTo }
        }
        private var nextEntry: ScanEntry = advance()
        private def advance(): ScanEntry =
          try {
            val lsn = in.readLong()
            val len = in.readInt()
            val tag = in.readByte()
            val state =
              if (tag == 'R' || tag == 'B') {
                val rest = new Array[Byte](len - 1)
                in.readFully(rest)
                val full = new Array[Byte](len)
                full(0) = tag
                System.arraycopy(rest, 0, full, 1, len - 1)
                full
              } else {
                in.skipNBytes((len - 1).toLong)
                null
              }
            pos += 12L + len
            ScanEntry(lsn, p, pos, tag, state)
          } catch { case _: EOFException => in.close(); null }
        def hasNext: Boolean = nextEntry != null
        def next(): ScanEntry = { val e = nextEntry; nextEntry = advance(); e }
      }
    }
  }

  /** Frames from an exact (segment, byteOffset) position onward (the seek
    * handed to readers by driver-side admission control), capped at
    * untilLsn. */
  def readFrom(dir: String, segment: Path, byteOffset: Long,
      untilLsn: Long): Iterator[Frame] = {
    val files = segmentFiles(dir).dropWhile(_.compareTo(segment) < 0)
    files.iterator.zipWithIndex.flatMap { case (p, idx) =>
      if (idx == 0) readSegmentFrom(p, byteOffset) else readSegment(p)
    }.filter(_.lsn <= untilLsn)
  }

  private def readSegmentFrom(path: Path, byteOffset: Long): Iterator[Frame] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(path.toFile)))
    if (byteOffset > 0) in.skipNBytes(byteOffset)
    new Iterator[Frame] {
      private var nextFrame: Frame = advance()
      private def advance(): Frame =
        try {
          val lsn = in.readLong()
          val len = in.readInt()
          val buf = new Array[Byte](len)
          in.readFully(buf)
          Frame(lsn, buf)
        } catch { case _: EOFException => in.close(); null }
      def hasNext: Boolean = nextFrame != null
      def next(): Frame = { val f = nextFrame; nextFrame = advance(); f }
    }
  }

  // -- confirmed-LSN file: the standby-status-update analog ------------------

  def confirmedPath(dir: String): Path = Paths.get(dir, "confirmed.lsn")

  /** Durably record the confirmed flush LSN (a live source sends this as a
    * StandbyStatusUpdate on the replication socket instead — reference
    * semantics: confirm only after sink delivery is verified,
    * docs/design/STREAMING_REPLICATION_DESIGN.md:71-89). */
  def confirm(dir: String, lsn: Long): Unit = {
    val tmp = Paths.get(dir, ".confirmed.lsn.tmp")
    Files.writeString(tmp, lsn.toString)
    Files.move(tmp, confirmedPath(dir),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  def confirmed(dir: String): Long = {
    val p = confirmedPath(dir)
    if (Files.exists(p)) Files.readString(p).trim.toLong else 0L
  }
}
