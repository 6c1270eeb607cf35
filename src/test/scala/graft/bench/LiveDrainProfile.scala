package graft.bench

import graft.config.StreamDef
import graft.model.ChangeEvent
import graft.source.postgres.{CopyBothChannel, PgServerHarness, ReplicationSpooler, WireBootstrap}
import graft.source.wal.WalLog
import java.nio.file.Files

/** Scratch profiler for the live-drain variance question (r7 VERDICT "What's
  * wrong" #2): inside a real 10×-scale wire drain, how much wall-clock is
  * spent BLOCKED in `channel.read()` (i.e., waiting on the walsender's
  * logical decode + network) vs in the client's own decode/append path?
  * If read-wait dominates, the drain rate measures the SERVER, and
  * round-over-round swings are box/pg-side, not client regressions. */
object LiveDrainProfile {
  private final class TimedChannel(inner: CopyBothChannel)
      extends CopyBothChannel {
    var readNanos = 0L
    var reads = 0L
    override def read(): Array[Byte] = {
      val t0 = System.nanoTime()
      val m = inner.read()
      readNanos += System.nanoTime() - t0
      reads += 1
      m
    }
    override def write(msg: Array[Byte]): Unit = inner.write(msg)
    override def close(): Unit = inner.close()
  }

  def main(args: Array[String]): Unit = {
    require(PgServerHarness.binariesPresent, "needs postgres binaries")
    val n = args.headOption.map(_.toInt).getOrElse(999000)
    val h = PgServerHarness.start().getOrElse(sys.error("server boot failed"))
    try {
      val admin = h.session()
      admin.simpleQuery("CREATE TABLE public.bench_records(" +
        "id bigint PRIMARY KEY, account_id bigint, amount double precision, " +
        "status text, payload text, created_at timestamptz)")
      admin.simpleQuery("ALTER TABLE public.bench_records REPLICA IDENTITY FULL")
      val s = h.session()
      val boot = WireBootstrap.bootstrap(s, "graft_prof_slot", "graft_prof_pub",
        Seq(StreamDef("bench_records", "public.bench_records",
          Seq("insert"), "cdc.bench")),
        confirmedLsn = 0L, emit = _ => (), flushDelivery = () => ())
      (0 until n by 111000).foreach { lo =>
        admin.simpleQuery("INSERT INTO public.bench_records " +
          s"SELECT i, i % 1000, (i % 100000) / 100.0, 'active', " +
          s"repeat('x', 100), now() FROM " +
          s"generate_series(${lo + 1}, ${math.min(lo + 111000, n)}) AS g(i)")
      }
      val endLsn = ChangeEvent.lsnValue(admin.simpleQuery(
        "SELECT pg_current_wal_lsn() AS lsn").single("lsn").get)
      s.close()
      import scala.jdk.CollectionConverters._
      def gcMs: Long = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      def cpuJiffies: (Long, Long) = { // (steal, total) from /proc/stat
        val f = Files.readString(java.nio.file.Paths.get("/proc/stat"))
          .linesIterator.next().split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      }
      (1 to 3).foreach { trial =>
        val walDir = Files.createTempDirectory("graft-live-prof").toString
        val ch = new TimedChannel(h.session().startReplication(
          "graft_prof_slot", "graft_prof_pub",
          ChangeEvent.lsnText(boot.startLsn), readTimeoutMs = 1000))
        val sp = new ReplicationSpooler(ch, walDir)
        val gc0 = gcMs; val (st0, tot0) = cpuJiffies
        val t0 = System.nanoTime()
        while (sp.lastReceivedLsn < endLsn) sp.pumpOnce()
        val total = (System.nanoTime() - t0) / 1e9
        val gcD = gcMs - gc0; val (st1, tot1) = cpuJiffies
        sp.flush()
        val nIns = WalLog.read(walDir, 0L, Long.MaxValue)
          .count(f => f.payload.nonEmpty && f.payload(0) == 'I')
        sp.close()
        val readS = ch.readNanos / 1e9
        println(f"trial $trial: $nIns%d inserts in $total%.3f s " +
          f"(${nIns / total}%.0f ev/s); read()-wait $readS%.3f s " +
          f"(${100 * readS / total}%.1f%%), client decode+append " +
          f"${total - readS}%.3f s (${100 * (total - readS) / total}%.1f%%), " +
          f"${ch.reads}%d reads, gc=${gcD}ms, " +
          f"steal=${100.0 * (st1 - st0) / math.max(1, tot1 - tot0)}%.1f%%")
      }
      admin.close()
    } finally h.stop()
  }
}
