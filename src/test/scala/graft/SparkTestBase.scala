package graft

import org.apache.spark.sql.SparkSession

/** One shared session for all suites — creating one SparkSession per suite
  * dominates test wall-clock otherwise. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"

  // Stale test-fixture sweeper: specs create graft-* temp dirs (WAL
  // fixtures, spool dirs, anomaly sources…) that accumulate across runs —
  // the same leftover class whose 25 GB livepg variant poisoned the r12
  // drain benchmarks. The bench and harness delete their own dirs per
  // trial (HarnessLifecycleSpec gates that); this hook closes the TEST
  // tier: on test-JVM shutdown, delete /tmp/graft-* entries last modified
  // more than an hour ago. The age guard means a concurrently running
  // bench/smoke process's FRESH dirs are never touched — only fossils
  // from previous runs; this run's own dirs get swept by the next run.
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import java.nio.file.{Files, Paths}
    try {
      val tmp = Paths.get(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      val cutoff = System.currentTimeMillis() - 3600L * 1000
      val ls = Files.list(tmp)
      try {
        ls.iterator().forEachRemaining { p =>
          val name = p.getFileName.toString
          if (name.startsWith("graft-") &&
              Files.getLastModifiedTime(p).toMillis < cutoff) {
            val walk = Files.walk(p)
            try {
              import scala.jdk.CollectionConverters._
              walk.sorted(java.util.Comparator.reverseOrder())
                .iterator().asScala.foreach(q =>
                  try Files.deleteIfExists(q)
                  catch { case _: java.io.IOException => () })
            } finally walk.close()
          }
        }
      } finally ls.close()
    } catch { case _: Throwable => () } // sweeping is hygiene, never a failure
  }, "graft-test-tmp-sweeper"))
}
