package graft.metrics

import java.util.concurrent.{Executors, ScheduledExecutorService, TimeUnit}

/** Stall fail-fast: when the wire has been silent past the liveness window,
  * stop the streaming query instead of hanging behind a green /metrics port
  * (reference: src/processor/processor.zig:393-399 kills the process on a
  * stalled replication connection and lets the supervisor restart it).
  *
  * Spark-native shape: the watchdog stops the QUERY with the stall recorded
  * as the fatal error — /readyz goes false, the driver's awaitTermination
  * returns, and the deployment's restart-from-checkpoint contract (the same
  * one the restart tests prove) brings the stream back from the committed
  * LSN. Stopping the query rather than `System.exit` keeps embedded uses
  * (tests, notebooks, multi-query drivers) safe; `stalled` tells the caller
  * to exit nonzero if it IS the supervisor-managed main.
  *
  * Decoupled from StreamingQuery through (isActive, stop) thunks so the
  * stall matrix is unit-testable with a fake clock and no running stream.
  */
final class StallWatchdog(
    metrics: GraftMetrics,
    isActive: () => Boolean,
    stopQuery: () => Unit,
    checkIntervalMs: Long = 5000L) extends AutoCloseable {

  @volatile private var exec: ScheduledExecutorService = _
  @volatile var stalled: Boolean = false

  /** One liveness check; returns true when a stall was detected (idempotent
    * — the query is stopped once). Exposed for deterministic tests. */
  def check(): Boolean = {
    if (!stalled && !metrics.live && isActive()) {
      stalled = true
      metrics.lastError.compareAndSet(null,
        s"stalled: no wire activity for > ${metrics.LivenessWindowS} s; " +
          "stopping query for supervisor restart")
      stopQuery()
    }
    stalled
  }

  def start(): this.type = {
    exec = Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-stall-watchdog")
      t.setDaemon(true)
      t
    })
    exec.scheduleAtFixedRate(() => check(),
      checkIntervalMs, checkIntervalMs, TimeUnit.MILLISECONDS)
    this
  }

  override def close(): Unit = if (exec != null) exec.shutdownNow()
}

object StallWatchdog {
  def apply(metrics: GraftMetrics,
      query: org.apache.spark.sql.streaming.StreamingQuery,
      checkIntervalMs: Long = 5000L): StallWatchdog =
    new StallWatchdog(metrics, () => query.isActive, () => query.stop(),
      checkIntervalMs)
}
