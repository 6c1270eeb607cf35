package graft.source.postgres

/** Driver-side pump thread owning the live replication wire: drains the
  * channel into the WAL spooler on a cadence and keeps the standby-status
  * feedback flowing. On a fatal wire error it records the error and STOPS
  * the streaming query immediately — restart-from-checkpoint happens in
  * seconds instead of waiting out the liveness watchdog's 90 s window
  * (the reference fails fast on a dead replication connection:
  * src/source/postgres/source.zig:394-401).
  *
  * The pump, not the watchdog, is the authority on wire death: the watchdog
  * exists for SILENT stalls (no error, no traffic); an exception on the
  * socket is a loud failure and must not hide behind query-side liveness
  * (the streaming query happily idles over a dead wire otherwise).
  */
final class WirePump(
    spooler: ReplicationSpooler,
    onFatal: Throwable => Unit,
    onTraffic: () => Unit = () => (),
    pollMs: Long = 10L) extends AutoCloseable {

  @volatile private var running = true
  @volatile var fatal: Throwable = _

  private val thread = new Thread(() => {
    try while (running) {
      // onTraffic fires only when the server actually sent something — a
      // half-open socket (no error, no bytes) must NOT look alive, so the
      // wire heartbeat goes stale and the stall watchdog can trip even
      // while the idle query keeps its own heartbeat fresh
      if (spooler.pump() > 0) onTraffic()
      Thread.sleep(pollMs)
    }
    catch {
      case _: InterruptedException => // close() — not a wire failure
      case e: Throwable => if (running) { fatal = e; onFatal(e) }
    }
  }, "graft-replication-pump")
  thread.setDaemon(true)

  def start(): this.type = { thread.start(); this }

  def alive: Boolean = thread.isAlive

  override def close(): Unit = {
    running = false
    thread.interrupt()
    thread.join(2000)
  }
}
