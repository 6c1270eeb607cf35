package graft.sink.kafka

import java.util.concurrent.{ConcurrentHashMap, ConcurrentLinkedQueue}

/** Per-executor (per-JVM) pool of [[WireProducer]] connections, keyed by
  * broker endpoint — the persistent-connection discipline every real Kafka
  * producer keeps (reference: the producer lives for the sink's lifetime,
  * producer.zig; librdkafka holds broker sockets across produce calls).
  * Without it, each Spark TASK of each EPOCH dialed a fresh TCP connection
  * + Metadata round-trip: at a 5 ms trigger that is ~200 connections/s of
  * pure churn, and on the headline drain it priced connection setup into
  * every micro-batch.
  *
  * Contract:
  *  - `borrow` hands out an idle pooled producer or creates one.
  *  - `give` returns a producer ONLY after a clean delivery barrier (the
  *    caller's flush succeeded and `deliveryErrorCount` is 0) — a producer
  *    whose task aborted may hold undelivered queued records or a
  *    mid-frame socket, so it is closed instead (`discard`). At-least-once
  *    is unaffected either way (restart redelivers), but a dirty producer
  *    must never leak another epoch's records into a later flush.
  *  - the pool is bounded per endpoint; overflow producers are closed.
  */
object WireProducerPool {
  private val MaxIdlePerEndpoint = 64
  // keyed by the endpoint's poolKey, which includes the TLS identity —
  // producers with different trust configurations must never share a
  // pooled connection (a verify-full caller handed a plaintext or
  // trust-all socket would silently lose its authentication)
  private val pools = new ConcurrentHashMap[WireEndpoint.PoolKey,
    ConcurrentLinkedQueue[WireProducer]]()

  def borrow(ep: WireEndpoint.Ep): WireProducer = {
    val q = pools.computeIfAbsent(ep.poolKey,
      _ => new ConcurrentLinkedQueue[WireProducer]())
    Option(q.poll())
      .getOrElse(new WireProducer(ep.host, ep.port, tls = ep.tls,
        sasl = ep.sasl))
  }

  /** Return a HEALTHY producer (post-barrier, zero delivery errors). */
  def give(ep: WireEndpoint.Ep, p: WireProducer): Unit = {
    val q = pools.computeIfAbsent(ep.poolKey,
      _ => new ConcurrentLinkedQueue[WireProducer]())
    if (q.size < MaxIdlePerEndpoint) q.offer(p)
    else discard(p)
  }
  // NOTE no (host, port) convenience overloads: they hard-coded a
  // plaintext Ep, so routing a TLS producer through one would file its
  // socket under the plaintext pool key — callers always pass the full
  // endpoint so the TLS identity is part of the key (r15 review finding)

  /** Close a producer whose state is unknown (abort / delivery failure) —
    * no flush barrier: its queue may hold records the epoch disowned. */
  def discard(p: WireProducer): Unit =
    try p.abortClose() catch { case _: Exception => () }

  /** Test hook: drop every pooled connection. */
  def clear(): Unit = {
    pools.forEach { (_, q) =>
      var p = q.poll()
      while (p != null) { discard(p); p = q.poll() }
    }
  }
}
