package graft.sink.kafka

import java.io.{DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import scala.collection.mutable

/** Permanent delivery failure — the caller must NOT confirm the LSN; Spark
  * task failure → epoch failure → restart-from-checkpoint redelivers
  * (reference: producer.zig flush() → error.DeliveryFailed). */
final class DeliveryFailedException(msg: String) extends RuntimeException(msg)

/** A minimal produce-path Kafka client over [[KafkaWire]], matching the
  * reference producer's delivery contract
  * (reference: src/sink/kafka/producer.zig:331-399):
  *
  *  - `send` treats a full local queue as BACKPRESSURE, not an error: it
  *    drains via `flush` and retries, so a burst stalls the WAL read
  *    instead of dropping or erroring (producer.zig:327-356).
  *  - `flush` is the delivery barrier: a clean return means every queued
  *    record was acked by the broker with error NONE — "a drained queue is
  *    not a delivered queue" (producer.zig:358-380). Retriable partition
  *    errors (NotLeader / RequestTimedOut / NotEnoughReplicas) are retried
  *    with backoff up to `maxRetries`; anything else — or retry
  *    exhaustion — counts into `deliveryErrorCount` and throws.
  *  - `deliveryErrorCount` is monotonic over the producer's lifetime: a
  *    non-zero value means at-least-once is broken and demands a restart
  *    (producer.zig:382-387).
  *  - `testConnection` is a Metadata round-trip failing on an empty broker
  *    set (producer.zig:404-432).
  *
  * Transport is synchronous request/response (one in-flight produce): the
  * barrier and fail-fast semantics are identical to the reference's async
  * delivery-report form, with ordering per partition free instead of via
  * max.in.flight; wire-level idempotence (InitProducerId/sequence numbers)
  * is not modeled — consumer dedup on meta.lsn carries exactly-once, the
  * same end-to-end contract the reference documents. Keyed records use the
  * stock murmur2 partitioner so placement matches any standard client.
  */
final class WireProducer(host: String, port: Int,
    clientId: String = "graft-producer",
    batchBytes: Int = 256 * 1024,
    maxQueuedRecords: Int = 100000,
    maxRetries: Int = 5,
    retryBackoffMs: Long = 50L,
    requestTimeoutMs: Int = 30000,
    tls: Option[graft.source.postgres.PgTls.SslConfig] = None,
    sasl: Option[KafkaSasl.Config] = None)
    extends AutoCloseable {

  private var socket: Socket = _
  private var out: DataOutputStream = _
  private var in: DataInputStream = _
  private var corr = 0
  private val pending = mutable.LinkedHashMap.empty[(String, Int), // topic,part
    (mutable.ArrayBuffer[KafkaWire.Record], Int)] // records, byteEstimate
  private var queued = 0
  private var deliveryErrors = 0L
  private val partitionCounts = mutable.Map.empty[String, Int]

  private def ensureConnected(): Unit = if (socket == null || socket.isClosed) {
    val plain = new Socket()
    plain.setTcpNoDelay(true)
    plain.setSoTimeout(requestTimeoutMs)
    plain.connect(new InetSocketAddress(host, port), requestTimeoutMs)
    // security.protocol=SSL is TLS from byte 0 — wrap BEFORE any Kafka
    // frame; a handshake/verification failure throws here and the producer
    // never speaks plaintext to an unauthenticated peer (the reference
    // producer's TLS verify/reject contract,
    // src/sink/kafka/producer_test.zig:70-282)
    socket = tls.filter(_.enabled) match {
      case Some(cfg) =>
        try {
          val ssl = graft.source.postgres.PgTls.wrapClient(plain, host, cfg)
          ssl.setSoTimeout(requestTimeoutMs)
          ssl
        } catch { case e: Throwable =>
          try plain.close() catch { case _: Throwable => () }
          throw e
        }
      case None => plain
    }
    out = new DataOutputStream(new java.io.BufferedOutputStream(
      socket.getOutputStream, 1 << 16))
    in = new DataInputStream(new java.io.BufferedInputStream(
      socket.getInputStream, 1 << 16))
    // SASL runs immediately after the transport is up (and AFTER the TLS
    // wrap for SASL_SSL — credentials never cross an unencrypted socket
    // unless the config explicitly chose SASL_PLAINTEXT), before any
    // other API call; a rejected exchange tears the connection down and
    // the producer never proceeds half-authenticated
    sasl.foreach { cfg =>
      try KafkaSasl.authenticate(cfg, (key, ver, body) => {
        corr += 1
        val sent = corr
        KafkaWire.writeFrame(out, key, ver, sent, clientId, body)
        val resp = new KafkaWire.In(KafkaWire.readFrame(in))
        val got = resp.i32()
        require(got == sent, s"correlation mismatch: sent $sent got $got")
        resp
      }) catch { case e: Throwable =>
        try socket.close() catch { case _: Throwable => () }
        socket = null
        throw e
      }
    }
  }

  private def roundTrip(apiKey: Short, version: Short,
      body: KafkaWire.Out): KafkaWire.In = {
    ensureConnected()
    corr += 1
    val sent = corr
    KafkaWire.writeFrame(out, apiKey, version, sent, clientId, body)
    val resp = new KafkaWire.In(KafkaWire.readFrame(in))
    val got = resp.i32()
    require(got == sent, s"correlation mismatch: sent $sent got $got")
    resp
  }

  /** Metadata round-trip; fails on an empty broker set. Also learns
    * partition counts for the named topics (all topics when empty). */
  def testConnection(topics: Seq[String] = Seq.empty): Unit = {
    val body = new KafkaWire.Out
    body.i32(topics.size); topics.foreach(body.str)
    val resp = roundTrip(KafkaWire.ApiMetadata, 0, body)
    val nBrokers = resp.i32()
    (0 until nBrokers).foreach { _ => resp.i32(); resp.str(); resp.i32() }
    if (nBrokers == 0)
      throw new DeliveryFailedException("no Kafka brokers available")
    val nTopics = resp.i32()
    (0 until nTopics).foreach { _ =>
      resp.i16() // topic error
      val name = resp.str()
      val nParts = resp.i32()
      (0 until nParts).foreach { _ =>
        resp.i16(); resp.i32(); resp.i32()
        val nr = resp.i32(); (0 until nr).foreach(_ => resp.i32())
        val ni = resp.i32(); (0 until ni).foreach(_ => resp.i32())
      }
      partitionCounts(name) = nParts
    }
  }

  private def numPartitions(topic: String): Int =
    partitionCounts.getOrElse(topic, { testConnection(Seq(topic))
      partitionCounts.getOrElse(topic, 1) })

  /** Queue one record; full queue → flush (backpressure) and retry. An
    * over-budget batch flushes eagerly — the synchronous analogue of
    * linger/batch.size. */
  def send(topic: String, key: Array[Byte], value: Array[Byte]): Unit = {
    if (queued >= maxQueuedRecords) flush()
    val part = KafkaWire.partitionFor(key, numPartitions(topic))
    val (recs, sz) = pending.getOrElseUpdate((topic, part),
      (mutable.ArrayBuffer.empty[KafkaWire.Record], 0))
    recs += KafkaWire.Record(key, value)
    val add = (if (key == null) 0 else key.length) +
      (if (value == null) 0 else value.length) + 32
    pending((topic, part)) = (recs, sz + add)
    queued += 1
    if (sz + add >= batchBytes) flush()
  }

  /** Deliver every queued batch and block until each is acked. Throws
    * DeliveryFailedException (after counting the loss) on any permanent
    * partition error or retry exhaustion; a clean return means the broker
    * acked every record. */
  def flush(): Unit = {
    val batches = pending.toSeq
    pending.clear()
    batches.foreach { case ((topic, part), (recs, _)) =>
      produceOne(topic, part, recs.toSeq)
      queued -= recs.size
    }
  }

  private def produceOne(topic: String, partition: Int,
      recs: Seq[KafkaWire.Record]): Unit = {
    val batch = KafkaWire.encodeRecordBatch(System.currentTimeMillis(), recs)
    var attempt = 0
    while (true) {
      val body = new KafkaWire.Out
      body.str(null) // transactional_id
      body.i16(-1)   // acks=all
      body.i32(requestTimeoutMs)
      body.i32(1); body.str(topic)
      body.i32(1); body.i32(partition); body.bytes(batch)
      val errCode =
        try {
          val resp = roundTrip(KafkaWire.ApiProduce, 3, body)
          val nTopics = resp.i32()
          var code: Short = KafkaWire.ErrNone
          (0 until nTopics).foreach { _ =>
            resp.str()
            val nParts = resp.i32()
            (0 until nParts).foreach { _ =>
              resp.i32() // partition index
              val ec = resp.i16()
              resp.i64(); resp.i64() // base_offset, log_append_time
              if (ec != KafkaWire.ErrNone) code = ec
            }
          }
          resp.i32() // throttle_time_ms
          code
        } catch { // transport failure: drop the connection, retriable
          case e: java.io.IOException =>
            closeQuietly()
            KafkaWire.ErrRequestTimedOut
        }
      if (errCode == KafkaWire.ErrNone) return
      if (!KafkaWire.isRetriable(errCode) || attempt >= maxRetries) {
        deliveryErrors += recs.size
        throw new DeliveryFailedException(
          s"produce to $topic-$partition failed permanently " +
            s"(error=$errCode after $attempt retries) — " +
            s"${recs.size} record(s) undelivered; restart from checkpoint")
      }
      attempt += 1
      Thread.sleep(retryBackoffMs * attempt)
    }
  }

  /** Monotonic count of records that permanently failed delivery. */
  def deliveryErrorCount: Long = deliveryErrors

  private def closeQuietly(): Unit = {
    if (socket != null) { try socket.close() catch { case _: Exception => } }
    socket = null
  }

  override def close(): Unit = {
    try flush() finally closeQuietly()
  }

  /** Close WITHOUT the flush barrier — for discarding a producer whose
    * task aborted: flushing here could deliver (or spend retry backoff
    * on) records the epoch already disowned. */
  def abortClose(): Unit = {
    pending.clear(); queued = 0
    closeQuietly()
  }
}
