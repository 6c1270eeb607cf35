package graft

import graft.sink.kafka.{DeliveryFailedException, KafkaWire, WireFrameProducer, WireProducer}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** The wire produce path against the scripted broker — graduating K1's
  * last line from a seam to real socket traffic. Contract under test is
  * the reference producer's (src/sink/kafka/producer.zig:331-399):
  * flush barrier (clean return ⇔ every record acked), queue-full
  * backpressure inside send, retriable-vs-permanent error split with
  * fail-fast on permanent, monotonic delivery-error count, metadata
  * connection test, and stock murmur2 key placement. Every produced byte
  * round-trips the real v2 RecordBatch format — the broker re-verifies
  * CRC32C on ingest, so a framing bug cannot pass silently.
  */
class KafkaWireSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("RecordBatch v2 round-trips with CRC32C, null keys, varint lengths") {
    val recs = Seq(
      KafkaWire.Record(b("k1"), b("v1")),
      KafkaWire.Record(null, b("a" * 300)), // varint length > 1 byte
      KafkaWire.Record(b(""), b("")),
      KafkaWire.Record(b("k" * 200), b("é中" * 50)))
    val enc = KafkaWire.encodeRecordBatch(1700000000000L, recs)
    val dec = KafkaWire.decodeRecordBatch(enc)
    assert(dec.size == recs.size)
    recs.zip(dec).foreach { case (e, g) =>
      assert((e.key == null && g.key == null) ||
        java.util.Arrays.equals(e.key, g.key))
      assert(java.util.Arrays.equals(e.value, g.value))
    }
    // CRC must catch corruption anywhere in the post-crc region
    val corrupt = enc.clone(); corrupt(enc.length - 1) = (corrupt(enc.length - 1) ^ 1).toByte
    intercept[IllegalArgumentException] { KafkaWire.decodeRecordBatch(corrupt) }
  }

  test("murmur2 matches the published reference values") {
    // Values computed by the stock client's partitioner for these keys
    // (org.apache.kafka.common.utils.Utils.murmur2 — public algorithm);
    // pin a few so placement interops with standard consumers.
    assert(KafkaWire.murmur2(b("21")) == -973932308)
    assert(KafkaWire.murmur2(b("foobar")) == -790332482)
    assert(KafkaWire.murmur2(b("a-little-bit-long-string")) == -985981536)
    assert(KafkaWire.murmur2(b("")) == 275646681)
  }

  test("send/flush delivers everything; keys land on murmur2 partitions") {
    val broker = new FakeKafkaBroker(Map("t" -> 4))
    try {
      val p = new WireProducer("localhost", broker.port)
      try {
        p.testConnection(Seq("t"))
        (1 to 50).foreach(i => p.send("t", b(s"key-$i"), b(s"value-$i")))
        p.flush()
        assert(p.deliveryErrorCount == 0)
      } finally p.close()
      val got = broker.receivedSeq
      assert(got.size == 50)
      got.foreach { case (topic, part, key, value) =>
        assert(topic == "t")
        assert(part == KafkaWire.partitionFor(b(key), 4),
          s"key $key on wrong partition")
        assert(value == "value-" + key.stripPrefix("key-"))
      }
    } finally broker.close()
  }

  test("flush fails fast on a permanent error and counts the loss") {
    val broker = new FakeKafkaBroker(Map("t" -> 1))
    try {
      broker.pushProduceErrors(KafkaWire.ErrTopicAuthorizationFailed, 1)
      val p = new WireProducer("localhost", broker.port)
      p.send("t", b("k"), b("v"))
      val ex = intercept[DeliveryFailedException] { p.flush() }
      assert(ex.getMessage.contains("permanently"))
      assert(p.deliveryErrorCount == 1) // monotonic: at-least-once broken
      assert(broker.receivedSeq.isEmpty, "failed records must not be stored")
    } finally broker.close()
  }

  test("retriable errors are retried and deliver without loss") {
    val broker = new FakeKafkaBroker(Map("t" -> 1))
    try {
      broker.pushProduceErrors(KafkaWire.ErrNotLeader, 1)
      broker.pushProduceErrors(KafkaWire.ErrNotEnoughReplicas, 1)
      val p = new WireProducer("localhost", broker.port, retryBackoffMs = 5L)
      (1 to 10).foreach(i => p.send("t", b("k"), b(s"v$i")))
      p.flush() // two retriable failures, then success
      assert(p.deliveryErrorCount == 0)
      assert(broker.receivedSeq.map(_._4) == (1 to 10).map("v" + _))
      assert(broker.produceRequests.get() == 3,
        "expected exactly err, err, ok")
    } finally broker.close()
  }

  test("a full local queue is backpressure: send drains and retries") {
    val broker = new FakeKafkaBroker(Map("t" -> 2))
    try {
      val p = new WireProducer("localhost", broker.port,
        maxQueuedRecords = 8)
      (1 to 100).foreach(i => p.send("t", b(s"k$i"), b(s"v$i")))
      p.flush()
      assert(broker.receivedSeq.size == 100)
      assert(broker.produceRequests.get() > 1,
        "the queue bound must have forced intermediate flushes")
    } finally broker.close()
  }

  test("an oversized batch flushes eagerly (size-triggered batching)") {
    val broker = new FakeKafkaBroker(Map("t" -> 1))
    try {
      val p = new WireProducer("localhost", broker.port, batchBytes = 1024)
      val big = "x" * 400
      (1 to 10).foreach(i => p.send("t", null, b(big + i)))
      assert(broker.produceRequests.get() > 0,
        "batch.size overflow must produce before flush() is called")
      p.flush()
      assert(broker.receivedSeq.size == 10)
    } finally broker.close()
  }

  test("testConnection fails on an empty broker set") {
    val broker = new FakeKafkaBroker(Map("t" -> 1))
    try {
      broker.brokerless = true
      val p = new WireProducer("localhost", broker.port)
      intercept[DeliveryFailedException] { p.testConnection() }
    } finally broker.close()
  }

  test("WireFrameProducer delivers a shaped frame from Spark tasks e2e") {
    val broker = new FakeKafkaBroker(Map("cdc.events" -> 4))
    try {
      import spark.implicits._
      val shaped = (1 to 200).map(i =>
        ("cdc.events", s"user-${i % 17}", s"""{"op":"INSERT","n":$i}"""))
        .toDF("topic", "key", "value")
        .repartition(8)
      new WireFrameProducer("localhost", broker.port).produce(shaped)
      val got = broker.receivedSeq
      assert(got.size == 200)
      assert(got.map(_._4).toSet == (1 to 200)
        .map(i => s"""{"op":"INSERT","n":$i}""").toSet)
      // same key → same partition, and it is the stock murmur2 placement
      got.groupBy(_._3).foreach { case (key, rows) =>
        assert(rows.map(_._2).distinct.size == 1)
        assert(rows.head._2 == KafkaWire.partitionFor(b(key), 4))
      }
    } finally broker.close()
  }

  test("streaming e2e over the wire: epoch fail → restart → redelivery → " +
      "lsn dedup collapses to exactly-once") {
    import graft.operators.Routing
    import graft.source.wal.WalFixture
    import graft.streaming.StreamingPipeline
    import org.apache.spark.sql.functions._
    val broker = new FakeKafkaBroker(Map(
      "cdc.click" -> 2, "cdc.purchase" -> 2, "cdc.signup" -> 2,
      "cdc.view" -> 2))
    try {
      val walDir = java.nio.file.Files
        .createTempDirectory("graft-wire-wal").toString
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft-wire-ckpt").toString
      val seen = scala.collection.mutable.Set.empty[String]
      val events = (1L to 60L).map(i => WalFixture.Ev(i,
        1700000000000000L + i * 1000000L, i % 5,
        Seq("click", "purchase", "signup", "view")(i.toInt % 4), i * 0.5, "{}"))
      graft.source.wal.WalLog.write(
        java.nio.file.Paths.get(walDir, "00000000.wal"),
        events.iterator.flatMap(e => WalFixture.frames(e, seen)))

      def run(): Unit = {
        val q = StreamingPipeline.start(spark, walDir,
          Routing.fixtureStreams, ckpt, outDir = walDir + "-unused",
          kafkaBootstrap = Some(s"wire://localhost:${broker.port}"),
          triggerMs = 25L, maxEventsPerBatch = 1000)
        try q.processAllAvailable()
        finally q.stop()
      }

      // First run: the broker rejects every produce attempt of the first
      // epoch permanently — delivered-nothing-or-partially, epoch fails,
      // the query dies loudly (fail-fast, no silent drop).
      broker.pushProduceErrors(KafkaWire.ErrTopicAuthorizationFailed, 64)
      val ex = intercept[
        org.apache.spark.sql.streaming.StreamingQueryException] { run() }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(_.isInstanceOf[DeliveryFailedException]))

      // Restart from the same checkpoint: the unconfirmed batch redelivers
      // over the same wire path; this time the broker accepts.
      broker.clearProduceErrors()
      while (broker.received.poll() != null) {} // ignore any partials
      run()
      val got = broker.receivedSeq
      assert(got.nonEmpty)
      // every value is a JSON envelope carrying meta.lsn; dedup on it must
      // collapse to one value per (topic, lsn) — byte-identical redelivery
      val lsnRe = """"lsn":"([^"]+)"""".r
      val byLsn = got.groupBy { case (topic, _, _, v) =>
        (topic, lsnRe.findFirstMatchIn(v).map(_.group(1)).getOrElse(fail(
          s"no lsn in $v")))
      }
      byLsn.foreach { case (k, rows) =>
        assert(rows.map(_._4).distinct.size == 1,
          s"$k redelivered with differing payloads")
      }
      // routing coverage: only fixture topics, a healthy slice of the 60
      // events routed (per-op filters drop some), same key → same partition
      assert(byLsn.keys.map(_._1).toSet.subsetOf(Set(
        "cdc.click", "cdc.purchase", "cdc.signup", "cdc.view")))
      assert(byLsn.size >= 30, s"only ${byLsn.size} routed events delivered")
      got.groupBy(r => (r._1, r._3)).values.foreach { rows =>
        assert(rows.map(_._2).distinct.size == 1,
          "one key must map to one partition")
      }
    } finally broker.close()
  }

  test("wire produce failure fails the Spark job — the epoch-failure path") {
    val broker = new FakeKafkaBroker(Map("t" -> 1))
    try {
      // every task's produce hits a permanent error (local[32] may retry
      // tasks; script enough failures for all attempts)
      broker.pushProduceErrors(KafkaWire.ErrTopicAuthorizationFailed, 64)
      import spark.implicits._
      val shaped = (1 to 10).map(i => ("t", s"k$i", s"v$i"))
        .toDF("topic", "key", "value").coalesce(1)
      val ex = intercept[org.apache.spark.SparkException] {
        new WireFrameProducer("localhost", broker.port).produce(shaped)
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(ex).exists(_.isInstanceOf[DeliveryFailedException]),
        "task failure must carry the DeliveryFailedException")
    } finally broker.close()
  }
}
