package graft.sink

/** K1/K2 — Kafka producer configuration with the reference's delivery
  * semantics (reference: src/sink/kafka/producer.zig:111-176, options at
  * :150-161; constants src/constants.zig:27-29):
  *
  *  - idempotent producer, acks=all, bounded in-flight — no reordering, no
  *    duplication at the broker on retry
  *  - linger 50 ms / 256 KB batches — throughput batching
  *  - delivery verification: Spark's Kafka sink task fails the task on
  *    permanent produce errors → task retry → query restart from checkpoint,
  *    which is the reference's fail-fast + slot-resend contract (K2)
  */
object KafkaSinkConfig {

  val LingerMs = "50"
  val BatchSize = (256 * 1024).toString

  /** Options for `writeStream.format("kafka")` (prefix `kafka.` reaches the
    * producer client verbatim). */
  def producerOptions(bootstrap: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "kafka.enable.idempotence" -> "true",
    "kafka.acks" -> "all",
    "kafka.retries" -> Int.MaxValue.toString,
    "kafka.max.in.flight.requests.per.connection" -> "5",
    "kafka.linger.ms" -> LingerMs,
    "kafka.batch.size" -> BatchSize,
    "kafka.compression.type" -> "lz4")

  /** Closed security enums (reference: src/config/config.zig:23-28 —
    * KAFKA_SECURITY_PROTOCOLS / KAFKA_SASL_MECHANISMS). */
  val SecurityProtocols: Set[String] =
    Set("PLAINTEXT", "SSL", "SASL_PLAINTEXT", "SASL_SSL")
  val SaslMechanisms: Set[String] =
    Set("PLAIN", "SCRAM-SHA-256", "SCRAM-SHA-512")

  /** TLS/SASL pass-through with VALIDATION (M6): option names forward to the
    * client verbatim (as the reference forwards librdkafka properties), but
    * a bad security config must fail the query at build time, never
    * silently downgrade to plaintext (the reference rejects invalid TLS
    * settings up front, src/sink/kafka/producer_test.zig:70-282). */
  def withSecurity(base: Map[String, String],
      security: Map[String, String]): Map[String, String] = {
    security.foreach { case (k, v) =>
      require(v != null && v.nonEmpty,
        s"kafka security option '$k' is empty — a blank value silently " +
          "disables the setting downstream; remove it or set a real value")
    }
    val merged = base ++ security.map { case (k, v) =>
      (if (k.startsWith("kafka.")) k else s"kafka.$k") -> v
    }
    merged.get("kafka.security.protocol").foreach { p =>
      require(SecurityProtocols(p),
        s"unknown kafka security.protocol '$p' (allowed: ${SecurityProtocols.mkString(", ")})")
    }
    merged.get("kafka.sasl.mechanism").foreach { m =>
      require(SaslMechanisms(m),
        s"unknown kafka sasl.mechanism '$m' (allowed: ${SaslMechanisms.mkString(", ")})")
    }
    merged
  }
}

/** The seam between a shaped micro-batch and its delivery — what the
  * fail-injection tests exercise without a broker. `produce` MUST throw on
  * delivery failure: Spark then fails the epoch and the restart-from-
  * checkpoint contract redelivers the batch (the reference's fail-fast +
  * slot-resend behavior, src/sink/kafka/producer.zig:430-502); consumers
  * dedup on meta.lsn. */
trait FrameProducer {
  /** `shaped` carries (topic, key, value, …) rows, key-partitioned and
    * LSN-ordered within partitions. */
  def produce(shaped: org.apache.spark.sql.DataFrame): Unit
}

/** Real-broker producer: Spark's Kafka batch sink with the reference's
  * delivery options (idempotence, acks=all) + validated security overlay. */
final class KafkaFrameProducer(bootstrap: String,
    security: Map[String, String] = Map.empty) extends FrameProducer {
  // validate at construction — a bad TLS config must fail BEFORE the
  // streaming query starts, not on the first produce
  val options: Map[String, String] = KafkaSinkConfig.withSecurity(
    KafkaSinkConfig.producerOptions(bootstrap), security)
  override def produce(shaped: org.apache.spark.sql.DataFrame): Unit =
    shaped
      .selectExpr("topic", "CAST(key AS BINARY) AS key",
        "CAST(value AS BINARY) AS value")
      .write.format("kafka").options(options).save()
}
