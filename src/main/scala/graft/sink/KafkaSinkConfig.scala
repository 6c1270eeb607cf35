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

  /** TLS/SASL pass-through (M6): the engine forwards security options
    * untouched, as the reference forwards librdkafka properties. */
  def withSecurity(base: Map[String, String],
      security: Map[String, String]): Map[String, String] =
    base ++ security.map { case (k, v) =>
      (if (k.startsWith("kafka.")) k else s"kafka.$k") -> v
    }
}
