package graft.operators

import graft.config.StreamDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** F1 — stream match: filter + fan-out routing.
  *
  * The reference scans the configured streams per event and routes the event to
  * every stream whose resource matches exactly (schema-qualified) and whose
  * operation set contains the event's op, case-insensitively
  * (reference: src/processor/processor.zig:31-51; identity semantics
  * src/processor/routing_integration_test.zig:45-165). One event may route to
  * N sinks; READ events route only to read-opted streams (:170-211).
  *
  * Spark-native shape: the stream config is a tiny dimension table — one row
  * per (stream, operation) — and routing is a BROADCAST inner join on
  * (resource, lower(op)). At 100 TB this is the right plan: the fact side
  * streams through map tasks with zero shuffle; fan-out multiplicity falls out
  * of the join. The alternative (N filtered branches) re-reads the source N
  * times; the join form scans once — the "serialize once, fan out many"
  * optimization (processor.zig:204-206) then applies upstream of this join.
  */
object Routing {

  /** Default fixture streams used by the test queries; includes a stream per
    * resource with differing op sets and routing keys, and leaves
    * `public.error` unmatched (the matchStreams-miss path,
    * reference: src/benchmarks/match_streams_bench.zig). */
  val fixtureStreams: Seq[StreamDef] = Seq(
    StreamDef("s_click", "public.click", Seq("insert", "update"), "cdc.click"),
    StreamDef("s_purchase", "public.purchase", Seq("insert", "update", "delete"),
      "cdc.purchase", routingKey = "user_id"),
    StreamDef("s_signup", "public.signup", Seq("insert", "read"), "cdc.signup"),
    StreamDef("s_view", "public.view", Seq("insert"), "cdc.view"))

  /** (stream, resource, op, routing_key, topic) — one row per stream×op. */
  def streamsDF(spark: SparkSession, streams: Seq[StreamDef]): DataFrame = {
    import spark.implicits._
    streams.flatMap { s =>
      val n = s.normalized
      n.operations.map(op => (n.name, n.resource, op, n.routingKey, n.destination))
    }.toDF("stream", "s_resource", "s_op", "routing_key", "topic")
  }

  /** Fan-out route: every (event × matching stream) row survives. */
  def route(changes: DataFrame, streams: DataFrame): DataFrame =
    changes.join(
      broadcast(streams),
      changes("resource") === streams("s_resource") &&
        lower(changes("op")) === streams("s_op"))
      .drop("s_resource", "s_op")

  /** The fixture streams as a DuckDB VALUES clause (for oracle SQL). */
  def fixtureStreamsSql: String =
    fixtureStreams.flatMap { s =>
      val n = s.normalized
      n.operations.map(op =>
        s"('${n.name}','${n.resource}','$op','${n.routingKey}','${n.destination}')")
    }.mkString(
      "(SELECT * FROM (VALUES ", ", ",
      ") AS t(stream, s_resource, s_op, routing_key, topic))")
}
