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

  private val MatchType =
    "array<struct<stream:string,routing_key:string,topic:string>>"

  /** [[route]] with the dimension INLINED into the plan: the stream config
    * is a closed, tiny set (it comes from config, not data), so instead of
    * broadcasting a dimension table every micro-batch — a fresh
    * BroadcastExchange build is ~50–90 ms per batch, the dominant term of
    * the micro-batch latency floor — the (resource, op) → matches mapping
    * folds into a literal CASE over array-of-struct constants and the
    * fan-out is an `explode`. Identical inner-join semantics (an unmatched
    * event's NULL match list explodes to zero rows; N subscribers on one
    * (resource, op) explode to N rows), pure whole-stage codegen, zero
    * exchanges at ANY scale. Equality with the join form is pinned by
    * RoutingSpec; keep `route` for a genuinely dynamic dimension. */
  def routeInline(changes: DataFrame, streams: Seq[StreamDef]): DataFrame = {
    val byPair = streams.flatMap { s =>
        val n = s.normalized
        n.operations.map(op =>
          ((n.resource, op), (n.name, n.routingKey, n.destination)))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy(_._1) // deterministic branch order
    val matches = byPair.foldLeft(lit(null).cast(MatchType)) {
      case (acc, ((res, op), ms)) =>
        when(col("resource") === res && lower(col("op")) === op,
          array(ms.map { case (st, rk, tp) =>
            struct(lit(st).as("stream"), lit(rk).as("routing_key"),
              lit(tp).as("topic"))
          }: _*)).otherwise(acc)
    }
    val kept = changes.columns
    changes.withColumn("__match", explode(matches))
      .select(kept.map(col) ++ Seq(col("__match.stream").as("stream"),
        col("__match.routing_key").as("routing_key"),
        col("__match.topic").as("topic")): _*)
  }

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
