package graft.queries

import graft.cdc.ChangeLog
import graft.model.ChangeEvent
import graft.operators.{PartitionKey, Routing}
import graft.serialization.JsonEnvelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC operator inventory (SURVEY.md §2) as verifiable queries.
  *
  * Each entry is (Spark DataFrame function, DuckDB oracle SQL over the same
  * parquet tables). The Spark side is pure `functions._` — declarative plans
  * Catalyst can push down, prune and codegen; the stream-config dimension is
  * always broadcast so routing fan-out shuffles nothing at any scale.
  */
object CdcQueries {
  type QFn = (SparkSession, String) => DataFrame

  private val cte = ChangeLog.sqlCte
  private val streamsSql = Routing.fixtureStreamsSql

  /** Fixed "now" for lag computation — determinism across engines/replays. */
  private val NowS = 1735689600L // 2025-01-01T00:00:00Z
  /** Fixed snapshot wall-clock (before the first event in the fixtures). */
  private val SnapTs = 1704067200L // 2024-01-01T00:00:00Z

  private def changelog(s: SparkSession, dir: String) = ChangeLog.changelog(s, dir)
  private def routed(s: SparkSession, dir: String) =
    Routing.routeInline(changelog(s, dir), Routing.fixtureStreams)

  /** Serialized envelope payload column for changelog rows (serialize-once,
    * fan-out-many — reference processor.zig:204-206). `props` is a JSONB
    * column: per the OID rules it stays a STRING (verbatim text form,
    * escaped), not inlined JSON — converter.zig:190-191. */
  private def payloadCol = JsonEnvelope.envelopeCol(
    op = col("op"),
    dataJson = JsonEnvelope.objCol(
      JsonEnvelope.numField("id", col("id")),
      JsonEnvelope.numField("user_id", col("user_id")),
      JsonEnvelope.numField("value", col("value")),
      JsonEnvelope.strField("props", col("props"))),
    resource = col("resource"),
    timestamp = col("commit_ts"),
    lsn = col("lsn"))

  private val payloadSql =
    """'{"op":"' || op || '","data":{"id":' || id || ',"user_id":' || user_id ||
      |',"value":' || CAST(value AS VARCHAR) || ',"props":"' ||
      |replace(replace(props, '\', '\\'), '"', '\"') ||
      |'"},"meta":{"source":"postgres","resource":"' || resource ||
      |'","timestamp":' || commit_ts || ',"lsn":"' || lsn || '"}}'""".stripMargin.replace("\n", " ")

  // S1/S3/S5 — scan + decode + typed projection into the envelope.
  val cdcChangelog: (QFn, String) = (
    (s, dir) => changelog(s, dir),
    s"""$cte SELECT * FROM changelog""")

  // S5/§1.3 — OID→value promotion rules: int widening, bool 't'/'f', numeric
  // stays string, non-finite floats fall back to text, TOAST placeholder.
  val cdcTypePromotion: (QFn, String) = (
    (s, dir) => ChangeLog.table(s, dir, "lineitem").select(
      col("l_orderkey"),
      col("l_linenumber").cast("long").as("int_col"),
      col("l_quantity").as("float_col"),
      (when(col("l_returnflag") === "R", "t").otherwise("f") === "t").as("bool_col"),
      col("l_extendedprice").cast("string").as("numeric_str"),
      when(col("l_linenumber") % 7 === 0, "NaN")
        .otherwise(col("l_discount").cast("string")).as("float_or_str"),
      when(col("l_orderkey") % 11 === 0, ChangeEvent.ToastPlaceholder)
        .otherwise(col("l_returnflag")).as("toast_col")),
    s"""SELECT l_orderkey,
       |  CAST(l_linenumber AS BIGINT) AS int_col,
       |  l_quantity AS float_col,
       |  (CASE WHEN l_returnflag = 'R' THEN 't' ELSE 'f' END) = 't' AS bool_col,
       |  CAST(l_extendedprice AS VARCHAR) AS numeric_str,
       |  CASE WHEN l_linenumber % 7 = 0 THEN 'NaN'
       |       ELSE CAST(l_discount AS VARCHAR) END AS float_or_str,
       |  CASE WHEN l_orderkey % 11 = 0 THEN '${ChangeEvent.ToastPlaceholder}'
       |       ELSE l_returnflag END AS toast_col
       |FROM lineitem""".stripMargin)

  // F1 — stream match: broadcast-join fan-out, schema-qualified identity,
  // case-insensitive op sets; public.error matches no stream.
  val cdcRouteFanout: (QFn, String) = (
    (s, dir) => routed(s, dir)
      .select(col("stream"), col("topic"), col("routing_key"),
        col("lsn"), col("op"), col("resource"), col("id"), col("user_id")),
    s"""$cte SELECT stream, topic, routing_key, lsn, op, resource, id, user_id
       |FROM changelog c JOIN $streamsSql s
       |  ON c.resource = s.s_resource AND lower(c.op) = s.s_op""".stripMargin)

  // F1 fan-OUT multiplicity: one event may match N streams and must be
  // delivered to each (reference: processor.zig:31-51 returns ALL matches;
  // routing_integration_test.zig). Overlapping subscriptions on
  // public.purchase: the firehose stream gets every op, the audit stream
  // only deletes — a DELETE fans out to BOTH topics.
  val cdcMultiSubscriber: (QFn, String) = {
    import graft.config.StreamDef
    val streams = Seq(
      StreamDef("s_purchase_all", "public.purchase",
        Seq("insert", "update", "delete"), "cdc.purchase"),
      StreamDef("s_purchase_audit", "public.purchase", Seq("delete"),
        "audit.purchase"),
      StreamDef("s_click_ins", "public.click", Seq("insert"), "cdc.click"))
    val streamsSqlLocal = streams.flatMap { s =>
      val n = s.normalized
      n.operations.map(op =>
        s"('${n.name}','${n.resource}','$op','${n.routingKey}','${n.destination}')")
    }.mkString(
      "(SELECT * FROM (VALUES ", ", ",
      ") AS t(stream, s_resource, s_op, routing_key, topic))")
    ((s: SparkSession, dir: String) =>
      Routing.routeInline(changelog(s, dir), streams)
        .groupBy(col("resource"), col("op"))
        .agg(count(lit(1)).as("deliveries"),
          countDistinct(col("lsn_num")).as("distinct_events")),
      s"""$cte SELECT resource, op, CAST(count(*) AS BIGINT) AS deliveries,
         |  CAST(count(DISTINCT lsn_num) AS BIGINT) AS distinct_events
         |FROM changelog c JOIN $streamsSqlLocal s
         |  ON c.resource = s.s_resource AND lower(c.op) = s.s_op
         |GROUP BY resource, op""".stripMargin)
  }

  // P1 — routing-key extraction: the Kafka message key as CAST(col AS STRING).
  val cdcPartitionKey: (QFn, String) = (
    (s, dir) => routed(s, dir).select(
      col("stream"), col("lsn"),
      PartitionKey.kafkaKeyCol(col("routing_key"),
        Map("id" -> col("id"), "user_id" -> col("user_id"))).as("kafka_key")),
    s"""$cte SELECT stream, lsn,
       |  CASE WHEN routing_key = 'user_id' THEN CAST(user_id AS VARCHAR)
       |       WHEN routing_key = 'id' THEN CAST(id AS VARCHAR) END AS kafka_key
       |FROM changelog c JOIN $streamsSql s
       |  ON c.resource = s.s_resource AND lower(c.op) = s.s_op""".stripMargin)

  // Z1 — JSON envelope serialization (field order op,data,meta; meta order
  // source,resource,timestamp,lsn; codegen'd concat, no UDF).
  val cdcSerializeJson: (QFn, String) = (
    (s, dir) => changelog(s, dir).select(col("lsn"), payloadCol.as("payload")),
    s"""$cte SELECT lsn, $payloadSql AS payload FROM changelog""")

  // M1/M2 end-to-end — the Kafka-shaped frame: (topic, key, value) per routed
  // event; serialize once upstream of the fan-out join.
  val cdcKafkaMessages: (QFn, String) = (
    (s, dir) => {
      val serialized = changelog(s, dir).withColumn("payload", payloadCol)
      Routing.routeInline(serialized, Routing.fixtureStreams)
        .select(
          col("topic"),
          PartitionKey.kafkaKeyCol(col("routing_key"),
            Map("id" -> col("id"), "user_id" -> col("user_id"))).as("key"),
          col("payload").as("value"),
          col("lsn"))
    },
    s"""$cte, serialized AS (SELECT *, $payloadSql AS payload FROM changelog)
       |SELECT topic,
       |  CASE WHEN routing_key = 'user_id' THEN CAST(user_id AS VARCHAR)
       |       WHEN routing_key = 'id' THEN CAST(id AS VARCHAR) END AS key,
       |  payload AS value, lsn
       |FROM serialized c JOIN $streamsSql s
       |  ON c.resource = s.s_resource AND lower(c.op) = s.s_op""".stripMargin)

  // A1 — per-(stream, op) tally (the reference's per-batch metric aggregation).
  val cdcTally: (QFn, String) = (
    (s, dir) => routed(s, dir).groupBy(col("stream"), col("op"))
      .agg(count(lit(1)).as("n_events")),
    s"""$cte SELECT stream, op, CAST(count(*) AS BIGINT) AS n_events
       |FROM changelog c JOIN $streamsSql s
       |  ON c.resource = s.s_resource AND lower(c.op) = s.s_op
       |GROUP BY stream, op""".stripMargin)

  // C1 — LSN checkpoint: highest delivered position per resource, rendered in
  // pg_lsn text form (what the standby status update would confirm).
  val cdcCommitLsn: (QFn, String) = (
    (s, dir) => changelog(s, dir).groupBy(col("resource"))
      .agg(max(col("lsn_num")).as("commit_lsn_num"))
      .select(col("resource"), col("commit_lsn_num"),
        ChangeLog.lsnTextCol(col("commit_lsn_num")).as("commit_lsn")),
    s"""$cte SELECT resource, max(lsn_num) AS commit_lsn_num,
       |  printf('%X/%X', max(lsn_num) >> 32, max(lsn_num) & 4294967295) AS commit_lsn
       |FROM changelog GROUP BY resource""".stripMargin)

  // A2 — replication lag: max(now - last commit_ts, 0) per resource, with a
  // fixed "now" for determinism (reference source.zig:376-383).
  val cdcLag: (QFn, String) = (
    (s, dir) => changelog(s, dir).groupBy(col("resource"))
      .agg(max(col("commit_ts")).as("last_commit_ts"))
      .select(col("resource"),
        greatest(lit(NowS) - col("last_commit_ts"), lit(0L)).as("lag_s")),
    s"""$cte SELECT resource, greatest($NowS - max(commit_ts), 0) AS lag_s
       |FROM changelog GROUP BY resource""".stripMargin)

  // S6 — initial snapshot: current table state emitted as READ events, all
  // stamped with the slot's consistent-point LSN and snapshot wall-clock
  // (reference snapshot.zig:157-187). `customer` stands in for the table;
  // numeric-typed c_acctbal stays a string per the §1.3 numeric rule.
  val cdcSnapshotRead: (QFn, String) = (
    (s, dir) => ChangeLog.table(s, dir, "customer").select(
      lit("READ").as("op"),
      lit("public.customer").as("resource"),
      lit("0/0").as("lsn"),
      lit(SnapTs).as("commit_ts"),
      col("c_custkey").as("id"),
      JsonEnvelope.objCol(
        JsonEnvelope.numField("c_custkey", col("c_custkey")),
        JsonEnvelope.strField("c_name", col("c_name")),
        JsonEnvelope.numField("c_nationkey", col("c_nationkey")),
        JsonEnvelope.strField("c_acctbal", col("c_acctbal").cast("string")),
        JsonEnvelope.strField("c_mktsegment", col("c_mktsegment"))).as("data")),
    s"""SELECT 'READ' AS op, 'public.customer' AS resource, '0/0' AS lsn,
       |  $SnapTs AS commit_ts, c_custkey AS id,
       |  '{"c_custkey":' || c_custkey || ',"c_name":"' || c_name ||
       |  '","c_nationkey":' || c_nationkey || ',"c_acctbal":"' ||
       |  CAST(c_acctbal AS VARCHAR) || '","c_mktsegment":"' || c_mktsegment ||
       |  '"}' AS data
       |FROM customer""".stripMargin)

  // S7/M4 — snapshot-then-stream: rows before the consistent point arrive
  // exactly once as READ (stamped with the boundary LSN), later changes stream
  // through unchanged — the e2e/snapshot_test.zig:12-24 contract.
  val cdcSnapshotThenStream: (QFn, String) = (
    (s, dir) => {
      val cl = changelog(s, dir)
      val b = cl.agg(floor(max(col("lsn_num")) / 2).cast("long").as("b"))
      val withB = cl.crossJoin(broadcast(b))
      val snap = withB.filter(col("lsn_num") < col("b")).select(
        lit("snapshot").as("phase"), lit("READ").as("op"), col("resource"),
        ChangeLog.lsnTextCol(col("b")).as("lsn"), col("lsn_num"),
        lit(SnapTs).as("commit_ts"), col("id"), col("user_id"), col("value"))
      val stream = withB.filter(col("lsn_num") >= col("b")).select(
        lit("stream").as("phase"), col("op"), col("resource"),
        col("lsn"), col("lsn_num"), col("commit_ts"), col("id"),
        col("user_id"), col("value"))
      snap.unionAll(stream)
    },
    s"""$cte, b AS (SELECT max(lsn_num) // 2 AS b FROM changelog)
       |SELECT 'snapshot' AS phase, 'READ' AS op, resource,
       |  printf('%X/%X', b >> 32, b & 4294967295) AS lsn, lsn_num,
       |  $SnapTs AS commit_ts, id, user_id, value
       |FROM changelog, b WHERE lsn_num < b
       |UNION ALL
       |SELECT 'stream' AS phase, op, resource, lsn, lsn_num, commit_ts, id,
       |  user_id, value
       |FROM changelog, b WHERE lsn_num >= b""".stripMargin)

  // Consumer-side upsert materialization: READ is an upsert
  // (processor.zig:300-304); the latest change per (resource, id) wins and a
  // final DELETE removes the row. Window over the change-log — at scale this
  // is one shuffle on the state key, exactly the partitioning a keyed state
  // store would use.
  val cdcUpsertState: (QFn, String) = (
    (s, dir) => {
      val w = Window.partitionBy(col("resource"), col("id"))
        .orderBy(col("lsn_num").desc)
      changelog(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") =!= "DELETE")
        .select(col("resource"), col("id"), col("op").as("last_op"),
          col("lsn"), col("commit_ts"), col("user_id"), col("value"))
    },
    s"""$cte SELECT resource, id, op AS last_op, lsn, commit_ts, user_id, value
       |FROM (SELECT *, row_number() OVER (PARTITION BY resource, id
       |        ORDER BY lsn_num DESC) AS rn FROM changelog)
       |WHERE rn = 1 AND op <> 'DELETE'""".stripMargin)

  // Consumer-side SCD TYPE-2 materialization: every non-DELETE version of a
  // (resource, id) becomes a history row valid from its own commit to the
  // NEXT change's commit (open-ended sentinel when still current; a DELETE
  // closes the last version without emitting a row of its own). The other
  // canonical changelog consumer besides upsert-latest — dimension history
  // for time-travel joins. ONE shuffle on the state key drives the lead()
  // window, the same partitioning the upsert materialization uses; no
  // self-join of the log against itself.
  val cdcScd2: (QFn, String) = (
    (s, dir) => {
      val w = Window.partitionBy(col("resource"), col("id"))
        .orderBy(col("lsn_num"))
      changelog(s, dir)
        .withColumn("valid_to_ts",
          coalesce(lead(col("commit_ts"), 1).over(w), lit(253402300800L)))
        .withColumn("is_current",
          lead(col("lsn_num"), 1).over(w).isNull)
        .filter(col("op") =!= "DELETE")
        .select(col("resource"), col("id"), col("op"), col("lsn_num"),
          col("user_id"), col("value"),
          col("commit_ts").as("valid_from_ts"), col("valid_to_ts"),
          col("is_current"))
    },
    s"""$cte SELECT resource, id, op, lsn_num, user_id, value,
       |  commit_ts AS valid_from_ts,
       |  coalesce(lead(commit_ts, 1) OVER w, 253402300800) AS valid_to_ts,
       |  lead(lsn_num, 1) OVER w IS NULL AS is_current
       |FROM changelog
       |WINDOW w AS (PARTITION BY resource, id ORDER BY lsn_num)
       |QUALIFY op <> 'DELETE'""".stripMargin)

  // Log-compaction materialization (the Kafka compacted-topic contract):
  // one row per (resource, id) — the LATEST version's payload, or an
  // explicit TOMBSTONE when the latest change is a DELETE. The compaction
  // sibling of cdc_upsert_state (which drops deleted keys outright):
  // downstream rebuilds need the tombstone to propagate the deletion.
  // Same single state-key shuffle; tombstone payload columns are zeroed
  // (not null) so the compare stays engine-exact.
  val cdcTombstoneCompaction: (QFn, String) = (
    (s, dir) => {
      val w = Window.partitionBy(col("resource"), col("id"))
        .orderBy(col("lsn_num").desc)
      changelog(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .withColumn("is_tombstone", col("op") === "DELETE")
        .select(col("resource"), col("id"), col("op").as("last_op"),
          col("lsn_num"), col("is_tombstone"),
          when(col("is_tombstone"), lit(-1L)).otherwise(col("user_id"))
            .as("user_id"),
          when(col("is_tombstone"), lit(0.0)).otherwise(col("value"))
            .as("value"))
    },
    s"""$cte SELECT resource, id, op AS last_op, lsn_num,
       |  op = 'DELETE' AS is_tombstone,
       |  CASE WHEN op = 'DELETE' THEN -1 ELSE user_id END AS user_id,
       |  CASE WHEN op = 'DELETE' THEN 0.0 ELSE value END AS value
       |FROM (SELECT *, row_number() OVER (PARTITION BY resource, id
       |        ORDER BY lsn_num DESC) AS rn FROM changelog)
       |WHERE rn = 1""".stripMargin)

  // Incremental VIEW MAINTENANCE — the CDC→OLAP bridge: a per-resource
  // aggregate (row count + Σvalue of the CURRENT state) maintained from
  // the changelog's per-version DELTAS, never from a state rebuild. Each
  // change contributes (new active? +1/+v) − (previous version active?
  // −1/−v_prev); the per-key delta series telescopes, so the sum over all
  // changes IS the aggregate over the final state. The PROOF is the
  // oracle: DuckDB computes the view the other way (materialize rn=1
  // state, aggregate it) — hash-equality across structurally different
  // algorithms is what certifies the maintenance rule. Values in exact e6
  // integers (a double Σ is fold-order-dependent and can never
  // hash-match). Scale shape: one shuffle on the state key for lag(),
  // then a partial-aggregable sum to |resources| rows — the same
  // partitioning a flatMapGroupsWithState twin would keep per key, i.e.
  // this plan IS streamable: deltas emit per micro-batch and the
  // downstream sum is a running aggregate (no rebuild at 100 TB).
  val cdcIncrementalView: (QFn, String) = (
    (s, dir) => {
      val w = Window.partitionBy(col("resource"), col("id"))
        .orderBy(col("lsn_num"))
      changelog(s, dir)
        .select(col("resource"), col("id"), col("lsn_num"),
          (col("op") =!= "DELETE").as("act"),
          floor(col("value") * 1000000).cast("long").as("v_e6"))
        .withColumn("prev_act",
          coalesce(lag(col("act"), 1).over(w), lit(false)))
        .withColumn("prev_v",
          coalesce(lag(col("v_e6"), 1).over(w), lit(0L)))
        .select(col("resource"),
          (when(col("act"), 1L).otherwise(0L) -
            when(col("prev_act"), 1L).otherwise(0L)).as("dn"),
          (when(col("act"), col("v_e6")).otherwise(0L) -
            when(col("prev_act"), col("prev_v")).otherwise(0L)).as("dv"))
        .groupBy(col("resource"))
        .agg(sum(col("dn")).as("n_rows"), sum(col("dv")).as("total_e6"))
        .filter(col("n_rows") > 0) // an all-deleted resource has no oracle row
    },
    s"""$cte, st AS (
       |  SELECT resource, CAST(floor(value * 1000000) AS BIGINT) AS v_e6
       |  FROM (SELECT *, row_number() OVER (PARTITION BY resource, id
       |          ORDER BY lsn_num DESC) AS rn FROM changelog)
       |  WHERE rn = 1 AND op <> 'DELETE')
       |SELECT resource, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(v_e6) AS BIGINT) AS total_e6
       |FROM st GROUP BY resource""".stripMargin)

  // At-least-once consumer dedup: replay the last 10% of the WAL (redelivery
  // after a crash) and collapse duplicates by the (resource, lsn) identity —
  // consumers dedup on meta.lsn (converter.zig:99-100).
  val cdcAtLeastOnceDedup: (QFn, String) = (
    (s, dir) => {
      val cl = changelog(s, dir)
      val b = cl.agg(floor(max(col("lsn_num")) * 0.9).cast("long").as("b"))
      val redelivered = cl.crossJoin(broadcast(b))
        .filter(col("lsn_num") >= col("b")).drop("b")
      cl.unionAll(redelivered)
        .groupBy(col("resource"), col("lsn_num"))
        .agg(count(lit(1)).as("deliveries"),
          // native min (SortAggregate) kept deliberately: at ~110k
          // (resource, lsn) groups of ~2 rows, the object-hash form's
          // per-group buffer allocation measured SLOWER than the sorted
          // aggregate (r19 full-run A/B 0.67 vs 0.88) - the minOrd win
          // applies to low/mid-cardinality argmins, not here
          min(col("op")).as("op"), min(col("id")).as("id"))
    },
    s"""$cte, b AS (SELECT CAST(floor(max(lsn_num) * 0.9) AS BIGINT) AS b
       |             FROM changelog),
       |delivered AS (
       |  SELECT * FROM changelog
       |  UNION ALL
       |  SELECT c.* FROM changelog c, b WHERE c.lsn_num >= b.b)
       |SELECT resource, lsn_num, CAST(count(*) AS BIGINT) AS deliveries,
       |  min(op) AS op, min(id) AS id
       |FROM delivered GROUP BY resource, lsn_num""".stripMargin)

  val all: Map[String, (QFn, String)] = Map(
    "cdc_changelog" -> cdcChangelog,
    "cdc_type_promotion" -> cdcTypePromotion,
    "cdc_route_fanout" -> cdcRouteFanout,
    "cdc_multi_subscriber" -> cdcMultiSubscriber,
    "cdc_partition_key" -> cdcPartitionKey,
    "cdc_serialize_json" -> cdcSerializeJson,
    "cdc_kafka_messages" -> cdcKafkaMessages,
    "cdc_tally" -> cdcTally,
    "cdc_commit_lsn" -> cdcCommitLsn,
    "cdc_lag" -> cdcLag,
    "cdc_snapshot_read" -> cdcSnapshotRead,
    "cdc_snapshot_then_stream" -> cdcSnapshotThenStream,
    "cdc_upsert_state" -> cdcUpsertState,
    "cdc_scd2" -> cdcScd2,
    "cdc_tombstone_compaction" -> cdcTombstoneCompaction,
    "cdc_incremental_view" -> cdcIncrementalView,
    "cdc_at_least_once_dedup" -> cdcAtLeastOnceDedup)
}
