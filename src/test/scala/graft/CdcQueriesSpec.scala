package graft

import graft.cdc.ChangeLog
import graft.queries.CdcQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CdcQueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = SparkTestBase.sf

  test("every declared query runs and returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle — no exemptions") {
    // r12 closed the last two gaps: the sketch queries now emit the exact
    // value plus an in-band |approx − exact| ≤ 10% verdict (each engine
    // runs its own sketch against its own exact twin), so even they are
    // hash-comparable. An empty oracle string anywhere is a regression.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
    val empty = SparkEntry.oracleSql.collect {
      case (k, v) if v.trim.isEmpty => k
    }
    assert(empty.isEmpty, s"queries with empty oracle SQL: $empty")
  }

  test("entry returns kafka-shaped rows") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet == Set("topic", "key", "value", "lsn"))
    assert(df.count() > 0)
  }

  test("routing: fan-out multiplicity and miss path (processor.zig:31-51)") {
    val routed = CdcQueries.cdcRouteFanout._1(spark, sf)
    // public.error is configured on no stream — must never route
    assert(routed.filter(col("resource") === "public.error").count() == 0)
    // s_view subscribes only to insert
    assert(routed.filter(col("stream") === "s_view" && col("op") =!= "INSERT")
      .count() == 0)
    // every routed row kept its schema-qualified resource
    assert(routed.filter(!col("resource").startsWith("public.")).count() == 0)
  }

  test("serialized payload is valid JSON with the envelope field order") {
    val row = CdcQueries.cdcSerializeJson._1(spark, sf)
      .select("payload").head().getString(0)
    assert(row.startsWith("{\"op\":\""))
    assert(row.contains("\"meta\":{\"source\":\"postgres\",\"resource\":\""))
    // must re-parse with the expected envelope keys
    val parsed = spark.range(1).select(
      from_json(lit(row), lit("op STRING, data MAP<STRING,STRING>, meta STRUCT<source STRING, resource STRING, `timestamp` BIGINT, lsn STRING>")).as("j"))
      .select("j.op", "j.meta.lsn").head()
    assert(parsed.getString(0) == "INSERT" || graft.model.Op.all(parsed.getString(0)))
    assert(parsed.getString(1).contains("/"))
  }

  test("upsert state: one row per live (resource,id), DELETE removes") {
    val st = CdcQueries.cdcUpsertState._1(spark, sf)
    assert(st.groupBy("resource", "id").count().filter(col("count") > 1).count() == 0)
    assert(st.filter(col("last_op") === "DELETE").count() == 0)
  }

  test("incremental view: delta maintenance equals state recomputation") {
    // the DuckDB oracle proves this cross-engine; this pin proves it
    // WITHIN Spark so a fixture change that breaks the telescoping rule
    // fails fast with a readable diff. Recompute the view from the
    // materialized upsert state and diff against the delta-maintained one.
    val maintained = CdcQueries.cdcIncrementalView._1(spark, sf)
    val recomputed = CdcQueries.cdcUpsertState._1(spark, sf)
      .groupBy(col("resource"))
      .agg(count(lit(1)).as("n_rows"),
        sum(floor(col("value") * 1000000).cast("long")).as("total_e6"))
    assert(maintained.exceptAll(recomputed).isEmpty &&
      recomputed.exceptAll(maintained).isEmpty,
      "delta-maintained view diverges from state recomputation")
    // the view is genuinely incremental state: resources present, counts
    // positive, and the DELETE mix means n_rows < distinct keys touched
    val touched = ChangeLog.changelog(spark, sf)
      .groupBy("resource").agg(countDistinct("id").as("k"))
    val joined = maintained.join(touched, "resource")
    assert(joined.filter(col("n_rows") > col("k")).count() == 0)
  }

  test("at-least-once dedup: redelivered tail collapses to one per lsn") {
    val d = CdcQueries.cdcAtLeastOnceDedup._1(spark, sf)
    val total = ChangeLog.changelog(spark, sf).count()
    assert(d.count() == total) // one surviving row per original LSN
    assert(d.filter(col("deliveries") > 2).count() == 0)
    assert(d.filter(col("deliveries") === 2).count() > 0) // the replayed tail
  }
}
