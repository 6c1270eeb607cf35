package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CDC change-log over the harness fixtures.
  *
  * The reference's input is a Postgres WAL stream; the harness provides static
  * parquet. Per FIXTURES.md §5 we replay the `events` table as an ordered
  * change-log: `event_id` is the WAL position (LSN), `ts` the transaction
  * commit time, `event_type` names the source table, and the op is assigned
  * deterministically so Spark and the DuckDB oracle agree row-for-row.
  *
  * Columns produced (flat envelope; `lsn` in pg_lsn text form `X/X` exactly as
  * the reference renders it, src/source/postgres/converter.zig:99-100):
  * lsn, lsn_num, op, resource, commit_ts, id, user_id, value, props.
  */
object ChangeLog {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** pg_lsn text `X/X` from a 64-bit position, as a codegen'd column. */
  def lsnTextCol(lsnNum: Column): Column =
    format_string("%X/%X", shiftright(lsnNum, 32), lsnNum.bitwiseAND(lit(4294967295L)))

  /** Deterministic op assignment: 60% INSERT / 30% UPDATE / 10% DELETE by
    * lsn modulo — mirrors the reference load stand's operation mix knobs
    * (reference: tests/load/README.md "Operation Mix"). */
  def opCol(lsnNum: Column): Column =
    when(lsnNum % 10 < 6, "INSERT")
      .when(lsnNum % 10 < 9, "UPDATE")
      .otherwise("DELETE")

  /** The changed row's primary key: `event_id % 97` — repeats across events,
    * so one logical row receives many changes (INSERT, then UPDATEs/DELETEs),
    * which is what makes upsert materialization and LSN dedup meaningful. */
  def rowIdCol(lsnNum: Column): Column = lsnNum % 97

  def changelog(spark: SparkSession, sfDir: String): DataFrame = {
    // The harness has written `ts` as parquet TIMESTAMP(NANOS) (readable in
    // Spark 4 only as a nanosecond LongType under the nanosAsLong flag) in
    // some rounds and TIMESTAMP(MICROS) (TimestampNTZ) in others. Commit time
    // is Unix SECONDS in the envelope (converter.zig:95-98); integer `div`
    // keeps full precision (a double round-trip would lose bits at 1.7e18 ns).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = table(spark, sfDir, "events")
    // Floor division in pure integer math (`a div b` truncates toward zero;
    // the DuckDB oracle floors — they diverge for pre-1970 timestamps, so
    // subtract 1 when a negative remainder exists instead of assuming ts≥0).
    def floorDiv(a: String, b: Long): Column =
      expr(s"$a div $b - (case when $a % $b < 0 then 1 else 0 end)")
    val commitTs = ev.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => floorDiv("ts", 1000000000L)
      case _ => floorDiv("unix_micros(cast(ts as timestamp))", 1000000L)
    }
    ev.select(
      lsnTextCol(col("event_id")).as("lsn"),
      col("event_id").as("lsn_num"),
      opCol(col("event_id")).as("op"),
      concat(lit("public."), col("event_type")).as("resource"),
      commitTs.as("commit_ts"),
      rowIdCol(col("event_id")).as("id"),
      col("user_id"),
      col("value"),
      col("props"))
  }

  /** The same definition as a DuckDB CTE for the correctness oracle.
    * `floor(epoch(ts))` because DuckDB's BIGINT cast rounds while Spark's
    * `unix_timestamp` truncates. */
  val sqlCte: String =
    """WITH changelog AS (
      |  SELECT printf('%X/%X', event_id >> 32, event_id & 4294967295) AS lsn,
      |         event_id AS lsn_num,
      |         CASE WHEN event_id % 10 < 6 THEN 'INSERT'
      |              WHEN event_id % 10 < 9 THEN 'UPDATE'
      |              ELSE 'DELETE' END AS op,
      |         'public.' || event_type AS resource,
      |         CAST(floor(epoch(ts)) AS BIGINT) AS commit_ts,
      |         event_id % 97 AS id, user_id, value, props
      |  FROM events
      |)""".stripMargin
}
