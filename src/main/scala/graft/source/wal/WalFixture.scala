package graft.source.wal

import graft.source.pgoutput.PgOutputMessage._
import graft.source.pgoutput.PgOutputMessages._
import graft.source.pgoutput.PgOutputEncoder
import graft.model.ChangeEvent
import java.nio.file.Paths

/** Deterministic WAL fixture generator: renders the harness change-log as
  * byte-exact pgoutput frames so the full decode → convert → route → sink
  * path can be driven end-to-end (and benchmarked) without a live Postgres.
  *
  * Event k becomes one single-statement transaction:
  * BEGIN / (INSERT|UPDATE|DELETE) / COMMIT at LSNs 10k+1..10k+3, preceded by
  * a RELATION message the first time its table appears — exactly the message
  * choreography a walsender emits. Ops follow the change-log's modulo mix;
  * UPDATE ships old+new and DELETE ships the old row (REPLICA IDENTITY FULL).
  */
object WalFixture {

  final case class Ev(eventId: Long, tsMicros: Long, userId: Long,
      eventType: String, value: Double, props: String)

  private val relIds = Map(
    "click" -> 1, "error" -> 2, "purchase" -> 3, "signup" -> 4, "view" -> 5)

  private def relationMsg(eventType: String): Relation =
    Relation(relIds(eventType), "public", eventType, 'f'.toByte, Vector(
      ColumnDef(1, "id", 20, -1),        // int8
      ColumnDef(0, "user_id", 20, -1),   // int8
      ColumnDef(0, "value", 701, -1),    // float8
      ColumnDef(0, "props", 25, -1)))    // text

  private def tuple(ev: Ev): TupleData = TupleData(Vector(
    TextDatum((ev.eventId % 97).toString),
    TextDatum(ev.userId.toString),
    TextDatum(ev.value.toString),
    TextDatum(ev.props)))

  def opFor(eventId: Long): String =
    if (eventId % 10 < 6) "INSERT" else if (eventId % 10 < 9) "UPDATE" else "DELETE"

  /** Frames for one event (RELATION emitted on first sight of the table). */
  def frames(ev: Ev, seenRelations: scala.collection.mutable.Set[String]): Seq[WalLog.Frame] = {
    // LSNs are strictly positive (offset ranges are half-open (after, until],
    // and the stream's initial offset is 0)
    val base = ev.eventId * 10 + 10
    val relId = relIds(ev.eventType)
    val rel =
      if (seenRelations.add(ev.eventType))
        Seq(WalLog.Frame(base, PgOutputEncoder.encode(relationMsg(ev.eventType))))
      else Seq.empty
    val pgEpochMicros = ev.tsMicros - ChangeEvent.PostgresEpochShiftS * 1000000L
    val t = tuple(ev)
    val data = opFor(ev.eventId) match {
      case "INSERT" => Insert(relId, t)
      case "UPDATE" => Update(relId, Some(t), t)
      case "DELETE" => Delete(relId, t)
    }
    rel ++ Seq(
      WalLog.Frame(base + 1, PgOutputEncoder.encode(
        Begin(base + 3, pgEpochMicros, (ev.eventId + 1).toInt))),
      WalLog.Frame(base + 2, PgOutputEncoder.encode(data)),
      WalLog.Frame(base + 3, PgOutputEncoder.encode(
        Commit(0, base + 3, base + 3, pgEpochMicros))))
  }

  /** Write the whole events fixture as WAL segments (segmentSize events per
    * segment file). Driver-side, once per test/bench setup.
    *
    * Every segment RE-ANNOUNCES its relations before first use (fresh `seen`
    * per segment) — the same guarantee a walsender gives each session. This
    * is what lets the reader prune whole segments below a batch boundary
    * instead of replaying the log from LSN 0 for registry state. */
  def writeLog(events: Iterator[Ev], dir: String, segmentSize: Int = 20000): Long = {
    var n = 0L
    events.grouped(segmentSize).zipWithIndex.foreach { case (chunk, i) =>
      val seen = scala.collection.mutable.Set.empty[String]
      val fs = chunk.flatMap(e => frames(e, seen))
      WalLog.write(Paths.get(dir, f"$i%08d.wal"), fs)
      n += chunk.size
    }
    n
  }

  /** `events.parquet` with `ts` normalized to epoch MICROSECONDS as a Long,
    * whatever physical type the harness wrote this round: TIMESTAMP(NANOS)
    * (readable only as a ns Long under `nanosAsLong`), TIMESTAMP(MICROS)
    * (TimestampNTZ / LocalDateTime under `inferTimestampNTZ`), or an
    * adjusted-to-UTC instant. Every fixture/bench consumer goes through
    * here so a harness schema change lands in exactly one place. */
  def eventsUs(spark: org.apache.spark.sql.SparkSession,
      sfDir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.expr
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    val tsUs = df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }
    df.withColumn("ts", tsUs)
  }

  /** Row → [[Ev]] for a frame from [[eventsUs]] (ts already µs). */
  def evFromRow(r: org.apache.spark.sql.Row): Ev =
    Ev(r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
      r.getDouble(4), r.getString(5))
}
