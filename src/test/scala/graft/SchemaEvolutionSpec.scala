package graft

import graft.source.pgoutput.{PgOutputEncoder, PgOutputMessage}
import graft.source.pgoutput.PgOutputMessage._
import graft.source.pgoutput.PgOutputMessages._
import graft.source.wal.WalLog
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** ALTER TABLE mid-stream: a fresh RELATION message re-registers the schema
  * in place and subsequent rows carry the new column — the registry contract
  * (reference: relation_registry.zig + STREAMING_REPLICATION_DESIGN.md:113-127). */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("rows decoded after an in-stream ALTER carry the evolved schema") {
    val walDir = Files.createTempDirectory("graft-evo-wal").toString
    val relV1 = Relation(9, "public", "click", 'f'.toByte, Vector(
      ColumnDef(1, "id", 20, -1), ColumnDef(0, "user_id", 20, -1)))
    val relV2 = Relation(9, "public", "click", 'f'.toByte, Vector(
      ColumnDef(1, "id", 20, -1), ColumnDef(0, "user_id", 20, -1),
      ColumnDef(0, "note", 25, -1)))
    def tx(lsn: Long, data: PgOutputMessage): Seq[WalLog.Frame] = Seq(
      WalLog.Frame(lsn, PgOutputEncoder.encode(Begin(lsn + 2, 0L, 1))),
      WalLog.Frame(lsn + 1, PgOutputEncoder.encode(data)),
      WalLog.Frame(lsn + 2, PgOutputEncoder.encode(Commit(0, lsn + 2, lsn + 2, 0L))))
    val frames =
      Seq(WalLog.Frame(10L, PgOutputEncoder.encode(relV1))) ++
      tx(20L, Insert(9, TupleData(Vector(TextDatum("1"), TextDatum("7"))))) ++
      Seq(WalLog.Frame(30L, PgOutputEncoder.encode(relV2))) ++ // ALTER
      tx(40L, Insert(9, TupleData(Vector(TextDatum("2"), TextDatum("8"),
        TextDatum("hello"))))) ++
      tx(50L, Insert(9, TupleData(Vector(TextDatum("3"), NullDatum, ToastDatum))))
    WalLog.write(Paths.get(walDir, "00000000.wal"), frames)

    val stream = StreamingPipeline.walStream(spark, walDir)
    val q = stream.writeStream.format("memory").queryName("evo").start()
    try {
      q.processAllAvailable()
      val byLsn = spark.table("evo").orderBy("lsn_num")
        .select("data").collect().map(_.getString(0))
      assert(byLsn(0) == """{"id":1,"user_id":7}""")
      assert(byLsn(1) == """{"id":2,"user_id":8,"note":"hello"}""")
      assert(byLsn(2) ==
        s"""{"id":3,"user_id":null,"note":"${graft.model.ChangeEvent.ToastPlaceholder}"}""")
    } finally q.stop()
  }
}
