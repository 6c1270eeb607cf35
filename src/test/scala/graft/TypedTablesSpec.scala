package graft

import graft.model.TypedTables
import graft.source.pgoutput.PgOutputMessage.ColumnDef
import graft.source.pgoutput.PgOutputMessages.Relation
import graft.source.pgoutput.RelationRegistry
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TypedTablesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val registry = new RelationRegistry
  registry.register(Relation(1, "public", "click", 'f'.toByte, Vector(
    ColumnDef(1, "id", 20, -1), ColumnDef(0, "user_id", 20, -1),
    ColumnDef(0, "value", 701, -1), ColumnDef(0, "props", 25, -1))))

  test("OID promotion to Spark types matches the converter's rules") {
    assert(TypedTables.sparkTypeFor(23) == LongType)
    assert(TypedTables.sparkTypeFor(701) == DoubleType)
    assert(TypedTables.sparkTypeFor(16) == BooleanType)
    assert(TypedTables.sparkTypeFor(1700) == StringType) // numeric stays text
    assert(TypedTables.sparkTypeFor(3802) == StringType) // jsonb stays text
  }

  test("typed projection of one table from the WAL stream") {
    import graft.source.wal.WalFixture
    val walDir = Files.createTempDirectory("graft-typed-wal").toString
    val ev = WalFixture.eventsUs(spark, SparkTestBase.sf)
      .orderBy("event_id").filter(col("event_id") < 200).collect().iterator
      .map(WalFixture.evFromRow)
    WalFixture.writeLog(ev, walDir)

    val rel = registry.get(1).get
    val stream = TypedTables.tableChanges(
      StreamingPipeline.walStream(spark, walDir), rel)
    val q = stream.writeStream.format("memory").queryName("typed_click").start()
    try {
      q.processAllAvailable()
      val got = spark.table("typed_click")
      val sch = got.schema.fields.map(f => f.name -> f.dataType).toMap
      assert(sch("id") == LongType && sch("user_id") == LongType)
      assert(sch("value") == DoubleType && sch("props") == StringType)
      assert(got.count() > 0)
      assert(got.filter(col("value").isNull).count() == 0)
      assert(got.select("props").head().getString(0).startsWith("{"))
      // only click-table rows were parsed
      val total = spark.table("typed_click").count()
      val clicks = WalFixture.eventsUs(spark, SparkTestBase.sf)
        .filter(col("event_id") < 200).filter(col("event_type") === "click").count()
      assert(total == clicks)
    } finally q.stop()
  }
}
