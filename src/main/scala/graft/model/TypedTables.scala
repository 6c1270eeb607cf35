package graft.model

import graft.source.pgoutput.RelationRegistry
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed per-table projection at the edges (SURVEY §1.4 option (a)).
  *
  * The change stream is table-agnostic — a fixed envelope with the row as a
  * JSON payload (the reference's own serialization choice). Where a consumer
  * wants one table with real columns, the relation registry's column OIDs
  * derive a `StructType` and `from_json` lifts the payload — the same OID →
  * engine-type promotion the converter applies
  * (reference: src/source/postgres/converter.zig:146-192):
  * int2/4/8 → LongType, float4/8 → DoubleType (non-finite values arrived as
  * strings and become null here — callers keep the raw payload when they
  * need the textual fallback), bool → BooleanType, numeric and everything
  * else → StringType.
  */
object TypedTables {

  def sparkTypeFor(oid: Int): DataType = oid match {
    case 20 | 21 | 23 => LongType
    case 700 | 701 => DoubleType
    case 16 => BooleanType
    case _ => StringType // numeric (1700) included: lossless passthrough
  }

  def schemaFor(rel: RelationRegistry#RelationInfo): StructType =
    StructType(rel.columns.map(c =>
      StructField(c.name, sparkTypeFor(c.typeOid), nullable = true)))

  /** One table's changes as typed columns + envelope metadata. Filter on the
    * schema-qualified resource BEFORE parsing: Catalyst pushes the filter to
    * the scan and only matching rows pay the JSON parse. */
  def tableChanges(events: DataFrame, rel: RelationRegistry#RelationInfo): DataFrame = {
    val schema = schemaFor(rel)
    events
      .filter(col("resource") === rel.resource)
      .withColumn("row", from_json(col("data"), schema))
      .select(col("op") +: col("lsn") +: col("lsn_num") +: col("commit_ts") +:
        schema.fieldNames.toSeq.map(f => col(s"row.`$f`").as(f)): _*)
  }
}
