package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** P1 — partition-key extraction (scalar projection).
  *
  * The reference pulls the stream's `routing_key` column (default "id") from
  * the event row — for UPDATE, from the NEW row — and formats it as the Kafka
  * message key: integers via a no-alloc fast path, string/bool/float/null via
  * text form; a missing key is a hard error
  * (reference: src/processor/processor.zig:231-252,
  * src/domain/change_event.zig:173-210).
  *
  * Spark-native shape: `CAST(col AS STRING)` — codegen'd, the integer fast
  * path is free. The routing key varies per stream, so after routing fan-out
  * the key is a CASE over the (small, closed) set of configured key columns;
  * Catalyst folds it into the same whole-stage-codegen span as the join.
  */
object PartitionKey {

  /** Kafka key for a routed event: pick the column named by `routing_key`.
    * `keyCols` maps routing-key name → source column. Unknown key name → null,
    * surfaced by [[requireKey]] as the reference's hard error. */
  def kafkaKeyCol(routingKey: Column, keyCols: Map[String, Column]): Column = {
    val cases = keyCols.foldLeft(lit(null).cast("string")) {
      case (acc, (name, c)) => when(routingKey === name, c.cast("string")).otherwise(acc)
    }
    cases
  }

  /** Missing routing key is a hard error in the reference (processor.zig:247-251). */
  def requireKey(key: Column): Column =
    when(key.isNull, raise_error(lit("routing key column missing from row")))
      .otherwise(key)
}
