package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 scopes `ExpressionUtils` as `private[sql]`; third-party engines
  * that add native expressions conventionally expose the two conversions
  * from inside the `org.apache.spark.sql` package. This is the only file
  * outside the `graft` namespace. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Stable per-session identity (`sessionUUID` is `private[sql]` in
    * Spark 4) — cache keys that must not strongly reference the session
    * (graft's knn edge cache) key on this string instead. */
  def sessionUuid(s: org.apache.spark.sql.SparkSession): String = s match {
    case c: org.apache.spark.sql.classic.SparkSession => c.sessionUUID
    case other => "id-" + System.identityHashCode(other).toHexString
  }
}
