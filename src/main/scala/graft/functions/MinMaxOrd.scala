package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Hash-aggregable min/max over any ORDERABLE type (strings, structs).
  *
  * Why: Spark's built-in `Min`/`Max` are DeclarativeAggregates whose buffer
  * holds the value itself — a string or struct buffer cannot live in the
  * hash aggregate's UnsafeRow, so every `min(md5(...))` / `min(struct(...))`
  * / `max(struct(...))` demotes the WHOLE aggregate (all sibling functions
  * included) to a SortAggregate: both the partial and the final pass sort
  * their full input by group key before aggregating. This
  * TypedImperativeAggregate keeps the running extreme in an object buffer,
  * so the plan stays an ObjectHashAggregate — map-side partials, no sorts,
  * the same shape TopKByScore already rides (guide §2.3 "aggregate before
  * you shuffle"; r19).
  *
  * Ordering contract: `TypeUtils.getInterpretedOrdering(dataType)` — the
  * SAME total order Spark's native Min/Max and ORDER BY use (binary
  * UTF8String compare for strings, lexicographic field order for structs),
  * so results are identical to `min(...)`/`max(...)`. Null INPUTS are
  * skipped exactly like the native aggregates; an all-null / empty group
  * evaluates to null.
  */
abstract class ExtremeOrd extends TypedImperativeAggregate[Array[Any]] {
  def childExpr: Expression
  /** +1 keeps the larger value (max), -1 the smaller (min). */
  def sign: Int

  override def children: Seq[Expression] = Seq(childExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = childExpr.dataType

  @transient private lazy val ordering =
    TypeUtils.getInterpretedOrdering(childExpr.dataType)

  override def checkInputDataTypes(): TypeCheckResult =
    if (org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(childExpr.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an orderable type; got " +
        childExpr.dataType.simpleString)

  // single-slot mutable cell: element 0 holds the current extreme (null =
  // no non-null input seen yet)
  override def createAggregationBuffer(): Array[Any] = new Array[Any](1)

  override def update(buf: Array[Any], input: InternalRow): Array[Any] = {
    val v = childExpr.eval(input)
    if (v != null &&
        (buf(0) == null || math.signum(ordering.compare(v, buf(0))) == sign))
      // copy: the value may be backed by a reused row/scan buffer
      buf(0) = InternalRow.copyValue(v)
    buf
  }

  override def merge(buf: Array[Any], other: Array[Any]): Array[Any] = {
    val v = other(0)
    if (v != null &&
        (buf(0) == null || math.signum(ordering.compare(v, buf(0))) == sign))
      buf(0) = v
    buf
  }

  override def eval(buf: Array[Any]): Any = buf(0)

  // Serialize through a single-field UnsafeRow — handles every orderable
  // type (UTF8String, InternalRow, nested arrays) with Spark's own binary
  // format; the row's bytes round-trip bit-exactly.
  @transient private lazy val proj = UnsafeProjection.create(Array(dataType))

  override def serialize(buf: Array[Any]): Array[Byte] = {
    val row = proj(InternalRow(buf(0)))
    row.getBytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Any] = {
    val row = new UnsafeRow(1)
    row.pointTo(bytes, bytes.length)
    val out = new Array[Any](1)
    out(0) = InternalRow.copyValue(row.get(0, dataType))
    out
  }
}

case class MinOrd(
    childExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ExtremeOrd {
  override def sign: Int = -1
  override def withNewMutableAggBufferOffset(offset: Int): MinOrd =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinOrd =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinOrd =
    copy(childExpr = newChildren(0))
  override def prettyName: String = "min_ord"
}

case class MaxOrd(
    childExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ExtremeOrd {
  override def sign: Int = 1
  override def withNewMutableAggBufferOffset(offset: Int): MaxOrd =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MaxOrd =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MaxOrd =
    copy(childExpr = newChildren(0))
  override def prettyName: String = "max_ord"
}

object MinMaxOrd {
  /** Drop-in for `min(c)` over strings/structs that keeps the aggregate
    * hash-based (ObjectHashAggregate) instead of demoting to SortAggregate. */
  def minOrd(c: Column): Column =
    ColumnBridge.column(MinOrd(ColumnBridge.expression(c)).toAggregateExpression())

  /** Drop-in for `max(c)` — same contract as [[minOrd]]. */
  def maxOrd(c: Column): Column =
    ColumnBridge.column(MaxOrd(ColumnBridge.expression(c)).toAggregateExpression())
}
