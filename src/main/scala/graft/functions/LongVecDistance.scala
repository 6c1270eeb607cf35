package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst distance reductions over `array<bigint>` columns — the
  * exact-integer vector tier's hot kernels.
  *
  * Why custom Expressions: the composable form — `aggregate(zip_with(a, b,
  * λ), 0L, +)` — routes every element through the interpreted
  * higher-order-function evaluator AND allocates the zipped intermediate
  * array per pair. On the recall contracts' probe × corpus legs that is
  * ~15M pair evaluations × 64 elements per suite run; fusing the reduction
  * into one whole-stage-codegen loop removed `sim_ivfpq_recall`'s 16 s
  * in-suite cost (measured r15, see the query's comment). Pure long
  * arithmetic in the same order as the composed form — wrap-around,
  * ordering and results are bit-identical, so swapping changes no output.
  *
  * Null/shape semantics follow [[L2DistanceE8]]: null input → null, null
  * element → null, mismatched lengths → error.
  */
abstract class LongVecReduce extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  /** Per-element contribution in Scala (interpreted path). */
  protected def term(x: Long, y: Long): Long

  /** Per-element contribution as a Java expression over `$x`/`$y`. */
  protected def termJava(x: String, y: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"$prettyName: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += term(x.getLong(i), y.getLong(i))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "$prettyName: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |  else {
         |    final long $xv = $a.getLong($i);
         |    final long $yv = $b.getLong($i);
         |    $acc += ${termJava(xv, yv)};
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })
}

/** Σ (aᵢ−bᵢ)² as a long — the exact-integer squared L2 distance. */
case class L2SqLong(left: Expression, right: Expression)
    extends LongVecReduce {
  override protected def term(x: Long, y: Long): Long = (x - y) * (x - y)
  override protected def termJava(x: String, y: String): String =
    s"($x - $y) * ($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "l2_sq_long"
}

object L2SqLong {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(L2SqLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Σ |aᵢ−bᵢ| as a long — the exact-integer L1 distance. */
case class L1AbsLong(left: Expression, right: Expression)
    extends LongVecReduce {
  override protected def term(x: Long, y: Long): Long = math.abs(x - y)
  override protected def termJava(x: String, y: String): String =
    s"java.lang.Math.abs($x - $y)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1AbsLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "l1_abs_long"
}

object L1AbsLong {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(L1AbsLong(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
