package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expression: exact floor-scaled squared L2 distance of two
  * float-array columns — `Σ floor((aᵢ−bᵢ)² · 1e8)` as a long.
  *
  * This is the PQ family's distance primitive (emb_pq_codes /
  * sim_pq_adc_topk). Why a custom Expression: the composable form —
  * `aggregate(zip_with(a, b, λ), 0L, +)` — routes every element through the
  * interpreted higher-order-function evaluator; this node fuses the whole
  * reduction into one whole-stage-codegen loop. The per-term floor-scale is
  * IDENTICAL IEEE ops in the same order as the composed version and the
  * DuckDB oracle (each term floors independently; integer sum is
  * order-free), so swapping it in changes no result bit.
  *
  * Null/shape semantics follow [[CosineSimilarity]]: null input → null,
  * null element → null, mismatched lengths → error. Inputs are assumed
  * FINITE (embedding columns always are): on a NaN element this node's
  * `(long) Math.floor(NaN)` yields 0 where the composed form's ANSI
  * double→bigint cast would error — the only input class where the two
  * diverge.
  */
case class L2DistanceE8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_distance_e8 expects array<float> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    require(y.numElements() == n,
      s"l2_distance_e8: dimension mismatch ($n vs ${y.numElements()})")
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += math.floor(d * d * 100000000.0).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "l2_distance_e8: dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |  else {
         |    final double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |    $acc += (long) java.lang.Math.floor($d * $d * 100000000.0);
         |  }
         |}
         |if (!${ev.isNull}) { ${ev.value} = $acc; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistanceE8 =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "l2_distance_e8"
}

object L2DistanceE8 {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(L2DistanceE8(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** SQL registration: `SELECT l2_distance_e8(a.embedding, b.embedding)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_distance_e8",
      exprs => L2DistanceE8(exprs(0), exprs(1)), "scala_udf")
}
