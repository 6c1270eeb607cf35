package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import java.nio.ByteBuffer

/** Bounded top-k aggregate: keeps the k highest (score, id) pairs per group
  * in a min-heap.
  *
  * Why a custom `TypedImperativeAggregate` (the scale path for top-k): the
  * window form — `row_number() OVER (ORDER BY score DESC)` then `rank <= k`
  * — materializes and SORTS every candidate row per group; this aggregate is
  * O(N log k) memory-bounded, and because it's an aggregate it gets
  * map-side partial aggregation for free: each input partition reduces to k
  * rows before the shuffle, so the exchange carries k·partitions rows
  * instead of N.
  *
  * Ordering contract (matches the engine's deterministic rank queries):
  * higher score wins; ties break toward the SMALLER id. Result is
  * `array<struct<score:double, id:bigint>>` sorted best-first.
  */
final class TopKBuffer(val k: Int) {
  // min-heap on (score asc, id desc) so the root is the weakest element
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)

  @inline private def weaker(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) / 2
      if (weaker(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(): Unit = {
    var pos = 0
    while (true) {
      val l = 2 * pos + 1; val r = l + 1
      var m = pos
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) return
      swap(pos, m); pos = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def add(score: Double, id: Long): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (weaker(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }

  def merge(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  /** (score, id) pairs, best first. */
  def sortedDesc: Array[(Double, Long)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2 < b._2))
}

case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == LongType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_by_score(score: double, id: bigint, k > 0); got " +
        s"${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    // NaN would poison the heap: weaker() is false for every NaN comparison,
    // so an admitted NaN could never be evicted — skip it like null
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.size * 16)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)).putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { buf.add(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Column-API entry: `df.groupBy(...).agg(topK(col("cos"), col("cid"), 5))`. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())

  /** String-keyed variant: `topKStr(col("n").cast("double"), col("bigram"), 5)`. */
  def topKStr(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKStrByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}

/** [[TopKBuffer]] twin with string ids. Tie ordering matches the engine's
  * rank queries: higher score wins, ties break toward the BINARY-smaller
  * string — the same ordering Spark (UTF8String binary compare) and DuckDB
  * (default binary collation) use for `ORDER BY score DESC, id ASC`. */
final class TopKStrBuffer(val k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  var size = 0
  val scores = new Array[Double](k)
  val ids = new Array[UTF8String](k)

  @inline private def weaker(s1: Double, i1: UTF8String,
      s2: Double, i2: UTF8String): Boolean =
    s1 < s2 || (s1 == s2 && i1.compareTo(i2) > 0)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) / 2
      if (weaker(scores(pos), ids(pos), scores(parent), ids(parent))) {
        swap(pos, parent); pos = parent
      } else return
    }
  }

  private def siftDown(): Unit = {
    var pos = 0
    while (true) {
      val l = 2 * pos + 1; val r = l + 1
      var m = pos
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == pos) return
      swap(pos, m); pos = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val s = scores(a); scores(a) = scores(b); scores(b) = s
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def add(score: Double, id: UTF8String): Unit =
    if (size < k) {
      scores(size) = score; ids(size) = id; size += 1; siftUp(size - 1)
    } else if (weaker(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id; siftDown()
    }

  def merge(other: TopKStrBuffer): Unit = {
    var i = 0
    while (i < other.size) { add(other.scores(i), other.ids(i)); i += 1 }
  }

  def sortedDesc: Array[(Double, UTF8String)] =
    (0 until size).map(i => (scores(i), ids(i))).toArray
      .sortWith((a, b) => a._1 > b._1 || (a._1 == b._1 && a._2.compareTo(b._2) < 0))
}

/** Top-k by score with STRING ids (corpus stats: top tokens / n-grams per
  * group). Same scale rationale as [[TopKByScore]]: map-side partial top-k,
  * k rows per partition cross the shuffle, no per-group sort. */
case class TopKStrByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {
  import org.apache.spark.unsafe.types.UTF8String

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", StringType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (scoreExpr.dataType == DoubleType && idExpr.dataType == StringType && k > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"top_k_str_by_score(score: double, id: string, k > 0); got " +
        s"${scoreExpr.dataType.simpleString}, ${idExpr.dataType.simpleString}, k=$k")

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null && !s.asInstanceOf[Double].isNaN)
      // clone: the incoming UTF8String may be backed by a reused row buffer
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopKStrBuffer, other: TopKStrBuffer): TopKStrBuffer = {
    buf.merge(other); buf
  }

  override def eval(buf: TopKStrBuffer): Any =
    new GenericArrayData(buf.sortedDesc.map { case (s, i) =>
      InternalRow(s, i)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKStrBuffer): Array[Byte] = {
    val payloads = (0 until buf.size).map(i => buf.ids(i).getBytes)
    val bb = ByteBuffer.allocate(8 + buf.size * 12 + payloads.map(_.length).sum)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)).putInt(payloads(i).length).put(payloads(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKStrBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble()
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.add(s, UTF8String.fromBytes(b))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKStrByScore =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKStrByScore =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKStrByScore =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "top_k_str_by_score"
}
