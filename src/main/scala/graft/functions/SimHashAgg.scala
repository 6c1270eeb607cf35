package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer

/** One-pass 64-bit SimHash aggregate over md5-hex token hashes.
  *
  * Algorithm identical to [[graft.dedup.SimHash]]'s generated SQL (per-bit
  * ±1 majority over each token's md5, hex-digit arithmetic), but as a single
  * `TypedImperativeAggregate` with a 64-int vote buffer: one aggregation
  * operator instead of 64 separate sum aggregates, with map-side partial
  * aggregation — the shuffle carries one 64-int buffer per (doc, partition)
  * instead of 64 accumulator columns. Output: 16-char lowercase hex, equal
  * to the SQL formulation character-for-character.
  */
final class SimHashVotes {
  val votes = new Array[Int](64)
  def addHash(hexMd5: UTF8String): Unit = {
    val s = hexMd5.toString
    // the type check can only enforce StringType; enforce the md5-hex
    // contract here with a clear error rather than an out-of-bounds crash
    // (short input) or a silent all-ones bias (Character.digit == -1)
    require(s.length >= 16, s"simhash expects an md5 hex string, got '$s'")
    var k = 0
    while (k < 64) {
      val digit = Character.digit(s.charAt(k / 4), 16)
      require(digit >= 0, s"simhash expects an md5 hex string, got '$s'")
      val bit = (digit >> (3 - k % 4)) & 1
      votes(k) += (if (bit == 1) 1 else -1)
      k += 1
    }
  }
  def merge(o: SimHashVotes): Unit = {
    var i = 0
    while (i < 64) { votes(i) += o.votes(i); i += 1 }
  }
  def hex: String = {
    val sb = new StringBuilder(16)
    var j = 0
    while (j < 16) {
      var d = 0
      var b = 0
      while (b < 4) {
        if (votes(4 * j + b) > 0) d |= 8 >> b
        b += 1
      }
      sb.append("0123456789abcdef".charAt(d))
      j += 1
    }
    sb.toString
  }
}

case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SimHashVotes] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash expects an md5 hex string column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): SimHashVotes = new SimHashVotes

  override def update(buf: SimHashVotes, input: InternalRow): SimHashVotes = {
    val v = child.eval(input)
    if (v != null) buf.addHash(v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: SimHashVotes, other: SimHashVotes): SimHashVotes = {
    buf.merge(other); buf
  }

  override def eval(buf: SimHashVotes): Any = UTF8String.fromString(buf.hex)

  override def serialize(buf: SimHashVotes): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.votes.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SimHashVotes = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new SimHashVotes
    var i = 0
    while (i < 64) { buf.votes(i) = bb.getInt(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren(0))
  override def prettyName: String = "simhash"
}

object SimHashAgg {
  /** `df.groupBy("doc_id").agg(simhash(md5(col("w"))))`. */
  def simhash(md5Hex: Column): Column =
    ColumnBridge.column(
      SimHashAgg(ColumnBridge.expression(md5Hex)).toAggregateExpression())
}
