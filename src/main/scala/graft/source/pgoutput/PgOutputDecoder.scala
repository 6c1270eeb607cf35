package graft.source.pgoutput

import java.nio.charset.StandardCharsets

/** pgoutput logical-replication message model + byte-level decoder.
  *
  * Wire layout is the public PostgreSQL logical streaming replication
  * protocol (pgoutput plugin, protocol version 1): one-byte tag, big-endian
  * fixed ints, NUL-terminated strings, and per-column tuple data tagged
  * 'n' (null) / 'u' (unchanged TOAST) / 't' (text, len-prefixed) /
  * 'b' (binary, len-prefixed). The reference decodes the same layout
  * (reference: src/source/postgres/pg_output_decoder.zig:162-412); this is a
  * fresh implementation against the protocol spec, not a translation.
  *
  * TRUNCATE ('T'), TYPE ('Y') and ORIGIN ('O') are recognized and skipped,
  * matching the reference's behavior.
  */
object PgOutputMessage {
  /** One column of tuple data. */
  sealed trait Datum
  case object NullDatum extends Datum
  /** Unchanged TOAST column — value not shipped; converter substitutes the
    * placeholder literal. */
  case object ToastDatum extends Datum
  final case class TextDatum(value: String) extends Datum
  final case class BinaryDatum(bytes: Array[Byte]) extends Datum {
    // content equality — the case-class default compares Array references
    override def equals(o: Any): Boolean = o match {
      case b: BinaryDatum => java.util.Arrays.equals(bytes, b.bytes)
      case _ => false
    }
    override def hashCode: Int = java.util.Arrays.hashCode(bytes)
  }

  final case class TupleData(columns: Vector[Datum])

  final case class ColumnDef(flags: Int, name: String, typeOid: Int, typeMod: Int)
}

sealed trait PgOutputMessage
object PgOutputMessages {
  import PgOutputMessage._

  /** commitTsMicros is µs since the Postgres epoch (2000-01-01). */
  final case class Begin(finalLsn: Long, commitTsMicros: Long, xid: Int) extends PgOutputMessage
  final case class Commit(flags: Int, commitLsn: Long, endLsn: Long, commitTsMicros: Long) extends PgOutputMessage
  final case class Relation(relationId: Int, namespace: String, name: String,
      replicaIdentity: Byte, columns: Vector[ColumnDef]) extends PgOutputMessage
  final case class Insert(relationId: Int, newTuple: TupleData) extends PgOutputMessage
  /** oldTuple present only with REPLICA IDENTITY FULL ('O') or key ('K'). */
  final case class Update(relationId: Int, oldTuple: Option[TupleData], newTuple: TupleData) extends PgOutputMessage
  final case class Delete(relationId: Int, oldTuple: TupleData) extends PgOutputMessage
  /** TRUNCATE/TYPE/ORIGIN and anything unknown — consumed and ignored. */
  final case class Skipped(tag: Char) extends PgOutputMessage
}

final class PgOutputDecodeException(msg: String) extends RuntimeException(msg)

object PgOutputDecoder {
  import PgOutputMessage._
  import PgOutputMessages._

  private final class Reader(buf: Array[Byte]) {
    private var pos = 0
    def remaining: Int = buf.length - pos
    private def need(n: Int): Unit =
      // n < 0 means a corrupt length word (sign bit set) — surface it inside
      // the decoder's failure taxonomy, not as an Arrays.copyOfRange error
      if (n < 0 || remaining < n) throw new PgOutputDecodeException(
        s"truncated message: need $n bytes at offset $pos, have $remaining")
    def u8(): Int = { need(1); val v = buf(pos) & 0xFF; pos += 1; v }
    def i16(): Int = { need(2); val v = ((buf(pos) & 0xFF) << 8) | (buf(pos + 1) & 0xFF); pos += 2; v }
    def i32(): Int = { need(4); var v = 0; var i = 0
      while (i < 4) { v = (v << 8) | (buf(pos + i) & 0xFF); i += 1 }; pos += 4; v }
    def i64(): Long = { need(8); var v = 0L; var i = 0
      while (i < 8) { v = (v << 8) | (buf(pos + i) & 0xFFL); i += 1 }; pos += 8; v }
    def cstring(): String = {
      val start = pos
      while (pos < buf.length && buf(pos) != 0) pos += 1
      if (pos >= buf.length) throw new PgOutputDecodeException("unterminated cstring")
      val s = new String(buf, start, pos - start, StandardCharsets.UTF_8)
      pos += 1
      s
    }
    def bytes(n: Int): Array[Byte] = { need(n); val a = java.util.Arrays.copyOfRange(buf, pos, pos + n); pos += n; a }
  }

  private def tupleData(r: Reader): TupleData = {
    val n = r.i16()
    val cols = Vector.newBuilder[Datum]
    var i = 0
    while (i < n) {
      (r.u8(): @unchecked) match {
        case 'n' => cols += NullDatum
        case 'u' => cols += ToastDatum
        case 't' => cols += TextDatum(new String(r.bytes(r.i32()), StandardCharsets.UTF_8))
        case 'b' => cols += BinaryDatum(r.bytes(r.i32()))
        case k => throw new PgOutputDecodeException(s"unknown tuple datum kind '${k.toChar}'")
      }
      i += 1
    }
    TupleData(cols.result())
  }

  /** Decode one pgoutput message (the payload of an XLogData frame). */
  def decode(buf: Array[Byte]): PgOutputMessage = {
    if (buf.isEmpty) throw new PgOutputDecodeException("empty message")
    val r = new Reader(buf)
    (r.u8().toChar: @unchecked) match {
      case 'B' => Begin(r.i64(), r.i64(), r.i32())
      case 'C' => Commit(r.u8(), r.i64(), r.i64(), r.i64())
      case 'R' =>
        val id = r.i32()
        val ns = r.cstring()
        val name = r.cstring()
        val ri = r.u8().toByte
        val ncols = r.i16()
        val cols = Vector.newBuilder[ColumnDef]
        var i = 0
        while (i < ncols) {
          cols += ColumnDef(r.u8(), r.cstring(), r.i32(), r.i32()); i += 1
        }
        Relation(id, ns, name, ri, cols.result())
      case 'I' =>
        val id = r.i32()
        r.u8() match {
          case 'N' => Insert(id, tupleData(r))
          case k => throw new PgOutputDecodeException(s"INSERT: expected 'N', got '${k.toChar}'")
        }
      case 'U' =>
        val id = r.i32()
        r.u8() match {
          case 'K' | 'O' =>
            val old = tupleData(r)
            r.u8() match {
              case 'N' => Update(id, Some(old), tupleData(r))
              case k => throw new PgOutputDecodeException(s"UPDATE: expected 'N', got '${k.toChar}'")
            }
          case 'N' => Update(id, None, tupleData(r))
          case k => throw new PgOutputDecodeException(s"UPDATE: unknown tuple tag '${k.toChar}'")
        }
      case 'D' =>
        val id = r.i32()
        r.u8() match {
          case 'K' | 'O' => Delete(id, tupleData(r))
          case k => throw new PgOutputDecodeException(s"DELETE: unknown tuple tag '${k.toChar}'")
        }
      case t @ ('T' | 'Y' | 'O') => Skipped(t)
      case t => throw new PgOutputDecodeException(s"unknown message tag '$t'")
    }
  }
}

/** Encoder for tests and the replay fixture generator (builds byte-exact
  * pgoutput frames the decoder consumes; a live deployment receives these
  * from the walsender instead). */
object PgOutputEncoder {
  import PgOutputMessage._
  import PgOutputMessages._
  import java.io.ByteArrayOutputStream

  private final class Writer {
    val out = new ByteArrayOutputStream(64)
    def u8(v: Int): this.type = { out.write(v & 0xFF); this }
    def i16(v: Int): this.type = { out.write((v >> 8) & 0xFF); out.write(v & 0xFF); this }
    def i32(v: Int): this.type = { var i = 24; while (i >= 0) { out.write((v >> i) & 0xFF); i -= 8 }; this }
    def i64(v: Long): this.type = { var i = 56; while (i >= 0) { out.write(((v >> i) & 0xFF).toInt); i -= 8 }; this }
    def cstring(s: String): this.type = { out.write(s.getBytes(StandardCharsets.UTF_8)); out.write(0); this }
    def bytes(b: Array[Byte]): this.type = { out.write(b, 0, b.length); this }
  }

  private def tuple(w: Writer, t: TupleData): Unit = {
    w.i16(t.columns.size)
    t.columns.foreach {
      case NullDatum => w.u8('n')
      case ToastDatum => w.u8('u')
      case TextDatum(s) =>
        val b = s.getBytes(StandardCharsets.UTF_8)
        w.u8('t').i32(b.length).bytes(b)
      case BinaryDatum(b) => w.u8('b').i32(b.length).bytes(b)
    }
  }

  def encode(m: PgOutputMessage): Array[Byte] = {
    val w = new Writer
    m match {
      case Begin(lsn, ts, xid) => w.u8('B').i64(lsn).i64(ts).i32(xid)
      case Commit(f, c, e, ts) => w.u8('C').u8(f).i64(c).i64(e).i64(ts)
      case Relation(id, ns, name, ri, cols) =>
        w.u8('R').i32(id).cstring(ns).cstring(name).u8(ri).i16(cols.size)
        cols.foreach(c => w.u8(c.flags).cstring(c.name).i32(c.typeOid).i32(c.typeMod))
      case Insert(id, t) => w.u8('I').i32(id).u8('N'); tuple(w, t)
      case Update(id, old, nt) =>
        w.u8('U').i32(id)
        old.foreach { o => w.u8('O'); tuple(w, o) }
        w.u8('N'); tuple(w, nt)
      case Delete(id, t) => w.u8('D').i32(id).u8('O'); tuple(w, t)
      case Skipped(tag) => w.u8(tag)
    }
    w.out.toByteArray
  }
}
