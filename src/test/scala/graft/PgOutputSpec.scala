package graft

import graft.model.{ChangeEvent, Op}
import graft.source.pgoutput._
import graft.source.pgoutput.PgOutputMessage._
import graft.source.pgoutput.PgOutputMessages._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level golden tests for the pgoutput decoder + converter — the
  * decode/convert matrix the reference covers in
  * pg_output_decoder.zig:481-857 and converter.zig:196-823. */
class PgOutputSpec extends AnyFunSuite {

  private val usersRel = Relation(42, "public", "users", 'f'.toByte, Vector(
    ColumnDef(1, "id", 23, -1),      // int4
    ColumnDef(0, "name", 25, -1),    // text
    ColumnDef(0, "value", 23, -1)))  // int4

  private def t(vals: Datum*) = TupleData(vals.toVector)

  private def roundTrip(m: PgOutputMessage): PgOutputMessage =
    PgOutputDecoder.decode(PgOutputEncoder.encode(m))

  test("decode round-trips every message type byte-exactly") {
    assert(roundTrip(Begin(0x1_3259A308L, 123456789L, 77)) ==
      Begin(0x1_3259A308L, 123456789L, 77))
    assert(roundTrip(Commit(0, 10L, 11L, 99L)) == Commit(0, 10L, 11L, 99L))
    assert(roundTrip(usersRel) == usersRel)
    val ins = Insert(42, t(TextDatum("1"), TextDatum("Alice"), TextDatum("100")))
    assert(roundTrip(ins) == ins)
    val upd = Update(42, Some(t(TextDatum("1"), TextDatum("Old"), NullDatum)),
      t(TextDatum("1"), TextDatum("New"), ToastDatum))
    assert(roundTrip(upd) == upd)
    val del = Delete(42, t(TextDatum("1"), NullDatum, TextDatum("100")))
    assert(roundTrip(del) == del)
  }

  test("truncate/type/origin are skipped; junk and truncation are errors") {
    assert(PgOutputDecoder.decode(Array('T'.toByte)) == Skipped('T'))
    assert(PgOutputDecoder.decode(Array('Y'.toByte)) == Skipped('Y'))
    intercept[PgOutputDecodeException](PgOutputDecoder.decode(Array[Byte]()))
    intercept[PgOutputDecodeException](PgOutputDecoder.decode(Array('Z'.toByte)))
    // truncated INSERT: tag + partial relation id
    intercept[PgOutputDecodeException](
      PgOutputDecoder.decode(Array('I'.toByte, 0, 0)))
    // unterminated cstring in RELATION
    val bad = PgOutputEncoder.encode(usersRel).dropRight(15)
    intercept[PgOutputDecodeException](PgOutputDecoder.decode(bad))
  }

  private def freshConverter = {
    val reg = new RelationRegistry
    val conv = new Converter(reg)
    // commit ts: 2023-11-14T22:13:20Z = 1700000000 Unix; pg epoch micros:
    val pgMicros = (1700000000L - ChangeEvent.PostgresEpochShiftS) * 1000000L
    conv.convert(Begin(0L, pgMicros, 1), 1L)
    conv.convert(usersRel, 2L)
    conv
  }

  test("INSERT converts to the golden envelope (FIXTURES.md §2)") {
    val conv = freshConverter
    val ev = conv.convert(
      Insert(42, t(TextDatum("1"), TextDatum("Alice"), TextDatum("100"))),
      0x1_3259A308L).get
    assert(ev.op == Op.Insert)
    assert(ev.data == """{"id":1,"name":"Alice","value":100}""")
    assert(ev.meta == graft.model.Meta("postgres", "public.users", 1700000000L, "1/3259A308"))
    val json = graft.serialization.JsonEnvelope.envelope(
      ev.op, ev.data, ev.meta.source, ev.meta.resource, ev.meta.timestamp, ev.meta.lsn)
    assert(json ==
      """{"op":"INSERT","data":{"id":1,"name":"Alice","value":100},""" +
      """"meta":{"source":"postgres","resource":"public.users","timestamp":1700000000,"lsn":"1/3259A308"}}""")
  }

  test("UPDATE serializes only the new row; DELETE carries the old row") {
    val conv = freshConverter
    val up = conv.convert(Update(42,
      Some(t(TextDatum("1"), TextDatum("Old"), TextDatum("1"))),
      t(TextDatum("1"), TextDatum("New"), TextDatum("2"))), 5L).get
    assert(up.data == """{"id":1,"name":"New","value":2}""")
    val del = conv.convert(Delete(42,
      t(TextDatum("1"), TextDatum("Gone"), TextDatum("9"))), 6L).get
    assert(del.op == Op.Delete && del.data.contains("\"Gone\""))
  }

  test("OID promotion: ints, floats w/ NaN fallback, bool, numeric, toast, null") {
    val reg = new RelationRegistry
    val conv = new Converter(reg)
    conv.convert(Relation(7, "public", "types", 'f'.toByte, Vector(
      ColumnDef(0, "i8", 20, -1), ColumnDef(0, "f8", 701, -1),
      ColumnDef(0, "b", 16, -1), ColumnDef(0, "num", 1700, -1),
      ColumnDef(0, "txt", 25, -1), ColumnDef(0, "n", 23, -1),
      ColumnDef(0, "toast", 25, -1))), 1L)
    conv.convert(Begin(0L, 0L, 1), 1L)
    val ev = conv.convert(Insert(7, t(
      TextDatum("9007199254740993"), TextDatum("NaN"), TextDatum("t"),
      TextDatum("12345678901234567890.123456"), TextDatum("hi\"there"),
      NullDatum, ToastDatum)), 2L).get
    assert(ev.data ==
      """{"i8":9007199254740993,"f8":"NaN","b":true,""" +
      """"num":"12345678901234567890.123456","txt":"hi\"there","n":null,""" +
      s""""toast":"${ChangeEvent.ToastPlaceholder}"}""")
  }

  test("finite floats stay JSON numbers; unparseable ints fall back to text") {
    val reg = new RelationRegistry
    val conv = new Converter(reg)
    conv.convert(Relation(8, "public", "t2", 'd'.toByte, Vector(
      ColumnDef(0, "f", 700, -1), ColumnDef(0, "i", 23, -1))), 1L)
    conv.convert(Begin(0L, 0L, 1), 1L)
    val ev = conv.convert(Insert(8, t(TextDatum("1.5"), TextDatum("12abc"))), 2L).get
    assert(ev.data == """{"f":1.5,"i":"12abc"}""")
  }

  test("arity mismatch and unregistered relation are hard errors") {
    val conv = freshConverter
    intercept[ConvertException](
      conv.convert(Insert(42, t(TextDatum("1"))), 9L))
    intercept[ConvertException](
      conv.convert(Insert(999, t(TextDatum("1"))), 9L))
  }

  test("registry updates in place on repeated RELATION (ALTER TABLE)") {
    val reg = new RelationRegistry
    val conv = new Converter(reg)
    conv.convert(usersRel, 1L)
    assert(reg.get(42).get.columns.size == 3)
    conv.convert(usersRel.copy(columns = usersRel.columns :+
      ColumnDef(0, "extra", 25, -1)), 2L)
    assert(reg.get(42).get.columns.size == 4)
    assert(reg.get(42).get.resource == "public.users")
    assert(reg.get(42).get.hasFullIdentity)
  }
}
