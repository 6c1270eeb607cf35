package graft

import graft.model.ChangeEvent
import graft.serialization.JsonEnvelope
import org.scalatest.funsuite.AnyFunSuite

class ModelSpec extends AnyFunSuite {

  test("lsn text round-trips (pg_lsn X/X form)") {
    assert(ChangeEvent.lsnText(0x1_3259A308L) == "1/3259A308")
    assert(ChangeEvent.lsnText(0L) == "0/0")
    assert(ChangeEvent.lsnValue("1/3259A308") == 0x1_3259A308L)
    val rnd = new scala.util.Random(42)
    (1 to 1000).foreach { _ =>
      val n = rnd.nextLong() & Long.MaxValue
      assert(ChangeEvent.lsnValue(ChangeEvent.lsnText(n)) == n)
    }
  }

  test("golden envelope matches the reference JSON shape (FIXTURES.md §2)") {
    val data = JsonEnvelope.obj(Seq(
      "id" -> 1L, "name" -> "Alice", "value" -> 100L))
    val got = JsonEnvelope.envelope("INSERT", data, "postgres",
      "public.users", 1700000000L, "1/3259A308")
    assert(got ==
      """{"op":"INSERT","data":{"id":1,"name":"Alice","value":100},""" +
      """"meta":{"source":"postgres","resource":"public.users","timestamp":1700000000,"lsn":"1/3259A308"}}""")
  }

  test("scalar rules: native int/float/bool, strings escaped, null literal") {
    assert(JsonEnvelope.scalar(42L) == "42")
    assert(JsonEnvelope.scalar(true) == "true")
    assert(JsonEnvelope.scalar(1.5) == "1.5")
    assert(JsonEnvelope.scalar(null) == "null")
    assert(JsonEnvelope.scalar("a\"b\\c") == "\"a\\\"b\\\\c\"")
    // non-finite floats must be string-promoted upstream (converter.zig:175-181)
    intercept[IllegalArgumentException](JsonEnvelope.scalar(Double.NaN))
    assert(JsonEnvelope.scalar("NaN") == "\"NaN\"")
  }

  test("RFC 8259 escaping incl. control chars (json.zig:379-424)") {
    assert(JsonEnvelope.escape("tab\there") == "tab\\there")
    assert(JsonEnvelope.escape("nl\n cr\r q\" bs\\ b\b f\f") ==
      "nl\\n cr\\r q\\\" bs\\\\ b\\b f\\f")
    assert(JsonEnvelope.escape("\u0001") == "\\u0001")
    assert(JsonEnvelope.escape("") == "")
  }

  test("TOAST placeholder constant matches the reference literal") {
    assert(ChangeEvent.ToastPlaceholder == "__outboxx_unknown_value__")
  }
}
