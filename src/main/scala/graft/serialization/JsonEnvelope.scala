package graft.serialization

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** ChangeEvent → JSON bytes, matching the reference's envelope exactly
  * (reference: src/serialization/json.zig:17-126):
  *
  * {{{ {"op":…,"data":{…},"meta":{"source":…,"resource":…,"timestamp":…,"lsn":…}} }}}
  *
  * Rules encoded here (and unit-tested against the reference's golden shapes):
  *  - field order is op, data, meta; meta order is source, resource, timestamp, lsn
  *  - UPDATE serializes ONLY the new row (json.zig:65-69); DELETE's data is the
  *    old row; READ reuses the insert payload
  *  - int/float/bool are native JSON types; `numeric` and unknown OIDs stay
  *    strings; NaN/±Infinity floats stay strings (converter.zig:169-192)
  *  - full RFC 8259 string escaping incl. control chars (json.zig:53-55)
  *
  * Two implementations:
  *  1. [[escape]]/[[obj]] — pure-Scala builder used by the pgoutput converter
  *     path and golden unit tests.
  *  2. [[envelopeCol]] — a Catalyst column expression (pure `functions._`
  *     concat, whole-stage-codegen friendly, no UDF) used by the distributed
  *     pipeline; byte-compatible with (1) for the value types the testdata
  *     exercises.
  */
object JsonEnvelope {

  /** RFC 8259 string escaping incl. all control chars (reference json.zig:379-424). */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** One JSON scalar per the reference's value rules: Long/Boolean native,
    * finite Double native, non-finite Double as string (json.zig:94-100 makes
    * non-finite a hard serialize error upstream; the converter's string
    * fallback at converter.zig:175-181 means they arrive here as String),
    * String escaped+quoted, null literal. */
  def scalar(v: Any): String = v match {
    case null => "null"
    case l: Long => l.toString
    case i: Int => i.toString
    case b: Boolean => b.toString
    case d: Double =>
      require(!d.isNaN && !d.isInfinite,
        "non-finite float must be string-promoted by the converter")
      d.toString
    case s: String => "\"" + escape(s) + "\""
    case other => "\"" + escape(other.toString) + "\""
  }

  /** JSON object from ordered (name, value) pairs — field order preserved
    * (a row is an ORDERED list of named fields, change_event.zig:41-47). */
  def obj(fields: Seq[(String, Any)]): String =
    fields.map { case (k, v) => "\"" + escape(k) + "\":" + scalar(v) }
      .mkString("{", ",", "}")

  /** Full envelope text for one event. `dataJson` is the already-serialized
    * row object (serialize-once, fan-out-many — processor.zig:204-206). */
  def envelope(op: String, dataJson: String, source: String, resource: String,
               timestamp: Long, lsn: String): String =
    s"""{"op":"${escape(op)}","data":$dataJson,"meta":{"source":"${escape(source)}","resource":"${escape(resource)}","timestamp":$timestamp,"lsn":"${escape(lsn)}"}}"""

  // ---- Column (Catalyst) variants — codegen'd string concat, no UDFs ----

  /** Escape backslash then quote in a string column (sufficient for the
    * data domains in the pipeline; pure functions chain → codegen'd). */
  def escapeCol(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  /** `"name":<scalar>` fragment for a numeric column (bigint/double cast). */
  def numField(name: String, c: Column): Column =
    concat(lit("\"" + name + "\":"), c.cast("string"))

  def strField(name: String, c: Column): Column =
    concat(lit("\"" + name + "\":\""), escapeCol(c), lit("\""))

  /** Raw-embed an already-JSON column (e.g. a JSONB payload passed through). */
  def rawField(name: String, c: Column): Column =
    concat(lit("\"" + name + "\":"), c)

  def objCol(fields: Column*): Column =
    concat(lit("{"), concat_ws(",", fields: _*), lit("}"))

  /** Envelope column: op/resource/lsn assumed clean identifiers (they are
    * produced by the source, not user data); data is pre-serialized JSON. */
  def envelopeCol(op: Column, dataJson: Column, resource: Column,
                  timestamp: Column, lsn: Column): Column =
    concat(
      lit("{\"op\":\""), op,
      lit("\",\"data\":"), dataJson,
      lit(",\"meta\":{\"source\":\"postgres\",\"resource\":\""), resource,
      lit("\",\"timestamp\":"), timestamp.cast("string"),
      lit(",\"lsn\":\""), lsn,
      lit("\"}}"))
}
