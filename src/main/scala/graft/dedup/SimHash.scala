package graft.dedup

/** 64-bit SimHash over token md5s, generated as engine-neutral SQL.
  *
  * SimHash = per-bit majority vote over the 64-bit hashes of a document's
  * tokens; near-duplicate docs land within small Hamming distance. The bit
  * arithmetic is generated once here for BOTH engines (Spark `expr(...)` and
  * the DuckDB oracle) so the semantics cannot drift: hash = md5 hex, digit
  * value via position in '0123456789abcdef', bit extraction via power-of-two
  * integer division — all exact-integer ops with identical results.
  *
  * At scale this is one narrow map (explode tokens) + one hash-partitioned
  * aggregate per doc — no joins, no skew beyond document length.
  */
object SimHash {

  /** SQL for the value of hex digit at 1-based position `pos` of column `h`. */
  private def digitSql(pos: Int, spark: Boolean): String =
    if (spark) s"(locate(substr(h,$pos,1),'0123456789abcdef')-1)"
    else s"(strpos('0123456789abcdef',substr(h,$pos,1))-1)"

  /** Per-bit ±1 vote sum aggregate, bit k (0 = MSB of the md5). */
  def bitSumSql(k: Int, spark: Boolean): String = {
    val pos = k / 4 + 1
    val divisor = 1 << (3 - k % 4)
    val divOp = if (spark) "div" else "//"
    s"sum(CASE WHEN (${digitSql(pos, spark)} $divOp $divisor) % 2 = 1 THEN 1 ELSE -1 END) AS s$k"
  }

  /** Hex-string simhash from the 64 vote sums s0..s63 (16 hex chars, MSB first). */
  def hexSql: String = {
    val digits = (0 until 16).map { j =>
      val bits = (0 until 4).map { b =>
        val w = 8 >> b
        s"$w*(CASE WHEN s${4 * j + b} > 0 THEN 1 ELSE 0 END)"
      }.mkString(" + ")
      s"substr('0123456789abcdef', ($bits) + 1, 1)"
    }
    digits.mkString("concat(", ", ", ")")
  }
}
