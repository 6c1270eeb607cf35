package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns as pure Catalyst
  * expressions (`zip_with`/`aggregate` — codegen'd, no UDF, no collect).
  *
  * Every element is cast to double BEFORE arithmetic and folds run in index
  * order, so results are bit-identical to a sequential loop; outputs exposed
  * for comparison are rounded (4 dp) to absorb any engine-side summation
  * difference.
  */
object Vectors {

  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential-fold dot product in index order (works for any dims, but
    * higher-order functions evaluate interpreted — see [[dotN]]). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Flat `a[1]*b[1] + … + a[n]*b[n]` variant — measured SLOWER than the
    * fold at 64 dims (the 128-term tree exceeds codegen method limits), kept
    * as documentation of the experiment; prefer [[dot]]. */
  def dotN(a: Column, b: Column, dims: Int): Column =
    (1 to dims).map(i =>
      element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduce(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def normN(a: Column, dims: Int): Column = sqrt(dotN(a, a, dims))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-LSH with md5-seeded hyperplanes: the ±1 component of plane `p` at
    * dimension `i` is the MSB of the first hex digit of md5("p:i") — a
    * deterministic "random" projection reproducible in any engine with md5.
    *
    * SQL fragment is engine-neutral except locate/strpos + the integer-div
    * operator (1-based list/array indexing in both engines). */
  def lshBitSql(p: Int, dims: Int, spark: Boolean): String = {
    val posFn = (arg: String) =>
      if (spark) s"locate($arg,'0123456789abcdef')" else s"strpos('0123456789abcdef',$arg)"
    val divOp = if (spark) "div" else "//"
    val idx = (i: String) => if (spark) s"element_at(embedding,$i)" else s"embedding[$i]"
    val genSeries = if (spark) s"sequence(1,$dims)" else s"generate_series(1,$dims)"
    val lam = (body: String) => if (spark) s"i -> $body" else s"i -> $body"
    val sign = s"((${posFn(s"substr(md5(concat('$p:',cast(i as string))),1,1)")}-1) $divOp 8) % 2 * 2 - 1"
    val term = s"cast(${idx("i")} as double) * ($sign)"
    val sumFn = if (spark) s"aggregate(transform($genSeries, ${lam(term)}), cast(0.0 as double), (acc, x) -> acc + x)"
    else s"list_sum(list_transform($genSeries, ${lam(term)}))"
    s"CASE WHEN ($sumFn) > 0 THEN '1' ELSE '0' END"
  }

  /** Full sign-LSH bucket signature (nPlanes chars of '0'/'1'). */
  def lshBucketSql(nPlanes: Int, dims: Int, spark: Boolean): String =
    (1 to nPlanes).map(p => lshBitSql(p, dims, spark))
      .mkString("concat(", ", ", ")")

  /** The hyperplane sign constants, computed once at plan-build time —
    * identical values to the in-SQL md5 derivation (same hash, same rule),
    * but evaluated 8×64 times total instead of per row. */
  def planeSigns(nPlanes: Int, dims: Int): Seq[Array[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (1 to nPlanes).map { p =>
      (1 to dims).map { i =>
        val hex = md.digest(s"$p:$i".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val d = Character.digit(hex.charAt(0), 16)
        (((d >> 3) & 1) * 2 - 1).toDouble
      }.toArray
    }
  }

  /** Spark-side bucket column with the signs inlined as literal arrays (the
    * SQL-generated form recomputes md5 per row·dim·plane — ~1M hashes per
    * 2000 vectors; this is the constant-folded equivalent). */
  def lshBucketCol(embedding: Column, nPlanes: Int, dims: Int): Column = {
    val bits = planeSigns(nPlanes, dims).map { signs =>
      val signArr = array(signs.map(lit).toIndexedSeq: _*)
      when(dot(embedding, signArr) > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }
}
