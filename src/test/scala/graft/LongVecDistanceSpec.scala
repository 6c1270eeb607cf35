package graft

import graft.functions.{L1AbsLong, L2SqLong}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd long-array distance kernels must be BIT-IDENTICAL to the
  * aggregate(zip_with(...)) fold compositions they replaced in the recall
  * contracts (sim_ivfpq_recall's L2, mm_sim_dct / mm_sim_recall's L1) —
  * same long arithmetic in the same element order, so swapping them in
  * changes no query output. */
class LongVecDistanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def e6Pairs = {
    val e = spark.read.parquet(s"${SparkTestBase.sf}/embeddings.parquet")
      .select(col("vec_id"), expr("transform(embedding, x -> " +
        "CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))").as("v"))
    val a = e.select(col("vec_id").as("ia"), col("v").as("a"))
    val b = e.select(col("vec_id").as("ib"), col("v").as("b"))
    a.join(b, col("ia") + 1 === col("ib")).limit(500)
  }

  test("L2SqLong equals the fold composition on e6-quantized fixture vectors") {
    val native = e6Pairs.select(col("ia"), col("ib"),
      L2SqLong(col("a"), col("b")).as("d"))
    val fold = e6Pairs.select(col("ia"), col("ib"),
      expr("aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L, " +
        "(acc, d) -> acc + d)").as("d"))
    assert(native.exceptAll(fold).count() == 0 &&
      fold.exceptAll(native).count() == 0)
  }

  test("L1AbsLong equals the fold composition on e6-quantized fixture vectors") {
    val native = e6Pairs.select(col("ia"), col("ib"),
      L1AbsLong(col("a"), col("b")).as("d"))
    val fold = e6Pairs.select(col("ia"), col("ib"),
      expr("aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0L, " +
        "(acc, d) -> acc + d)").as("d"))
    assert(native.exceptAll(fold).count() == 0 &&
      fold.exceptAll(native).count() == 0)
  }

  test("identical → 0; null input → null; null element → null; mismatch raises") {
    val same = Seq((Array(5L, -7L, 0L), Array(5L, -7L, 0L))).toDF("a", "b")
    assert(same.select(L2SqLong(col("a"), col("b"))).head().getLong(0) == 0L)
    assert(same.select(L1AbsLong(col("a"), col("b"))).head().getLong(0) == 0L)

    val nulIn = Seq((Array(1L), Option.empty[Array[Long]])).toDF("a", "b")
    assert(nulIn.select(L2SqLong(col("a"), col("b"))).head().isNullAt(0))

    val nulEl = Seq((Seq(Some(1L), None), Seq(Some(1L), Some(2L))))
      .toDF("a", "b")
    assert(nulEl.select(L1AbsLong(col("a"), col("b"))).head().isNullAt(0))

    val bad = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(L2SqLong(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") || ex.getCause != null)
  }

  test("type check rejects non-long arrays") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(L1AbsLong(col("a"), col("b"))).collect()
    }
  }
}
