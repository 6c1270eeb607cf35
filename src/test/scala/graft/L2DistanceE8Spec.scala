package graft

import graft.functions.L2DistanceE8
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class L2DistanceE8Spec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val composed =
    "aggregate(zip_with(a, b, (x, y) -> " +
      "cast(floor((cast(x as double) - cast(y as double)) * " +
      "(cast(x as double) - cast(y as double)) * 100000000) as bigint)), " +
      "0L, (acc, x) -> acc + x)"

  test("native expression equals the fold composition on fixture subvectors") {
    val e = spark.read.parquet(s"${SparkTestBase.sf}/embeddings.parquet")
    val a = e.select(col("vec_id").as("ia"),
      expr("slice(embedding, 1, 16)").as("a"))
    val b = e.select(col("vec_id").as("ib"),
      expr("slice(embedding, 17, 16)").as("b"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(500)
    val native = pairs.select(col("ia"), col("ib"),
      L2DistanceE8(col("a"), col("b")).as("d"))
    val fold = pairs.select(col("ia"), col("ib"), expr(composed).as("d"))
    assert(native.exceptAll(fold).count() == 0)
  }

  test("identical vectors → 0; null element → null; mismatch raises; SQL works") {
    val same = Seq((Array(1.5f, -2.5f), Array(1.5f, -2.5f))).toDF("a", "b")
    assert(same.select(L2DistanceE8(col("a"), col("b"))).head().getLong(0) == 0L)

    val nul = Seq((Array(1.0f), Option.empty[Array[Float]])).toDF("a", "b")
    assert(nul.select(L2DistanceE8(col("a"), col("b"))).head().isNullAt(0))

    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(L2DistanceE8(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") || ex.getCause != null)

    L2DistanceE8.register(spark)
    same.createOrReplaceTempView("l2vecs")
    assert(spark.sql("SELECT l2_distance_e8(a, b) FROM l2vecs")
      .head().getLong(0) == 0L)
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(L2DistanceE8(col("a"), col("b"))).collect()
    }
  }
}
