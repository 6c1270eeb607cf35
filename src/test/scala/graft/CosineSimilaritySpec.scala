package graft

import graft.functions.CosineSimilarity
import graft.sim.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CosineSimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def vecDf = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.5f, -2.5f, 0.5f), Array(-0.5f, 1.25f, 8.0f))
  ).toDF("id", "a", "b")

  test("native expression equals the fold composition bit-for-bit") {
    val rows = vecDf.select(
      CosineSimilarity(col("a"), col("b")).as("native"),
      (Vectors.dot(col("a"), col("b")) /
        (Vectors.norm(col("a")) * Vectors.norm(col("b")))).as("fold"))
      .collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // identical vectors → 1.0; orthogonal → 0.0
    val byId = vecDf.select(col("id"), CosineSimilarity(col("a"), col("b")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(byId(1L) - 1.0) < 1e-12)
    assert(byId(2L) == 0.0)
  }

  test("codegen and interpreted paths agree on the fixture embeddings") {
    val e = spark.read.parquet(s"${SparkTestBase.sf}/embeddings.parquet")
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib")).limit(500)
    val viaExpr = pairs.select(col("ia"), col("ib"),
      round(CosineSimilarity(col("ea"), col("eb")), 10).as("c"))
    val viaFold = pairs.select(col("ia"), col("ib"),
      round(Vectors.dot(col("ea"), col("eb")) /
        (Vectors.norm(col("ea")) * Vectors.norm(col("eb"))), 10).as("c"))
    assert(viaExpr.exceptAll(viaFold).count() == 0)
  }

  test("null propagates; dimension mismatch raises; SQL registration works") {
    val df = Seq((Array(1.0f), Option.empty[Array[Float]])).toDF("a", "b")
    assert(df.select(CosineSimilarity(col("a"), col("b"))).head().isNullAt(0))

    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f))).toDF("a", "b")
    val ex = intercept[Exception] {
      bad.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      ex.getCause != null)

    CosineSimilarity.register(spark)
    vecDf.createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT cosine_similarity(a, b) FROM vecs WHERE id = 1").head().getDouble(0)
    assert(math.abs(viaSql - 1.0) < 1e-12)
  }

  test("type check rejects non-float arrays") {
    val df = Seq((Array(1.0, 2.0), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(CosineSimilarity(col("a"), col("b"))).collect()
    }
  }
}
