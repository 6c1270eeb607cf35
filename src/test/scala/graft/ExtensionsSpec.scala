package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects cosine_similarity into a fresh session") {
    val prior = SparkSession.getDefaultSession
    // getOrCreate reuses any live default session and would skip extension
    // application — clear first, restore after (the SparkContext is shared)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val v = spark.sql(
        "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      val ex = intercept[Exception](
        spark.sql("SELECT cosine_similarity(array(CAST(1.0 AS FLOAT)))"))
      assert(ex.getMessage.toLowerCase.contains("two arguments") ||
        ex.getMessage.toLowerCase.contains("cosine_similarity"))

      val d = spark.sql(
        "SELECT l2_distance_e8(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))").head().getLong(0)
      assert(d == 400000000L, s"l2_distance_e8: $d")

      // the custom aggregates resolve from SQL too (analyzer wraps the
      // returned AggregateFunction); k is a plan-time literal
      val top = spark.sql(
        """SELECT top_k_by_score(s, i, 2) AS t FROM VALUES
          |  (1.0D, 10L), (3.0D, 30L), (2.0D, 20L) AS v(s, i)""".stripMargin)
        .selectExpr("inline(t)").collect().map(r => r.getLong(1))
      assert(top.toSet == Set(30L, 20L), s"top-2 ids: ${top.mkString(",")}")
      val sh = spark.sql(
        "SELECT simhash(md5(x)) FROM VALUES ('a'), ('b') AS v(x)")
        .head().getString(0)
      assert(sh.matches("[0-9a-f]{16}"), s"simhash hex: $sh")
      val badK = intercept[Exception](
        spark.sql("SELECT top_k_by_score(s, i, i) FROM VALUES (1.0D, 1L) AS v(s, i)")
          .collect())
      assert(badK.getMessage.toLowerCase.contains("literal"))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
