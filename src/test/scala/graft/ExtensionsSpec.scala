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
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach(SparkSession.setDefaultSession)
      prior.foreach(SparkSession.setActiveSession)
    }
  }
}
