package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects cosine_similarity into a fresh session") {
    // newSession shares the SparkContext but NOT function registrations;
    // build a session with the extensions class wired the production way
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // force a distinct session picking up the extensions conf
      val v = spark.sql(
        "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
          "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").head().getDouble(0)
      assert(math.abs(v - 1.0) < 1e-12)
      val ex = intercept[Exception](spark.sql("SELECT cosine_similarity(array(CAST(1.0 AS FLOAT)))"))
      assert(ex.getMessage.toLowerCase.contains("two arguments") ||
        ex.getMessage.toLowerCase.contains("cosine_similarity"))
    } finally { /* shared context; do not stop */ }
  }
}
