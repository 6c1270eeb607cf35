package graft

import graft.functions.MinMaxOrd.{maxOrd, minOrd}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.functions.MinOrd]]/[[MaxOrd]] must be drop-ins for the native
  * min/max on orderable types — identical results (including null inputs
  * and all-null groups) — while planning as an ObjectHashAggregate instead
  * of the SortAggregate the native string/struct buffer forces. */
class MinMaxOrdSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("string min/max agree with native min/max, nulls skipped") {
    val df = Seq(
      (1L, "b"), (1L, "a"), (1L, "c"),
      (2L, "zz"), (2L, "z"),
      (3L, null.asInstanceOf[String]),
      (4L, "only")
    ).toDF("k", "v")
    val got = df.groupBy($"k")
      .agg(minOrd($"v").as("mn"), maxOrd($"v").as("mx"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = df.groupBy($"k")
      .agg(min($"v").as("mn"), max($"v").as("mx"))
      .orderBy($"k").collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == want.toSeq)
    assert(got(2) == ((3L, null, null)), "all-null group must yield null")
  }

  test("struct argmin/argmax agree with native min/max(struct)") {
    val df = Seq(
      (1L, 5L, "s1"), (1L, 3L, "s2"), (1L, 3L, "s0"),
      (2L, 7L, "x")
    ).toDF("k", "ord", "payload")
      .select($"k", struct($"ord", $"payload").as("p"))
    val got = df.groupBy($"k")
      .agg(minOrd($"p").as("mn"), maxOrd($"p").as("mx"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getStruct(1).toString, r.getStruct(2).toString))
    val want = df.groupBy($"k")
      .agg(min($"p").as("mn"), max($"p").as("mx"))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getStruct(1).toString, r.getStruct(2).toString))
    assert(got.toSeq == want.toSeq)
  }

  test("md5-string minimum matches native over a wide group set") {
    val df = spark.range(0, 5000)
      .select((col("id") % 97).as("k"), md5(col("id").cast("string")).as("h"))
    val got = df.groupBy($"k").agg(minOrd($"h").as("m")).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = df.groupBy($"k").agg(min($"h").as("m")).orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
  }

  test("plans as ObjectHashAggregate, not SortAggregate") {
    val df = spark.range(0, 1000)
      .select((col("id") % 10).as("k"), md5(col("id").cast("string")).as("h"))
      .groupBy(col("k")).agg(minOrd(col("h")).as("m"), count(lit(1)).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), s"expected hash aggregate:\n$plan")
    assert(!plan.contains("SortAggregate"), s"must not demote to sort:\n$plan")
  }
}
