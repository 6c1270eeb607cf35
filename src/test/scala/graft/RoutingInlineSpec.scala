package graft

import graft.config.StreamDef
import graft.operators.Routing
import org.scalatest.funsuite.AnyFunSuite

/** [[Routing.routeInline]] (literal CASE + explode, zero exchanges) must be
  * row-identical to [[Routing.route]] (broadcast join) — same fan-out
  * multiplicity, same inner-join miss behavior, same columns — on the
  * fixture config, a multi-subscriber config, and an op-case-sensitivity
  * config. The inline form is what the streaming pipeline runs (it removes
  * the per-micro-batch BroadcastExchange build from the latency floor). */
class RoutingInlineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def events = {
    import spark.implicits._
    Seq(
      (1L, "INSERT", "public.click"),
      (2L, "insert", "public.click"),
      (3L, "update", "public.click"),
      (4L, "DELETE", "public.click"), // not in s_click's op set → dropped
      (5L, "insert", "public.purchase"),
      (6L, "delete", "public.purchase"),
      (7L, "read", "public.signup"),
      (8L, "insert", "public.error"), // unmatched resource → dropped
      (9L, "insert", "public.view")
    ).toDF("lsn_num", "op", "resource")
  }

  private def assertSame(streams: Seq[StreamDef]): Unit = {
    val byJoin = Routing.route(events, Routing.streamsDF(spark, streams))
    val inline = Routing.routeInline(events, streams)
    assert(inline.columns.toSeq == byJoin.columns.toSeq,
      "column sets must match")
    val cols = inline.columns.map(org.apache.spark.sql.functions.col)
    assert(inline.select(cols: _*).exceptAll(byJoin.select(cols: _*)).isEmpty &&
      byJoin.select(cols: _*).exceptAll(inline.select(cols: _*)).isEmpty,
      s"routeInline must equal broadcast-join route for $streams")
  }

  test("inline route ≡ broadcast-join route on the fixture config") {
    assertSame(Routing.fixtureStreams)
  }

  test("inline route ≡ join route with multiple subscribers on one (resource, op)") {
    assertSame(Seq(
      StreamDef("a", "public.click", Seq("insert"), "t.a"),
      StreamDef("b", "public.click", Seq("insert", "update"), "t.b",
        routingKey = "user_id"),
      StreamDef("c", "public.purchase", Seq("delete"), "t.c")))
  }

  test("inline route plan has zero exchanges and stays in codegen") {
    val plan = Routing.routeInline(events, Routing.fixtureStreams)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected no exchange:\n$plan")
    // `*(1)` is the simple-string marker for a WholeStageCodegen stage
    assert(plan.contains("*(1) Generate"), s"expected codegen:\n$plan")
  }
}
