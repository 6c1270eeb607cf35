package graft

import org.scalatest.funsuite.AnyFunSuite

/** The adaptive cell blocking in sim_knn_graph must be a pure execution
  * re-shape: any block budget (hence any fan-out) yields bit-identical
  * results, because every (src, dst) pair within a cell meets exactly once
  * at key (label, qsalt, csalt) and the heap top-k merge is decomposable.
  * The sf0.001 fixture's largest cell is 63 vectors, so block=8 forces
  * fan = ceil(63/8) = 8 sub-buckets per cell — the salted path — while the
  * default 256 collapses to the un-salted fan=1 plan. */
class KnnBlockingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(block: String): Set[String] = {
    val prev = sys.props.get("graft.knn.block")
    sys.props("graft.knn.block") = block
    try SparkEntry.queries("sim_knn_graph")(spark, SparkTestBase.sf)
      .collect().map(_.mkString("|")).toSet
    finally prev match {
      case Some(v) => sys.props("graft.knn.block") = v
      case None => sys.props.remove("graft.knn.block")
    }
  }

  test("fan>1 blocked plan is bit-identical to the fan=1 plan") {
    val salted = run("8")       // fan = 8 per cell at this fixture
    val degenerate = run("1000000") // fan = 1 everywhere
    assert(salted == degenerate)
    assert(salted.nonEmpty)
  }

  test("dedup_semantic components are identical under forced blocking") {
    def comp(block: String): Set[String] = {
      val prev = sys.props.get("graft.knn.block")
      sys.props("graft.knn.block") = block
      try SparkEntry.queries("dedup_semantic")(spark, SparkTestBase.sf)
        .collect().map(_.mkString("|")).toSet
      finally prev match {
        case Some(v) => sys.props("graft.knn.block") = v
        case None => sys.props.remove("graft.knn.block")
      }
    }
    assert(comp("8") == comp("1000000"))
  }
}
