package graft

import graft.dedup.Components
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the distributed connected-components operator: the
  * near-dup oracle graphs are near-cliques (converge in one round), so this
  * spec is what proves the fixpoint loop on shapes that need MANY rounds —
  * long paths, stars, forests, duplicate/self edges — against an in-memory
  * union-find reference.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)], tag: String): Unit = {
    import spark.implicits._
    val want = unionFind(edges)
    // both algorithms, same contract: min propagation AND the
    // large-star/small-star doubling variant must match union-find exactly
    val got = Components.connected(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, s"$tag/propagate: got $got, want $want")
    val gotD = Components.connectedDoubling(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotD == want, s"$tag/doubling: got $gotD, want $want")
  }

  test("path graph converges across many propagation rounds") {
    // a 33-node path needs ~log-to-diameter rounds of min propagation —
    // the shape a near-clique corpus never exercises
    check((1L to 32L).map(i => (i, i + 1)), "path-33")
  }

  test("star, forest, duplicate and self edges") {
    check(Seq((10L, 2L), (10L, 3L), (10L, 4L), (10L, 5L)), "star")
    check(Seq((1L, 2L), (2L, 3L), (7L, 8L), (9L, 9L), (1L, 2L)), "forest+dup+self")
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { round =>
      val n = 30
      val edges = Seq.fill(40)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      check(edges, s"random-$round")
    }
  }

  test("two chains meeting at the tail collapse to one component") {
    // min label must flow across the junction in both directions
    check(Seq((5L, 6L), (6L, 7L), (20L, 19L), (19L, 18L), (7L, 18L), (1L, 5L)),
      "merged-chains")
  }
}
