package graft

import graft.source.postgres.WireSnapshot
import org.scalatest.funsuite.AnyFunSuite

/** The parallel snapshot's range splitter must produce contiguous,
  * disjoint, covering ranges for ANY long bounds — including key spans
  * wider than Long.Max/n, where naive long arithmetic (`span * i`) wraps
  * into overlapping (data-duplicating) or inverted (data-losing) ranges. */
class WireSnapshotRangeSpec extends AnyFunSuite {

  private def check(lo: Long, hi: Long, n: Int): Unit = {
    val rs = WireSnapshot.splitRanges(lo, hi, n)
    assert(rs.nonEmpty && rs.size <= math.max(1, n))
    assert(rs.head.lo == lo && rs.last.hi == hi, s"cover [$lo, $hi]: $rs")
    rs.foreach(r => assert(r.lo <= r.hi, s"inverted range in $rs"))
    rs.sliding(2).foreach {
      case Seq(a, b) => assert(
        BigInt(b.lo) - BigInt(a.hi) == 1, s"gap/overlap between $a and $b")
      case _ =>
    }
  }

  test("small dense span") { check(1L, 100L, 8) }
  test("span smaller than partition count collapses to per-key ranges") {
    check(10L, 12L, 8)
  }
  test("single key") { check(5L, 5L, 4) }
  test("full long domain does not wrap") {
    check(Long.MinValue, Long.MaxValue, 16)
  }
  test("sparse bigserial span wider than Long.Max/n") {
    check(-4611686018427387904L, 4611686018427387904L, 7)
  }

  test("property: contiguous, disjoint, covering for seeded random bounds") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val a = rnd.nextLong(); val b = rnd.nextLong()
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      check(lo, hi, 1 + rnd.nextInt(64))
    }
  }
}
