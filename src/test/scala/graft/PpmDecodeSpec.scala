package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The REAL P6 parser: header grammar (whitespace runs, comments), pixel
  * offset, and every malformed-payload rejection path. */
class PpmDecodeSpec extends AnyFunSuite {

  private def ppm(header: String, px: Array[Byte]): Array[Byte] =
    header.getBytes("US-ASCII") ++ px

  test("plain header parses; offset lands on the first pixel byte") {
    val px = Array.tabulate[Byte](2 * 2 * 3)(i => (i + 1).toByte)
    val b = ppm("P6\n2 2\n255\n", px)
    val Some((w, h, mx, off)) = Multimodal.decodePpm(b): @unchecked
    assert(w == 2 && h == 2 && mx == 255)
    assert(b(off) == 1.toByte)
  }

  test("comments and arbitrary whitespace runs in the header are legal") {
    val px = Array.fill[Byte](1 * 2 * 3)(7)
    val b = ppm("P6 # a comment\n# another\n  1\t\n2 # dims done\n255 ", px)
    val Some((w, h, mx, off)) = Multimodal.decodePpm(b): @unchecked
    assert(w == 1 && h == 2 && mx == 255 && b.length - off == 6)
  }

  test("exactly ONE whitespace byte separates maxval from the raster") {
    // a pixel payload that BEGINS with a whitespace-valued byte must not be
    // eaten by header parsing: '\n' (0x0a) as the first raster byte
    val px = Array[Byte](0x0a, 1, 2)
    val b = ppm("P6\n1 1\n255\n", px)
    val Some((_, _, _, off)) = Multimodal.decodePpm(b): @unchecked
    assert(b(off) == 0x0a.toByte, "raster byte 0x0a must survive")
  }

  test("malformed payloads are rejected, not mis-decoded") {
    val px3 = Array.fill[Byte](3)(1)
    assert(Multimodal.decodePpm("P5\n1 1\n255\n".getBytes ++ px3).isEmpty,
      "P5 (grayscale) is not P6")
    assert(Multimodal.decodePpm(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n255\n", Array[Byte](1, 2)))
      .isEmpty, "truncated raster")
    assert(Multimodal.decodePpm(ppm("P6\n0 1\n255\n", px3)).isEmpty,
      "zero width")
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n99999\n", px3)).isEmpty,
      "maxval out of range")
    assert(Multimodal.decodePpm(ppm("P6\n1 x\n255\n", px3)).isEmpty,
      "non-numeric height")
    // 16-bit P6 (maxval >= 256, 2 big-endian bytes/sample) would pass a
    // 1-byte-per-sample length check with a long-enough raster and then be
    // silently mis-read — it must be REJECTED outright
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n256\n", Array.fill[Byte](6)(1)))
      .isEmpty, "16-bit P6 must be rejected, not mis-decoded as 8-bit")
    assert(Multimodal.decodePpm(ppm("P6\n1 1\n65535\n", Array.fill[Byte](6)(1)))
      .isEmpty, "16-bit P6 (maxval 65535) must be rejected")
  }

  test("box-filter resize: exact floor-mean of each full 2x2 block") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // 3x3 raster, factor 2 → 1x1 output from the top-left 2x2 block only
    // (trailing row+column discarded). Channel values chosen so the floor
    // division is exercised: r block = 1,2,3,5 → 11/4 = 2.
    val px = Array[Byte](
      1, 10, 100, 2, 20, 200.toByte, 9, 9, 9,
      3, 30, 44, 5, 50, 55, 9, 9, 9,
      9, 9, 9, 9, 9, 9, 9, 9, 9)
    val ds = Seq(graft.multimodal.MediaRecord(7L, ppm("P6\n3 3\n255\n", px)))
      .toDS()
    val out = Multimodal.resizePpm(ds, factor = 2).collect()
    assert(out.length == 1)
    val p = out.head
    assert(p.doc_id == 7L && p.out_x == 0L && p.out_y == 0L)
    assert(p.r == (1 + 2 + 3 + 5) / 4)       // 2 (floor of 2.75)
    assert(p.g == (10 + 20 + 30 + 50) / 4)   // 27 (floor of 27.5)
    assert(p.b == (100 + 200 + 44 + 55) / 4) // 99 — unsigned byte 200 honored
  }

  test("color-moment features: exact integer min/max/mean/second-moment") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    // 2x1 raster: r = {10, 20} → min 10, max 20, mean 15.0000,
    // m2 = ((2·(100+400) − 30²)·10⁴) / 4 = (1000 − 900)·10⁴/4 = 250000 (=25.0)
    val px = Array[Byte](10, 0, 100, 20, 30, 100)
    val ds = Seq(graft.multimodal.MediaRecord(3L, ppm("P6\n2 1\n255\n", px)))
      .toDS()
    val f = Multimodal.featuresPpm(ds).collect().head
    assert(f.r_min == 10L && f.r_max == 20L && f.r_mean_e4 == 150000L &&
      f.r_m2_e4 == 250000L)
    assert(f.g_min == 0L && f.g_max == 30L && f.g_mean_e4 == 150000L &&
      f.g_m2_e4 == 2250000L) // {0,30}: m2 = 15² = 225.0
    assert(f.b_min == 100L && f.b_max == 100L && f.b_mean_e4 == 1000000L &&
      f.b_m2_e4 == 0L) // constant channel: zero variance
  }

  test("resize factor 1 is the identity raster") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val px = Array[Byte](10, 20, 30, 40, 50, 60)
    val ds = Seq(graft.multimodal.MediaRecord(1L, ppm("P6\n2 1\n255\n", px)))
      .toDS()
    val out = Multimodal.resizePpm(ds, factor = 1).collect()
      .sortBy(p => (p.out_y, p.out_x))
    assert(out.map(p => (p.out_x, p.out_y, p.r, p.g, p.b)).toSeq ==
      Seq((0L, 0L, 10L, 20L, 30L), (1L, 0L, 40L, 50L, 60L)))
  }

  test("decoded means are exact integer e4 units") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    val px = Array[Byte](10, 20, 30, 20, 40, 60) // 2 px: r̄=15 ḡ=30 b̄=45
    val ds = Seq(graft.multimodal.MediaRecord(1L, ppm("P6\n2 1\n255\n", px)))
      .toDS()
    val out = Multimodal.decodePpmMeta(ds).collect().head
    assert(out.width == 2 && out.height == 1)
    assert(out.mean_r_e4 == 150000L && out.mean_g_e4 == 300000L &&
      out.mean_b_e4 == 450000L)
  }
}
