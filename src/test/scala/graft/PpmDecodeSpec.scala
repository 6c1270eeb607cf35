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
