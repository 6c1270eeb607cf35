package graft

import graft.multimodal.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The r9 codec graduation: JPEG/PNG decode through the JDK's own ImageIO
  * (java.desktop — no external library). Contracts:
  *  - PNG is LOSSLESS: encode → decode is the identity on the raster, so
  *    the mm_decode_png query can be oracle-exact end-to-end.
  *  - JPEG is lossy: dimensions/shape are exactly preserved (the
  *    oracle-checked part of mm_decode_jpeg); pixel error through the
  *    default-quality transform is BOUNDED here — on the fixture's
  *    noise-like ASCII pattern (the hard case for a DCT codec) and on a
  *    smooth gradient (the easy case, much tighter).
  *  - Sniffing: non-image payloads are quarantined (None), never thrown.
  */
class CodecSpec extends AnyFunSuite {

  private def pattern(id: Long, text: String) = Multimodal.patternRgb(id, text)

  test("PNG round-trip is the identity on the raster (lossless contract)") {
    val (w, h, rgb) = pattern(7L, "the quick brown fox jumps over the lazy dog 0123456789")
    val png = Multimodal.encodeImage(w, h, rgb, "png")
    // real PNG magic on the wire
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val Some((dw, dh, back)) = Multimodal.decodeCompressed(png)
    assert((dw, dh) == (w, h))
    assert(back.toSeq == rgb.toSeq, "PNG decode must reproduce every pixel")
  }

  test("JPEG preserves dimensions exactly; pixel error is bounded") {
    // noise-like pattern (fixture shape): the DCT-hostile case
    val (w, h, rgb) = pattern(11L, "jpeg fidelity probe text with enough variety 42!")
    val jpeg = Multimodal.encodeImage(w, h, rgb, "jpeg")
    assert((jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8) // SOI marker
    val Some((dw, dh, back)) = Multimodal.decodeCompressed(jpeg)
    assert((dw, dh) == (w, h), "JPEG must preserve dimensions exactly")
    def chans(v: Int) = Seq((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF)
    val errs = rgb.zip(back).flatMap { case (a, b) =>
      chans(a).zip(chans(b)).map { case (x, y) => math.abs(x - y) } }
    val mae = errs.sum.toDouble / errs.length
    info(f"JPEG mean abs channel error on ASCII-noise pattern: $mae%.1f")
    assert(mae < 48.0, s"noise-pattern MAE $mae out of bounds")

    // smooth gradient: the codec's design case must be much tighter
    val gw = 64; val gh = 48
    val grad = Array.tabulate(gw * gh) { p =>
      val x = p % gw; val y = p / gw
      ((x * 4) << 16) | ((y * 5) << 8) | 128
    }
    val gj = Multimodal.encodeImage(gw, gh, grad, "jpeg")
    val Some((_, _, gback)) = Multimodal.decodeCompressed(gj)
    val gerrs = grad.zip(gback).flatMap { case (a, b) =>
      chans(a).zip(chans(b)).map { case (x, y) => math.abs(x - y) } }
    val gmae = gerrs.sum.toDouble / gerrs.length
    info(f"JPEG mean abs channel error on smooth gradient: $gmae%.1f")
    assert(gmae < 8.0, s"gradient MAE $gmae out of bounds")
  }

  test("non-image payloads are quarantined, not thrown") {
    assert(Multimodal.decodeCompressed(null).isEmpty)
    assert(Multimodal.decodeCompressed(Array[Byte]()).isEmpty)
    assert(Multimodal.decodeCompressed("P6\n2 2\n255\n............".getBytes).isEmpty)
    // valid magic, corrupt body → IOException path → None
    assert(Multimodal.decodeCompressed(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 1, 2, 3, 4)).isEmpty)
    assert(Multimodal.decodeCompressed(
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0x00.toByte)).isEmpty)
  }

  test("WAV round-trip is the identity on the samples (lossless PCM contract)") {
    val samples = Array.tabulate(257)(i => ((i * 37 + 11) % 256).toByte)
    val wav = Multimodal.encodeWavU8(samples)
    // a genuine RIFF/WAVE container on the wire
    assert(new String(wav, 0, 4, "US-ASCII") == "RIFF")
    assert(new String(wav, 8, 4, "US-ASCII") == "WAVE")
    val Some(back) = Multimodal.decodeWav(wav)
    assert(back.toSeq == samples.map(_ & 0xFF).toSeq)
    // quarantine paths
    assert(Multimodal.decodeWav(null).isEmpty)
    assert(Multimodal.decodeWav("RIFFxxxx".getBytes).isEmpty)
    assert(Multimodal.decodeWav("not audio at all".getBytes).isEmpty)
  }

  test("MJPEG demux: exact frame boundaries on real JPEG bytes") {
    val (w1, h1, rgb1) = pattern(3L, "frame one content for the demuxer")
    val (w2, h2, rgb2) = pattern(8L, "frame two, different dims and bytes")
    val f1 = Multimodal.encodeImage(w1, h1, rgb1, "jpeg")
    val f2 = Multimodal.encodeImage(w2, h2, rgb2, "jpeg")
    val stream = f1 ++ f2 ++ f1
    val Some(frames) = Multimodal.demuxMjpeg(stream)
    assert(frames.size == 3)
    assert(frames(0).toSeq == f1.toSeq && frames(1).toSeq == f2.toSeq &&
      frames(2).toSeq == f1.toSeq)
    // each demuxed frame decodes standalone with the right geometry
    assert(Multimodal.decodeCompressed(frames(1)).exists {
      case (w, h, _) => (w, h) == (w2, h2) })
    // quarantine: truncated trailing frame, or not starting at SOI
    assert(Multimodal.demuxMjpeg(stream.dropRight(1)).isEmpty)
    assert(Multimodal.demuxMjpeg(stream.drop(2)).isEmpty)
    assert(Multimodal.demuxMjpeg(null).isEmpty)
  }

  test("PNG-stream demux: chunk-walked frame boundaries, lossless per-frame " +
      "pixels, quarantine on malformed streams") {
    val (w1, h1, rgb1) = pattern(3L, "frame one content for the demuxer")
    val (w2, h2, rgb2) = pattern(8L, "frame two, different dims and bytes")
    val f1 = Multimodal.encodeImage(w1, h1, rgb1, "png")
    val f2 = Multimodal.encodeImage(w2, h2, rgb2, "png")
    val stream = f1 ++ f2 ++ f1
    val Some(frames) = Multimodal.demuxPngStream(stream)
    assert(frames.size == 3)
    assert(frames(0).toSeq == f1.toSeq && frames(1).toSeq == f2.toSeq &&
      frames(2).toSeq == f1.toSeq)
    // lossless through the stream: a demuxed frame reproduces its raster
    assert(Multimodal.decodeCompressed(frames(1)).exists {
      case (w, h, px) => (w, h) == (w2, h2) && px.toSeq == rgb2.toSeq })
    // quarantine: truncated final chunk, not starting at the signature,
    // trailing garbage after the last IEND, null
    assert(Multimodal.demuxPngStream(stream.dropRight(1)).isEmpty)
    assert(Multimodal.demuxPngStream(stream.drop(2)).isEmpty)
    assert(Multimodal.demuxPngStream(stream :+ 0x00.toByte).isEmpty)
    assert(Multimodal.demuxPngStream(null).isEmpty)
  }

  test("mm_video_stream samples PNG frames at sf0.001 with exact pixel stats") {
    val df = SparkEntry.queries("mm_video_stream")(SparkTestBase.spark,
      SparkTestBase.sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    // stride 2 over 3..6 frames ⇒ every doc contributes exactly 2 or 3 rows
    val perDoc = rows.groupBy(_.getLong(0)).values.map(_.length).toSet
    assert(perDoc.subsetOf(Set(2, 3)), s"unexpected per-doc frame counts $perDoc")
    // frame 0 of each doc matches the single-image PNG kernel's stats for
    // the same (id, f=0) pattern — the two paths share the raster contract
    val d0 = rows.filter(r => r.getLong(0) == rows.map(_.getLong(0)).min &&
      r.getLong(1) == 0L).head
    assert(d0.getLong(2) % 8 == 0 && d0.getLong(3) % 6 == 0)
  }

  test("mm_video_mjpeg returns sampled frames at sf0.001 with real decode dims") {
    val spark = SparkTestBase.spark
    val rows = SparkEntry.queries("mm_video_mjpeg")(spark, SparkTestBase.sf).collect()
    // 500 docs × 2-3 sampled frames (every 2nd of 3-6)
    assert(rows.length > 900 && rows.length < 1600)
    rows.foreach { r =>
      val (id, f, w, h) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(f % 2 == 0)
      assert(w == 8 * (1 + (id + f) % 4) && h == 6 * (1 + (id + f) % 3))
    }
  }

  test("mm_audio_wav returns rows at sf0.001") {
    val spark = SparkTestBase.spark
    val rows = SparkEntry.queries("mm_audio_wav")(spark, SparkTestBase.sf).collect()
    assert(rows.length == 500)
    // real zero-crossing structure from the alternating-bias pattern
    assert(rows.count(_.getLong(6) > 0) > 400)
  }

  test("mm_decode_png / mm_decode_jpeg return rows at sf0.001 and dims match") {
    val spark = SparkTestBase.spark
    val png = SparkEntry.queries("mm_decode_png")(spark, SparkTestBase.sf).collect()
    val jpg = SparkEntry.queries("mm_decode_jpeg")(spark, SparkTestBase.sf).collect()
    assert(png.length == 500 && jpg.length == 500)
    // both decode paths must agree on the pattern's dimensions
    val pd = png.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    jpg.foreach { r =>
      assert(pd(r.getLong(0)) == ((r.getLong(1), r.getLong(2))))
    }
  }

  test("sniffPngDims reads IHDR without decoding; agrees with the real decode") {
    val (w, h, rgb) = pattern(13L, "header sniff probe text 0123456789")
    val png = Multimodal.encodeImage(w, h, rgb, "png")
    assert(Multimodal.sniffPngDims(png).contains((w, h)))
    val Some((dw, dh, _)) = Multimodal.decodeCompressed(png)
    assert((dw, dh) == (w, h))
    // quarantine: JPEG bytes, truncated header, garbage
    val jpeg = Multimodal.encodeImage(w, h, rgb, "jpeg")
    assert(Multimodal.sniffPngDims(jpeg).isEmpty)
    assert(Multimodal.sniffPngDims(png.take(20)).isEmpty)
    assert(Multimodal.sniffPngDims("not a png at all, truly".getBytes).isEmpty)
    // channel count derives from the color-type byte (IHDR offset 25):
    // the encoder writes truecolor (type 2 → 3 channels); rewriting the
    // byte must change the decoded-channel answer, and an unknown type
    // must quarantine (the r12 ADVICE resize-plan byte-budget fix)
    assert(Multimodal.sniffPngHeader(png).contains((w, h, 3)))
    def withColorType(ct: Int): Array[Byte] = {
      val b = png.clone(); b(25) = ct.toByte; b
    }
    assert(Multimodal.sniffPngHeader(withColorType(0)).contains((w, h, 1)))
    assert(Multimodal.sniffPngHeader(withColorType(3)).contains((w, h, 3)))
    assert(Multimodal.sniffPngHeader(withColorType(4)).contains((w, h, 2)))
    assert(Multimodal.sniffPngHeader(withColorType(6)).contains((w, h, 4)))
    assert(Multimodal.sniffPngHeader(withColorType(7)).isEmpty)
  }

  test("DCT low band: constant raster concentrates all energy in the DC term") {
    // constant luminance L per pixel ⇒ every pooled cell is exactly L and
    // every non-DC basis row sums to zero (the hardcoded fixed-point table
    // preserves that exactly: each cosine row is antisymmetric at 1e5
    // scale) ⇒ coef(0,0) = 48·L·1e10, all others 0
    val w = 16; val h = 12
    val px = Array.fill(w * h)((100 << 16) | (50 << 8) | 25) // L = 175
    val Some(coefs) = Multimodal.dctLowBand(w, h, px)
    assert(coefs.size == 12)
    coefs.foreach { case (u, v, c) =>
      if (u == 0 && v == 0) assert(c == 48L * 175L * 10000000000L)
      else assert(c == 0L, s"AC coefficient ($u,$v) = $c on a constant raster")
    }
  }

  test("DCT low band: horizontal edge excites u>0 terms, v terms stay zero") {
    // left half black, right half white — constant in y, a step in x:
    // v>0 coefficients must vanish (each C6 row sums to 0 over a constant
    // column profile); u=1 must be the dominant AC term (the step's
    // fundamental); and the descriptor must distinguish the edge image
    // from its mirror by the SIGN of u-odd terms
    val w = 16; val h = 12
    val px = Array.tabulate(w * h)(p => if (p % w < w / 2) 0 else 0xFFFFFF)
    val Some(coefs) = Multimodal.dctLowBand(w, h, px)
    val m = coefs.map { case (u, v, c) => (u, v) -> c }.toMap
    assert(m((1, 1)) == 0L && m((1, 2)) == 0L && m((2, 1)) == 0L,
      "y-direction terms must vanish for an x-only edge")
    assert(m((1, 0)) != 0L, "the step's fundamental must be excited")
    assert(math.abs(m((1, 0))) > math.abs(m((2, 0))),
      "u=1 must dominate u=2 for a half-step edge")
    val mirror = Array.tabulate(w * h)(p => if (p % w < w / 2) 0xFFFFFF else 0)
    val Some(mc) = Multimodal.dctLowBand(w, h, mirror)
    val mm = mc.map { case (u, v, c) => (u, v) -> c }.toMap
    assert(mm((1, 0)) == -m((1, 0)), "mirroring must flip the odd term's sign")
  }

  test("DCT low band quarantines rasters that do not tile the 8x6 grid") {
    assert(Multimodal.dctLowBand(10, 12, new Array[Int](120)).isEmpty)
    assert(Multimodal.dctLowBand(16, 10, new Array[Int](160)).isEmpty)
  }

  test("mm_feature_dct end to end: 12 coefficients per doc through real PNG bytes") {
    val spark = SparkTestBase.spark
    val rows = SparkEntry.queries("mm_feature_dct")(spark, SparkTestBase.sf)
      .collect()
    assert(rows.length == 500 * 12)
    // DC term is always positive (luminance is non-negative, text is ASCII
    // with printable bytes), AC terms vary — the encoder is not constant
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.forall(_._2.length == 12))
    val dc = rows.filter(r => r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(dc.forall(_.getLong(3) > 0L))
    assert(rows.map(_.getLong(3)).distinct.length > 100,
      "DCT coefficients suspiciously uniform")
  }
}
