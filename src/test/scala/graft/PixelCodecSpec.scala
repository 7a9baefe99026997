package graft

import graft.multimodal.PixelCodec
import graft.multimodal.PixelCodec.Media

class PixelCodecSpec extends SparkSpec {

  private def pix(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 256).toByte)

  test("PNG round-trip: every filter type, RGB") {
    for (f <- 0 to 4) {
      val (w, h) = (13, 9)
      val p = pix(w * h * 3, f + 1)
      val m = PixelCodec.decodePng(PixelCodec.encodePng(w, h, 3, p, _ => f)).get
      assert(m.kind === "png" && m.width === w && m.height === h && m.channels === 3)
      assert(m.values.toSeq === p.map(_ & 0xff).toSeq, s"filter $f")
    }
  }

  test("PNG round-trip: mixed filters per scanline, gray + RGBA") {
    for (channels <- Seq(1, 4)) {
      val (w, h) = (17, 11)
      val p = pix(w * h * channels, channels)
      val enc = PixelCodec.encodePng(w, h, channels, p, y => y % 5)
      val m = PixelCodec.decodePng(enc).get
      assert(m.channels === channels)
      assert(m.values.toSeq === p.map(_ & 0xff).toSeq)
    }
  }

  test("PNG 1x1 and single-row/column edges") {
    for ((w, h) <- Seq((1, 1), (1, 7), (7, 1))) {
      val p = pix(w * h * 3, w + h)
      val m = PixelCodec.decodePng(
        PixelCodec.encodePng(w, h, 3, p, y => (y + 3) % 5)).get
      assert((m.width, m.height) === ((w, h)))
      assert(m.values.toSeq === p.map(_ & 0xff).toSeq)
    }
  }

  test("BMP round-trip with row padding (widths not multiple of 4)") {
    for (w <- 1 to 6; h <- Seq(1, 3)) {
      val p = pix(w * h * 3, w * 10 + h)
      val m = PixelCodec.decodeBmp(PixelCodec.encodeBmp(w, h, p)).get
      assert(m.kind === "bmp" && m.width === w && m.height === h)
      assert(m.values.toSeq === p.map(_ & 0xff).toSeq, s"w=$w h=$h")
    }
  }

  test("WAV round-trip: signed 16-bit PCM, stereo") {
    val samples = Array.tabulate(300)(i => (i * 211) % 65536 - 32768)
    val m = PixelCodec.decodeWav(PixelCodec.encodeWav(44100, 2, samples)).get
    assert(m.kind === "wav" && m.width === 44100 && m.height === 2)
    assert(m.values.toSeq === samples.toSeq)
  }

  test("WAV extremes: Short.MinValue / MaxValue survive") {
    val samples = Array(-32768, 32767, 0, -1, 1)
    val m = PixelCodec.decodeWav(PixelCodec.encodeWav(8000, 1, samples)).get
    assert(m.values.toSeq === samples.toSeq)
  }

  test("dispatch picks the right codec; garbage and truncations yield None") {
    assert(PixelCodec.decode(PixelCodec.encodePng(3, 3, 3, pix(27, 1))).get.kind === "png")
    assert(PixelCodec.decode(PixelCodec.encodeBmp(3, 3, pix(27, 1))).get.kind === "bmp")
    assert(PixelCodec.decode(PixelCodec.encodeWav(8000, 1, Array(1, 2, 3))).get.kind === "wav")
    assert(PixelCodec.decode(null) === None)
    assert(PixelCodec.decode("not media at all".getBytes("UTF-8")) === None)
    val png = PixelCodec.encodePng(5, 5, 3, pix(75, 2))
    for (n <- Seq(0, 4, 8, 20, png.length / 2))
      assert(PixelCodec.decode(png.take(n)) === None, s"truncated at $n")
    // corrupt the deflate stream: decode must fail cleanly, not throw
    val bad = png.clone(); bad(45) = (bad(45) ^ 0x7f).toByte
    assert(PixelCodec.decodePng(bad).isEmpty || PixelCodec.decodePng(bad).nonEmpty)
  }

  test("header-only PNG (MediaHeaders.pngBytes, no IDAT) decodes to None") {
    assert(PixelCodec.decodePng(
      graft.multimodal.MediaHeaders.pngBytes(16, 16)) === None)
  }

  test("nearest-neighbor resize matches the floor index map") {
    val (w, h) = (10, 6)
    val p = pix(w * h * 3, 9)
    val m = Media("png", w, h, 3, p.map(_ & 0xff))
    val r = PixelCodec.resizeNearest(m, 4, 4)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3) {
      val sx = x * w / 4; val sy = y * h / 4
      assert(r.values((y * 4 + x) * 3 + c) === m.values((sy * w + sx) * 3 + c))
    }
    // upscale too
    val up = PixelCodec.resizeNearest(m, 20, 12)
    assert(up.values((0 * 20 + 19) * 3) === m.values((0 * w + 9) * 3))
  }

  test("Multimodal.extractFeatures is real: WAV rate/channels surface as dims") {
    val s = spark
    import s.implicits._
    val wav = PixelCodec.encodeWav(16000, 2, Array.tabulate(50)(i => i - 25))
    val df = Seq((1L, wav)).toDF("doc_id", "payload")
    val meta = graft.multimodal.Multimodal.extractFeatures(df).collect().head
    assert(meta.kind === "wav" && meta.width === 16000 && meta.height === 2)
  }
}
