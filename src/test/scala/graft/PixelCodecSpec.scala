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

  private def testPalette: Array[Byte] = Array.tabulate(768) { j =>
    val e = j / 3
    ((j % 3) match {
      case 0 => (e * 37 + 1) % 256
      case 1 => (e * 73 + 5) % 256
      case _ => (e * 101 + 9) % 256
    }).toByte
  }

  private def rgbOf(pal: Array[Byte], idx: Array[Byte]): Seq[Int] =
    idx.toSeq.flatMap { b =>
      val v = b & 0xff
      Seq(pal(v * 3) & 0xff, pal(v * 3 + 1) & 0xff, pal(v * 3 + 2) & 0xff)
    }

  test("GIF round-trip: single frame resolves palette to RGB") {
    val (w, h) = (11, 7)
    val idx = pix(w * h, 3)
    val gif = PixelCodec.encodeGif(w, h, testPalette, Seq(idx))
    val frames = PixelCodec.decodeGifFrames(gif).get
    assert(frames.length === 1)
    val m = frames.head
    assert(m.kind === "gif" && m.width === w && m.height === h && m.channels === 3)
    assert(m.values.toSeq === rgbOf(testPalette, idx))
  }

  test("GIF round-trip: animated, interlaced odd frames decode identically") {
    val (w, h) = (9, 13)
    val fs = (0 until 5).map(f => pix(w * h, f * 11 + 1))
    val gif = PixelCodec.encodeGif(w, h, testPalette, fs,
      interlaceFor = f => f % 2 == 1)
    val frames = PixelCodec.decodeGifFrames(gif).get
    assert(frames.length === 5)
    frames.zip(fs).zipWithIndex.foreach { case ((m, idx), f) =>
      assert(m.values.toSeq === rgbOf(testPalette, idx), s"frame $f")
    }
  }

  test("GIF LZW: code-width growth to 12 bits and 4096 dictionary reset") {
    // 160x160 of high-entropy pixels forces >4096 dict entries → mid-stream
    // clear; an all-same frame drives long KwKwK chains
    val (w, h) = (160, 160)
    val noisy = Array.tabulate(w * h)(i => ((i * 2654435761L >>> 8) % 256).toByte)
    val flat = Array.fill(w * h)(42.toByte)
    val gif = PixelCodec.encodeGif(w, h, testPalette, Seq(noisy, flat))
    val frames = PixelCodec.decodeGifFrames(gif).get
    assert(frames(0).values.toSeq === rgbOf(testPalette, noisy))
    assert(frames(1).values.toSeq === rgbOf(testPalette, flat))
  }

  test("GIF edges: 1x1 frame, single row, single column") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1))) {
      val idx = pix(w * h, w * 10 + h)
      val m = PixelCodec.decodeGifFrames(
        PixelCodec.encodeGif(w, h, testPalette, Seq(idx))).get.head
      assert((m.width, m.height) === ((w, h)), s"w=$w h=$h")
      assert(m.values.toSeq === rgbOf(testPalette, idx))
    }
  }

  test("GIF hostile inputs decode to None, never throw") {
    val gif = PixelCodec.encodeGif(5, 5, testPalette, Seq(pix(25, 1)))
    for (n <- Seq(0, 5, 12, 13, 20, gif.length / 2, gif.length - 1))
      assert(PixelCodec.decodeGifFrames(gif.take(n)) === None, s"truncated at $n")
    // header declaring a tiny 2-entry GCT misaligns every later block
    val small = gif.clone(); small(10) = 0xf0.toByte
    assert(PixelCodec.decodeGifFrames(small) === None)
    // corrupt LZW data: flip a byte inside the first data sub-block
    val bad = gif.clone(); bad(gif.length - 10) = (bad(gif.length - 10) ^ 0x55).toByte
    PixelCodec.decodeGifFrames(bad) // must not throw; any Option is fine
    // MediaHeaders' header-only GIF has no image data at all
    assert(PixelCodec.decodeGifFrames(
      graft.multimodal.MediaHeaders.gifBytes(16, 16)).isEmpty)
  }

  test("GIF local color table is honored when the global one is absent") {
    val (w, h) = (7, 5)
    val idx = pix(w * h, 6)
    val gif = PixelCodec.encodeGif(w, h, testPalette, Seq(idx))
    val want = PixelCodec.decodeGifFrames(gif).get.head.values.toSeq
    // restructure the encoder's GCT layout into an LCT one byte-for-byte
    val out = new java.io.ByteArrayOutputStream()
    out.write(gif, 0, 10)
    out.write(0x00) // LSD packed: no global color table
    out.write(gif, 11, 2) // bg + aspect
    val afterGct = 13 + 768
    out.write(gif, afterGct, 8) // GCE block unchanged
    out.write(gif, afterGct + 8, 9) // image descriptor minus packed byte
    out.write(0x87) // local color table present, 256 entries
    out.write(gif, 13, 768) // the palette, now local
    out.write(gif, afterGct + 18, gif.length - (afterGct + 18))
    val got = PixelCodec.decodeGifFrames(out.toByteArray).get.head
    assert(got.values.toSeq === want)
  }

  test("GIF dispatch: decode() returns the first frame") {
    val fs = (0 until 3).map(f => pix(6 * 4, f + 7))
    val gif = PixelCodec.encodeGif(6, 4, testPalette, fs)
    val m = PixelCodec.decode(gif).get
    assert(m.kind === "gif")
    assert(m.values.toSeq === rgbOf(testPalette, fs.head))
  }

  test("sampleFrames demuxes real GIF frames as standalone PNGs") {
    val s = spark
    import s.implicits._
    val (w, h) = (8, 6)
    val fs = (0 until 5).map(f => pix(w * h, f * 3 + 2))
    val gif = PixelCodec.encodeGif(w, h, testPalette, fs,
      interlaceFor = f => f == 1)
    val df = Seq((7L, gif)).toDF("doc_id", "payload")
    val out = graft.multimodal.Multimodal.sampleFrames(df, stride = 2)
      .collect().sortBy(_.frameIdx)
    assert(out.map(_.frameIdx).toSeq === Seq(0, 2, 4))
    out.foreach { fr =>
      val m = PixelCodec.decodePng(fr.payload).get
      assert((m.width, m.height, m.channels) === ((w, h, 3)))
      assert(m.values.toSeq === rgbOf(testPalette, fs(fr.frameIdx)))
    }
    // non-GIF payloads keep the byte-block fallback shape
    val blocks = graft.multimodal.Multimodal.sampleFrames(
      Seq((1L, Array.tabulate(600)(_.toByte))).toDF("doc_id", "payload"), 2)
      .collect()
    assert(blocks.map(_.frameIdx).toSeq.sorted === Seq(0, 2))
  }

  test("keyframeOverlap pairs documents sharing demuxed frames") {
    val s = spark
    import s.implicits._
    val (w, h) = (5, 4)
    val shared = pix(w * h, 1); val only1 = pix(w * h, 2)
    val only2 = pix(w * h, 3); val lonely = pix(w * h, 4)
    val g1 = PixelCodec.encodeGif(w, h, testPalette, Seq(shared, only1))
    val g2 = PixelCodec.encodeGif(w, h, testPalette, Seq(only2, shared, shared))
    val g3 = PixelCodec.encodeGif(w, h, testPalette, Seq(lonely))
    val df = Seq((1L, g1), (2L, g2), (3L, g3)).toDF("doc_id", "payload")
    val pairs = graft.multimodal.Multimodal.keyframeOverlap(
      graft.multimodal.Multimodal.sampleFrames(df, stride = 1)).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    // doc 2 repeats the shared frame — still ONE distinct shared frame
    assert((p.getLong(0), p.getLong(1), p.getLong(2)) === ((1L, 2L, 1L)))
  }

  test("audioStats: integer-exact energy/peak/zcr/autocorrelation") {
    val s = spark
    import s.implicits._
    val samples = Array(100, -200, 300, -400, 0, 500, -600, 700)
    val wav = PixelCodec.encodeWav(8000, 1, samples)
    val df = Seq((3L, wav), (4L, "junk".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val rows = graft.multimodal.Multimodal.audioStats(df)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r3 = rows(3L)
    assert(r3.getInt(1) === 8000)
    assert(r3.getLong(2) === 8L)
    assert(r3.getLong(3) === samples.map(v => v.toLong * v).sum)
    assert(r3.getLong(4) === 700L)
    // strict sign flips: zero breaks the chain (+300,-400 then 0 then +500)
    assert(r3.getLong(5) === 5L)
    assert(r3.getLong(6) === samples.sliding(2).map(p => p(0).toLong * p(1)).sum)
    assert(r3.getLong(8) ===
      (0 until 4).map(i => samples(i).toLong * samples(i + 4)).sum)
    // non-WAV payload: zeroed row, not an exception
    assert(rows(4L).getLong(2) === 0L)
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
