package graft

import graft.multimodal.{JpegCodec, PixelCodec}

class JpegCodecSpec extends SparkSpec {

  private def pix(n: Int, seed: Int): Array[Byte] =
    Array.tabulate(n)(i => ((seed * 31 + i * 7) % 256).toByte)

  test("flat-block grayscale decodes to the exact DC formula") {
    // every 8x8 block flat → lone quantized DC → pixel is EXACTLY
    // clamp(floorDiv(round(8*(v-128)/16)*16 + 4, 8) + 128)
    val (w, h) = (24, 16)
    val p = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (37 * (x / 8) + 91 * (y / 8) + 5) % 256
      p(y * w + x) = v.toByte
    }
    val m = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, 1, p)).get
    assert(m.kind === "jpeg" && m.width === w && m.height === h && m.channels === 1)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (37 * (x / 8) + 91 * (y / 8) + 5) % 256
      val dc = Math.round(8.0 * (v - 128) / 16).toInt
      val expect = Math.max(0, Math.min(255, Math.floorDiv(dc * 16 + 4, 8) + 128))
      assert(m.values(y * w + x) === expect, s"($x,$y) v=$v")
    }
  }

  test("near-lossless round-trip: general content survives within tolerance") {
    // quant all-1s: the only loss is FDCT/IDCT double rounding — tiny
    val (w, h) = (32, 24)
    val p = pix(w * h, 3)
    val m = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, 1, p, JpegCodec.FlatQ1, JpegCodec.FlatQ1)).get
    var maxErr = 0
    for (i <- 0 until w * h)
      maxErr = math.max(maxErr, math.abs(m.values(i) - (p(i) & 0xff)))
    assert(maxErr <= 2, s"maxErr=$maxErr")
  }

  test("color 4:4:4 round-trip stays close under fine quantization") {
    val (w, h) = (16, 16)
    val p = pix(w * h * 3, 7)
    val m = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, 3, p, JpegCodec.FlatQ1, JpegCodec.FlatQ1)).get
    assert(m.channels === 3)
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs(m.values(i) - (p(i) & 0xff)))
    // YCbCr forward+inverse rounding adds a few counts on top of DCT error
    assert(maxErr <= 6, s"maxErr=$maxErr")
  }

  test("4:2:0 flat macroblocks decode to the exact integer closed form") {
    // 16x16-flat color regions: chroma downsample is lossless, every block
    // is DC-only, so decode must EXACTLY equal the fixed-point pipeline
    val (w, h) = (32, 16)
    val p = new Array[Byte](w * h * 3)
    def rgbOf(mx: Int, my: Int): (Int, Int, Int) =
      ((mx * 97 + my * 31 + 11) % 256, (mx * 53 + my * 71 + 99) % 256,
        (mx * 29 + my * 13 + 200) % 256)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 16, y / 16)
      val i = (y * w + x) * 3
      p(i) = r.toByte; p(i + 1) = g.toByte; p(i + 2) = b.toByte
    }
    val m = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, 3, p, subsample420 = true)).get
    def dcPath(v: Int): Int = {
      val dc = Math.round(8.0 * (v - 128) / 16).toInt
      Math.max(0, Math.min(255, Math.floorDiv(dc * 16 + 4, 8) + 128))
    }
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 16, y / 16)
      val (yv, cb, cr) = JpegCodec.rgbToYcc(r, g, b)
      val (er, eg, eb) = JpegCodec.yccToRgb(dcPath(yv), dcPath(cb), dcPath(cr))
      val i = (y * w + x) * 3
      assert((m.values(i), m.values(i + 1), m.values(i + 2)) === ((er, eg, eb)),
        s"($x,$y) rgb=($r,$g,$b)")
    }
  }

  test("4:2:2 flat regions decode to the exact integer closed form") {
    // 16x8-flat regions: horizontal-only chroma downsample is lossless,
    // blocks DC-only — decode must equal the fixed-point pipeline exactly
    val (w, h) = (32, 16)
    val p = new Array[Byte](w * h * 3)
    def rgbOf(mx: Int, my: Int): (Int, Int, Int) =
      ((mx * 61 + my * 43 + 7) % 256, (mx * 17 + my * 83 + 150) % 256,
        (mx * 89 + my * 19 + 60) % 256)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 16, y / 8)
      val i = (y * w + x) * 3
      p(i) = r.toByte; p(i + 1) = g.toByte; p(i + 2) = b.toByte
    }
    val m = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, 3, p, subsample422 = true)).get
    def dcPath(v: Int): Int = {
      val dc = Math.round(8.0 * (v - 128) / 16).toInt
      Math.max(0, Math.min(255, Math.floorDiv(dc * 16 + 4, 8) + 128))
    }
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = rgbOf(x / 16, y / 8)
      val (yv, cb, cr) = JpegCodec.rgbToYcc(r, g, b)
      val (er, eg, eb) = JpegCodec.yccToRgb(dcPath(yv), dcPath(cb), dcPath(cr))
      val i = (y * w + x) * 3
      assert((m.values(i), m.values(i + 1), m.values(i + 2)) === ((er, eg, eb)),
        s"($x,$y)")
    }
  }

  test("4:2:0 general content round-trips within subsampling tolerance") {
    // smooth gradient: chroma varies slowly, so 2x2 averaging loses little
    val (w, h) = (24, 24)
    val p = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      p(i) = (100 + x * 2).toByte
      p(i + 1) = (80 + y * 2).toByte
      p(i + 2) = (60 + x + y).toByte
    }
    val m = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, 3, p,
      JpegCodec.FlatQ1, JpegCodec.FlatQ1, subsample420 = true)).get
    var maxErr = 0
    for (i <- 0 until w * h * 3)
      maxErr = math.max(maxErr, math.abs(m.values(i) - (p(i) & 0xff)))
    assert(maxErr <= 8, s"maxErr=$maxErr")
  }

  test("non-multiple-of-8 dimensions: edge blocks crop correctly") {
    for ((w, h) <- Seq((9, 5), (17, 11), (8, 3), (1, 1))) {
      val p = pix(w * h, w + h)
      val m = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpeg(w, h, 1, p, JpegCodec.FlatQ1, JpegCodec.FlatQ1)).get
      assert((m.width, m.height) === ((w, h)))
      var maxErr = 0
      for (i <- 0 until w * h)
        maxErr = math.max(maxErr, math.abs(m.values(i) - (p(i) & 0xff)))
      assert(maxErr <= 2, s"w=$w h=$h maxErr=$maxErr")
    }
  }

  test("restart markers: DRI-interval streams decode identically") {
    // grayscale with RST every 2 MCUs — predictors reset at each marker
    val (w, h) = (40, 24)
    val p = pix(w * h, 5)
    val plain = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(w, h, 1, p, JpegCodec.FlatQ1, JpegCodec.FlatQ1)).get
    val rst = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(w, h, 1, p,
      JpegCodec.FlatQ1, JpegCodec.FlatQ1, restartInterval = 2)).get
    assert(rst.values.toSeq === plain.values.toSeq)
    // 4:2:0 color with restarts: same pixels as the unrestarted stream
    val pc = pix(32 * 16 * 3, 9)
    val plainC = JpegCodec.decodeJpeg(
      JpegCodec.encodeJpeg(32, 16, 3, pc, subsample420 = true)).get
    val rstC = JpegCodec.decodeJpeg(JpegCodec.encodeJpeg(32, 16, 3, pc,
      subsample420 = true, restartInterval = 1)).get
    assert(rstC.values.toSeq === plainC.values.toSeq)
  }

  test("hostile and unsupported streams decode to None, never throw") {
    val good = JpegCodec.encodeJpeg(16, 16, 1, pix(256, 1))
    // header-region truncations must be None; cuts inside/after the scan
    // may legally still decode (all MCUs read) but must never throw
    for (n <- Seq(0, 2, 4, 20, 60))
      assert(JpegCodec.decodeJpeg(good.take(n)) === None, s"truncated at $n")
    for (n <- Seq(good.length / 2, good.length - 1))
      JpegCodec.decodeJpeg(good.take(n))
    // flip SOF0 to SOF2 (progressive): must refuse, not mis-decode
    val prog = good.clone()
    val sofAt = {
      var i = 2
      while (!((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegCodec.decodeJpeg(prog) === None)
    // corrupt entropy data mid-stream: clean None
    val bad = good.clone(); bad(good.length - 8) = (bad(good.length - 8) ^ 0x5a).toByte
    JpegCodec.decodeJpeg(bad) // any Option, no throw
    // header-only JPEG (MediaHeaders fixture, no scan) is not decodable
    assert(JpegCodec.decodeJpeg(
      graft.multimodal.MediaHeaders.jpegBytes(16, 16)) === None)
  }

  test("dispatch routes JPEG magic through PixelCodec.decode") {
    val jpeg = JpegCodec.encodeJpeg(8, 8, 1, pix(64, 2))
    assert(PixelCodec.decode(jpeg).get.kind === "jpeg")
  }
}
