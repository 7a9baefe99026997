package graft.multimodal

import java.io.ByteArrayOutputStream

/** Baseline JPEG (ITU-T T.81 / ISO 10918-1, SOF0) codec in pure JVM — the
  * last payload format [[MediaHeaders]] could only header-parse.
  *
  * Decoder: full segment walk (DQT / SOF0 / DHT / DRI / SOS), canonical
  * Huffman table construction from DHT (Annex C), entropy decode with
  * byte-unstuffing and restart-marker handling, DC prediction, run-length
  * AC with ZRL/EOB, dequantization, de-zigzag, and a double-precision IDCT
  * (basis from `StrictMath.cos`, so results are bit-identical on every
  * JVM) with round + clamp. Grayscale, 4:4:4, 4:2:2 and 4:2:0 YCbCr
  * (MCU-interleaved sampling factors 1–2, replication upsample, JFIF
  * transform in exact ×10⁶ integer fixed point); progressive, 12-bit and
  * arithmetic-coded streams decode to None rather than mis-decoding.
  *
  * Encoder (fixture/export side): level shift, forward DCT, quantization
  * with caller-supplied tables, canonical Huffman tables (12 DC symbols at
  * 4 bits, 162 AC symbols at 8 bits — valid by construction, carried in
  * DHT so ANY conformant decoder reads them), byte stuffing, optional
  * DRI/RSTn restart intervals (byte-aligned markers, predictor reset).
  *
  * The integer contract the oracle replays (`q_jpeg_decode`): a flat 8×8
  * block quantizes to a lone DC coefficient — AC terms cancel below the
  * rounding threshold — and the decoded pixel is then EXACTLY
  * `clamp(floorDiv(dc·q + 4, 8) + 128)`: Math.round on `dcq/8.0` is exact
  * binary arithmetic, no cosine in sight. North-star addition; the
  * reference has no binary surface.
  */
object JpegCodec {

  import PixelCodec.Media

  private val MaxDim = 1 << 15

  /** Zigzag order: zigzag(k) = raster index of the k-th scanned coef. */
  private val Zigzag: Array[Int] = {
    val z = new Array[Int](64)
    var (x, y, k) = (0, 0, 0)
    var up = true
    while (k < 64) {
      z(k) = y * 8 + x; k += 1
      if (up) {
        if (x == 7) { y += 1; up = false }
        else if (y == 0) { x += 1; up = false }
        else { x += 1; y -= 1 }
      } else {
        if (y == 7) { x += 1; up = true }
        else if (x == 0) { y += 1; up = true }
        else { x -= 1; y += 1 }
      }
    }
    z
  }

  /** cos((2x+1)·u·π/16) basis, StrictMath for cross-JVM determinism. */
  private val Cos: Array[Array[Double]] =
    Array.tabulate(8, 8)((x, u) => StrictMath.cos((2 * x + 1) * u * Math.PI / 16))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / StrictMath.sqrt(2.0) else 1.0)

  /** Default quantization tables: flat 16 for luma DC-dominant fixtures and
    * flat 1 ("near-lossless") — callers pick; both valid baseline tables.
    */
  val FlatQ16: Array[Int] = Array.fill(64)(16)
  val FlatQ1: Array[Int] = Array.fill(64)(1)

  // --------------------------------------------------- canonical Huffman

  /** Our encoder's tables: BITS/HUFFVAL pairs. DC: 12 category symbols,
    * all 4 bits (max code 1011 ≠ 1111 — valid). AC: 162 run/size symbols,
    * all 8 bits (max code 0xA1 ≠ 0xFF — valid).
    */
  private val DcBits: Array[Int] = { val b = new Array[Int](17); b(4) = 12; b }
  private val DcVals: Array[Int] = Array.tabulate(12)(identity)
  private val AcBits: Array[Int] = { val b = new Array[Int](17); b(8) = 162; b }
  private val AcVals: Array[Int] = {
    val vals = Array.newBuilder[Int]
    vals += 0x00 // EOB
    vals += 0xf0 // ZRL
    for (run <- 0 to 15; size <- 1 to 10) vals += (run << 4) | size
    vals.result()
  }

  /** Canonical code assignment (Annex C): symbols in HUFFVAL order get
    * increasing codes, code length from BITS. Returns symbol → (code, len).
    */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len)) {
        out += vals(k) -> ((code, len)); code += 1; k += 1
        i += 1
      }
      code <<= 1
    }
    out.result()
  }

  /** Decode-side canonical tables (Annex F.2.2.3): per-length min/max code
    * and value pointer.
    */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    private var code = 0
    private var k = 0
    for (len <- 1 to 16) {
      valPtr(len) = k
      minCode(len) = code
      code += bits(len); k += bits(len)
      maxCode(len) = if (bits(len) == 0) -1 else code - 1
      code <<= 1
    }
    def value(len: Int, codeV: Int): Int =
      vals(valPtr(len) + codeV - minCode(len))
  }

  // -------------------------------------------------------------- writer

  private final class BitWriter(out: ByteArrayOutputStream) {
    private var buf = 0L
    private var n = 0
    def put(code: Int, len: Int): Unit = {
      buf = (buf << len) | (code & ((1L << len) - 1)); n += len
      while (n >= 8) {
        val b = ((buf >> (n - 8)) & 0xff).toInt
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        n -= 8
      }
    }
    def flush(): Unit = if (n > 0) { put(0x7f, 8 - n) } // pad with 1s
    /** Byte-align and emit RSTm — the restart-interval boundary. */
    def restart(m: Int): Unit = {
      flush()
      out.write(0xff); out.write(0xd0 + (m & 7))
    }
  }

  private def categoryOf(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  /** Encode one component plane's 8×8 block at (bx, by), edge-clamped. */
  private def encodeBlock(plane: Array[Int], w: Int, h: Int, bx: Int, by: Int,
      quant: Array[Int], pred: Int, bw: BitWriter,
      dcTab: Map[Int, (Int, Int)], acTab: Map[Int, (Int, Int)]): Int = {
    val f = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val sx = math.min(bx * 8 + x, w - 1)
        val sy = math.min(by * 8 + y, h - 1)
        f(y * 8 + x) = plane(sy * w + sx) - 128.0
        x += 1
      }
      y += 1
    }
    val coef = new Array[Int](64) // zigzag order, quantized
    var k = 0
    while (k < 64) {
      val (u, v) = (Zigzag(k) % 8, Zigzag(k) / 8)
      var s = 0.0
      var yy = 0
      while (yy < 8) {
        var xx = 0
        while (xx < 8) { s += f(yy * 8 + xx) * Cos(xx)(u) * Cos(yy)(v); xx += 1 }
        yy += 1
      }
      // DC: C(0)² is EXACTLY 1/2 mathematically but not in doubles
      // ((1/√2)² ≈ 0.4999…); computing it as s/8 keeps the DC of an
      // integer block exact — the contract the flat-block oracle replays
      val fc = if (k == 0) s / 8.0 else 0.25 * C(u) * C(v) * s
      coef(k) = Math.round(fc / quant(k)).toInt
      k += 1
    }
    // DC
    val diff = coef(0) - pred
    val s0 = categoryOf(diff)
    val (c0, l0) = dcTab(s0)
    bw.put(c0, l0)
    if (s0 > 0) bw.put(if (diff < 0) diff + (1 << s0) - 1 else diff, s0)
    // AC
    var run = 0
    k = 1
    while (k < 64) {
      if (coef(k) == 0) run += 1
      else {
        while (run > 15) { val (cz, lz) = acTab(0xf0); bw.put(cz, lz); run -= 16 }
        val s = categoryOf(coef(k))
        val (c, l) = acTab((run << 4) | s)
        bw.put(c, l)
        bw.put(if (coef(k) < 0) coef(k) + (1 << s) - 1 else coef(k), s)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (ce, le) = acTab(0x00); bw.put(ce, le) }
    coef(0)
  }

  /** JFIF RGB→YCbCr in ×10⁶ integer fixed point (round-half-up via
    * floorDiv) — deterministic AND exactly replayable in SQL, unlike
    * double rounding. Returns (Y, Cb, Cr), each clamped 0..255.
    */
  def rgbToYcc(r: Int, g: Int, b: Int): (Int, Int, Int) = (
    clamp255(Math.floorDiv(299000 * r + 587000 * g + 114000 * b + 500000,
      1000000).toInt),
    clamp255(Math.floorDiv(-168736 * r - 331264 * g + 500000 * b + 500000,
      1000000).toInt + 128),
    clamp255(Math.floorDiv(500000 * r - 418688 * g - 81312 * b + 500000,
      1000000).toInt + 128))

  /** Inverse JFIF transform, same ×10⁶ fixed point. */
  def yccToRgb(yv: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp255(Math.floorDiv(1000000 * yv + 1402000 * (cr - 128) + 500000,
      1000000).toInt),
    clamp255(Math.floorDiv(1000000 * yv - 344136 * (cb - 128) -
      714136 * (cr - 128) + 500000, 1000000).toInt),
    clamp255(Math.floorDiv(1000000 * yv + 1772000 * (cb - 128) + 500000,
      1000000).toInt))

  /** Encode 8-bit pixels as baseline JPEG. `channels` 1 (grayscale) or 3
    * (RGB, stored YCbCr — 4:4:4, or 4:2:0 with 2×2-average chroma
    * downsampling when `subsample420`). `quantLuma`/`quantChroma` are
    * zigzag-order tables (defaults: flat 16).
    */
  def encodeJpeg(w: Int, h: Int, channels: Int, pix: Array[Byte],
      quantLuma: Array[Int] = FlatQ16,
      quantChroma: Array[Int] = FlatQ16,
      subsample420: Boolean = false,
      subsample422: Boolean = false,
      restartInterval: Int = 0): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(pix.length == w * h * channels, s"pix length ${pix.length}")
    // luma sampling factors; chroma is always 1×1
    val (hY, vY) =
      if (channels == 3 && subsample420) (2, 2)
      else if (channels == 3 && subsample422) (2, 1)
      else (1, 1)
    // per-component plane + dims
    val (planes, dims): (Array[Array[Int]], Array[(Int, Int)]) =
      if (channels == 1)
        (Array(Array.tabulate(w * h)(i => pix(i) & 0xff)), Array((w, h)))
      else {
        val yP = new Array[Int](w * h)
        val cbF = new Array[Int](w * h)
        val crF = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val (yv, cb, cr) =
            rgbToYcc(pix(i * 3) & 0xff, pix(i * 3 + 1) & 0xff, pix(i * 3 + 2) & 0xff)
          yP(i) = yv; cbF(i) = cb; crF(i) = cr
          i += 1
        }
        if (hY == 1 && vY == 1)
          (Array(yP, cbF, crF), Array((w, h), (w, h), (w, h)))
        else {
          val (cw, ch) = ((w + hY - 1) / hY, (h + vY - 1) / vY)
          // box-average chroma downsample over the hY×vY window (round,
          // edge windows clamp to the actual pixel count)
          def down(src: Array[Int]): Array[Int] = {
            val d = new Array[Int](cw * ch)
            var cy = 0
            while (cy < ch) {
              var cx = 0
              while (cx < cw) {
                var sum = 0; var n = 0
                var dy = 0
                while (dy < vY) {
                  var dx = 0
                  while (dx < hY) {
                    val (x, y) = (cx * hY + dx, cy * vY + dy)
                    if (x < w && y < h) { sum += src(y * w + x); n += 1 }
                    dx += 1
                  }
                  dy += 1
                }
                d(cy * cw + cx) = Math.floorDiv(2 * sum + n, 2 * n) // round
                cx += 1
              }
              cy += 1
            }
            d
          }
          (Array(yP, down(cbF), down(crF)),
            Array((w, h), (cw, ch), (cw, ch)))
        }
      }
    val out = new ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    seg(0xdb, Array(0x00) ++ quantLuma) // DQT table 0
    if (channels == 3) seg(0xdb, Array(0x01) ++ quantChroma) // table 1
    val sof = Array.newBuilder[Int]
    sof += 8 += (h >> 8) += (h & 0xff) += (w >> 8) += (w & 0xff) += channels
    for (c <- 0 until channels) {
      val hv = if (c == 0) (hY << 4) | vY else 0x11
      sof += (c + 1) += hv += (if (c == 0) 0 else 1)
    }
    seg(0xc0, sof.result())
    def dhtBody(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Array[Int] =
      Array((tc << 4) | th) ++ (1 to 16).map(bits) ++ vals
    seg(0xc4, dhtBody(0, 0, DcBits, DcVals))
    seg(0xc4, dhtBody(1, 0, AcBits, AcVals))
    if (channels == 3) {
      seg(0xc4, dhtBody(0, 1, DcBits, DcVals))
      seg(0xc4, dhtBody(1, 1, AcBits, AcVals))
    }
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff)) // DRI
    val sos = Array.newBuilder[Int]
    sos += channels
    for (c <- 0 until channels)
      sos += (c + 1) += (if (c == 0) 0x00 else 0x11)
    sos += 0 += 63 += 0
    seg(0xda, sos.result())

    val dcEnc = buildEncodeTable(DcBits, DcVals)
    val acEnc = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val preds = new Array[Int](channels)
    val hFac = Array.tabulate(channels)(c => if (c == 0) hY else 1)
    val vFac = Array.tabulate(channels)(c => if (c == 0) vY else 1)
    val hMax = hFac.max; val vMax = vFac.max
    val (mxN, myN) = ((w + 8 * hMax - 1) / (8 * hMax), (h + 8 * vMax - 1) / (8 * vMax))
    var mcu = 0
    var my = 0
    while (my < myN) {
      var mx = 0
      while (mx < mxN) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.restart((mcu / restartInterval - 1) & 7)
          java.util.Arrays.fill(preds, 0)
        }
        var c = 0
        while (c < channels) {
          val q = if (c == 0) quantLuma else quantChroma
          val (cw, ch) = dims(c)
          var v = 0
          while (v < vFac(c)) {
            var u = 0
            while (u < hFac(c)) {
              preds(c) = encodeBlock(planes(c), cw, ch,
                mx * hFac(c) + u, my * vFac(c) + v, q, preds(c), bw,
                dcEnc, acEnc)
              u += 1
            }
            v += 1
          }
          c += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // -------------------------------------------------------------- reader

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0L
    private var n = 0
    var sawMarker = false
    /** Next bit; byte-unstuffs FF00; RST markers reset state between
      * restart intervals (handled by caller via [[atRestart]]).
      */
    def bit(): Int = {
      if (n == 0) {
        if (pos >= b.length) throw new JpegError("truncated entropy stream")
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          val m = if (pos < b.length) b(pos) & 0xff else -1
          if (m == 0x00) pos += 1 // stuffed byte
          else { sawMarker = true; pos -= 1; throw new JpegError("marker in stream") }
        }
        buf = v; n = 8
      }
      n -= 1
      ((buf >> n) & 1).toInt
    }
    def bits(k: Int): Int = {
      var v = 0
      var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** True iff the next bytes are an RST marker; consumes it and realigns. */
    def atRestart(): Boolean = {
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
        ((b(pos + 1) & 0xff) & 0xf8) == 0xd0) {
        pos += 2; n = 0; true
      } else false
    }
    def align(): Unit = n = 0
  }

  private final class JpegError(msg: String) extends RuntimeException(msg)

  private def decodeHuff(br: BitReader, t: HuffTable): Int = {
    var code = br.bit()
    var len = 1
    while (len < 16 && (t.maxCode(len) < 0 || code > t.maxCode(len))) {
      code = (code << 1) | br.bit(); len += 1
    }
    if (t.maxCode(len) < 0 || code > t.maxCode(len))
      throw new JpegError("bad huffman code")
    t.value(len, code)
  }

  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline JPEG to [[PixelCodec.Media]] ("jpeg", w, h, 1 or 3, gray or
    * RGB values). None for anything but 8-bit baseline sequential with
    * 1×1 sampling (grayscale or 4:4:4).
    */
  def decodeJpeg(b: Array[Byte]): Option[Media] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var w = 0; var h = 0; var nc = 0
    var compQ: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      val m = b(pos + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
      if (pos + 2 + len > b.length) return None
      val body = pos + 4
      m match {
        case 0xdb => // DQT: one or more tables
          var p = body
          while (p < pos + 2 + len) {
            val pq = (b(p) & 0xff) >> 4
            val tq = b(p) & 0x0f
            if (pq != 0) return None // 16-bit tables: not baseline-8
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(i) = b(p + 1 + i) & 0xff; i += 1 }
            quant(tq) = t
            p += 65
          }
        case 0xc4 => // DHT: one or more tables
          var p = body
          while (p < pos + 2 + len) {
            val tc = (b(p) & 0xff) >> 4
            val th = b(p) & 0x0f
            val bits = new Array[Int](17)
            var total = 0
            var i = 1
            while (i <= 16) { bits(i) = b(p + i) & 0xff; total += bits(i); i += 1 }
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = b(p + 17 + i) & 0xff; i += 1 }
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcTabs(th) = t else acTabs(th) = t
            p += 17 + total
          }
        case 0xc0 => // SOF0 baseline
          if ((b(body) & 0xff) != 8) return None
          h = ((b(body + 1) & 0xff) << 8) | (b(body + 2) & 0xff)
          w = ((b(body + 3) & 0xff) << 8) | (b(body + 4) & 0xff)
          nc = b(body + 5) & 0xff
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
          if (nc != 1 && nc != 3) return None
          compQ = new Array[Int](nc)
          compH = new Array[Int](nc)
          compV = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            val hv = b(body + 6 + c * 3 + 1) & 0xff
            compH(c) = hv >> 4
            compV(c) = hv & 0x0f
            // factors 1 or 2 cover gray / 4:4:4 / 4:2:2 / 4:2:0
            if (compH(c) < 1 || compH(c) > 2 || compV(c) < 1 || compV(c) > 2)
              return None
            compQ(c) = b(body + 6 + c * 3 + 2) & 0x0f
            c += 1
          }
        case 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
            0xcd | 0xce | 0xcf =>
          return None // extended / progressive / lossless / arithmetic
        case 0xdd =>
          restartInterval = ((b(body) & 0xff) << 8) | (b(body + 1) & 0xff)
        case 0xda => // SOS: entropy data follows
          if (w == 0 || compQ == null) return None
          val ns = b(body) & 0xff
          if (ns != nc) return None
          compDc = new Array[Int](nc)
          compAc = new Array[Int](nc)
          var c = 0
          while (c < nc) {
            val tda = b(body + 1 + c * 2 + 1) & 0xff
            compDc(c) = tda >> 4
            compAc(c) = tda & 0x0f
            c += 1
          }
          return decodeScan(b, pos + 2 + len, w, h, nc, quant, compQ,
            compH, compV, dcTabs, acTabs, compDc, compAc, restartInterval)
        case _ => () // APPn / COM / others: skip
      }
      pos += 2 + len
    }
    None
  } catch { case _: JpegError | _: ArrayIndexOutOfBoundsException => None }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int, nc: Int,
      quant: Array[Array[Int]], compQ: Array[Int],
      compH: Array[Int], compV: Array[Int],
      dcTabs: Array[HuffTable], acTabs: Array[HuffTable],
      compDc: Array[Int], compAc: Array[Int],
      restartInterval: Int): Option[Media] = {
    val hMax = compH.max; val vMax = compV.max
    val (mxN, myN) = ((w + 8 * hMax - 1) / (8 * hMax),
      (h + 8 * vMax - 1) / (8 * vMax))
    // per-component plane at its own resolution, MCU-padded
    val strides = Array.tabulate(nc)(c => mxN * compH(c) * 8)
    val planes = Array.tabulate(nc)(c =>
      new Array[Int](strides(c) * myN * compV(c) * 8))
    val br = new BitReader(b, start)
    val preds = new Array[Int](nc)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    var mcu = 0
    var my = 0
    try {
      while (my < myN) {
        var mx = 0
        while (mx < mxN) {
          if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
            br.align()
            if (!br.atRestart()) throw new JpegError("missing RST")
            java.util.Arrays.fill(preds, 0)
          }
          var c = 0
          while (c < nc) {
            val q = quant(compQ(c))
            if (q == null || dcTabs(compDc(c)) == null ||
              acTabs(compAc(c)) == null) throw new JpegError("missing table")
            var bv = 0
            while (bv < compV(c)) {
              var bu = 0
              while (bu < compH(c)) {
                java.util.Arrays.fill(coef, 0)
                val s0 = decodeHuff(br, dcTabs(compDc(c)))
                preds(c) += extend(br.bits(s0), s0)
                coef(0) = preds(c) * q(0)
                var k = 1
                var eob = false
                while (k < 64 && !eob) {
                  val rs = decodeHuff(br, acTabs(compAc(c)))
                  val r = rs >> 4; val s = rs & 0x0f
                  if (s == 0) {
                    if (r == 15) k += 16 else eob = true
                  } else {
                    k += r
                    if (k > 63) throw new JpegError("AC overflow")
                    coef(k) = extend(br.bits(s), s) * q(k)
                    k += 1
                  }
                }
                idctBlock(coef, block)
                val bx = mx * compH(c) + bu
                val byk = my * compV(c) + bv
                val base = byk * 8 * strides(c) + bx * 8
                var yy = 0
                while (yy < 8) {
                  var xx = 0
                  while (xx < 8) {
                    planes(c)(base + yy * strides(c) + xx) = block(yy * 8 + xx)
                    xx += 1
                  }
                  yy += 1
                }
                bu += 1
              }
              bv += 1
            }
            c += 1
          }
          mcu += 1
          mx += 1
        }
        my += 1
      }
    } catch { case _: JpegError => return None }
    // crop to (w, h), upsample subsampled components by replication
    // (sample at x·Hc/Hmax — the box upsample), color-convert
    if (nc == 1) {
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { out(y * w + x) = planes(0)(y * strides(0) + x); x += 1 }
        y += 1
      }
      Some(Media("jpeg", w, h, 1, out))
    } else {
      val out = new Array[Int](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sample(c: Int): Int =
            planes(c)((y * compV(c) / vMax) * strides(c) + x * compH(c) / hMax)
          val (r, g, bb) = yccToRgb(sample(0), sample(1), sample(2))
          val i = (y * w + x) * 3
          out(i) = r; out(i + 1) = g; out(i + 2) = bb
          x += 1
        }
        y += 1
      }
      Some(Media("jpeg", w, h, 3, out))
    }
  }

  /** IDCT: coef in ZIGZAG order already dequantized; output level-shifted
    * clamped pixels. DC-only fast path is `Math.round(dc/8.0)` — exact
    * binary arithmetic, the formula the SQL oracle replays; the general
    * path is the O(64·64) double sum with the same rounding (a flat block
    * produced by ANY encoder hits the fast path with identical results,
    * since the general sum for DC-only input is dc·(1/8) exactly in the
    * mathematical limit and within 1 ulp in doubles — we keep the explicit
    * fast path so the contract is exact by construction, not by ulp luck).
    */
  private def idctBlock(coefZ: Array[Int], out: Array[Int]): Unit = {
    var onlyDc = true
    var k = 1
    while (k < 64 && onlyDc) { if (coefZ(k) != 0) onlyDc = false; k += 1 }
    if (onlyDc) {
      val v = clamp255(Math.floorDiv(coefZ(0) + 4, 8) + 128)
      java.util.Arrays.fill(out, v)
      return
    }
    // de-zigzag to raster F(u,v)
    val f = new Array[Int](64)
    k = 0
    while (k < 64) { f(Zigzag(k)) = coefZ(k); k += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            s += C(u) * C(v) * f(v * 8 + u) * Cos(x)(u) * Cos(y)(v)
            u += 1
          }
          v += 1
        }
        out(y * 8 + x) = clamp255(Math.round(0.25 * s).toInt + 128)
        x += 1
      }
      y += 1
    }
  }
}
