package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{CRC32, Deflater, Inflater}

/** REAL payload decoders in pure JVM — no media libraries.
  *
  * [[MediaHeaders]] covers the metadata half (dimensions from container
  * headers); this object decodes the actual payload:
  *
  *   - '''PNG''' — chunk walk, concatenated-IDAT inflate via
  *     `java.util.zip.Inflater`, then per-scanline unfiltering of all five
  *     filter types (None/Sub/Up/Average/Paeth, ISO 15948 §9). Bit depth 8,
  *     color types 0 (gray), 2 (RGB), 6 (RGBA).
  *   - '''BMP''' — BITMAPINFOHEADER 24-bit uncompressed pixel array:
  *     bottom-up (or top-down when height < 0) BGR rows padded to 4 bytes,
  *     normalized to top-down RGB.
  *   - '''WAV''' — RIFF chunk walk to the `data` chunk, 16-bit little-endian
  *     PCM frames decoded to signed sample values.
  *   - '''GIF''' — GIF87a/89a block walk, per-frame LZW decompression
  *     (variable-width codes, clear/KwKwK handling, deferred-clear
  *     tolerant), four-pass de-interlacing, palette resolution through the
  *     local-else-global color table. Animated GIFs decode to one RGB
  *     [[Media]] per frame ([[decodeGifFrames]]) — the real multi-frame
  *     demux behind [[Multimodal.sampleFrames]].
  *   - '''JPEG''' — baseline SOF0 via [[JpegCodec]]: DHT canonical Huffman
  *     construction, entropy decode with byte-unstuffing and restart
  *     markers, dequant, de-zigzag, deterministic IDCT, JFIF color
  *     transform (grayscale + 4:4:4).
  *
  * Encoders for the same three formats exist so tests and DuckDB oracles can
  * construct payloads with ''known'' pixel/sample values and prove
  * `decode ∘ encode = id` end-to-end (the `q_media_headers` pattern, now for
  * payload bytes, not just headers). The PNG encoder takes a per-scanline
  * filter chooser so fixtures exercise every unfilter branch.
  *
  * Scale shape: `decode` is a per-row function used inside the
  * `mapPartitions` batch plumbing of [[Multimodal]] — a pure map stage, no
  * shuffle, codec state per partition. North-star addition; the reference
  * has no binary surface.
  */
object PixelCodec {

  /** Decoded payload, one record shape for all kinds.
    *
    *  - images (`png`/`bmp`): `(width, height, channels)` are pixel dims and
    *    the values are the top-down row-major interleaved channel stream,
    *    each 0..255;
    *  - audio (`wav`): `width` = sample rate, `height` = channel count,
    *    `channels` = bytes per sample, values = signed PCM samples in frame
    *    order.
    */
  final case class Media(kind: String, width: Int, height: Int,
      channels: Int, values: Array[Int])

  /** Decode bounds on DECLARED image dimensions: a malformed or hostile
    * header claiming gigapixel sizes must decode to None, never allocate.
    * 32k × 32k × 4 channels (4 GiB of pixel values) is far past any
    * payload this engine stores inline in a column.
    */
  private val MaxDim = 1 << 15
  private val MaxPixelBytes = 1L << 28

  // ---------------------------------------------------------------- util

  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ----------------------------------------------------------------- PNG

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  private def channelsOf(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // truecolor
    case 6 => 4 // truecolor + alpha
    case _ => -1
  }

  /** Encode 8-bit pixels as a valid PNG. `pix` is the top-down row-major
    * interleaved stream (length w*h*channels); `channels` picks the color
    * type (1 → gray, 3 → RGB, 4 → RGBA). `filterFor(y)` chooses the scanline
    * filter (0..4) so callers can exercise specific unfilter paths; the
    * forward filters here are the spec's §9 equations run in reverse.
    */
  def encodePng(w: Int, h: Int, channels: Int, pix: Array[Byte],
      filterFor: Int => Int = _ => 0): Array[Byte] = {
    require(pix.length == w * h * channels, s"pix length ${pix.length} != $w*$h*$channels")
    val colorType = channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case c => throw new IllegalArgumentException(s"unsupported channel count $c")
    }
    val bpp = channels
    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    var y = 0
    while (y < h) {
      val f = filterFor(y) % 5
      raw(y * (1 + stride)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = pix(y * stride + x) & 0xff
        val left = if (x >= bpp) pix(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) pix((y - 1) * stride + x) & 0xff else 0
        val ul = if (y > 0 && x >= bpp) pix((y - 1) * stride + x - bpp) & 0xff else 0
        val filtered = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (1 + stride) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val comp = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()

    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length))
      val tb = tag.getBytes(US_ASCII)
      val crc = new CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.write(be32(crc.getValue.toInt))
    }
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, colorType.toByte, 0, 0, 0))
    chunk("IDAT", comp.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Paeth predictor (ISO 15948 §9.4). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Full PNG payload decode: chunk walk → inflate concatenated IDAT →
    * unfilter every scanline. None for unsupported layouts (interlaced,
    * palette, 16-bit) or malformed streams.
    */
  def decodePng(b: Array[Byte]): Option[Media] = {
    if (b.length < 8 + 25 || !b.take(8).sameElements(PngSig)) return None
    var w = 0; var h = 0; var channels = -1
    val idat = new ByteArrayOutputStream()
    var i = 8
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = readBe32(b, i)
      // long arithmetic: a hostile len near 2^31 overflows the int sum and
      // would slip past the bound
      if (len < 0 || i.toLong + 8L + len + 4L > b.length) return None
      val tag = new String(b, i + 4, 4, US_ASCII)
      tag match {
        case "IHDR" =>
          if (len < 13) return None
          w = readBe32(b, i + 8); h = readBe32(b, i + 12)
          val bitDepth = b(i + 16) & 0xff
          channels = channelsOf(b(i + 17) & 0xff)
          val interlace = b(i + 20) & 0xff
          if (bitDepth != 8 || channels < 0 || interlace != 0) return None
        case "IDAT" => idat.write(b, i + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
      i += 8 + len + 4
    }
    if (w <= 0 || h <= 0 || channels < 0) return None
    // bound the DECLARED dimensions before allocating: a malformed header
    // claiming gigapixel dims must fall through to None (total function),
    // not overflow the stride arithmetic or OOM the task
    if (w > MaxDim || h > MaxDim ||
      w.toLong * h.toLong * channels > MaxPixelBytes) return None

    val stride = w * channels
    val raw = new Array[Byte](h * (1 + stride))
    val inflater = new Inflater()
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inflater.end()
    if (off != raw.length) return None

    val bpp = channels
    val pix = new Array[Int](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      var x = 0
      while (x < stride) {
        val v = raw(y * (1 + stride) + 1 + x) & 0xff
        val left = if (x >= bpp) pix(y * stride + x - bpp) else 0
        val up = if (y > 0) pix((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= bpp) pix((y - 1) * stride + x - bpp) else 0
        pix(y * stride + x) = f match {
          case 0 => v
          case 1 => (v + left) & 0xff
          case 2 => (v + up) & 0xff
          case 3 => (v + (left + up) / 2) & 0xff
          case 4 => (v + paeth(left, up, ul)) & 0xff
          case _ => return None
        }
        x += 1
      }
      y += 1
    }
    Some(Media("png", w, h, channels, pix))
  }

  // ----------------------------------------------------------------- BMP

  /** Encode 24-bit BMP: top-down row-major RGB input, written bottom-up in
    * BGR with rows padded to 4 bytes (the on-disk convention).
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != $w*$h*3")
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    val imgSize = (rowBytes + pad) * h
    val out = new ByteArrayOutputStream()
    out.write("BM".getBytes(US_ASCII))
    out.write(le32(54 + imgSize)); out.write(le32(0)); out.write(le32(54))
    out.write(le32(40)); out.write(le32(w)); out.write(le32(h))
    out.write(le16(1)); out.write(le16(24)); out.write(le32(0))
    out.write(le32(imgSize)); out.write(le32(2835)); out.write(le32(2835))
    out.write(le32(0)); out.write(le32(0))
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val p = (y * w + x) * 3
        out.write(rgb(p + 2) & 0xff); out.write(rgb(p + 1) & 0xff)
        out.write(rgb(p) & 0xff)
        x += 1
      }
      var k = 0
      while (k < pad) { out.write(0); k += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Decode a 24-bit uncompressed BMP pixel array, normalizing to top-down
    * RGB. Handles both bottom-up (height > 0) and top-down (height < 0)
    * row orders and the 4-byte row padding.
    */
  def decodeBmp(b: Array[Byte]): Option[Media] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val dataOff = readLe32(b, 10)
    val w = readLe32(b, 18)
    val hRaw = readLe32(b, 22)
    val bits = readLe16(b, 28)
    val compression = readLe32(b, 30)
    if (w <= 0 || hRaw == 0 || bits != 24 || compression != 0) return None
    // abs on LONG: math.abs(Int.MinValue) stays negative and would bypass
    // the dimension bound below
    val hL = math.abs(hRaw.toLong)
    // dimension bound BEFORE the stride arithmetic: huge declared widths
    // overflow rowBytes (int) and can slip past the length check below
    if (w > MaxDim || hL > MaxDim || w.toLong * hL * 3 > MaxPixelBytes)
      return None
    val h = hL.toInt
    val topDown = hRaw < 0
    val rowBytes = w * 3
    val pad = (4 - rowBytes % 4) % 4
    if (dataOff < 54 || dataOff.toLong + (rowBytes + pad).toLong * h > b.length) return None
    val pix = new Array[Int](w * h * 3)
    var row = 0
    while (row < h) {
      val srcY = if (topDown) row else h - 1 - row
      val base = dataOff + srcY * (rowBytes + pad)
      var x = 0
      while (x < w) {
        val s = base + x * 3
        val d = (row * w + x) * 3
        pix(d) = b(s + 2) & 0xff     // R (stored as BGR)
        pix(d + 1) = b(s + 1) & 0xff // G
        pix(d + 2) = b(s) & 0xff     // B
        x += 1
      }
      row += 1
    }
    Some(Media("bmp", w, h, 3, pix))
  }

  // ----------------------------------------------------------------- WAV

  /** Encode 16-bit PCM samples (frame order, signed) as RIFF/WAVE. */
  def encodeWav(sampleRate: Int, channels: Int, samples: Array[Int]): Array[Byte] = {
    val dataLen = samples.length * 2
    val blockAlign = channels * 2
    val out = new ByteArrayOutputStream()
    out.write("RIFF".getBytes(US_ASCII)); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes(US_ASCII))
    out.write("fmt ".getBytes(US_ASCII)); out.write(le32(16))
    out.write(le16(1)); out.write(le16(channels)); out.write(le32(sampleRate))
    out.write(le32(sampleRate * blockAlign)); out.write(le16(blockAlign))
    out.write(le16(16))
    out.write("data".getBytes(US_ASCII)); out.write(le32(dataLen))
    samples.foreach { s => out.write(s & 0xff); out.write((s >> 8) & 0xff) }
    out.toByteArray
  }

  /** RIFF chunk walk to `fmt ` + `data`; decodes 16-bit LE PCM to signed
    * sample values. None for non-PCM or non-16-bit payloads.
    */
  def decodeWav(b: Array[Byte]): Option[Media] = {
    if (b.length < 44 || !b.take(4).sameElements("RIFF".getBytes(US_ASCII)) ||
      !b.slice(8, 12).sameElements("WAVE".getBytes(US_ASCII))) return None
    var i = 12
    var rate = -1; var channels = -1; var bits = -1
    var samples: Array[Int] = null
    while (i + 8 <= b.length) {
      val id = new String(b, i, 4, US_ASCII)
      val len = readLe32(b, i + 4)
      // long arithmetic: a hostile len near 2^31 overflows the int sum and
      // would drive a multi-GiB sample allocation
      if (len < 0 || i.toLong + 8L + len > b.length) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = readLe16(b, i + 8)
          channels = readLe16(b, i + 10)
          rate = readLe32(b, i + 12)
          bits = readLe16(b, i + 22)
          if (fmt != 1 || bits != 16 || channels <= 0) return None
        case "data" =>
          val n = len / 2
          samples = new Array[Int](n)
          var k = 0
          while (k < n) {
            samples(k) = readLe16(b, i + 8 + k * 2).toShort.toInt
            k += 1
          }
        case _ => ()
      }
      i += 8 + len + (len & 1) // chunks are word-aligned
    }
    if (rate < 0 || samples == null) return None
    Some(Media("wav", rate, channels, 2, samples))
  }

  // ----------------------------------------------------------------- GIF

  /** GIF-variant LZW compress of an index stream (codes packed LSB-first,
    * clear emitted up front and on dictionary overflow at 4096, variable
    * code width growing when the just-added entry value reaches
    * `1 << codeSize` — the growth point the decoder mirrors one entry
    * behind).
    */
  private def lzwCompress(minCodeSize: Int, idx: Array[Byte]): Array[Byte] = {
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new ByteArrayOutputStream()
    var bitBuf = 0L; var nBits = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << nBits; nBits += codeSize
      while (nBits >= 8) {
        out.write((bitBuf & 0xff).toInt); bitBuf >>= 8; nBits -= 8
      }
    }
    // dict over (prefixCode << 8 | nextByte) — prefix codes < 4096 so the
    // packed key is unique
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = end + 1
    put(clear)
    if (idx.nonEmpty) {
      var prefix: Int = idx(0) & 0xff
      var i = 1
      while (i < idx.length) {
        val k = idx(i) & 0xff
        val key: Integer = (prefix << 8) | k
        val hit = dict.get(key)
        if (hit != null) prefix = hit
        else {
          put(prefix)
          dict.put(key, next)
          // grow when the entry VALUE just added reaches the width limit —
          // the decoder adds the same value one code later and grows there
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          next += 1
          if (next == 4096) {
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            codeSize = minCodeSize + 1
            next = end + 1
          }
          prefix = k
        }
        i += 1
      }
      put(prefix)
    }
    put(end)
    if (nBits > 0) out.write((bitBuf & 0xff).toInt)
    out.toByteArray
  }

  /** GIF-variant LZW decompress to exactly `n` index values. None on any
    * malformed stream (bad code, truncation, overrun).
    */
  private def lzwDecompress(minCodeSize: Int, data: Array[Byte], n: Int): Option[Array[Byte]] = {
    if (minCodeSize < 2 || minCodeSize > 8) return None
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Byte](n)
    var outLen = 0
    // dict as prefix-link arrays: suffix byte + previous code per entry
    val suffix = new Array[Byte](4096)
    val prev = new Array[Int](4096)
    var i = 0
    while (i < clear) { suffix(i) = i.toByte; prev(i) = -1; i += 1 }
    var next = end + 1
    var codeSize = minCodeSize + 1
    var bitBuf = 0L; var nBits = 0; var pos = 0
    var prevCode = -1
    val stack = new Array[Byte](4096)
    def emit(code: Int): Int = { // returns first byte of the expansion
      var d = 0; var c = code
      while (c >= 0) { stack(d) = suffix(c); d += 1; c = prev(c) }
      val first = stack(d - 1)
      while (d > 0 && outLen < n) { d -= 1; out(outLen) = stack(d); outLen += 1 }
      first & 0xff
    }
    while (outLen < n) {
      while (nBits < codeSize) {
        if (pos >= data.length) return None // truncated
        bitBuf |= (data(pos) & 0xffL) << nBits; nBits += 8; pos += 1
      }
      val code = (bitBuf & ((1 << codeSize) - 1)).toInt
      bitBuf >>= codeSize; nBits -= codeSize
      if (code == clear) {
        next = end + 1; codeSize = minCodeSize + 1; prevCode = -1
      } else if (code == end) {
        return if (outLen == n) Some(out) else None
      } else if (prevCode < 0) {
        if (code >= clear) return None
        emit(code); prevCode = code
      } else if (code < next && code != clear && code != end) {
        val first = emit(code)
        if (next < 4096) {
          suffix(next) = first.toByte; prev(next) = prevCode
          next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prevCode = code
      } else if (code == next && next < 4096) {
        // KwKwK: expansion is str(prev) + first(str(prev))
        var d = 0; var c = prevCode
        while (c >= 0) { stack(d) = suffix(c); d += 1; c = prev(c) }
        val first = stack(d - 1)
        suffix(next) = first; prev(next) = prevCode
        next += 1
        emit(next - 1)
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prevCode = code
      } else return None // out-of-range code
    }
    Some(out)
  }

  /** GIF interlace row order (the four passes of GIF89a appendix E):
    * `rows(d)` is the display row carried at stream position `d`.
    */
  private def interlaceRows(h: Int): Array[Int] = {
    val rows = new Array[Int](h)
    var d = 0
    Array((0, 8), (4, 8), (2, 4), (1, 2)).foreach { case (s, st) =>
      var y = s
      while (y < h) { rows(d) = y; d += 1; y += st }
    }
    rows
  }

  /** Encode index-pixel frames as an animated GIF89a: 256-entry global
    * color table (`palette` = 768 RGB bytes), one full-rect image per
    * frame, per-frame Graphic Control Extension carrying `delayCs`
    * centiseconds, LZW min code size 8. `interlaceFor(f)` writes frame `f`
    * in the four-pass interlaced row order so decoders must de-interlace.
    */
  def encodeGif(w: Int, h: Int, palette: Array[Byte],
      frames: Seq[Array[Byte]], delayCs: Int = 4,
      interlaceFor: Int => Boolean = _ => false): Array[Byte] = {
    require(palette.length == 768, s"palette length ${palette.length} != 768")
    frames.foreach(f =>
      require(f.length == w * h, s"frame length ${f.length} != $w*$h"))
    val out = new ByteArrayOutputStream()
    out.write("GIF89a".getBytes(US_ASCII))
    out.write(le16(w)); out.write(le16(h))
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0); out.write(0)
    out.write(palette)
    if (frames.length > 1) { // NETSCAPE loop extension, loop forever
      out.write(0x21); out.write(0xff); out.write(11)
      out.write("NETSCAPE2.0".getBytes(US_ASCII))
      out.write(3); out.write(1); out.write(le16(0)); out.write(0)
    }
    frames.zipWithIndex.foreach { case (idx, f) =>
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(0); out.write(le16(delayCs)); out.write(0); out.write(0)
      out.write(0x2c) // image descriptor, full rect
      out.write(le16(0)); out.write(le16(0))
      out.write(le16(w)); out.write(le16(h))
      val interlaced = interlaceFor(f)
      out.write(if (interlaced) 0x40 else 0x00)
      val rowOrder =
        if (interlaced) interlaceRows(h) else Array.tabulate(h)(identity)
      val stream = new Array[Byte](w * h)
      var d = 0
      rowOrder.foreach { y =>
        System.arraycopy(idx, y * w, stream, d, w); d += w
      }
      out.write(8) // LZW min code size
      val lzw = lzwCompress(8, stream)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** Decode every frame of a GIF: LZW decompress, de-interlace when
    * flagged, resolve indices through the active (local-else-global) color
    * table — each frame an independent RGB [[Media]] of its own rect (no
    * inter-frame compositing: disposal/transparency blending is a player
    * concern, not a data-pipeline one). None for malformed streams,
    * out-of-palette indices, or hostile declared dimensions.
    */
  def decodeGifFrames(b: Array[Byte]): Option[Seq[Media]] = {
    if (b.length < 13 || !(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
    val sw = readLe16(b, 6); val sh = readLe16(b, 8)
    if (sw <= 0 || sh <= 0 || sw > MaxDim || sh > MaxDim) return None
    val packed = b(10) & 0xff
    var i = 13
    var gct: Array[Byte] = null
    var gctSize = 0
    if ((packed & 0x80) != 0) {
      gctSize = 1 << ((packed & 7) + 1)
      if (i + gctSize * 3 > b.length) return None
      gct = java.util.Arrays.copyOfRange(b, i, i + gctSize * 3)
      i += gctSize * 3
    }
    val frames = Seq.newBuilder[Media]
    var done = false
    while (!done) {
      if (i >= b.length) return None // missing trailer
      (b(i) & 0xff) match {
        case 0x3b => done = true
        case 0x21 => // extension: label + sub-blocks, skipped
          i += 2
          var blockLen = if (i < b.length) b(i) & 0xff else return None
          while (blockLen != 0) {
            i += 1 + blockLen
            blockLen = if (i < b.length) b(i) & 0xff else return None
          }
          i += 1
        case 0x2c =>
          if (i + 10 > b.length) return None
          val fw = readLe16(b, i + 5); val fh = readLe16(b, i + 7)
          val fPacked = b(i + 9) & 0xff
          i += 10
          if (fw <= 0 || fh <= 0 || fw > MaxDim || fh > MaxDim ||
            fw.toLong * fh * 3 > MaxPixelBytes) return None
          var pal = gct; var palSize = gctSize
          if ((fPacked & 0x80) != 0) {
            palSize = 1 << ((fPacked & 7) + 1)
            if (i + palSize * 3 > b.length) return None
            pal = java.util.Arrays.copyOfRange(b, i, i + palSize * 3)
            i += palSize * 3
          }
          if (pal == null) return None // no color table at all
          if (i >= b.length) return None
          val minCode = b(i) & 0xff
          i += 1
          val lzw = new ByteArrayOutputStream()
          var blockLen = if (i < b.length) b(i) & 0xff else return None
          while (blockLen != 0) {
            if (i + 1 + blockLen > b.length) return None
            lzw.write(b, i + 1, blockLen)
            i += 1 + blockLen
            blockLen = if (i < b.length) b(i) & 0xff else return None
          }
          i += 1
          val idx = lzwDecompress(minCode, lzw.toByteArray, fw * fh) match {
            case Some(s) => s
            case None => return None
          }
          val rowOrder = if ((fPacked & 0x40) != 0) interlaceRows(fh)
            else Array.tabulate(fh)(identity)
          val pix = new Array[Int](fw * fh * 3)
          var srcRow = 0
          while (srcRow < fh) {
            val dstY = rowOrder(srcRow)
            var x = 0
            while (x < fw) {
              val v = idx(srcRow * fw + x) & 0xff
              if (v >= palSize) return None // out-of-palette index
              val d = (dstY * fw + x) * 3
              pix(d) = pal(v * 3) & 0xff
              pix(d + 1) = pal(v * 3 + 1) & 0xff
              pix(d + 2) = pal(v * 3 + 2) & 0xff
              x += 1
            }
            srcRow += 1
          }
          frames += Media("gif", fw, fh, 3, pix)
        case _ => return None // unknown block type
      }
    }
    val fs = frames.result()
    if (fs.isEmpty) None else Some(fs)
  }

  /** First frame of a GIF as a still image. */
  def decodeGif(b: Array[Byte]): Option[Media] =
    decodeGifFrames(b).map(_.head)

  // ------------------------------------------------------------ dispatch

  /** Decode any supported payload by magic bytes. */
  def decode(b: Array[Byte]): Option[Media] =
    if (b == null || b.length < 4) None
    else if (b.length >= 8 && b.take(8).sameElements(PngSig)) decodePng(b)
    else if (b(0) == 'B' && b(1) == 'M') decodeBmp(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
      decodeGif(b)
    else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegCodec.decodeJpeg(b)
    else if (b.take(4).sameElements("RIFF".getBytes(US_ASCII))) decodeWav(b)
    else None

  /** Nearest-neighbor resample of a decoded image to (dw, dh) — the real
    * pixel resize behind [[Multimodal.resize]]. Channel-preserving; source
    * index for output (x, y) is (x*w/dw, y*h/dh), the standard floor map.
    */
  def resizeNearest(m: Media, dw: Int, dh: Int): Media = {
    require(m.kind != "wav", "resize is an image operation")
    val c = m.channels
    val out = new Array[Int](dw * dh * c)
    var y = 0
    while (y < dh) {
      val sy = (y.toLong * m.height / dh).toInt
      var x = 0
      while (x < dw) {
        val sx = (x.toLong * m.width / dw).toInt
        var k = 0
        while (k < c) {
          out((y * dw + x) * c + k) = m.values((sy * m.width + sx) * c + k)
          k += 1
        }
        x += 1
      }
      y += 1
    }
    Media(m.kind, dw, dh, c, out)
  }
}
