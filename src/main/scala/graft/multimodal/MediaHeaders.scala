package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII

/** REAL container-format metadata codecs — PNG / JPEG / GIF / BMP / WAV
  * header encode + parse in pure JVM byte arithmetic (no media libraries).
  *
  * This replaces the "decode is a stub" caveat for the metadata half of the
  * multimodal surface: dimension/sample-rate extraction over binary
  * payloads is what a crawl-scale media pipeline runs FIRST (filter by
  * size/aspect/duration before any expensive pixel decode), and these are
  * the real wire formats — PNG IHDR with CRC-32-checked chunks (ISO 15948
  * §5.3), JPEG SOF0 segment scan (ITU T.81 §B.2.2), GIF logical screen
  * descriptor, BMP BITMAPINFOHEADER, RIFF/WAVE fmt chunk.
  *
  * Scale shape: `parse` is a per-row function over the first bytes of a
  * payload, used inside the same `mapPartitions` batch plumbing as
  * [[Multimodal.extractFeatures]] — a pure map stage, no shuffle. Full
  * payload decode (PNG IDAT inflate + unfilter, BMP pixel arrays, WAV PCM)
  * lives in [[PixelCodec]].
  */
object MediaHeaders {

  /** Parsed metadata: for images (a, b) = (width, height); for WAV
    * (a, b) = (sample rate, channels).
    */
  final case class MediaInfo(kind: String, a: Int, b: Int)

  // ------------------------------------------------------------- helpers

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

  private def readBe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ------------------------------------------------------------- encode

  private val PngSig =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  /** Minimal valid PNG: signature + IHDR (with real CRC-32) + IEND. */
  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      out.write(be32(body.length))
      val tb = tag.getBytes(US_ASCII)
      val crc = new java.util.zip.CRC32()
      crc.update(tb); crc.update(body)
      out.write(tb); out.write(body); out.write(be32(crc.getValue.toInt))
    }
    // IHDR: w, h, bit depth 8, color type 2 (truecolor), deflate, none, none
    chunk("IHDR", be32(w) ++ be32(h) ++ Array[Byte](8, 2, 0, 0, 0))
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Minimal valid JPEG: SOI, APP0/JFIF, SOF0 (carries dimensions), EOI. */
  def jpegBytes(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0xff, 0xd8).map(_.toByte)) // SOI
    val jfif = "JFIF".getBytes(US_ASCII) ++ Array[Byte](0, 1, 1, 0) ++
      le16(1).reverse ++ le16(1).reverse ++ Array[Byte](0, 0)
    out.write(Array(0xff, 0xe0).map(_.toByte)) // APP0
    out.write(be32(jfif.length + 2).drop(2))   // segment length (16-bit BE)
    out.write(jfif)
    // SOF0: precision 8, height, width, 3 components (id, sampling, qtable)
    val sof = Array[Byte](8) ++ be32(h).drop(2) ++ be32(w).drop(2) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    out.write(Array(0xff, 0xc0).map(_.toByte))
    out.write(be32(sof.length + 2).drop(2))
    out.write(sof)
    out.write(Array(0xff, 0xd9).map(_.toByte)) // EOI
    out.toByteArray
  }

  /** GIF89a header: logical screen descriptor carries dimensions (LE16). */
  def gifBytes(w: Int, h: Int): Array[Byte] =
    "GIF89a".getBytes(US_ASCII) ++ le16(w) ++ le16(h) ++
      Array[Byte](0, 0, 0) ++ Array[Byte](0x3b) // trailer

  /** BMP with BITMAPINFOHEADER: signed-LE32 dimensions at offsets 18/22. */
  def bmpBytes(w: Int, h: Int): Array[Byte] =
    "BM".getBytes(US_ASCII) ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      Array.fill[Byte](24)(0)

  /** RIFF/WAVE with a canonical fmt chunk (PCM): rate LE32 at 24,
    * channels LE16 at 22.
    */
  def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val blockAlign = channels * 2
    "RIFF".getBytes(US_ASCII) ++ le32(36) ++ "WAVE".getBytes(US_ASCII) ++
      "fmt ".getBytes(US_ASCII) ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate * blockAlign) ++ le16(blockAlign) ++
      le16(16) ++ "data".getBytes(US_ASCII) ++ le32(0)
  }

  // -------------------------------------------------------------- parse

  private def isPng(b: Array[Byte]) =
    b.length >= 33 && b.take(8).sameElements(PngSig)

  private def isJpeg(b: Array[Byte]) =
    b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

  private def isGif(b: Array[Byte]) =
    b.length >= 13 && (b.take(6).sameElements("GIF87a".getBytes(US_ASCII)) ||
      b.take(6).sameElements("GIF89a".getBytes(US_ASCII)))

  private def isBmp(b: Array[Byte]) =
    b.length >= 26 && b(0) == 'B' && b(1) == 'M'

  private def isWav(b: Array[Byte]) =
    b.length >= 28 && b.take(4).sameElements("RIFF".getBytes(US_ASCII)) &&
      b.slice(8, 12).sameElements("WAVE".getBytes(US_ASCII))

  /** JPEG segment scan for the first SOFn (baseline/progressive) marker. */
  private def parseJpeg(b: Array[Byte]): Option[MediaInfo] = {
    var i = 2
    while (i + 4 <= b.length) {
      if ((b(i) & 0xff) != 0xff) return None
      val marker = b(i + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) return None // EOI / SOS: no SOF seen
      val len = readBe16(b, i + 2)
      val isSof = marker >= 0xc0 && marker <= 0xcf &&
        marker != 0xc4 && marker != 0xc8 && marker != 0xcc
      if (isSof) {
        if (i + 9 > b.length) return None
        return Some(MediaInfo("jpeg", readBe16(b, i + 7), readBe16(b, i + 5)))
      }
      i += 2 + len
    }
    None
  }

  /** PNG chunk walk: verify the IHDR CRC, then read dimensions. */
  private def parsePng(b: Array[Byte]): Option[MediaInfo] = {
    val len = readBe32(b, 8)
    val tag = new String(b, 12, 4, US_ASCII)
    if (tag != "IHDR" || len < 13 || b.length < 16 + len + 4) return None
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 4 + len)
    if (crc.getValue.toInt != readBe32(b, 16 + len)) return None
    Some(MediaInfo("png", readBe32(b, 16), readBe32(b, 20)))
  }

  /** Dispatch on magic bytes; None for unrecognized/truncated payloads. */
  def parse(b: Array[Byte]): Option[MediaInfo] =
    if (b == null) None
    else if (isPng(b)) parsePng(b)
    else if (isJpeg(b)) parseJpeg(b)
    else if (isGif(b)) Some(MediaInfo("gif", readLe16(b, 6), readLe16(b, 8)))
    else if (isBmp(b)) Some(MediaInfo("bmp", readLe32(b, 18), readLe32(b, 22)))
    else if (isWav(b)) Some(MediaInfo("wav", readLe32(b, 24), readLe16(b, 22)))
    else None

  // ------------------------------------------- compressed A/V containers
  // MP4 (ISO-BMFF box walk), MP3 (MPEG-1 Layer III frame header), FLAC
  // (STREAMINFO block) — the three containers a crawled A/V corpus is
  // actually made of. Same discipline as the image/WAV codecs above: real
  // wire formats from the public specs, fixture encoders for the oracle.

  /** mp4: duration in ms (timescale-normalized) + track pixel dims.
    * mp3: bitrate kbps + sample rate. flac: sample rate, channels, total
    * samples.
    */
  final case class AvInfo(kind: String, a: Long, b: Long, c: Long)

  /** Minimal valid ISO-BMFF file: ftyp + moov(mvhd + trak(tkhd)).
    * mvhd carries (timescale, duration-in-ticks); tkhd carries 16.16
    * fixed-point width/height — the fields every indexer needs.
    */
  def mp4Bytes(timescale: Int, durationTicks: Int, w: Int, h: Int): Array[Byte] = {
    def box(tag: String, body: Array[Byte]): Array[Byte] =
      be32(8 + body.length) ++ tag.getBytes(US_ASCII) ++ body
    val ftyp = box("ftyp",
      "isom".getBytes(US_ASCII) ++ be32(512) ++
        "isom".getBytes(US_ASCII) ++ "mp41".getBytes(US_ASCII))
    val mvhd = box("mvhd",
      be32(0) ++ be32(0) ++ be32(0) ++ be32(timescale) ++ be32(durationTicks) ++
        be32(0x00010000) ++ Array[Byte](0x01, 0x00) ++ new Array[Byte](10) ++
        identityMatrix ++ new Array[Byte](24) ++ be32(2))
    val tkhd = box("tkhd",
      be32(7) ++ be32(0) ++ be32(0) ++ be32(1) ++ be32(0) ++
        be32(durationTicks) ++ new Array[Byte](8) ++
        new Array[Byte](2) ++ new Array[Byte](2) ++ new Array[Byte](2) ++
        new Array[Byte](2) ++ identityMatrix ++
        be32(w << 16) ++ be32(h << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    ftyp ++ moov
  }

  private def identityMatrix: Array[Byte] =
    be32(0x00010000) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000)

  /** MPEG-1 Layer III bitrate table (kbps, index 1–14) and sample-rate
    * table — the published header tables.
    */
  val Mp3Bitrates: Array[Int] =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  val Mp3SampleRates: Array[Int] = Array(44100, 48000, 32000)

  /** One MPEG-1 Layer III frame header (0xFFFB sync, no CRC) preceded by
    * an empty ID3v2 tag — the shape real MP3 files open with.
    */
  def mp3Bytes(bitrateIdx: Int, srIdx: Int): Array[Byte] = {
    require(bitrateIdx >= 1 && bitrateIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val id3 = "ID3".getBytes(US_ASCII) ++ Array[Byte](3, 0, 0, 0, 0, 0, 0)
    id3 ++ Array[Byte](0xff.toByte, 0xfb.toByte,
      ((bitrateIdx << 4) | (srIdx << 2)).toByte, 0)
  }

  /** FLAC: "fLaC" + a STREAMINFO metadata block with the packed
    * (rate 20b | channels-1 3b | bps-1 5b | total-samples 36b) field.
    */
  def flacBytes(sampleRate: Int, channels: Int, totalSamples: Long): Array[Byte] = {
    val packed = (sampleRate.toLong << 44) | ((channels - 1).toLong << 41) |
      (15L << 36) /* bps-1 = 15 → 16-bit */ | (totalSamples & ((1L << 36) - 1))
    val packedBytes = (0 until 8).map(i => ((packed >>> (56 - 8 * i)) & 0xff).toByte)
    "fLaC".getBytes(US_ASCII) ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ // last-block flag, type 0, len 34
      le16(4096).reverse ++ le16(4096).reverse ++ // min/max blocksize (BE)
      new Array[Byte](6) ++ // min/max frame size (unknown)
      packedBytes.toArray ++ new Array[Byte](16) // MD5 unset
  }

  private def isMp4(b: Array[Byte]) =
    b.length >= 12 && new String(b, 4, 4, US_ASCII) == "ftyp"
  private def isMp3(b: Array[Byte]) =
    (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') ||
      (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xe0) == 0xe0)
  private def isFlac(b: Array[Byte]) =
    b.length >= 42 && new String(b, 0, 4, US_ASCII) == "fLaC"

  /** ISO-BMFF box walk: find moov, then mvhd (timescale, duration) and the
    * first tkhd (16.16 width/height). Duration is normalized to ms with
    * integer math: `ticks * 1000 / timescale`.
    */
  private def parseMp4(b: Array[Byte]): Option[AvInfo] = {
    def findBox(tag: String, from: Int, to: Int): Option[(Int, Int)] = {
      var i = from
      while (i + 8 <= to) {
        val size = readBe32(b, i)
        if (size < 8 || i + size > to) return None
        if (new String(b, i + 4, 4, US_ASCII) == tag) return Some((i + 8, i + size))
        i += size
      }
      None
    }
    // Total over hostile crawl bytes: a box smaller than its fixed field
    // layout (mvhd needs 20 body bytes through `duration`, tkhd 84 through
    // `height`) or a zero timescale yields None, never a throw.
    for {
      (moovS, moovE) <- findBox("moov", 0, b.length)
      (mvhdS, mvhdE) <- findBox("mvhd", moovS, moovE)
      if mvhdE - mvhdS >= 20
      (trakS, trakE) <- findBox("trak", moovS, moovE)
      (tkhdS, tkhdE) <- findBox("tkhd", trakS, trakE)
      if tkhdE - tkhdS >= 84
      timescale = readBe32(b, mvhdS + 12).toLong
      if timescale != 0L
    } yield {
      val ticks = readBe32(b, mvhdS + 16).toLong
      val w = readBe32(b, tkhdS + 76) >>> 16
      val h = readBe32(b, tkhdS + 80) >>> 16
      AvInfo("mp4", ticks * 1000L / timescale, w.toLong, h.toLong)
    }
  }

  /** Skip the ID3v2 tag when present (syncsafe size; bare frame streams
    * start at 0), then decode the first frame header's bitrate/sample-rate
    * indices through the published tables.
    */
  private def parseMp3(b: Array[Byte]): Option[AvInfo] = {
    val off =
      if (b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
      else 0
    if (off + 4 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return None
    val version = (b(off + 1) >> 3) & 3
    val layer = (b(off + 1) >> 1) & 3
    if (version != 3 || layer != 1) return None // MPEG-1 Layer III only
    val brIdx = (b(off + 2) >> 4) & 15
    val srIdx = (b(off + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    Some(AvInfo("mp3", Mp3Bitrates(brIdx).toLong, Mp3SampleRates(srIdx).toLong, 0L))
  }

  /** STREAMINFO unpack: rate 20b | channels-1 3b | bps-1 5b | samples 36b. */
  private def parseFlac(b: Array[Byte]): Option[AvInfo] = {
    if ((b(4) & 0x7f) != 0) return None // first block must be STREAMINFO
    var packed = 0L
    var i = 0
    while (i < 8) { packed = (packed << 8) | (b(18 + i) & 0xffL); i += 1 }
    val rate = packed >>> 44
    val channels = ((packed >>> 41) & 0x7) + 1
    val samples = packed & ((1L << 36) - 1)
    Some(AvInfo("flac", rate, channels, samples))
  }

  /** Compressed-container dispatch (mp4/mp3/flac). */
  def parseAv(b: Array[Byte]): Option[AvInfo] =
    if (b == null) None
    else if (isMp4(b)) parseMp4(b)
    else if (isMp3(b)) parseMp3(b)
    else if (isFlac(b)) parseFlac(b)
    else None
}
