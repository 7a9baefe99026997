package graft

import graft.multimodal.MediaHeaders
import graft.multimodal.MediaHeaders.MediaInfo

class MediaHeadersSpec extends SparkSpec {

  test("encode/parse identity for all five formats") {
    assert(MediaHeaders.parse(MediaHeaders.pngBytes(640, 480)) ===
      Some(MediaInfo("png", 640, 480)))
    assert(MediaHeaders.parse(MediaHeaders.jpegBytes(1920, 1080)) ===
      Some(MediaInfo("jpeg", 1920, 1080)))
    assert(MediaHeaders.parse(MediaHeaders.gifBytes(320, 200)) ===
      Some(MediaInfo("gif", 320, 200)))
    assert(MediaHeaders.parse(MediaHeaders.bmpBytes(800, 600)) ===
      Some(MediaInfo("bmp", 800, 600)))
    assert(MediaHeaders.parse(MediaHeaders.wavBytes(44100, 2)) ===
      Some(MediaInfo("wav", 44100, 2)))
  }

  test("large dimensions survive 16/32-bit boundaries") {
    assert(MediaHeaders.parse(MediaHeaders.pngBytes(65535, 70000)) ===
      Some(MediaInfo("png", 65535, 70000)))
    assert(MediaHeaders.parse(MediaHeaders.jpegBytes(65535, 65535)) ===
      Some(MediaInfo("jpeg", 65535, 65535)))
    assert(MediaHeaders.parse(MediaHeaders.gifBytes(65535, 1)) ===
      Some(MediaInfo("gif", 65535, 1)))
  }

  test("corrupt and truncated payloads parse to None, never throw") {
    val png = MediaHeaders.pngBytes(64, 64)
    val badCrc = png.clone(); badCrc(30) = (badCrc(30) ^ 0x5a).toByte
    assert(MediaHeaders.parse(badCrc) === None)
    for (b <- Seq(png, MediaHeaders.jpegBytes(9, 9), MediaHeaders.gifBytes(9, 9),
        MediaHeaders.bmpBytes(9, 9), MediaHeaders.wavBytes(8000, 1));
        n <- Seq(0, 1, 3, 7, 12)) {
      assert(MediaHeaders.parse(b.take(n)).isEmpty ||
        n >= 13) // tiny prefixes must never be misread as complete headers
    }
    assert(MediaHeaders.parse(Array[Byte](1, 2, 3)) === None)
    assert(MediaHeaders.parse("plain text bytes".getBytes("UTF-8")) === None)
    assert(MediaHeaders.parse(null) === None)
  }

  test("JPEG with no SOF before SOS yields None") {
    // SOI + APP0-only + SOS
    val b = Array(0xff, 0xd8, 0xff, 0xe0, 0x00, 0x04, 0x00, 0x00,
      0xff, 0xda).map(_.toByte)
    assert(MediaHeaders.parse(b) === None)
  }

  test("A/V containers: encode∘parse identity for mp4/mp3/flac") {
    import MediaHeaders.AvInfo
    // mp4: ticks→ms uses integer division by the real timescale
    assert(MediaHeaders.parseAv(MediaHeaders.mp4Bytes(600, 90000, 1920, 1080))
      === Some(AvInfo("mp4", 90000L * 1000 / 600, 1920, 1080)))
    assert(MediaHeaders.parseAv(MediaHeaders.mp4Bytes(1000, 12345, 320, 240))
      === Some(AvInfo("mp4", 12345, 320, 240)))
    // mp3: table lookups for every (bitrate, sample-rate) index pair
    for (br <- 1 to 14; sr <- 0 to 2)
      assert(MediaHeaders.parseAv(MediaHeaders.mp3Bytes(br, sr)) ===
        Some(AvInfo("mp3", MediaHeaders.Mp3Bitrates(br).toLong,
          MediaHeaders.Mp3SampleRates(sr).toLong, 0L)))
    // flac: 20-bit rate / 3-bit channels / 36-bit sample-count unpack
    assert(MediaHeaders.parseAv(MediaHeaders.flacBytes(96000, 8, (1L << 36) - 1))
      === Some(AvInfo("flac", 96000, 8, (1L << 36) - 1)))
    assert(MediaHeaders.parseAv(MediaHeaders.flacBytes(8000, 1, 0))
      === Some(AvInfo("flac", 8000, 1, 0)))
  }

  test("A/V containers: truncated/corrupt payloads parse to None, never throw") {
    val mp4 = MediaHeaders.mp4Bytes(1000, 5000, 640, 480)
    for (n <- Seq(0, 4, 11, 24, 40)) // box walk must bound-check
      assert(MediaHeaders.parseAv(mp4.take(n)).isEmpty)
    // box size smaller than header ⇒ walk stops instead of looping
    val badSize = mp4.clone()
    badSize(24 + 3) = 2 // moov size → 2
    assert(MediaHeaders.parseAv(badSize) === None)
    // mp3: reserved bitrate index 15 and sample-rate index 3 are refused
    val mp3 = MediaHeaders.mp3Bytes(1, 0)
    val badBr = mp3.clone(); badBr(12) = 0xf0.toByte
    assert(MediaHeaders.parseAv(badBr) === None)
    // mp3 whose ID3 size points past the payload
    val shortTag = mp3.clone(); shortTag(9) = 0x7f
    assert(MediaHeaders.parseAv(shortTag) === None)
    // bare MP3 frame (no ID3 tag) is still recognized
    assert(MediaHeaders.parseAv(MediaHeaders.mp3Bytes(5, 1).drop(10)) ===
      Some(MediaHeaders.AvInfo("mp3", MediaHeaders.Mp3Bitrates(5).toLong,
        MediaHeaders.Mp3SampleRates(1).toLong, 0L)))
    // flac whose first block is not STREAMINFO
    val flac = MediaHeaders.flacBytes(44100, 2, 1000)
    val badBlock = flac.clone(); badBlock(4) = 0x84.toByte
    assert(MediaHeaders.parseAv(badBlock) === None)
    assert(MediaHeaders.parseAv(null) === None)
    assert(MediaHeaders.parseAv("not media".getBytes("UTF-8")) === None)
  }
}
