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
}
