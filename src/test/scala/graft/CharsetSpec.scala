package graft

import graft.multimodal.Charset
import graft.multimodal.Charset.CharsetInfo

/** RFC 3629 edge cases for the hand-rolled UTF-8 validator — the cases a
  * CharsetDecoder would hide behind unspecified replacement behavior.
  */
class CharsetSpec extends SparkSpec {

  private def utf8(s: String) = s.getBytes("UTF-8")

  test("ascii / valid multibyte / empty classify correctly") {
    assert(Charset.info(utf8("plain ascii")) === CharsetInfo("ascii", 11, 0))
    assert(Charset.info(utf8("café")) === CharsetInfo("utf8", 4, 0))
    assert(Charset.info(utf8("中文")) === CharsetInfo("utf8", 2, 0))
    // 4-byte astral plane (U+1F600)
    assert(Charset.info(utf8(new String(Character.toChars(0x1f600)))) ===
      CharsetInfo("utf8", 1, 0))
    assert(Charset.info(Array.empty[Byte]) === CharsetInfo("ascii", 0, 0))
  }

  test("boundary lead bytes accepted: C2, DF, E0 A0, ED 9F, F0 90, F4 8F") {
    for (bytes <- Seq(
        Array(0xc2, 0x80), Array(0xdf, 0xbf),
        Array(0xe0, 0xa0, 0x80), Array(0xed, 0x9f, 0xbf),
        Array(0xf0, 0x90, 0x80, 0x80), Array(0xf4, 0x8f, 0xbf, 0xbf)))
      assert(Charset.info(bytes.map(_.toByte)) === CharsetInfo("utf8", 1, 0))
  }

  test("overlongs, surrogates, and out-of-range leads are invalid") {
    // C0/C1 overlong leads; E0 80 overlong; ED A0 surrogate; F4 90 > U+10FFFF
    for ((bytes, bad) <- Seq(
        (Array(0xc0, 0xaf), 2L),       // C0 illegal, AF resyncs as bad cont
        (Array(0xc1, 0xbf), 2L),
        (Array(0xe0, 0x80, 0x80), 3L), // overlong 3-byte
        (Array(0xed, 0xa0, 0x80), 3L), // surrogate D800
        (Array(0xf4, 0x90, 0x80, 0x80), 4L), // above U+10FFFF
        (Array(0xf5, 0x80), 2L)))      // F5 never a legal lead
      assert(Charset.info(bytes.map(_.toByte)) ===
        CharsetInfo("invalid", 0, bad), bytes.toSeq)
  }

  test("truncation and resync: scanning resumes at the next byte") {
    // truncated 3-byte lead at end: 1 bad, preceding ascii intact
    assert(Charset.info("ab".getBytes("UTF-8") ++ Array(0xe4.toByte)) ===
      CharsetInfo("invalid", 2, 1))
    // lone continuation in the middle: 1 bad, both neighbors decode
    assert(Charset.info(Array('a'.toByte, 0x80.toByte, 'b'.toByte)) ===
      CharsetInfo("invalid", 2, 1))
    // broken pair then a valid 2-byte char: resync finds it
    assert(Charset.info(Array(0xc3.toByte, 'x'.toByte, 0xc3.toByte, 0xa9.toByte))
      === CharsetInfo("invalid", 2, 1))
  }
}
