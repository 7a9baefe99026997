package graft.multimodal

/** Charset sniffing for crawled byte payloads — the pass that decides, per
  * document, whether bytes are ASCII, valid UTF-8, or mojibake before any
  * text operator runs (real crawl pipelines route on exactly this
  * three-way split; invalid docs go to a transcode/quarantine lane).
  *
  * The validator is a hand-rolled UTF-8 state machine (RFC 3629: 1–4 byte
  * sequences, no overlongs, no surrogates, max U+10FFFF) rather than a
  * `CharsetDecoder`, so the result is fully specified — each byte that
  * cannot begin or continue a valid sequence counts as one `bad` byte and
  * scanning resumes at the next byte. Note this is a per-byte resync
  * policy (one `bad` count per rejected byte, including valid
  * continuation prefixes of a truncated sequence), which is stricter
  * bookkeeping than the Unicode/WHATWG maximal-subpart replacement
  * policy (one replacement per truncated sequence); the three-way
  * `kind` split is identical under both.
  * Runs inside the payload codec task ([[Multimodal]] discipline: bytes
  * never shuffle, only the per-doc stat row does).
  */
object Charset {

  /** (kind, decoded codepoints, invalid bytes). kind ∈ ascii|utf8|invalid. */
  final case class CharsetInfo(kind: String, chars: Long, bad: Long)

  def info(b: Array[Byte]): CharsetInfo = {
    var i = 0
    var chars = 0L
    var bad = 0L
    var ascii = true
    val n = b.length
    while (i < n) {
      val b0 = b(i) & 0xff
      if (b0 < 0x80) { chars += 1; i += 1 }
      else {
        ascii = false
        val len =
          if (b0 >= 0xc2 && b0 <= 0xdf) 2
          else if (b0 >= 0xe0 && b0 <= 0xef) 3
          else if (b0 >= 0xf0 && b0 <= 0xf4) 4
          else 0 // continuation byte or illegal lead (0xc0/0xc1/0xf5+)
        def cont(k: Int): Boolean =
          i + k < n && (b(i + k) & 0xc0) == 0x80
        val ok = len match {
          case 2 => cont(1)
          case 3 => cont(1) && cont(2) && {
            val b1 = b(i + 1) & 0xff
            // overlongs (E0 80-9F) and surrogates (ED A0-BF) are invalid
            !(b0 == 0xe0 && b1 < 0xa0) && !(b0 == 0xed && b1 > 0x9f)
          }
          case 4 => cont(1) && cont(2) && cont(3) && {
            val b1 = b(i + 1) & 0xff
            !(b0 == 0xf0 && b1 < 0x90) && !(b0 == 0xf4 && b1 > 0x8f)
          }
          case _ => false
        }
        if (ok) { chars += 1; i += len }
        else { bad += 1; i += 1 }
      }
    }
    CharsetInfo(
      if (bad > 0) "invalid" else if (ascii) "ascii" else "utf8",
      chars, bad)
  }
}
