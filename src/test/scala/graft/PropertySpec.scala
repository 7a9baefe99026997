package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.graftx.{RollingHash, SketchKernels, SortedIntersectSize}
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (SURVEY §5.4) over the native kernels and the
  * type-mapping round trip. Generators are driven directly with fixed seeds
  * (the scalatest-scalacheck bridge isn't in the offline cache), so runs are
  * deterministic: 300 cases per property.
  */
class PropertySpec extends SparkSpec {

  private val params = Gen.Parameters.default
  private def cases[A](g: Gen[A], n: Int = 300): Seq[A] =
    (0 until n).flatMap(i => g.apply(params, Seed(i.toLong)))

  private val word: Gen[String] = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text: Gen[String] = Gen.nonEmptyListOf(word).map(_.mkString(" "))

  test("minhash signature: length k, deterministic") {
    for (((t, n), k) <- cases(Gen.zip(Gen.zip(text, Gen.choose(1, 4)), Gen.choose(1, 32)))) {
      val s1 = SketchKernels.minHashSig(UTF8String.fromString(t), n, k)
      val s2 = SketchKernels.minHashSig(UTF8String.fromString(t), n, k)
      assert(s1.length == k && s1.sameElements(s2), s"text=$t n=$n k=$k")
    }
  }

  test("simhash is deterministic") {
    for ((t, n) <- cases(Gen.zip(text, Gen.choose(1, 3)))) {
      assert(SketchKernels.simHash(UTF8String.fromString(t), n) ==
        SketchKernels.simHash(UTF8String.fromString(t), n))
    }
  }

  test("sorted intersect size: commutative, bounded, exact vs Set intersection") {
    val sortedArr = Gen.listOf(Gen.choose(-1000L, 1000L)).map(_.distinct.sorted.toArray)
    for ((a, b) <- cases(Gen.zip(sortedArr, sortedArr))) {
      val got = SortedIntersectSize.merge(a, b)
      val want = a.toSet.intersect(b.toSet).size.toLong
      assert(got == want)
      assert(got == SortedIntersectSize.merge(b, a))
      assert(got <= math.min(a.length, b.length))
    }
  }

  test("rolling hash: deterministic; appending bytes extends the polynomial") {
    for ((t, w) <- cases(Gen.zip(text, word))) {
      val h1 = RollingHash.hashBytes(t.getBytes("UTF-8"))
      assert(h1 == RollingHash.hashBytes(t.getBytes("UTF-8")))
      val ext = RollingHash.hashBytes((t + w).getBytes("UTF-8"))
      val manual = w.getBytes("UTF-8").foldLeft(h1)((h, b) =>
        h * RollingHash.Base + (b & 0xffL))
      assert(ext == manual)
    }
  }

  test("tokenOffsets partitions the byte range on single spaces") {
    for (t <- cases(text)) {
      val b = t.getBytes("UTF-8")
      val offs = SketchKernels.tokenOffsets(b)
      val toks = offs.grouped(2).map { case Array(s, e) => new String(b, s, e - s, "UTF-8") }.toSeq
      assert(toks == t.split(" ", -1).toSeq, s"text=$t")
    }
  }

  test("vertica type mapping round-trips decimals exactly") {
    import graft.etl.TypeMapping
    import org.apache.spark.sql.types._
    val decimals = for {
      p <- Gen.choose(1, 38); s <- Gen.choose(0, math.min(p, 15))
    } yield DecimalType(p, s)
    for (d <- cases(decimals)) {
      assert(TypeMapping.verticaToSpark(TypeMapping.sparkToVertica(d)) == d)
    }
  }

  test("WARC record framing round-trips arbitrary unicode payloads") {
    import graft.sources.Warc
    import graft.sources.Warc.WarcDoc
    val payload: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('\r', '\n', ' ', 'é', '中', '\t'),
      Gen.const('W'))).map(_.mkString)
    val doc: Gen[WarcDoc] = for {
      id <- Gen.choose(0L, Long.MaxValue)
      lang <- Gen.oneOf("en", "de", "zh")
      src <- Gen.oneOf("web", "books")
      t <- payload
    } yield WarcDoc(id, lang, src, t)
    for (docs <- cases(Gen.nonEmptyListOf(doc), n = 120)) {
      // one in-memory archive: records concatenated exactly as the sink does
      val bytes = docs.toArray.flatMap(Warc.record)
      assert(Warc.parse(bytes).toList === docs)
    }
  }

  test("subword tokenization is total and lossless on arbitrary text") {
    import org.apache.spark.sql.graftx.WordPiece
    val anyWord: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('!', '?', '~', 'é', '中'))).map(_.mkString)
    for (w <- cases(anyWord)) {
      val pieces = WordPiece.tokenizeWord(w)
      assert(pieces.mkString("") === w)
      assert(pieces.forall(_.nonEmpty))
    }
  }

  test("protobuf varint/zigzag round-trips the full Long range") {
    import graft.sources.ProtoWire
    val longs = Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
      Gen.choose(-128L, 128L), Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
    for (n <- cases(longs)) {
      assert(ProtoWire.unzigzag(ProtoWire.zigzag(n)) === n, s"n=$n")
      // closed form: small magnitudes get small (cheap-to-encode) values
      if (n > -(1L << 31) && n < (1L << 31))
        assert(ProtoWire.zigzag(n) === (if (n >= 0) 2 * n else -2 * n - 1))
    }
  }

  test("protobuf messages round-trip arbitrary rows through the wire") {
    import graft.sources.ProtoWire
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("b", BooleanType),
      StructField("s", StringType)))
    val str: Gen[String] = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '|', 'é', '中', '\n', '\u0000'))).map(_.mkString)
    val row: Gen[Row] = for {
      k <- Gen.choose(Long.MinValue, Long.MaxValue)
      i <- Gen.choose(Int.MinValue, Int.MaxValue)
      d <- Gen.oneOf(Gen.choose(-1e18, 1e18), Gen.oneOf(0.0, -0.0, Double.NaN,
        Double.PositiveInfinity, Double.MinPositiveValue))
      b <- Gen.oneOf(true, false)
      s <- str
    } yield Row(k, i, d, b, s)
    def canon(r: Row) = (r.getLong(0), r.getInt(1),
      java.lang.Double.doubleToLongBits(r.getDouble(2)), r.getBoolean(3),
      r.getString(4))
    for (rows <- cases(Gen.nonEmptyListOf(row), n = 100)) {
      // one in-memory container: length-framed messages, exactly as the sink
      val out = new java.io.ByteArrayOutputStream()
      rows.foreach { r =>
        val msg = ProtoWire.encodeMessage(r, schema)
        ProtoWire.writeVarint(out, msg.length.toLong)
        out.write(msg)
      }
      val back = ProtoWire.parse(out.toByteArray, schema).toList
      assert(back.map(canon) === rows.map(canon))
    }
  }

  test("jaro-winkler: range, identity, symmetry, boost-vs-jaro consistency") {
    import org.apache.spark.sql.graftx.JaroWinkler.jw
    // jaro alone = jw with the boost branch removed: recompute via a copy
    // of the contract — boost only ever ADDS, and only when jaro > 0.7
    for ((a, b) <- cases(Gen.zip(word, word))) {
      val v = jw(a, b)
      assert(v >= 0.0 && v <= 1.0, s"range: $a/$b -> $v")
      assert(jw(a, a) == 1.0, s"identity: $a")
      assert(v == jw(b, a), s"symmetry: $a/$b")
      // a shared 4-char prefix adds matches and triggers the Winkler
      // boost: similarity must not drop (holds on all 300 seeded cases)
      if (a.nonEmpty && b.nonEmpty && a != b) {
        val vp = jw("zzzz" + a, "zzzz" + b)
        assert(vp >= v, s"prefix: $a/$b $v -> $vp")
      }
      // empty rules
      assert(jw("", a) == 0.0 && jw(a, "") == 0.0)
    }
  }

  test("png encode/decode round-trips arbitrary pixel buffers under every filter") {
    import graft.multimodal.PixelCodec
    val gen = for {
      w <- Gen.choose(1, 12); h <- Gen.choose(1, 12)
      ch <- Gen.oneOf(1, 3, 4)
      f <- Gen.choose(0, 4)
      pix <- Gen.listOfN(w * h * ch, Gen.choose(-128, 127).map(_.toByte))
    } yield (w, h, ch, f, pix.toArray)
    cases(gen, 150).foreach { case (w, h, ch, f, pix) =>
      val m = PixelCodec.decodePng(PixelCodec.encodePng(w, h, ch, pix, _ => f)).get
      assert(m.width == w && m.height == h && m.channels == ch)
      assert(m.values.toSeq == pix.toSeq.map(b => b.toInt & 0xff))
    }
  }

  test("nearest resize: identity at same size; every output pixel exists in the source") {
    import graft.multimodal.PixelCodec
    val gen = for {
      w <- Gen.choose(1, 10); h <- Gen.choose(1, 10)
      dw <- Gen.choose(1, 15); dh <- Gen.choose(1, 15)
      pix <- Gen.listOfN(w * h * 3, Gen.choose(-128, 127).map(_.toByte))
    } yield (w, h, dw, dh, pix.toArray)
    cases(gen, 150).foreach { case (w, h, dw, dh, pix) =>
      val m = PixelCodec.decodePng(PixelCodec.encodePng(w, h, 3, pix)).get
      assert(PixelCodec.resizeNearest(m, w, h).values.toSeq == m.values.toSeq)
      val r = PixelCodec.resizeNearest(m, dw, dh)
      assert(r.width == dw && r.height == dh)
      val srcPixels = m.values.grouped(3).map(_.toSeq).toSet
      assert(r.values.grouped(3).map(_.toSeq).forall(srcPixels.contains))
    }
  }

  test("url canonicalization: idempotent and artifact-free on generated messy urls") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val host = for {
      sub <- Gen.option(Gen.const("WWW."))
      name <- Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(8).mkString)
      tld <- Gen.oneOf(".COM", ".org", ".Net")
    } yield sub.getOrElse("") + name + tld
    val param = for {
      k <- Gen.oneOf("a", "b", "zz", "utm_source", "utm_x", "fbclid", "gclid")
      v <- Gen.choose(0, 99)
    } yield s"$k=$v"
    val gen = for {
      scheme <- Gen.oneOf("http://", "HTTP://", "https://", "HTTPS://")
      h <- host
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/x", "/x/", "/x/y")
      ps <- Gen.listOf(param).map(_.take(4))
      frag <- Gen.oneOf("", "#top")
    } yield scheme + h + port + path +
      (if (ps.isEmpty) "" else "?" + ps.mkString("&")) + frag
    val urls = cases(gen, 250).distinct.toDF("url")
    val (canon, _) = graft.pipeline.UrlCurate.canonicalize(col("url"))
    val once = urls.select(canon.as("c1"))
    val (again, _) = graft.pipeline.UrlCurate.canonicalize(col("c1"))
    val rows = once.select(col("c1"), again.as("c2")).collect()
    rows.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"not idempotent: ${r.getString(0)}")
      val c = r.getString(0)
      assert(!c.contains("#") && !c.contains("utm_") && !c.contains("fbclid")
        && !c.contains("gclid"), s"artifact survived: $c")
      assert(!c.startsWith("https://") || !c.split("/", 4)(2).endsWith(":443"))
      assert(!c.startsWith("http://") || !c.split("/", 4)(2).endsWith(":80"))
    }
  }

  test("png/bmp decode is total on malformed and hostile headers") {
    import graft.multimodal.PixelCodec
    // valid signature + IHDR declaring absurd dimensions: must decode to
    // None, never allocate or throw
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    for ((w, h) <- Seq((0x40000000, 1), (1, 0x40000000), (30000, 30000))) {
      val ihdr = be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++
        Array[Byte](8, 2, 0, 0, 0) ++ be32(0) // bogus CRC — decoder skips it
      assert(PixelCodec.decodePng(sig ++ ihdr).isEmpty)
    }
    // BMP with a width whose stride overflows int
    val bmp = new Array[Byte](64)
    bmp(0) = 'B'; bmp(1) = 'M'
    def putLe32(off: Int, v: Int): Unit = {
      bmp(off) = (v & 0xff).toByte; bmp(off + 1) = ((v >> 8) & 0xff).toByte
      bmp(off + 2) = ((v >> 16) & 0xff).toByte; bmp(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLe32(10, 54); putLe32(18, 0x30000000); putLe32(22, 2)
    bmp(28) = 24; putLe32(30, 0)
    assert(PixelCodec.decodeBmp(bmp).isEmpty)
    // height = Int.MinValue: abs() stays negative on ints — must still be None
    putLe32(18, 1); putLe32(22, 0x80000000)
    assert(PixelCodec.decodeBmp(bmp).isEmpty)
    // chunk lengths near 2^31 overflow int bound arithmetic — must be None,
    // not an IndexOutOfBounds/OOM
    val pngChunk = sig ++ be32(0x7ffffff0) ++ "IDAT".getBytes ++ Array[Byte](1, 2, 3)
    assert(PixelCodec.decodePng(pngChunk).isEmpty)
    val wav = new Array[Byte](64)
    "RIFF".getBytes.copyToArray(wav, 0); "WAVE".getBytes.copyToArray(wav, 8)
    "data".getBytes.copyToArray(wav, 12)
    wav(16) = 0xf0.toByte; wav(17) = 0xff.toByte
    wav(18) = 0xff.toByte; wav(19) = 0x7f.toByte // len = 0x7ffffff0 LE
    assert(PixelCodec.decodeWav(wav).isEmpty)
    // arbitrary byte soup never throws
    val gen = Gen.listOf(Gen.choose(-128, 127).map(_.toByte)).map(_.toArray)
    cases(gen, 200).foreach { bytes =>
      PixelCodec.decode(bytes) // totality: any result is fine, no throw
    }
  }

  test("gif encode/decode round-trips arbitrary frames incl. interlace") {
    import graft.multimodal.PixelCodec
    val g = Gen.zip(Gen.zip(Gen.choose(1, 20), Gen.choose(1, 16)),
      Gen.zip(Gen.choose(1, 4), Gen.choose(0, 1 << 20)))
    for (((w, h), (nf, seed)) <- cases(g, 60)) {
      val palette = Array.tabulate(768)(j => ((j * 31 + seed) % 256).toByte)
      val frames = (0 until nf).map(f =>
        Array.tabulate(w * h)(p => ((seed + f * 17 + p * 3) % 256).toByte))
      val gif = PixelCodec.encodeGif(w, h, palette, frames,
        interlaceFor = f => (f + seed) % 2 == 0)
      val got = PixelCodec.decodeGifFrames(gif).get
      assert(got.length == nf)
      got.zip(frames).foreach { case (m, idx) =>
        assert(m.width == w && m.height == h)
        val want = idx.toSeq.flatMap { b =>
          val v = b & 0xff
          Seq(palette(v * 3) & 0xff, palette(v * 3 + 1) & 0xff,
            palette(v * 3 + 2) & 0xff)
        }
        assert(m.values.toSeq == want, s"w=$w h=$h nf=$nf seed=$seed")
      }
    }
  }

  test("jpeg near-lossless round-trip bound holds on arbitrary grayscale") {
    import graft.multimodal.JpegCodec
    val g = Gen.zip(Gen.zip(Gen.choose(1, 24), Gen.choose(1, 20)),
      Gen.choose(0, 1 << 20))
    for (((w, h), seed) <- cases(g, 40)) {
      val p = Array.tabulate(w * h)(i => ((seed + i * 7) % 256).toByte)
      val m = JpegCodec.decodeJpeg(
        JpegCodec.encodeJpeg(w, h, 1, p, JpegCodec.FlatQ1, JpegCodec.FlatQ1)).get
      val maxErr =
        (0 until w * h).map(i => math.abs(m.values(i) - (p(i) & 0xff))).max
      assert(maxErr <= 2, s"w=$w h=$h seed=$seed err=$maxErr")
    }
  }

  test("tar member framing round-trips arbitrary unicode keys and sizes") {
    import graft.sources.TarShards
    val keyGen = Gen.nonEmptyListOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('-', '_', 'é', '中'))).map(_.mkString.take(20))
    for ((keys, seed) <- cases(Gen.zip(Gen.nonEmptyListOf(keyGen),
        Gen.choose(0, 1000)), 50)) {
      val members = keys.distinct.zipWithIndex.map { case (k, i) =>
        TarShards.Member(k, "bin",
          Array.tabulate((seed + i * 37) % 1500)(j => ((i + j) % 256).toByte))
      }
      val parsed = TarShards.parse(TarShards.archive(members.iterator)).toSeq
      assert(parsed.map(_.key) == members.map(_.key))
      parsed.zip(members).foreach { case (p, m) =>
        assert(p.content.toSeq == m.content.toSeq, m.key)
      }
    }
  }

  test("gif/jpeg decode is total under random corruption of valid streams") {
    import graft.multimodal.{JpegCodec, PixelCodec}
    val gif = PixelCodec.encodeGif(9, 7, Array.tabulate(768)(_.toByte),
      Seq(Array.tabulate(63)(_.toByte)))
    val jpg = JpegCodec.encodeJpeg(16, 16, 1,
      Array.tabulate(256)(i => (i % 256).toByte))
    for ((at, bit) <- cases(Gen.zip(Gen.choose(0, gif.length - 1),
        Gen.choose(0, 7)), 150)) {
      val b = gif.clone(); b(at) = (b(at) ^ (1 << bit)).toByte
      PixelCodec.decodeGifFrames(b) // totality: no throw
    }
    for ((at, bit) <- cases(Gen.zip(Gen.choose(0, jpg.length - 1),
        Gen.choose(0, 7)), 150)) {
      val b = jpg.clone(); b(at) = (b(at) ^ (1 << bit)).toByte
      JpegCodec.decodeJpeg(b) // totality: no throw
    }
  }

  test("utf-8 validator: agrees with the JVM on arbitrary valid strings; total on noise") {
    import graft.multimodal.Charset
    // valid round-trip: chars == codepoint count, zero bad, kind by content
    val anyString: Gen[String] = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar.map(_.toString),
      2 -> Gen.oneOf("é", "ü", "中", "文", "Ж"),
      1 -> Gen.oneOf(Character.toChars(0x1F600).mkString,
        Character.toChars(0x10348).mkString))).map(_.mkString)
    for (s <- cases(anyString)) {
      val info = Charset.info(s.getBytes("UTF-8"))
      assert(info.bad === 0L, s)
      assert(info.chars === s.codePointCount(0, s.length).toLong, s)
      assert(info.kind === (if (s.forall(_ < 0x80)) "ascii" else "utf8"), s)
    }
    // totality + resync on arbitrary byte noise: never throws, and every
    // byte is accounted for as either part of a codepoint or one bad byte
    val bytes: Gen[Array[Byte]] =
      Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
    for (b <- cases(bytes)) {
      val info = Charset.info(b)
      assert(info.chars >= 0 && info.bad >= 0)
      assert(info.chars + info.bad <= b.length)
      assert((info.bad > 0) === (info.kind == "invalid"))
    }
  }

  test("luhn column check agrees with a reference implementation") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    def luhnRef(card: String): Boolean = {
      val sum = card.reverseIterator.zipWithIndex.map { case (c, i) =>
        val d = c - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }
    val cards = cases(Gen.listOfN(16, Gen.numChar), 100).map(_.mkString)
    val got = cards.toDF("c")
      .select(col("c"), graft.functions.TextFunctions.luhnValid(col("c")))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    for (c <- cards) assert(got(c) === luhnRef(c), c)
    // a known-valid number (classic test PAN) and an off-by-one neighbor
    assert(luhnRef("4539578763621486"))
    assert(got.getOrElse("4539578763621486", {
      val r = Seq("4539578763621486").toDF("c")
        .select(graft.functions.TextFunctions.luhnValid(col("c")))
        .head().getBoolean(0)
      r
    }))
  }

  test("packing manifest tiles any corpus exactly (property over random lengths)") {
    import spark.implicits._
    // random word-count corpora: packManifest only reads whitespace token
    // counts, so docs are synthesized as n-token strings
    val corpus: Gen[List[Int]] =
      Gen.nonEmptyListOf(Gen.choose(1, 200)).map(_.take(60))
    for ((lens, i) <- cases(corpus, 40).zipWithIndex) {
      val L = 16 + (i % 3) * 17 // 16, 33, 50
      val docs = lens.zipWithIndex.map { case (n, id) =>
        (id.toLong, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val m = graft.pipeline.Packing.packManifest(docs, L, shards = 3)
        .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("window_id"),
          r.getAs[Long]("doc_id"), r.getAs[Long]("tok_from"),
          r.getAs[Long]("tok_to"), r.getAs[Long]("win_offset")))
      // exact cover: each doc's spans sum to ntok (words + EOS), start at 0
      val byDoc = m.groupBy(_._3)
      lens.zipWithIndex.foreach { case (n, id) =>
        val spans = byDoc(id.toLong).sortBy(_._4)
        assert(spans.map(s => s._5 - s._4).sum == n + 1, s"case $i doc $id")
        assert(spans.head._4 == 0 && spans.last._5 == n + 1)
        // spans are consecutive windows with contiguous token ranges
        spans.sliding(2).filter(_.length == 2).foreach { pair =>
          val (a, b) = (pair(0), pair(1))
          assert(b._2 == a._2 + 1 && b._4 == a._5)
        }
      }
      // windows fill to exactly L except each shard's last
      val byWin = m.groupBy(x => (x._1, x._2))
      val lastW = m.groupBy(_._1).map { case (sh, xs) => sh -> xs.map(_._2).max }
      byWin.foreach { case ((sh, w), xs) =>
        val fill = xs.map(s => s._5 - s._4).sum
        if (w != lastW(sh)) assert(fill == L.toLong, s"case $i shard $sh win $w")
        else assert(fill >= 1 && fill <= L)
        // offsets tile the window contiguously from 0
        val sorted = xs.sortBy(_._6)
        assert(sorted.head._6 == 0)
        sorted.sliding(2).filter(_.length == 2).foreach { pair =>
          val (a, b) = (pair(0), pair(1))
          assert(b._6 == a._6 + (a._5 - a._4))
        }
      }
    }
  }
}
