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
}
