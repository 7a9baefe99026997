package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import org.apache.spark.sql.graftx.{RollingHash, SketchKernels}
import org.apache.spark.unsafe.types.UTF8String

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("token counts match a reference computation") {
    val r = Seq(("a b c", 3), ("one", 1), ("x y", 2)).toDF("text", "want")
      .select(TextFunctions.tokenCount(col("text")).as("got"), col("want"))
      .as[(Long, Int)].collect()
    assert(r.forall { case (got, want) => got == want })
  }

  test("word shingles of n=2 over 3 tokens gives 2 shingles") {
    val s = Seq("a b c").toDF("text")
      .select(TextFunctions.wordShingles(col("text"), 2).as("s"))
      .as[Seq[String]].head()
    assert(s == Seq("a b", "b c"))
  }

  test("token jaccard: identical=1, disjoint=0") {
    val r = Seq(("a b c", "a b c"), ("a b", "x y")).toDF("ta", "tb")
      .select(TextFunctions.tokenJaccard(col("ta"), col("tb")).as("j"))
      .as[Double].collect()
    assert(r(0) == 1.0 && r(1) == 0.0)
  }

  test("langId picks the marker-majority language deterministically") {
    val r = Seq("the the fast table", "scan join join group", "zzz qqq")
      .toDF("text").select(TextFunctions.langId(col("text")).as("l"))
      .as[String].collect()
    assert(r(0) == "en" && r(1) == "zh" && r(2) == "unk")
  }

  test("byte entropy: uniform > repetitive, bounds hold, normalize is idempotent") {
    import org.apache.spark.sql.graftx.{ByteEntropy, Sketches}
    assert(ByteEntropy.entropy("aaaa".getBytes) == 0.0)
    assert(math.abs(ByteEntropy.entropy("abab".getBytes) - 1.0) < 1e-12)
    assert(ByteEntropy.entropy("".getBytes) == 0.0)
    val docs = Tables.documents(spark, sf).limit(50)
    val rows = docs.select(Sketches.byte_entropy(col("text")).as("h"))
      .as[Double].collect()
    assert(rows.forall(h => h >= 0.0 && h <= 8.0))
    // normalize: idempotent, and output alphabet is [a-z0-9 ]
    val norm = docs.select(TextFunctions.normalize(col("text")).as("t"))
    val twice = norm.select(TextFunctions.normalize(col("t")).as("t2"), col("t"))
    assert(twice.filter(col("t") =!= col("t2")).count() == 0)
    assert(norm.filter(col("t").rlike("[^a-z0-9 ]")).count() == 0)
  }

  test("rolling hash expression equals the kernel (codegen path = eval path)") {
    val texts = Tables.documents(spark, sf).limit(20)
    val viaExpr = texts.select(col("doc_id"),
      org.apache.spark.sql.graftx.RollingHash.rolling_hash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    val viaKernel = texts.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> RollingHash.hashBytes(t.getBytes("UTF-8")) }.toMap
    assert(viaExpr == viaKernel)
  }

  test("minhash signature kernel: identical text → identical sig; length = k") {
    val s1 = SketchKernels.minHashSig(UTF8String.fromString("a b c d e"), 3, 16)
    val s2 = SketchKernels.minHashSig(UTF8String.fromString("a b c d e"), 3, 16)
    assert(s1.sameElements(s2) && s1.length == 16)
    val s3 = SketchKernels.minHashSig(UTF8String.fromString("totally different words here"), 3, 16)
    assert(!s1.sameElements(s3))
  }

  test("gram-stats kernel equals the relational explode+groupBy formulation") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val toks = split(col("text"), " ")
    val relational = docs.filter(size(toks) >= 2)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(toks) - lit(2)),
          i => concat_ws(" ", slice(toks, i + lit(1), lit(2))))).as("gram"))
      .groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("n_grams"), count(lit(1)).as("n_distinct"),
        max(col("n")).as("top_n"))
    val kernel = docs.filter(size(toks) >= 2)
      .select(col("doc_id"),
        org.apache.spark.sql.graftx.Sketches.gram_stats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_grams").as("n_grams"),
        col("st.n_distinct").as("n_distinct"), col("st.top_n").as("top_n"))
    assert(kernel.exceptAll(relational).isEmpty && relational.exceptAll(kernel).isEmpty)
    // edge: empty tokens from double spaces, and a doc that is all repeats
    val edge = Seq((1L, "x  x  x"), (2L, "a b a b a b")).toDF("doc_id", "text")
    val k = edge.select(col("doc_id"),
        org.apache.spark.sql.graftx.Sketches.gram_stats(col("text")).as("st"))
      .select(col("doc_id"), col("st.n_grams"), col("st.n_distinct"), col("st.top_n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "x  x  x" tokens: [x,"",x,"",x] → grams: "x ", " x", "x ", " x" → 4 grams, 2 distinct, top 2
    assert(k(1L) == ((4L, 2L, 2L)))
    // "a b a b a b" → 5 grams: "a b"×3, "b a"×2
    assert(k(2L) == ((5L, 2L, 3L)))
  }

  test("simhash kernel: small edit → small hamming distance") {
    val a = SketchKernels.simHash(UTF8String.fromString("the quick brown fox jumps over the lazy dog again and again"), 2)
    val b = SketchKernels.simHash(UTF8String.fromString("the quick brown fox jumps over the lazy dog again and again more"), 2)
    val c = SketchKernels.simHash(UTF8String.fromString("completely unrelated text about database query planning internals"), 2)
    assert(java.lang.Long.bitCount(a ^ b) < java.lang.Long.bitCount(a ^ c))
  }

  test("jaro-winkler matches textbook values, interpreted and codegen paths agree") {
    import org.apache.spark.sql.graftx.JaroWinkler
    assert(JaroWinkler.jw("martha", "marhta") == 0.9611111111111111)
    assert(JaroWinkler.jw("dwayne", "duane") == 0.8400000000000001)
    assert(JaroWinkler.jw("", "abc") == 0.0)
    assert(JaroWinkler.jw("abc", "") == 0.0)
    assert(JaroWinkler.jw("abc", "abc") == 1.0)
    assert(JaroWinkler.jw("ab", "ba") == 0.0) // window 0: no matches
    // below the 0.7 boost threshold the prefix must NOT be rewarded
    assert(JaroWinkler.jw("aaxxxxxx", "aayyyyyy") == 0.5)
    // symmetric
    assert(JaroWinkler.jw("prefix one", "prefix two") ==
      JaroWinkler.jw("prefix two", "prefix one"))
    // the Expression path (whole-stage codegen) computes the same value
    val got = spark.range(1)
      .select(JaroWinkler.jaro_winkler(lit("martha"), lit("marhta")).as("v"))
      .head().getDouble(0)
    assert(got == 0.9611111111111111)
  }
}
