// Lives under org.apache.spark.sql.* to reach `private[sql]` surface
// (Column<->Expression bridging, AbstractDataType) — the standard pattern for
// third-party catalyst extensions. All logic here is graft's own.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column <-> catalyst Expression bridge for Spark 4.x, where `Column` is
  * backed by a `ColumnNode` and no longer exposes `.expr` publicly.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}

/** 64-bit polynomial rolling-hash document fingerprint.
  *
  * `fp(s) = sum_i byte(i) * 1000003^(n-1-i) mod 2^64` over the UTF-8 bytes.
  * A native Catalyst `Expression` WITH `doGenCode` — it runs inside
  * whole-stage codegen (no UDF boxing, no serialization), so fingerprinting
  * 100 TB of documents is a pure map stage at scan speed.
  *
  * The reference has no hashing at all (its only string op is `||` concat,
  * `/root/reference/sqoop_table.py:125`); this is a north-star text-pipeline
  * primitive (doc identity keys, shift-tolerant near-dup blocks).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Base = 1000003L

  /** Static so generated Java can call it directly. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column = Bridge.toColumn(RollingHash(Bridge.toExpr(c)))
}

/** Unicode canonicalization fold for dedup keys: NFC-compose, lowercase
  * (root locale), strip combining marks (NFD → drop Mn → NFC) — so
  * composed `é`, decomposed `e`+U+0301, and case variants all map to one
  * key. Exact-dedup fingerprints computed on raw bytes miss every such
  * pair; real crawls are full of them (editors differ in composition
  * form). Native `Expression` with `doGenCode` — a static JVM call inside
  * whole-stage codegen, same tier as [[RollingHash]]: a map-only pass at
  * scan speed, no UDF boxing.
  *
  * Reference analogue: none (no text surface); north-star dedup addition.
  */
case class UnicodeFold(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = StringType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    UnicodeFold.foldUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.UnicodeFold.foldUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeFold =
    copy(child = newChild)

  override def prettyName: String = "unicode_fold"
}

object UnicodeFold {
  import java.text.Normalizer

  /** Static so generated Java can call it directly. */
  def foldUtf8(s: UTF8String): UTF8String = UTF8String.fromString(fold(s.toString))

  def fold(s: String): String = {
    val decomposed = Normalizer.normalize(s, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var i = 0
    while (i < decomposed.length) {
      val c = decomposed.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
  }

  def unicode_fold(c: Column): Column =
    Bridge.toColumn(UnicodeFold(Bridge.toExpr(c)))
}

/** Shared native hashing/shingling kernels for the sketch expressions below.
  * One pass over the UTF-8 bytes, no per-shingle string allocation — the
  * difference between this and the higher-order-function formulation is
  * ~100× on the documents table (measured at sf0.01: SimHash via nested
  * `aggregate`/`transform` = 42 s; this = sub-second).
  */
object SketchKernels {

  // Named so the DuckDB oracle SQL (graft.SketchOracleSql) is GENERATED from
  // the same constants — the two sides cannot drift.
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L
  final val GoldenGamma = 0x9e3779b97f4a7c15L
  final val Mix1 = 0xbf58476d1ce4e5b9L
  final val Mix2 = 0x94d049bb133111ebL

  /** FNV-1a 64 over a byte range, splitmix-finalized, seedable. */
  def hashRange(b: Array[Byte], from: Int, until: Int, seed: Long): Long = {
    var h = seed ^ FnvOffset
    var i = from
    while (i < until) {
      h ^= (b(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h ^= h >>> 30; h *= Mix1
    h ^= h >>> 27; h *= Mix2
    h ^= h >>> 31
    h
  }

  /** Token start/end offsets for single-space-delimited text.
    * Returns flat array [s0,e0,s1,e1,...].
    */
  def tokenOffsets(b: Array[Byte]): Array[Int] = {
    var n = 1
    var i = 0
    while (i < b.length) { if (b(i) == ' ') n += 1; i += 1 }
    val out = new Array[Int](n * 2)
    var t = 0
    var start = 0
    i = 0
    while (i <= b.length) {
      if (i == b.length || b(i) == ' ') {
        out(t * 2) = start; out(t * 2 + 1) = i
        t += 1; start = i + 1
      }
      i += 1
    }
    out
  }

  /** MinHash signature over word shingles of length `n`, `k` hashes via
    * Kirsch–Mitzenmacher double hashing (h_i = h1 + i·h2): O(shingle bytes)
    * hashing + O(k·shingles) arithmetic.
    */
  def minHashSig(s: UTF8String, n: Int, k: Int): Array[Long] = {
    val b = s.getBytes
    val offs = tokenOffsets(b)
    val nTok = offs.length / 2
    val nShingles = math.max(nTok - n + 1, 1)
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < nShingles) {
      val from = offs(i * 2)
      val lastTok = math.min(i + n - 1, nTok - 1)
      val until = offs(lastTok * 2 + 1)
      val h1 = hashRange(b, from, until, 0L)
      val h2 = hashRange(b, from, until, GoldenGamma) | 1L
      var j = 0
      var h = h1
      while (j < k) {
        if (h < mins(j)) mins(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    mins
  }

  /** 64-bit SimHash over word shingles of length `n`. */
  def simHash(s: UTF8String, n: Int): Long = {
    val b = s.getBytes
    val offs = tokenOffsets(b)
    val nTok = offs.length / 2
    val nShingles = math.max(nTok - n + 1, 1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < nShingles) {
      val from = offs(i * 2)
      val lastTok = math.min(i + n - 1, nTok - 1)
      val until = offs(lastTok * 2 + 1)
      val h = hashRange(b, from, until, 0L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }

  def minHashSigData(s: UTF8String, n: Int, k: Int): ArrayData =
    new GenericArrayData(minHashSig(s, n, k))
}

/** MinHash signature as a native expression: `array<long>` of `numHashes`
  * min-hashes over word shingles. Codegen emits a single static call.
  */
case class MinHashSigExpr(child: Expression, shingleLen: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minHashSigData(input.asInstanceOf[UTF8String], shingleLen, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftx.SketchKernels.minHashSigData($c, $shingleLen, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** 64-bit SimHash as a native expression. */
case class SimHashExpr(child: Expression, shingleLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simHash(input.asInstanceOf[UTF8String], shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftx.SketchKernels.simHash($c, $shingleLen)")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** Native Generator (the UDTF extension type): one output row per word
  * shingle of length `n` — the table-function analogue of the scalar sketch
  * kernels, sharing their tokenization (SketchKernels.tokenOffsets) and
  * short-document clamp, so downstream counts agree with MinHash/Jaccard
  * shingle semantics and with the generated oracle SQL. Evaluated via
  * `GenerateExec` exactly like the built-in `explode`, but without first
  * materializing a shingle array per document.
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.Generator
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def elementSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("shingle", StringType, nullable = false)))

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): IterableOnce[org.apache.spark.sql.catalyst.InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val b = v.asInstanceOf[UTF8String].getBytes
      val offs = SketchKernels.tokenOffsets(b)
      val nTok = offs.length / 2
      val nShingles = math.max(nTok - n + 1, 1)
      (0 until nShingles).iterator.map { i =>
        val from = offs(i * 2)
        val lastTok = math.min(i + n - 1, nTok - 1)
        val until = offs(lastTok * 2 + 1)
        org.apache.spark.sql.catalyst.InternalRow(
          UTF8String.fromBytes(java.util.Arrays.copyOfRange(b, from, until)))
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleGenerator =
    copy(child = newChild)

  override def prettyName: String = "shingle_explode"
}

/** Shannon entropy (bits) of a string's BYTE distribution — a cheap
  * quality/compressibility signal for training-data filtering (low entropy ≈
  * repetitive/boilerplate, ~8 ≈ binary junk). One pass + a 256-bucket
  * histogram, summed in ascending byte order so the double fold is
  * deterministic and reproducible by an ORDER BY in the oracle SQL.
  */
case class ByteEntropy(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    ByteEntropy.entropy(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.ByteEntropy.entropy($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): ByteEntropy =
    copy(child = newChild)

  override def prettyName: String = "byte_entropy"
}

object ByteEntropy {
  def entropy(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    val counts = new Array[Long](256)
    var i = 0
    while (i < bytes.length) { counts(bytes(i) & 0xff) += 1; i += 1 }
    val n = bytes.length.toDouble
    var h = 0.0
    var b = 0
    while (b < 256) {
      if (counts(b) > 0) {
        val p = counts(b) / n
        h -= p * (StrictMath.log(p) / StrictMath.log(2.0))
      }
      b += 1
    }
    h
  }
}

/** Per-document bigram repetition stats in ONE pass over the UTF-8 bytes:
  * (n_grams, n_distinct, top_n) of the whitespace word-bigram bag. The
  * equivalent relational formulation explodes every bigram and shuffles
  * twice (doc_id×gram, then doc_id) — but the stats are a function of the
  * document alone, so a codegen kernel computes them at scan speed with
  * zero shuffle. Gram identity is a 64-bit rolling hash of the bigram
  * bytes; a collision WITHIN one document would miscount (never observed;
  * the DuckDB oracle groups by the exact gram string, so a collision
  * would surface as a hash mismatch, not pass silently).
  */
case class GramStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_n", LongType, nullable = false)))
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    GramStats.compute(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.GramStats.compute($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): GramStats =
    copy(child = newChild)

  override def prettyName: String = "gram_stats"
}

object GramStats {
  /** Split semantics match `split(text, " ")` with limit -1 (empty tokens
    * kept); a bigram's hash covers the exact byte span "tok_i tok_i+1".
    */
  def compute(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow = {
    // token boundaries: starts(i) .. ends(i) is token i (exclusive end)
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nTok += 1; i += 1 }
    val starts = new Array[Int](nTok)
    val ends = new Array[Int](nTok)
    var t = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes.length
    val nGrams = (nTok - 1).toLong
    var nDistinct = 0L
    var topN = 0L
    if (nGrams > 0) {
      val counts = new java.util.HashMap[java.lang.Long, Array[Long]]()
      var g = 0
      while (g < nTok - 1) {
        var h = 0L
        var j = starts(g)
        val end = ends(g + 1)
        while (j < end) { h = h * RollingHash.Base + (bytes(j) & 0xffL); j += 1 }
        val slot = counts.get(h)
        if (slot == null) counts.put(h, Array(1L))
        else slot(0) += 1
        g += 1
      }
      nDistinct = counts.size().toLong
      val it = counts.values().iterator()
      while (it.hasNext) { val c = it.next()(0); if (c > topN) topN = c }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nGrams, nDistinct, topN))
  }
}

/** Winnowed substring anchors for span-level (ExactSubstr-style) dedup, in
  * ONE pass over the document: the 64-bit polynomial rolling hash of every
  * k-char window (mod 2^64, base [[RollingHash.Base]]), packed with its
  * 1-based char position as `(h >>> 33) << 32 | pos`, then winnowed — the
  * minimum packed key of every window of `w` consecutive positions is
  * selected (Schleimer/Wilkes/Aiken 2003). Guarantee: any substring of
  * length >= k + w - 1 shared by two documents yields at least one
  * IDENTICAL selected window in both (the minimum over a w-window lying
  * fully inside the shared span depends only on the span's content), at
  * ~2/(w+1) the density of emitting every position. `w = 1` emits every
  * window (exact full-density semantics).
  *
  * Returns `array<long>` of distinct selected packed keys in ascending
  * position order; consumers unpack `pos = key & 0xffffffff` and join on
  * `substring(text, pos, k)` — the hash only drives SELECTION, so a hash
  * collision can never corrupt results, only add an anchor.
  *
  * The rolling-window recurrence and the monotonic-deque winnow are O(n)
  * per document regardless of k and w.
  */
case class SubstrAnchors(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    SubstrAnchors.compute(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.SubstrAnchors.compute($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): SubstrAnchors =
    copy(child = newChild)

  override def prettyName: String = "substr_anchors"
}

/** [[SubstrAnchors]] variant that emits the DISTINCT selected window
  * CONTENTS (`array<string>`) instead of packed position keys: the explode
  * that follows then needs only `doc_id` from its input row, so the document
  * body never travels through the Generate — measured ~3× on the full
  * substring-dedup pipeline, whose map stage was dominated by copying `text`
  * into every anchor row and re-extracting each window with an O(pos)
  * `substr`. Per-doc distinctness comes free from the same pass (windows are
  * extracted in selection order into a local set).
  */
case class SubstrAnchorSubs(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    SubstrAnchors.computeSubs(input.asInstanceOf[UTF8String].toString, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.SubstrAnchors.computeSubs($c.toString(), $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): SubstrAnchorSubs =
    copy(child = newChild)

  override def prettyName: String = "substr_anchor_subs"
}

object SubstrAnchors {

  /** Distinct selected window contents, in first-occurrence order. Selection
    * is identical to [[compute]]; only the emitted representation differs.
    */
  def computeSubs(s: String, k: Int, w: Int): ArrayData = {
    val keys = compute(s, k, w)
    val n = keys.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val cps = s.codePoints().toArray
    val seen = new java.util.HashSet[String](n * 2)
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val pos = (keys.getLong(i) & 0xffffffffL).toInt // 1-based
      val sub = new String(cps, pos - 1, k)
      if (seen.add(sub)) out += UTF8String.fromString(sub)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Static so generated Java can call it directly. Operates on CODE POINTS
    * so `pos` agrees with `substring()` char indexing in Spark and DuckDB
    * (identical to byte indexing on the ASCII corpus, asserted in specs).
    */
  def compute(s: String, k: Int, w: Int): ArrayData = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    // packed key per window start: top 31 bits of the mod-2^64 poly hash,
    // then the 1-based char position (distinct positions => no min ties)
    val keys = new Array[Long](m)
    var h = 0L
    var powK = 1L // Base^(k-1) mod 2^64
    var i = 0
    while (i < k - 1) { powK *= RollingHash.Base; i += 1 }
    i = 0
    while (i < k) { h = h * RollingHash.Base + cps(i); i += 1 }
    keys(0) = ((h >>> 33) << 32) | 1L
    i = 1
    while (i < m) {
      h = (h - cps(i - 1) * powK) * RollingHash.Base + cps(i + k - 1)
      keys(i) = ((h >>> 33) << 32) | (i + 1L)
      i += 1
    }
    if (w == 1) return new GenericArrayData(keys)
    // winnow: min key of each full window of w starts (single window if
    // m < w), deduplicated, via a monotonic ascending deque — O(m)
    val win = math.min(w, m)
    val deque = new Array[Int](m) // indices, increasing key values
    var head = 0
    var tail = 0 // exclusive
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    i = 0
    while (i < m) {
      while (tail > head && keys(deque(tail - 1)) > keys(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) {
        val sel = keys(deque(head))
        if (out.isEmpty || out.last != sel) out += sel
      }
      i += 1
    }
    // distinct + ascending-position order (a key can re-win after leaving)
    val arr = out.distinct.sortBy(_ & 0xffffffffL).toArray
    new GenericArrayData(arr)
  }
}

/** Intersection size of two SORTED long arrays via linear merge — no hash
  * set per call, no boxing. Used for Jaccard over pre-hashed token sets:
  * the generic `array_intersect` builds a hash set per row pair, which
  * dominates blocked pair-join dedup cost.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.merge(
      a.asInstanceOf[ArrayData].toLongArray(),
      b.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftx.SortedIntersectSize.merge($a.toLongArray(), $b.toLongArray())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}

object SortedIntersectSize {
  /** Both inputs must be sorted ascending (duplicates allowed on neither). */
  def merge(a: Array[Long], b: Array[Long]): Long = {
    var i = 0
    var j = 0
    var n = 0L
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) i += 1
      else if (a(i) > b(j)) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }
}

/** Per-band LSH keys over a MinHash signature: band `b`'s key is the rolling
  * fold `h = b; h = h*Base + sig(b*rpb + j)` over its `rowsPerBand` values —
  * plain wrapping 64-bit arithmetic (not xxhash64) so the DuckDB oracle can
  * reproduce it in HUGEINT mod-2^64 SQL. Native + codegen'd: banding 100 TB
  * of signatures stays a map-only pass.
  */
case class BandHashes(child: Expression, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def nullSafeEval(input: Any): Any =
    BandHashes.hashData(input.asInstanceOf[ArrayData].toLongArray(), rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graftx.BandHashes.hashData($c.toLongArray(), $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): BandHashes =
    copy(child = newChild)

  override def prettyName: String = "band_hashes"
}

object BandHashes {
  def hash(sig: Array[Long], rowsPerBand: Int): Array[Long] = {
    val numBands = sig.length / rowsPerBand
    val out = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var h = b.toLong
      var j = 0
      while (j < rowsPerBand) {
        h = h * RollingHash.Base + sig(b * rowsPerBand + j)
        j += 1
      }
      out(b) = h
      b += 1
    }
    out
  }

  def hashData(sig: Array[Long], rowsPerBand: Int): ArrayData =
    new GenericArrayData(hash(sig, rowsPerBand))
}

object Sketches {
  def shingle_explode(c: Column, n: Int): Column =
    Bridge.toColumn(ShingleGenerator(Bridge.toExpr(c), n))

  def byte_entropy(c: Column): Column =
    Bridge.toColumn(ByteEntropy(Bridge.toExpr(c)))

  def band_hashes(sig: Column, rowsPerBand: Int): Column =
    Bridge.toColumn(BandHashes(Bridge.toExpr(sig), rowsPerBand))

  def sorted_intersect_size(a: Column, b: Column): Column =
    Bridge.toColumn(SortedIntersectSize(Bridge.toExpr(a), Bridge.toExpr(b)))

  def minhash_sig(c: Column, shingleLen: Int, numHashes: Int): Column =
    Bridge.toColumn(MinHashSigExpr(Bridge.toExpr(c), shingleLen, numHashes))

  def simhash64(c: Column, shingleLen: Int): Column =
    Bridge.toColumn(SimHashExpr(Bridge.toExpr(c), shingleLen))

  def gram_stats(c: Column): Column =
    Bridge.toColumn(GramStats(Bridge.toExpr(c)))

  def substr_anchors(c: Column, k: Int, w: Int): Column =
    Bridge.toColumn(SubstrAnchors(Bridge.toExpr(c), k, w))

  def substr_anchor_subs(c: Column, k: Int, w: Int): Column =
    Bridge.toColumn(SubstrAnchorSubs(Bridge.toExpr(c), k, w))

  /** Bloom filter over a LONG column (feed it `xxhash64(...)` keys), as a
    * binary-typed aggregate — Spark's own runtime-filter sketch
    * (`BloomFilterAggregate`), exposed for explicit two-phase joins where
    * the build side is too big to broadcast as a hash relation but fine as
    * bits (a 1B-key set at 1% fpp is ~1.2 GB of bits vs ~8 GB of keys).
    */
  def bloom_agg(keys: Column, expectedItems: Long, fpp: Double): Column = {
    val bits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedItems, fpp)
    Bridge.toColumn(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        Bridge.toExpr(keys),
        org.apache.spark.sql.catalyst.expressions.Literal(expectedItems),
        org.apache.spark.sql.catalyst.expressions.Literal(bits))
        .toAggregateExpression())
  }

  /** Probe side of [[bloom_agg]]: true if `key` MIGHT be in the filter
    * (no false negatives). Codegen-native (`BloomFilterMightContain`).
    */
  def bloom_might_contain(bloom: Column, key: Column): Column =
    Bridge.toColumn(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.toExpr(bloom), Bridge.toExpr(key)))
}
