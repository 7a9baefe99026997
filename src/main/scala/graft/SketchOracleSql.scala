package graft

import org.apache.spark.sql.graftx.{RollingHash, SketchKernels}

/** Unsigned-64 arithmetic building blocks for DuckDB oracle SQL.
  *
  * DuckDB BIGINT arithmetic is checked (overflow errors), so the wrapping
  * 64-bit folds the graft sketch kernels use are emulated in HUGEINT mod-2^64
  * arithmetic; XOR runs on the signed BIGINT two's-complement image (bitwise
  * identical) and converts back. Everything is generated from the same Scala
  * constants the kernels use, so the sides cannot drift.
  */
private[graft] object U64Sql {
  /** 2^64 */
  val Wrap = "CAST('18446744073709551616' AS HUGEINT)"
  /** 2^63 */
  val SignBit = "CAST('9223372036854775808' AS HUGEINT)"

  /** Literal of a Scala Long reinterpreted as unsigned decimal. */
  def u(l: Long): String = java.lang.Long.toUnsignedString(l)

  /** unsigned h in [0,2^64) → its signed two's-complement value (HUGEINT). */
  def signedVal(x: String): String =
    s"(CASE WHEN ($x) >= $SignBit THEN ($x) - $Wrap ELSE ($x) END)"

  /** unsigned h in [0,2^64) → signed BIGINT. */
  def toBigint(x: String): String = s"CAST(${signedVal(x)} AS BIGINT)"

  /** signed value → unsigned image in [0,2^64) (HUGEINT). */
  def unsignedVal(x: String): String =
    s"(CASE WHEN ($x) < 0 THEN CAST(($x) AS HUGEINT) + $Wrap ELSE CAST(($x) AS HUGEINT) END)"

  /** `h := h XOR (h >>> k)` on unsigned h; k >= 1 so the shifted operand is
    * positive and XOR can run on the signed BIGINT images bit-identically.
    */
  def xorShift(v: String, k: Int): String =
    unsignedVal(
      s"xor(CAST(${signedVal(v)} AS BIGINT), CAST(($v) // ${1L << k} AS BIGINT))")

  /** `(v * m) mod 2^64` when `m` is too big for the product to fit HUGEINT:
    * split v at 2^32 — `(lo*m + ((hi*m) mod 2^32)*2^32) mod 2^64`.
    */
  def mulSplit(v: String, m: Long): String = {
    val mu = u(m)
    s"((($v) % 4294967296 * $mu + " +
      s"((($v) // 4294967296 * $mu) % 4294967296) * 4294967296) % $Wrap)"
  }

  /** UTF-8 bytes of an (ASCII — asserted in QueryCatalogSpec) string column
    * as a HUGEINT list, 1 element per byte.
    */
  def byteList(text: String): String =
    s"list_transform(generate_series(1, length($text)), i -> CAST(ascii(($text)[i]) AS HUGEINT))"
}

/** DuckDB oracle SQL for the MinHash-LSH and SimHash near-dup queries —
  * full reimplementations of the native sketch kernels
  * ([[org.apache.spark.sql.graftx.SketchKernels]]) in mod-2^64 SQL, so even
  * the sketch-driven candidate generation is hash-checked by the driver, not
  * just recall-tested. The splitmix finalizer is staged through chained
  * `list_transform` CTEs (one step per stage) to keep the expression tree
  * linear instead of exponentially duplicated.
  */
private[graft] object SketchOracleSql {
  import U64Sql._

  /** Rolling polynomial fold of a SQL string expression — the per-token
    * replay of [[org.apache.spark.sql.graftx.RollingHash]]'s full-string
    * hash, usable inside a lambda (the bound variable must not be named
    * `i`/`h`/`b`, which the generated lambdas use internally).
    */
  def tokenFoldSql(expr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS HUGEINT), ${byteList(expr)}), " +
      s"(h, b) -> (h * ${RollingHash.Base} + b) % $Wrap)"

  /** FNV-1a 64 body over a shingle string's bytes, seeded. */
  private def fnvFold(sg: String, seed: Long): String = {
    val init = u(seed ^ SketchKernels.FnvOffset)
    s"list_reduce(list_prepend(CAST('$init' AS HUGEINT), ${byteList(sg)}), " +
      s"(h, b) -> ((h - h % 256 + " +
      s"CAST(xor(CAST(h % 256 AS BIGINT), CAST(b AS BIGINT)) AS HUGEINT)) * " +
      s"${SketchKernels.FnvPrime}) % $Wrap)"
  }

  /** splitmix finalizer staged over a list column: returns (colName, expr)
    * pairs to be threaded through successive CTEs; the last colName holds the
    * finalized hashes.
    */
  private def finalizerStages(src: String, prefix: String): Seq[(String, String)] = Seq(
    (s"${prefix}_a", s"list_transform($src, h -> ${xorShift("h", 30)})"),
    (s"${prefix}_b", s"list_transform(${prefix}_a, h -> ${mulSplit("h", SketchKernels.Mix1)})"),
    (s"${prefix}_c", s"list_transform(${prefix}_b, h -> ${xorShift("h", 27)})"),
    (s"${prefix}_d", s"list_transform(${prefix}_c, h -> ${mulSplit("h", SketchKernels.Mix2)})"),
    (s"${prefix}_e", s"list_transform(${prefix}_d, h -> ${xorShift("h", 31)})"))

  /** Word shingles of length n over single-space tokens `tk`, with the same
    * short-document clamp as SketchKernels.minHashSig (>= 1 shingle always).
    * Public: also the oracle for the ShingleGenerator table function.
    */
  def shingleList(n: Int): String =
    s"list_transform(generate_series(1, greatest(len(tk) - $n + 1, 1)), " +
      s"i -> array_to_string(tk[i:least(i + $n - 1, len(tk))], ' '))"

  /** Distinct-shingle-set Jaccard (mirrors TextFunctions.shingleJaccard). */
  private def jaccard(a: String, b: String): String =
    s"CAST(len(list_intersect($a, $b)) AS DOUBLE) / " +
      s"CAST(len($a) + len($b) - len(list_intersect($a, $b)) AS DOUBLE)"

  private def chainStages(stages: Seq[(String, String)], from: String,
      tag: String): (String, String) = {
    var prev = from
    val sb = new StringBuilder
    stages.zipWithIndex.foreach { case ((c, e), i) =>
      sb.append(s", $tag$i AS (SELECT *, $e AS $c FROM $prev)\n")
      prev = s"$tag$i"
    }
    (sb.toString, prev)
  }

  /** WITH-prefix computing per-doc MinHash signatures and rolling band keys:
    * CTEs `sh` (doc_id, shingles), `sig` (doc_id, sig — signed values), and
    * `bands` (doc_id, band, band_hash). Shared by the near-dup and
    * band-index-probe oracles.
    */
  private def sigAndBandsCte(shingleLen: Int, numHashes: Int,
      rowsPerBand: Int, src: String = "documents"): String = {
    val h1Stages = finalizerStages("r1", "f1")
    val h2Stages = finalizerStages("r2", "f2")
    val (chain, last) = chainStages(h1Stages ++ h2Stages, "raw", "st")
    val h1 = h1Stages.last._1
    val h2 = h2Stages.last._1
    val numBands = numHashes / rowsPerBand
    val bandFold =
      s"list_reduce(list_prepend(CAST(band AS HUGEINT), " +
        s"list_transform(sig[band*$rowsPerBand+1:band*$rowsPerBand+$rowsPerBand], " +
        s"v -> ${unsignedVal("v")})), " +
        s"(h, v) -> (h * ${RollingHash.Base} + v) % $Wrap)"
    val sigMin = signedVal(s"(($h1[s]) + j * (h2o[s])) % $Wrap")
    s"""WITH tk0 AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM $src
       |), sh AS (
       |  SELECT doc_id, text, ${shingleList(shingleLen)} AS shingles FROM tk0
       |), raw AS (
       |  SELECT doc_id,
       |    list_transform(shingles, sg -> ${fnvFold("sg", 0L)}) AS r1,
       |    list_transform(shingles, sg -> ${fnvFold("sg", SketchKernels.GoldenGamma)}) AS r2,
       |    shingles
       |  FROM sh
       |)
       |$chain, oddh2 AS (
       |  SELECT *, list_transform($h2, h -> h - h % 2 + 1) AS h2o FROM $last
       |), sig AS (
       |  SELECT doc_id,
       |    list_transform(generate_series(0, ${numHashes - 1}),
       |      j -> list_min(list_transform(generate_series(1, len($h1)),
       |             s -> $sigMin))) AS sig
       |  FROM oddh2
       |), bands AS (
       |  SELECT doc_id, band, ${toBigint(bandFold)} AS band_hash
       |  FROM sig, generate_series(0, ${numBands - 1}) g(band)
       |)""".stripMargin
  }

  /** Oracle for `Dedup.minHashNearDups`: signature → rolling band keys →
    * same-band candidate pairs → exact shingle-Jaccard verification.
    */
  def minHashNearDupsSql(threshold: Double, shingleLen: Int = 3,
      numHashes: Int = 24, rowsPerBand: Int = 4): String = {
    val jac = jaccard("x.sset", "y.sset")
    s"""${sigAndBandsCte(shingleLen, numHashes, rowsPerBand)}, cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
       |  WHERE a.doc_id < b.doc_id
       |), shd AS (
       |  SELECT doc_id, list_distinct(shingles) AS sset FROM sh
       |)
       |SELECT doc_a, doc_b, $jac AS jaccard
       |FROM cand JOIN shd x ON x.doc_id = doc_a JOIN shd y ON y.doc_id = doc_b
       |WHERE $jac >= $threshold
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Oracle for `Dedup.contrastivePairs`: LSH candidates classified by
    * exact shingle-Jaccard into positives (≥ posThreshold) and hard
    * negatives (in [negLo, negHi) — same blocking bucket, verifiably NOT
    * near-dups), aggregated per class.
    */
  def contrastivePairsSql(posThreshold: Double, negLo: Double,
      negHi: Double, shingleLen: Int = 3, numHashes: Int = 24,
      rowsPerBand: Int = 4): String = {
    val jac = jaccard("x.sset", "y.sset")
    s"""${sigAndBandsCte(shingleLen, numHashes, rowsPerBand)}, cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
       |  WHERE a.doc_id < b.doc_id
       |), shd AS (
       |  SELECT doc_id, list_distinct(shingles) AS sset FROM sh
       |), cls AS (
       |  SELECT doc_a, doc_b,
       |    CASE WHEN $jac >= $posThreshold THEN 'pos'
       |         WHEN $jac >= $negLo AND $jac < $negHi THEN 'neg'
       |         ELSE NULL END AS kind
       |  FROM cand JOIN shd x ON x.doc_id = doc_a JOIN shd y ON y.doc_id = doc_b)
       |SELECT kind, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |  CAST(bit_xor(doc_a * 1000000 + doc_b) AS BIGINT) AS pair_xor
       |FROM cls WHERE kind IS NOT NULL
       |GROUP BY kind ORDER BY kind""".stripMargin
  }

  /** Oracle for the planted near-dup evaluation (`q_neardup_eval`):
    * `corpusSql` defines the evaluation corpus (doc_id, text) — base
    * sample plus planted perturbed copies at ids ≥ `plantedFrom`. Ground
    * truth = ALL pairs with exact shingle-Jaccard ≥ threshold (brute
    * force over the bounded sample); system = the banded LSH pipeline's
    * verified pairs (replayed bit-for-bit); the output row carries truth/
    * found/planted counts and integer recall. Precision is 1 by
    * construction (the system verifies candidates with the same exact
    * Jaccard), so recall is the number under test.
    */
  def neardupEvalSql(corpusSql: String, plantedFrom: Long, threshold: Double,
      shingleLen: Int = 3, numHashes: Int = 24, rowsPerBand: Int = 4,
      label: String = "b6r4"): String = {
    val jac = jaccard("x.sset", "y.sset")
    val body = sigAndBandsCte(shingleLen, numHashes, rowsPerBand, "corpus")
      .stripPrefix("WITH ")
    s"""WITH corpus AS ($corpusSql),
       |$body, cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
       |  WHERE a.doc_id < b.doc_id
       |), shd AS (
       |  SELECT doc_id, list_distinct(shingles) AS sset FROM sh
       |), lsh AS (
       |  SELECT doc_a, doc_b
       |  FROM cand JOIN shd x ON x.doc_id = doc_a JOIN shd y ON y.doc_id = doc_b
       |  WHERE $jac >= $threshold
       |), truth AS (
       |  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b
       |  FROM shd x JOIN shd y ON y.doc_id > x.doc_id
       |  WHERE $jac >= $threshold
       |), lab AS (
       |  SELECT t.doc_a, t.doc_b, (l.doc_a IS NOT NULL) AS found,
       |    (t.doc_b >= $plantedFrom) AS planted
       |  FROM truth t LEFT JOIN lsh l
       |    ON l.doc_a = t.doc_a AND l.doc_b = t.doc_b)
       |SELECT '$label' AS config, CAST(COUNT(*) AS BIGINT) AS n_truth,
       |  CAST(SUM(CASE WHEN found THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       |  CAST(SUM(CASE WHEN planted THEN 1 ELSE 0 END) AS BIGINT) AS n_planted,
       |  CAST(SUM(CASE WHEN planted AND found THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_planted_found,
       |  CAST(SUM(CASE WHEN found THEN 1 ELSE 0 END) * 1000 // COUNT(*)
       |    AS BIGINT) AS recall_milli
       |FROM lab""".stripMargin
  }

  /** Oracle for `Dedup.probeBandIndex` with the corpus split at `splitId`
    * (index = ids below, probe batch = ids at or above): band-equality
    * candidates across the split, estimated Jaccard = fraction of agreeing
    * signature positions.
    */
  def bandIndexProbeSql(splitId: Long, minEstJaccard: Double,
      shingleLen: Int = 3, numHashes: Int = 24, rowsPerBand: Int = 4): String =
    s"""${sigAndBandsCte(shingleLen, numHashes, rowsPerBand)}, cand AS (
       |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS indexed_id
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
       |  WHERE a.doc_id >= $splitId AND b.doc_id < $splitId
       |), est AS (
       |  SELECT new_id, indexed_id,
       |    CAST(len(list_filter(generate_series(1, $numHashes),
       |      i -> x.sig[i] = y.sig[i])) AS DOUBLE) / $numHashes AS est_jaccard
       |  FROM cand JOIN sig x ON x.doc_id = new_id JOIN sig y ON y.doc_id = indexed_id
       |)
       |SELECT new_id, indexed_id, est_jaccard FROM est
       |WHERE est_jaccard >= $minEstJaccard ORDER BY new_id, indexed_id""".stripMargin

  /** Oracle for the streaming near-dup ingest gate
    * (`DocsStream.neardupGateDrain` over a base index of ids below
    * `splitId`): every canonical candidate pair whose LATER member (the
    * greater doc_id) is a stream arrival — in-batch, cross-batch, and
    * vs-base pairs all collapse to this one condition because the drain
    * evaluates each pair exactly once. Estimated Jaccard = fraction of
    * agreeing signature positions, same as the probe.
    */
  def streamIngestGateSql(splitId: Long, minEstJaccard: Double,
      shingleLen: Int = 3, numHashes: Int = 24, rowsPerBand: Int = 4): String =
    s"""${sigAndBandsCte(shingleLen, numHashes, rowsPerBand)}, cand AS (
       |  SELECT DISTINCT a.doc_id AS hi_id, b.doc_id AS lo_id
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.band_hash = b.band_hash
       |  WHERE a.doc_id > b.doc_id AND a.doc_id >= $splitId
       |), est AS (
       |  SELECT hi_id, lo_id,
       |    CAST(len(list_filter(generate_series(1, $numHashes),
       |      i -> x.sig[i] = y.sig[i])) AS DOUBLE) / $numHashes AS est_jaccard
       |  FROM cand JOIN sig x ON x.doc_id = hi_id JOIN sig y ON y.doc_id = lo_id
       |)
       |SELECT hi_id, lo_id, est_jaccard FROM est
       |WHERE est_jaccard >= $minEstJaccard ORDER BY hi_id, lo_id""".stripMargin

  /** Oracle for `Dedup.simHashNearDups`: per-shingle hash → 64 bit votes →
    * signature → 16-bit quarter blocking → `bit_count(xor)` Hamming filter.
    */
  def simHashNearDupsSql(maxHamming: Int, shingleLen: Int = 2): String = {
    val h1Stages = finalizerStages("r1", "g1")
    val (chain, last) = chainStages(h1Stages, "raw", "su")
    val h1 = h1Stages.last._1
    val sigSum = signedVal(
      s"""list_reduce(list_prepend(CAST(0 AS HUGEINT), list_transform(generate_series(0, 63),
         |      bit -> CASE WHEN list_sum(list_transform($h1,
         |          h -> CASE WHEN (h // CAST(power(2, bit) AS HUGEINT)) % 2 = 1 THEN 1 ELSE -1 END)) > 0
         |        THEN CAST(power(2, bit) AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)),
         |      (a, b) -> a + b)""".stripMargin)
    s"""WITH tk0 AS (
       |  SELECT doc_id, text, string_split(text, ' ') AS tk FROM documents
       |), sh AS (
       |  SELECT doc_id, ${shingleList(shingleLen)} AS shingles FROM tk0
       |), raw AS (
       |  SELECT doc_id, list_transform(shingles, sg -> ${fnvFold("sg", 0L)}) AS r1 FROM sh
       |)
       |$chain, sg AS (
       |  SELECT doc_id, CAST($sigSum AS BIGINT) AS sig FROM $last
       |), q AS (
       |  SELECT doc_id, sig, qi,
       |    CAST((${unsignedVal("sig")} // CAST(power(2, qi*16) AS HUGEINT)) % 65536 AS BIGINT) AS qhash
       |  FROM sg, generate_series(0, 3) g(qi)
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
       |FROM q a JOIN q b ON a.qi = b.qi AND a.qhash = b.qhash
       |WHERE a.doc_id < b.doc_id AND bit_count(xor(a.sig, b.sig)) <= $maxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** Span-level exact-substring dedup, full density: doc pairs sharing any
    * identical k-char window, with the count of distinct shared window
    * contents. Pure relational — window extraction is `substr`, the join
    * key is the content itself, so no hash replay is needed.
    */
  def substringDedupSql(k: Int): String =
    s"""WITH w AS (
       |  SELECT DISTINCT doc_id, substr(text, CAST(i AS INTEGER), $k) AS sub
       |  FROM documents, LATERAL unnest(generate_series(1, length(text) - ${k - 1})) AS t(i)
       |  WHERE length(text) >= $k
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM w a JOIN w b ON a.sub = b.sub AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Winnowed span-level dedup: full replay of the
    * [[org.apache.spark.sql.graftx.SubstrAnchors]] kernel — per-position
    * mod-2^64 polynomial window hashes, the packed `(h >>> 33) << 32 | pos`
    * selection key, and the sliding-window minimum (every full window of
    * `w` positions; the whole document if it has fewer than `w` windows) —
    * then the same content-keyed pair join as the full-density query.
    * Detection of sharing is hash-SELECTED but content-VERIFIED in both
    * engines, so the hash replay can only change which pairs surface, and
    * any kernel/SQL drift surfaces as a hash mismatch.
    */
  def winnowPairsSql(k: Int, w: Int): String = {
    val base = org.apache.spark.sql.graftx.RollingHash.Base
    // fold h := (h * Base + codepoint) mod 2^64 over the k-char window
    // (the window string is materialized as `sub` in a prior CTE — inlining
    // it here would put the outer position `i` inside byteList's lambda,
    // where the lambda's own `i` shadows it)
    val fold = s"list_reduce(list_prepend(CAST(0 AS HUGEINT), " +
      s"${byteList("sub")}), " +
      s"(h, c) -> (${mulSplit("h", base)} + c) % $Wrap)"
    s"""WITH wins AS (
       |  SELECT doc_id, text, CAST(i AS BIGINT) AS i,
       |    CAST(length(text) - ${k - 1} AS BIGINT) AS m,
       |    substr(text, CAST(i AS INTEGER), $k) AS sub
       |  FROM documents, LATERAL unnest(generate_series(1, length(text) - ${k - 1})) AS t(i)
       |  WHERE length(text) >= $k
       |), hashes AS (
       |  SELECT doc_id, text, i, m,
       |    CAST(($fold) // 8589934592 * 4294967296 + i AS BIGINT) AS key
       |  FROM wins
       |), mins AS (
       |  SELECT doc_id, text, i, m,
       |    MIN(key) OVER (PARTITION BY doc_id ORDER BY i
       |      ROWS BETWEEN CURRENT ROW AND ${w - 1} FOLLOWING) AS sel
       |  FROM hashes
       |), anchors AS (
       |  SELECT DISTINCT doc_id,
       |    substr(text, CAST(sel % 4294967296 AS INTEGER), $k) AS sub
       |  FROM mins WHERE i <= greatest(1, m - ${w - 1})
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(COUNT(*) AS BIGINT) AS n_shared
       |FROM anchors a JOIN anchors b ON a.sub = b.sub AND a.doc_id < b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
