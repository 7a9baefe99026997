package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import org.apache.spark.sql.graftx.RollingHash.rolling_hash

/** Document deduplication at training-data-pipeline scale.
  *
  * Every variant here is shuffle-bounded by design:
  *  - exact: one hash-aggregate on the text (or its 64-bit fingerprint —
  *    group on 8 bytes, not multi-KB strings).
  *  - MinHash/LSH and SimHash: candidate generation via equality joins on
  *    band/bucket keys (hash-partitioned, no O(n²) cross join); exact
  *    verification only within candidate pairs.
  * The reference has no dedup beyond `SELECT DISTINCT` on partition values
  * (`/root/reference/sqoop_table.py:145`); these are north-star additions.
  */
object Dedup {

  /** Exact dedup keyed by the raw text — oracle-parity/reference variant
    * only, deliberately NOT public API: at 100 TB grouping on multi-KB
    * strings shuffles document bodies. [[exactByFingerprint]] is the
    * flagship path (16-byte shuffle rows); this stays `private[graft]` so
    * the text-keyed formulation exists only for spec parity checks.
    */
  private[graft] def exactTextKeyed(docs: DataFrame): DataFrame =
    docs.groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

  /** Flagship exact dedup, keyed by 64-bit fingerprint — the shuffle carries
    * (long, long) pairs only, never document bodies (plan-asserted in
    * PlanSpec). Collision odds at 100 TB (~1e10 docs) are ~1e-20 per pair;
    * [[exactByFingerprintVerified]] adds a cheap second-hash check.
    */
  def exactByFingerprint(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), rolling_hash(col("text")).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))

  /** [[exactByFingerprint]] plus collision verification via an independent
    * 256-bit content hash: `n_distinct_sha > 1` marks a fingerprint group
    * that mixes different texts (expected none). Shuffle rows grow to
    * 8B fp + 64-char sha — still content-size-independent.
    */
  def exactByFingerprintVerified(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), rolling_hash(col("text")).as("fp"),
        sha2(col("text"), 256).as("h2"))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"),
        countDistinct(col("h2")).as("n_distinct_sha"))

  /** Benchmark decontamination: flag every corpus doc sharing at least one
    * word n-gram with a benchmark/eval set — the standard guard against
    * test-set leakage into training data.
    *
    * Scale shape: grams are fingerprinted to 64-bit rolling hashes BEFORE
    * the join, so the shuffle carries (long, long) rows, never gram strings;
    * the benchmark side (eval suites are small — thousands of docs) is
    * broadcast, making contamination detection a map-only pass over the
    * corpus at any corpus size. A 64-bit collision can only over-flag (drop
    * a clean doc), never leak a contaminated one.
    *
    * @return one row per corpus doc: doc_id, contaminated
    */
  def decontaminate(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8): DataFrame = {
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), n)).as("gram"))
    val bad = grams(docs)
      .select(col("doc_id"), rolling_hash(col("gram")).as("g"))
      .join(broadcast(grams(benchmark)
        .select(rolling_hash(col("gram")).as("g")).distinct()), Seq("g"))
      .select(col("doc_id")).distinct()
    docs.join(bad.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Decontamination with a bloom-filter prefilter instead of a broadcast
    * hash join — the shape for when the benchmark gram set is too large to
    * broadcast as keys but fine as bits (the two-phase runtime-filter
    * architecture: bloom prune first, exact join only the survivors).
    *
    * Phase 1 aggregates the benchmark gram fingerprints into ONE bloom
    * filter (partial aggregation merges per-partition filters — one byte
    * blob per partition crosses the wire). Phase 2 probes every corpus gram
    * against the broadcast bloom — a codegen-native map-side filter that
    * discards ~(1-fpp) of non-contaminated grams before any shuffle. Phase
    * 3 exactly joins only the bloom survivors against the benchmark grams,
    * so false positives are eliminated and the RESULT IS EXACT — identical
    * to [[decontaminate]], which is what the oracle checks.
    */
  def decontaminateBloom(docs: DataFrame, benchmark: DataFrame,
      n: Int = 8, fpp: Double = 0.01,
      expectedItems: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.graftx.Sketches
    def grams(df: DataFrame) = df.select(col("doc_id"),
      explode(TextFunctions.wordShingles(col("text"), n)).as("gram"))
    val benchGrams = grams(benchmark)
      .select(rolling_hash(col("gram")).as("g")).distinct()
    // one aggregated scalar crosses to the driver — the same dataflow as
    // Spark's own InjectRuntimeFilter (its ScalarSubquery is also
    // driver-materialized, then shipped with the plan); might_contain
    // requires a constant/scalar-subquery bloom side
    val blob = benchGrams
      .agg(Sketches.bloom_agg(col("g"), expectedItems, fpp).as("bloom"))
      .head().getAs[Array[Byte]]("bloom")
    val survivors = grams(docs)
      .select(col("doc_id"), rolling_hash(col("gram")).as("g"))
      .filter(Sketches.bloom_might_contain(lit(blob), col("g")))
    val bad = survivors.join(benchGrams, Seq("g"))
      .select(col("doc_id")).distinct()
    docs.join(bad.withColumn("contaminated", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Source-preference dedup: when the same text appears in several
    * sources (curated set ∩ web crawl), keep exactly one copy — the one
    * with the lowest (priority, doc_id). The winner election is a
    * fingerprint-keyed aggregate (min over a (prio, doc_id) struct —
    * ~24-byte shuffle rows, never text), then one semi join brings back
    * the winning rows; the corpus shuffles its payload at most once.
    */
  def preferredCopy(docs: DataFrame, priority: Column): DataFrame = {
    val winners = docs
      .select(rolling_hash(col("text")).as("fp"), priority.as("prio"),
        col("doc_id"))
      .groupBy(col("fp"))
      .agg(min(struct(col("prio"), col("doc_id"))).as("w"))
      .select(col("w.doc_id").as("doc_id"))
    docs.join(winners, Seq("doc_id"), "left_semi")
  }

  // ---------------------------------------------------------------- MinHash

  /** MinHash signature of the word-shingle set — native codegen expression
    * ([[org.apache.spark.sql.graftx.MinHashSigExpr]]): one pass over the
    * UTF-8 bytes, double-hashing for the k functions, no per-shingle
    * allocation. (The equivalent higher-order-function formulation measured
    * ~20× slower at sf0.01.) Map-only at any scale.
    */
  def minHashSignature(text: Column, shingleLen: Int, numHashes: Int): Column =
    org.apache.spark.sql.graftx.Sketches.minhash_sig(text, shingleLen, numHashes)

  /** LSH banding: split the signature into bands of `rowsPerBand`, hash each
    * band → (doc_id, band_idx, band_hash). Docs sharing any band hash are
    * candidate near-dups. Equality join on (band_idx, band_hash) shuffles by
    * hash — fully parallel, skew-bounded by band-hash cardinality. The band
    * key is a native rolling fold ([[org.apache.spark.sql.graftx.BandHashes]])
    * so the DuckDB oracle reproduces it exactly.
    */
  def minHashBands(docs: DataFrame, shingleLen: Int = 3, numHashes: Int = 24,
      rowsPerBand: Int = 4): DataFrame =
    bandsFromSigs(docs.select(col("doc_id"),
      minHashSignature(col("text"), shingleLen, numHashes).as("sig")), rowsPerBand)

  /** Band keys derived from an ALREADY-COMPUTED signature frame
    * `(doc_id, sig)` — lets a caller that needs both sigs and bands run the
    * signature kernel once (it is the dominant map cost at corpus scale).
    */
  def bandsFromSigs(sigs: DataFrame, rowsPerBand: Int = 4): DataFrame =
    sigs
      .select(col("doc_id"), posexplode(
        org.apache.spark.sql.graftx.Sketches.band_hashes(col("sig"), rowsPerBand)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")

  /** Candidate pairs from LSH banding (doc_a < doc_b, distinct). */
  def minHashCandidates(docs: DataFrame, shingleLen: Int = 3, numHashes: Int = 24,
      rowsPerBand: Int = 4): DataFrame = {
    val bands = minHashBands(docs, shingleLen, numHashes, rowsPerBand)
    val a = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** MinHash near-dup pairs, verified with exact shingle-set Jaccard ≥
    * threshold (the same unit the sketch approximates). Verification joins
    * text back only for candidate pairs (tiny vs n²).
    */
  def minHashNearDups(docs: DataFrame, threshold: Double, shingleLen: Int = 3,
      numHashes: Int = 24, rowsPerBand: Int = 4): DataFrame = {
    val cand = minHashCandidates(docs, shingleLen, numHashes, rowsPerBand)
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    cand.join(ta, "doc_a").join(tb, "doc_b")
      .withColumn("jaccard",
        TextFunctions.shingleJaccard(col("text_a"), col("text_b"), shingleLen))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Contrastive training-pair generation for embedding models: LSH
    * candidates classified by exact shingle-Jaccard into POSITIVES
    * (≥ posThreshold — genuine near-dups, the anchor/positive pairs) and
    * HARD NEGATIVES (in [negLo, negHi) — documents the blocking considered
    * similar but verification rejects, exactly the confusable pairs a
    * contrastive loss needs). Same banded shape as near-dup detection:
    * candidates come from the band join, never all-pairs; verification
    * joins text only for candidates.
    */
  def contrastivePairs(docs: DataFrame, posThreshold: Double = 0.7,
      negLo: Double = 0.2, negHi: Double = 0.5, shingleLen: Int = 3,
      numHashes: Int = 24, rowsPerBand: Int = 4): DataFrame = {
    val cand = minHashCandidates(docs, shingleLen, numHashes, rowsPerBand)
    val ta = docs.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val tb = docs.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    cand.join(ta, "doc_a").join(tb, "doc_b")
      .withColumn("jaccard",
        TextFunctions.shingleJaccard(col("text_a"), col("text_b"), shingleLen))
      .withColumn("kind",
        when(col("jaccard") >= lit(posThreshold), lit("pos"))
          .when(col("jaccard") >= lit(negLo) && col("jaccard") < lit(negHi),
            lit("neg")))
      .filter(col("kind").isNotNull)
      .select(col("doc_a"), col("doc_b"), col("kind"), col("jaccard"))
  }

  /** Persistent MinHash band index — the incremental-dedup shape: build the
    * index over the existing corpus ONCE, then probe each arriving batch
    * against it without touching (or re-reading) historical text. Two
    * stores: `path/sigs` (doc_id, signature) and `path/bands` (doc_id, band,
    * band_hash), the latter written partitioned by `band` so a probe scans
    * only matching band partitions. `mode=append` makes successive batches
    * accumulate — call with each new batch after probing it.
    */
  def buildBandIndex(docs: DataFrame, path: String, shingleLen: Int = 3,
      numHashes: Int = 24, rowsPerBand: Int = 4,
      mode: String = "append"): Unit = {
    docs.select(col("doc_id"),
        minHashSignature(col("text"), shingleLen, numHashes).as("sig"))
      .write.mode(mode).parquet(s"$path/sigs")
    minHashBands(docs, shingleLen, numHashes, rowsPerBand)
      .write.mode(mode).partitionBy("band").parquet(s"$path/bands")
  }

  /** Signature-estimated Jaccard: fraction of agreeing minhash positions —
    * THE estimate of the band-index family; every probe path shares this
    * one definition so the batch probe, the streaming gate, and the oracle
    * SQL cannot drift apart.
    */
  private def estJaccard(a: Column, b: Column, numHashes: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), m => m))
      .cast("double") / lit(numHashes)

  /** Core of every band-index probe: an already-computed `(doc_id, sig)`
    * frame against the store at `path` — banding join for candidates,
    * `estJaccard` to score. Returns (new_id, indexed_id, est_jaccard)
    * with est ≥ `minEstJaccard`.
    */
  def probeSigsAgainstIndex(sigs: DataFrame,
      spark: org.apache.spark.sql.SparkSession, path: String,
      minEstJaccard: Double, numHashes: Int = 24,
      rowsPerBand: Int = 4): DataFrame = {
    val idxBands = spark.read.parquet(s"$path/bands")
      .select(col("band"), col("band_hash"), col("doc_id").as("indexed_id"))
    val idxSigs = spark.read.parquet(s"$path/sigs")
      .select(col("doc_id").as("indexed_id"), col("sig").as("sig_idx"))
    bandsFromSigs(sigs, rowsPerBand)
      .select(col("band"), col("band_hash"), col("doc_id").as("new_id"))
      .join(idxBands, Seq("band", "band_hash"))
      .filter(col("new_id") =!= col("indexed_id"))
      .select("new_id", "indexed_id").distinct()
      .join(sigs.select(col("doc_id").as("new_id"), col("sig").as("sig_new")), "new_id")
      .join(idxSigs, "indexed_id")
      .withColumn("est_jaccard",
        estJaccard(col("sig_new"), col("sig_idx"), numHashes))
      .filter(col("est_jaccard") >= lit(minEstJaccard))
      .select(col("new_id"), col("indexed_id"), col("est_jaccard"))
  }

  /** Probe a new batch against a [[buildBandIndex]] store: banding join for
    * candidates, then signature-estimated Jaccard (fraction of agreeing
    * minhash positions) — no historical text needed, so probe cost is
    * new-batch bands × matching index partitions. Returns
    * (new_id, indexed_id, est_jaccard) with est ≥ `minEstJaccard`.
    */
  def probeBandIndex(newDocs: DataFrame, spark: org.apache.spark.sql.SparkSession,
      path: String, minEstJaccard: Double, shingleLen: Int = 3,
      numHashes: Int = 24, rowsPerBand: Int = 4): DataFrame =
    probeSigsAgainstIndex(
      newDocs.select(col("doc_id"),
        minHashSignature(col("text"), shingleLen, numHashes).as("sig")),
      spark, path, minEstJaccard, numHashes, rowsPerBand)

  /** One micro-batch through the streaming near-dup INGEST GATE over a
    * persistent band index: emit (1) in-batch candidate pairs and (2)
    * batch-vs-index pairs, both scored by signature-estimated Jaccard and
    * canonicalized as `(hi_id, lo_id)` with `hi_id > lo_id`. The caller
    * appends the batch's own bands+sigs AFTER probing
    * ([[buildBandIndex]] `mode=append`), so across a whole drain every
    * near-dup pair is evaluated EXACTLY ONCE — in the micro-batch where its
    * later-arriving member lands — and the emitted pair SET is independent
    * of micro-batch boundaries: the property that makes a streaming drain
    * replayable by the same batch oracle. Probe cost per batch is batch
    * bands × matching band partitions; historical text is never re-read —
    * the 100 TB online-dedup shape.
    */
  def ingestGateBatch(batch: DataFrame, spark: org.apache.spark.sql.SparkSession,
      path: String, minEstJaccard: Double, shingleLen: Int = 3,
      numHashes: Int = 24, rowsPerBand: Int = 4): DataFrame =
    ingestGateFromSigs(
      batch.select(col("doc_id"),
        minHashSignature(col("text"), shingleLen, numHashes).as("sig")),
      spark, path, minEstJaccard, numHashes, rowsPerBand)

  /** [[ingestGateBatch]] over an already-computed (and ideally persisted)
    * `(doc_id, sig)` frame: the signature kernel — the dominant map cost of
    * the gate at corpus scale — runs ONCE per arriving document, with
    * bands, in-batch estimates, index-probe estimates, and the
    * [[appendSigsToIndex]] call all derived from the same frame.
    */
  def ingestGateFromSigs(sigs: DataFrame, spark: org.apache.spark.sql.SparkSession,
      path: String, minEstJaccard: Double, numHashes: Int = 24,
      rowsPerBand: Int = 4): DataFrame = {
    val vsIndex =
      probeSigsAgainstIndex(sigs, spark, path, minEstJaccard, numHashes, rowsPerBand)
        .select(greatest(col("new_id"), col("indexed_id")).as("hi_id"),
          least(col("new_id"), col("indexed_id")).as("lo_id"),
          col("est_jaccard"))

    val bands = bandsFromSigs(sigs, rowsPerBand)
    val a = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val b = bands.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    val inBatch = a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .withColumn("est_jaccard", estJaccard(col("sig_a"), col("sig_b"), numHashes))
      .filter(col("est_jaccard") >= lit(minEstJaccard))
      .select(col("doc_b").as("hi_id"), col("doc_a").as("lo_id"),
        col("est_jaccard"))
    vsIndex.unionByName(inBatch)
  }

  /** Append an already-computed `(doc_id, sig)` frame to a
    * [[buildBandIndex]] store — both the sig store and the band-partitioned
    * store derive from the one frame, no re-read of text.
    */
  def appendSigsToIndex(sigs: DataFrame, path: String,
      rowsPerBand: Int = 4): Unit = {
    sigs.write.mode("append").parquet(s"$path/sigs")
    bandsFromSigs(sigs, rowsPerBand)
      .write.mode("append").partitionBy("band").parquet(s"$path/bands")
  }

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word shingles: per bit, sum +1/-1 votes of each
    * shingle's hash bit; bit set iff the vote is positive. Native codegen
    * expression ([[org.apache.spark.sql.graftx.SimHashExpr]]) — the
    * higher-order-function formulation of the same math measured 42 s for
    * 500 docs; this runs at scan speed.
    */
  def simHash(text: Column, shingleLen: Int = 2): Column =
    org.apache.spark.sql.graftx.Sketches.simhash64(text, shingleLen)

  /** Hamming-near pairs over any 64-bit signature frame `(doc_id, sig)`:
    * block by the 4 16-bit quarters (two sigs within Hamming distance 3
    * share at least one exact quarter — pigeonhole, exact for
    * `maxHamming` ≤ 3), join per block, verify Hamming ≤ maxHamming via
    * `bit_count(xor)`. The shared kernel under text SimHash and image
    * dHash near-dup — only 16-byte rows in the pair shuffle.
    */
  def hammingPairs(withSig: DataFrame, maxHamming: Int): DataFrame = {
    val blocked = withSig.select(col("doc_id"), col("sig"), posexplode(
      transform(sequence(lit(0), lit(3)),
        q => call_function("shiftright", col("sig"), q * lit(16)).bitwiseAND(lit(0xffffL)))))
      .withColumnRenamed("pos", "q").withColumnRenamed("col", "qhash")
    val a = blocked.select(col("q"), col("qhash"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = blocked.select(col("q"), col("qhash"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("q", "qhash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= lit(maxHamming))
  }

  /** SimHash near-dup pairs: [[hammingPairs]] over [[simHash]] signatures. */
  def simHashNearDups(docs: DataFrame, maxHamming: Int = 3,
      shingleLen: Int = 2): DataFrame =
    hammingPairs(
      docs.select(col("doc_id"), simHash(col("text"), shingleLen).as("sig")),
      maxHamming)

  // ------------------------------------------------------- n-gram Jaccard

  /** Blocked n-gram Jaccard near-dup pairs: block on (lang, length bucket) to
    * bound the quadratic comparison to within-block pairs, then exact
    * token-set Jaccard. At 100 TB the block key keeps each join partition
    * small; skewed blocks can be salted.
    */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
      lenBucket: Int = 100): DataFrame = {
    // Tokenize + hash ONCE per doc before the pair join: distinct tokens →
    // xxhash64 → sorted long array. Per pair, intersection size is then a
    // native linear merge (SortedIntersectSize) and |A∪B| = |A|+|B|-|A∩B| —
    // no per-pair hash sets, no string comparisons. Same integer sizes as
    // the string-set formulation (64-bit collisions within a pair's ~100
    // tokens are negligible), so the DuckDB oracle still matches exactly.
    val keyed = docs.select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / lit(lenBucket)).as("len_bucket"),
      array_sort(transform(array_distinct(TextFunctions.tokens(col("text"))),
        t => xxhash64(t))).as("toks"))
    val a = keyed.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_a"), col("toks").as("toks_a"))
    val b = keyed.select(col("lang"), col("len_bucket"),
      col("doc_id").as("doc_b"), col("toks").as("toks_b"))
    val inter = org.apache.spark.sql.graftx.Sketches
      .sorted_intersect_size(col("toks_a"), col("toks_b"))
    a.join(b, Seq("lang", "len_bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard",
        inter.cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - inter).cast("double"))
      .filter(col("jaccard") >= lit(threshold))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Substring anchor rows for span-level dedup: one row per selected
    * k-char window — `(doc_id, pos, sub)`, distinct per (doc, content).
    * `w = 1` emits every window (exact); `w > 1` winnows to ~2/(w+1)
    * density with the deterministic guarantee that any shared span of
    * length >= k + w - 1 yields an identical anchor in both documents
    * ([[org.apache.spark.sql.graftx.SubstrAnchors]]).
    *
    * The anchor substring is materialized map-side (codegen `substring` on
    * the scan projection) so downstream joins never re-read document
    * bodies — at 100 TB the shuffle carries (8 B id + k chars) per anchor,
    * ~k/w bytes per corpus byte at the winnowed density.
    */
  def substringAnchorRows(docs: DataFrame, k: Int, w: Int): DataFrame = {
    val anchors = org.apache.spark.sql.graftx.Sketches
      .substr_anchors(col("text"), k, w)
    docs.select(col("doc_id"), col("text"), explode(anchors).as("key"))
      .select(col("doc_id"),
        col("key").bitwiseAND(lit(0xffffffffL)).cast("int").as("pos"),
        col("text").substr(
          col("key").bitwiseAND(lit(0xffffffffL)).cast("int"), lit(k))
          .as("sub"))
  }

  /** Span-level (ExactSubstr-style) duplicate pairs: documents sharing at
    * least one identical k-char substring, with the count of distinct
    * shared window contents. The join key is the window CONTENT itself, so
    * results are exact regardless of hash collisions (the rolling hash in
    * the kernel only selects which windows become anchors).
    *
    * `maxDocsPerAnchor > 0` drops anchors appearing in more than that many
    * documents before pairing — the standard stop-gram cap that keeps a
    * boilerplate chunk shared by 10^6 documents from exploding into 10^12
    * pairs at corpus scale (dropped anchors are boilerplate, not dup
    * signal; see Boilerplate.removeFrequentChunks for the removal path).
    */
  def substringDupPairs(docs: DataFrame, k: Int, w: Int = 1,
      maxDocsPerAnchor: Int = 0): DataFrame = {
    // the kernel emits per-doc-DISTINCT window contents (SubstrAnchorSubs):
    // the explode's required input is just doc_id, so the document body never
    // rides through the Generate and no separate distinct pass is needed —
    // the position-key formulation copied `text` into all ~len(text) anchor
    // rows and re-extracted each window with an O(pos) substr, which
    // dominated the pipeline's cost (~3× overall)
    val rows = docs
      .select(col("doc_id"),
        explode(org.apache.spark.sql.graftx.Sketches
          .substr_anchor_subs(col("text"), k, w)).as("sub"))
    val kept =
      if (maxDocsPerAnchor <= 0) rows
      else {
        val hot = rows.groupBy(col("sub"))
          .agg(count(lit(1)).as("n_docs"))
          .filter(col("n_docs") > lit(maxDocsPerAnchor))
          .select(col("sub"))
        rows.join(hot, Seq("sub"), "left_anti")
      }
    // SHUFFLE_HASH self-join on the content key: with per-doc-distinct
    // anchor rows the join directly enumerates distinct shared contents per
    // pair. Hashed build beats sort-merge here because the join key is the
    // k-char content whose sort dominates SMJ (measured 3×); per-partition
    // build memory = anchors/shuffle-partitions — the partition count is
    // the sizing knob, same discipline as every shuffled hash join. A
    // collect_set-of-doc-ids formulation was slower still: 10^6 string-keyed
    // groups push ObjectHashAggregate into its sort-based fallback.
    val a = kept.select(col("doc_id").as("doc_a"), col("sub"))
    val b = kept.select(col("doc_id").as("doc_b"), col("sub"))
    a.join(b.hint("SHUFFLE_HASH"), Seq("sub"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
  }
}
