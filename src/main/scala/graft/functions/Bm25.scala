package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over an inverted index.
  *
  * The index is the classic flat-postings relation `(token, doc_id, tf)`
  * hash-partitioned by token — NOT array-aggregated posting lists, which
  * would make stop-word rows unboundedly wide. At 100 TB the build is one
  * explode + one aggregate (the word-count shape, map-side partials); a
  * query touches only the partitions its terms hash to (an `isin` filter
  * the scanner pushes down when the index is persisted bucketed by token).
  *
  * Scoring follows the Lucene BM25 variant: idf = ln(1 + (N - df + .5) /
  * (df + .5)), tfNorm = tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl)). Each
  * per-(doc,term) contribution is quantized to integer micros so the
  * per-doc SUM is an exact long — order-independent across engines and
  * partitionings; ln/division is the only double step (the established
  * parity rule, see q_unigram_lm).
  *
  * Reference scope: the reference ships only generated SQL strings
  * (sqoop_table.py:125); retrieval over the documents corpus is part of the
  * north-star text surface.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Inverted index: one row per (token, doc_id) with the term frequency. */
  def buildIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token", "doc_id").agg(count(lit(1)).as("tf"))

  /** Document lengths in tokens (the dl term of the BM25 normalizer). */
  def docLengths(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** Score every document matching at least one query term.
    *
    * Returns `(doc_id, n_terms, score_u, score)` where `score_u` is the
    * exact long micro-score and `score` its double rendering. The postings
    * scan is filtered to the query terms BEFORE any join (at scale: only
    * the terms' hash buckets are read); df per term and the corpus stats
    * (N, avgdl — two scalars) come from broadcast-sized aggregates.
    */
  def score(index: DataFrame, docLens: DataFrame,
      terms: Seq[String], k1: Double = K1, b: Double = B): DataFrame = {
    val matched = index.filter(col("token").isin(terms: _*))
    val df = matched.groupBy("token").agg(count(lit(1)).as("df"))
    // avgdl as exact-long-sum / count: double summation order varies with
    // partitioning, an integer sum does not — the division is then exact
    // and engine-independent.
    val stats = docLens.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    matched
      .join(broadcast(df), "token")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"),
        round(idf * tfNorm * lit(1000000.0)).cast("long").as("u"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("u")).as("score_u"))
      .withColumn("score", col("score_u").cast("double") / lit(1000000.0))
  }

  /** Partition count for the persisted index store. */
  val IndexBuckets = 32

  /** Token → directory bucket, as a column (md5 bits, not Spark-internal
    * hash, so the same bucket is computable driver-side in [[bucketOf]]
    * and in oracle SQL).
    */
  def tokenBucket(token: org.apache.spark.sql.Column, buckets: Int): org.apache.spark.sql.Column =
    conv(substring(md5(token), 1, 4), 16, 10).cast("long") % buckets

  /** Driver-side twin of [[tokenBucket]] — used to enumerate which buckets
    * a query's terms live in BEFORE the scan, so partition pruning happens
    * at file-listing time.
    */
  def bucketOf(token: String, buckets: Int = IndexBuckets): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(2).map(b => f"$b%02x").mkString, 16) % buckets
  }

  /** Persist the inverted index partitioned by token bucket
    * (`token_bucket=NN/` directories). At 100 TB a query term touches ONE
    * directory out of [[IndexBuckets]] — the probe never lists, let alone
    * reads, the rest of the index.
    */
  def writeIndex(index: DataFrame, path: String,
      buckets: Int = IndexBuckets): Unit =
    index.withColumn("token_bucket", tokenBucket(col("token"), buckets))
      .repartition(col("token_bucket"))
      .write.partitionBy("token_bucket").mode("overwrite").parquet(path)

  /** Incremental index maintenance: APPEND a new document wave's postings
    * into the same bucket directories — no rebuild, no read of historical
    * postings (the incremental-corpus discipline of `Dedup.appendBands`).
    * Readers see old∪new because bucket files are unioned by the scan;
    * `bucketOf` is a pure hash, so a token's postings never split across
    * buckets. Compaction of accumulated small files per bucket is
    * [[graft.sources.Compaction]]'s job, unchanged.
    */
  def appendIndex(index: DataFrame, path: String,
      buckets: Int = IndexBuckets): Unit =
    index.withColumn("token_bucket", tokenBucket(col("token"), buckets))
      .repartition(col("token_bucket"))
      .write.partitionBy("token_bucket").mode("append").parquet(path)

  /** Read back only the query terms' postings: the `token_bucket` filter is
    * a partition-directory prune (computed driver-side from the terms), the
    * `token` filter a pushed parquet predicate within those directories.
    */
  def probeIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], buckets: Int = IndexBuckets): DataFrame =
    spark.read.parquet(path)
      .filter(col("token_bucket").isin(terms.map(bucketOf(_, buckets)).distinct: _*) &&
        col("token").isin(terms: _*))
      .select("token", "doc_id", "tf")

  /** Positional postings: one row per (token, doc_id, pos) — the phrase /
    * proximity upgrade of [[buildIndex]]. Same scale shape (explode +
    * nothing wider than a posting row); persisted it buckets by token like
    * [[writeIndex]], so a phrase query reads only its terms' buckets.
    */
  def buildPositionalIndex(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "token")))
      .filter(col("token") =!= "")
      .select(col("token"), col("doc_id"), col("pos").cast("long").as("pos"))

  /** Exact-phrase retrieval: docs containing `terms` consecutively, with
    * occurrence count and first position. Each term's postings are
    * filtered BEFORE any join (with the bucketed store that is a
    * file-listing prune); the chain then joins on (doc_id, pos+i) keys —
    * hash joins over per-term posting lists, never a scan of full text.
    */
  def phraseSearch(pindex: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "phrase must have at least one term")
    val t0 = pindex.filter(col("token") === terms.head)
      .select(col("doc_id"), col("pos"))
    val matched = terms.zipWithIndex.drop(1).foldLeft(t0) {
      case (acc, (t, i)) =>
        val p = pindex.filter(col("token") === t)
          .select(col("doc_id").as("d"), col("pos").as("p"))
        acc.join(p, acc("doc_id") === col("d") &&
            col("p") === acc("pos") + lit(i.toLong))
          .select(acc("doc_id"), acc("pos"))
    }
    matched.groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min(col("pos")).as("first_pos"))
  }

  /** Stop-postings pruning — the classic index-size optimization: tokens
    * whose document frequency exceeds `maxDf` (corpus-wide stopwords)
    * carry the longest posting lists while contributing the least BM25
    * mass (idf → 0 as df → N); dropping them shrinks the index by the
    * heavy tail and leaves every query over surviving terms EXACTLY as
    * scored before (per-term contributions are independent). One
    * df-aggregate + a semi join — the word-count shuffle shape.
    */
  def pruneIndex(index: DataFrame, maxDf: Long): DataFrame = {
    // df = DISTINCT docs per token (matches scoreBatch), not row count:
    // on the positional index (same module, compatible schema) a plain
    // count(*) would tally positions and silently prune mid-freq tokens.
    val keep = index.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") <= maxDf).select("token")
    index.join(keep, Seq("token"), "left_semi")
  }

  /** Batch retrieval: score MANY queries in ONE pass — the serving shape
    * at scale (a per-query loop re-scans postings N times; this joins the
    * query-term relation against the postings once). `queries` is
    * (query_id, terms array); postings are pre-filtered to the union of
    * all query terms (with the bucketed store that prunes at listing
    * time), df/corpus stats broadcast, and each (query, doc) score is the
    * exact-long micro sum over the query's matched terms. Identical
    * per-term arithmetic to [[score]].
    */
  def scoreBatch(index: DataFrame, docLens: DataFrame, queries: DataFrame,
      k1: Double = K1, b: Double = B): DataFrame = {
    val qterms = queries
      .select(col("query_id"), explode(col("terms")).as("token")).distinct()
    val allTerms = broadcast(qterms.select("token").distinct())
    val matched = index.join(allTerms, "token")
    val df = matched.groupBy("token")
      .agg(countDistinct(col("doc_id")).as("df"))
    val stats = docLens.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
        .as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5)))
    val tfNorm = (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") /
          col("avgdl")))
    matched
      .join(broadcast(qterms), "token") // fan out to every query using the term
      .join(broadcast(df), "token")
      .join(docLens, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("doc_id"),
        round(idf * tfNorm * lit(1000000.0)).cast("long").as("u"))
      .groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("u")).as("score_u"))
  }

  /** Positional twin of [[probeIndex]]: read back only the phrase terms'
    * postings from a [[writeIndex]]-layout positional store — the
    * `token_bucket` filter prunes directories at file-listing time, the
    * `token` filter is a pushed parquet predicate inside them.
    */
  def probePositionalIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, terms: Seq[String],
      buckets: Int = IndexBuckets): DataFrame =
    spark.read.parquet(path)
      .filter(col("token_bucket").isin(terms.map(bucketOf(_, buckets)).distinct: _*) &&
        col("token").isin(terms: _*))
      .select("token", "doc_id", "pos")

  /** DuckDB oracle for [[score]] over the `documents` table — generated from
    * the same constants so the two sides cannot drift.
    */
  def oracleSql(terms: Seq[String], k1: Double = K1, b: Double = B,
      gateCol: Option[String] = None): String = {
    val termList = terms.map(t => s"'$t'").mkString(", ")
    val gate = gateCol.map(n => s", TRUE AS $n").getOrElse("")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
       |), t2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
       |idx AS (SELECT token, doc_id, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
       |dl AS (SELECT doc_id, COUNT(*) AS dl FROM t2 GROUP BY 1),
       |stats AS (SELECT COUNT(*) AS n_docs,
       |  CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl FROM dl),
       |m AS (SELECT * FROM idx WHERE token IN ($termList)),
       |dfq AS (SELECT token, COUNT(*) AS df FROM m GROUP BY 1),
       |contrib AS (
       |  SELECT m.doc_id,
       |    CAST(round(
       |      ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) /
       |                (CAST(df AS DOUBLE) + 0.5)) *
       |      (CAST(tf AS DOUBLE) * ${k1 + 1.0}) /
       |        (CAST(tf AS DOUBLE) +
       |         $k1 * (${1.0 - b} + $b * CAST(dl.dl AS DOUBLE) / avgdl)) *
       |      1000000.0) AS BIGINT) AS u
       |  FROM m JOIN dfq USING (token) JOIN dl USING (doc_id), stats)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
       |  CAST(SUM(u) AS BIGINT) AS score_u,
       |  CAST(SUM(u) AS DOUBLE) / 1000000.0 AS score$gate
       |FROM contrib GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }
}
