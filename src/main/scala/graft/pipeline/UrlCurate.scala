package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + canonical-URL dedup — the web-crawl curation
  * staple (Common-Crawl-style pipelines dedup on canonicalized URL before
  * any content pass, because it is free: no text is read).
  *
  * The testdata has no URL column, so — the `q_pii_scrub` discipline — a
  * deterministic synthetic URL is INJECTED per document (messy on purpose:
  * mixed-case scheme/host, `www.` prefixes, explicit default ports,
  * shuffled query params, tracking params, fragments) and then normalized
  * by [[canonicalize]]:
  *
  *   1. scheme + host lowercased; `www.` stripped; default port stripped
  *      (`:443` for https, `:80` for http)
  *   2. path: trailing `/` collapsed (empty path → `/`)
  *   3. query: tracking params removed (`utm_*`, `fbclid`, `gclid`),
  *      remainder SORTED so param order cannot split identical URLs
  *   4. fragment dropped
  *
  * Everything is built from codegen'd string/array builtins (regexp
  * extraction, higher-order filter, array_sort) — map-only, zero shuffle,
  * replayable verbatim in DuckDB SQL. The dedup keeps the min doc_id per
  * canonical URL: one 8-byte-keyed aggregate, the exact-dedup shuffle
  * shape. At 100 TB this runs before any content operator and its shuffle
  * carries (url_hash, doc_id), never text.
  */
object UrlCurate {

  /** Deterministic messy URL for a document row (synthetic injection). */
  def synthesizeUrl(docId: Column, source: Column): Column = {
    val scheme = when(pmod(docId, lit(5)) === 0, lit("HTTPS://"))
      .when(pmod(docId, lit(5)) === 1, lit("https://"))
      .otherwise(lit("http://"))
    val www = when(pmod(docId, lit(3)) === 0, lit("WWW.")).otherwise(lit(""))
    val host = concat(upper(substring(source, 1, 1)), substring(source, 2, 100),
      lit(".Example.COM"))
    val port = when(pmod(docId, lit(5)) === 0, lit(":443"))
      .when(pmod(docId, lit(7)) === 0, lit(":80"))
      .otherwise(lit(""))
    // doc_id mod 10 collapses ids onto shared paths → real dup pressure
    val path = concat(lit("/docs/item-"), pmod(docId, lit(10)),
      when(pmod(docId, lit(4)) === 0, lit("/")).otherwise(lit("")))
    val query = when(pmod(docId, lit(2)) === 0,
        lit("?b=2&utm_source=feed&a=1"))
      .otherwise(lit("?a=1&b=2&utm_campaign=x&fbclid=abc"))
    val frag = when(pmod(docId, lit(2)) === 0, lit("#sec")).otherwise(lit(""))
    concat(scheme, www, host, port, path, query, frag)
  }

  private val UrlRe = "^([A-Za-z]+)://([^/?#]+)([^?#]*)\\??([^#]*)#?.*$"

  /** Canonical form of a URL (struct of `canon_url`, `host`). */
  def canonicalize(url: Column): (Column, Column) = {
    val scheme = lower(regexp_extract(url, UrlRe, 1))
    val hostPort = lower(regexp_extract(url, UrlRe, 2))
    val hostNoWww = regexp_replace(hostPort, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(hostNoWww, ":443$", ""))
      .otherwise(regexp_replace(hostNoWww, ":80$", ""))
    val rawPath = regexp_extract(url, UrlRe, 3)
    val path = when(rawPath === "", lit("/"))
      .otherwise(regexp_replace(rawPath, "/$", ""))
    val pathNonEmpty = when(path === "", lit("/")).otherwise(path)
    val rawQuery = regexp_extract(url, UrlRe, 4)
    val kept = array_sort(filter(split(rawQuery, "&"), p =>
      p =!= "" && !p.startsWith("utm_") && !p.startsWith("fbclid") &&
        !p.startsWith("gclid")))
    val query = when(size(kept) === 0, lit(""))
      .otherwise(concat(lit("?"), concat_ws("&", kept)))
    (concat(scheme, lit("://"), host, pathNonEmpty, query), host)
  }

  /** Inject → canonicalize → dedup: every doc with its canonical URL and
    * host, `keep` marking the min-doc_id winner per canonical URL. ONE
    * shuffle, keyed on the canonical URL (a `min` window over the key —
    * the oracle's own shape), instead of a groupBy + join that would move
    * the URL strings twice. For the production 100 TB run, key the window
    * on `xxhash64(canon_url)` so the shuffle carries 8-byte keys — the
    * [[graft.dedup.Dedup.exactByFingerprint]] discipline.
    */
  def curate(docs: DataFrame): DataFrame = {
    val url = synthesizeUrl(col("doc_id"), col("source"))
    val (canon, host) = canonicalize(url)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("canon_url"))
    docs.select(col("doc_id"), canon.as("canon_url"), host.as("host"))
      .withColumn("keep", col("doc_id") === min(col("doc_id")).over(w))
      .select(col("doc_id"), col("canon_url"), col("host"), col("keep"))
  }
}
