package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction for web-curation pipelines — the pass that turns
  * crawled pages into training text (the jusText/trafilatura role, reduced
  * to deterministic regex structure): drop script/style/comment blocks,
  * strip tags, decode the common entities, collapse whitespace; plus the
  * link-density signal boilerplate classifiers key on (anchor-text chars
  * vs total text chars).
  *
  * Pure `regexp_replace`/`regexp_extract_all` column compositions —
  * codegen'd, map-only, no UDF: at 100 TB this runs at scan speed next to
  * the WARC decode ([[graft.sources.Warc]]). Patterns deliberately stay in
  * the Java∩RE2 common subset (inline `(?s)`, non-greedy `.*?`, explicit
  * `[ \t\n\r]` classes) so the DuckDB oracle replays them verbatim.
  *
  * The reference has no text operators (SQL-string ETL only); this is a
  * north-star web-curation addition.
  */
object HtmlExtract {

  /** script/style/comment blocks — content must vanish, not just tags. */
  private val BlockPatterns = Seq(
    "(?s)<script\\b[^>]*>.*?</script>",
    "(?s)<style\\b[^>]*>.*?</style>",
    "(?s)<!--.*?-->")

  /** The entity set worth decoding without a full table. Order matters:
    * `&amp;` LAST so `&amp;lt;` decodes to the literal `&lt;` (the
    * double-escape rule), matching every real extractor.
    */
  private val Entities = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** Visible text of an HTML string: blocks dropped, tags → space,
    * entities decoded, whitespace collapsed, trimmed.
    */
  def text(html: Column): Column = {
    val noBlocks = BlockPatterns.foldLeft(html)((c, p) =>
      regexp_replace(c, p, ""))
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      regexp_replace(c, e, r)
    }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** Concatenated anchor text (content of `<a …>…</a>`), tag-stripped and
    * whitespace-collapsed — the numerator of link density.
    */
  def anchorText(html: Column): Column = {
    val anchors = regexp_extract_all(html,
      lit("(?s)<a\\b[^>]*>(.*?)</a>"), lit(1))
    text(concat_ws(" ", anchors))
  }

  /** `<title>` content (empty string when absent). */
  def title(html: Column): Column =
    regexp_extract(html, "(?s)<title[^>]*>(.*?)</title>", 1)

  /** Link-density gate in exact integer form: anchor chars ≤ `num/den` of
    * text chars (boilerplate pages are link farms; content pages aren't).
    */
  def lowLinkDensity(html: Column, num: Int = 3, den: Int = 10): Column =
    length(anchorText(html)).cast("long") * lit(den.toLong) <=
      length(text(html)).cast("long") * lit(num.toLong)

  // ---- DuckDB oracle replay, generated from the SAME pattern constants.
  // DuckDB SQL literals are escape-free, so Java patterns embed verbatim
  // (the patterns contain no single quotes); RE2 reads the same inline
  // (?s) / non-greedy syntax.

  private def lit1(s: String): String = "'" + s.replace("'", "''") + "'"

  /** SQL replay of [[text]] applied to SQL expression `h`. */
  def textSql(h: String): String = {
    val noBlocks = BlockPatterns.foldLeft(h)((c, p) =>
      s"regexp_replace($c, ${lit1(p)}, '', 'g')")
    val noTags = s"regexp_replace($noBlocks, '<[^>]*>', ' ', 'g')"
    val decoded = Entities.foldLeft(noTags) { case (c, (e, r)) =>
      s"regexp_replace($c, ${lit1(e)}, ${lit1(r)}, 'g')"
    }
    s"trim(regexp_replace($decoded, '[ \\t\\n\\r]+', ' ', 'g'))"
  }

  /** SQL replay of [[anchorText]] applied to SQL expression `h`. */
  def anchorTextSql(h: String): String =
    textSql(s"array_to_string(regexp_extract_all($h, " +
      s"'(?s)<a\\b[^>]*>(.*?)</a>', 1), ' ')")

  /** SQL replay of [[title]]. */
  def titleSql(h: String): String =
    s"regexp_extract($h, '(?s)<title[^>]*>(.*?)</title>', 1)"

  /** Outgoing link targets: every double-quoted `href` attribute value, in
    * document order — the edge source for crawl-frontier and host-graph
    * analyses. Map-only `regexp_extract_all`; resolution of relative URLs
    * against the page URL is the caller's join with
    * [[UrlCurate]]-canonicalized bases.
    */
  def links(html: Column): Column =
    regexp_extract_all(html, lit("<a\\b[^>]*\\bhref=\"([^\"]*)\""), lit(1))

  /** SQL replay of [[links]]. */
  def linksSql(h: String): String =
    s"""regexp_extract_all($h, '<a\\b[^>]*\\bhref="([^"]*)"', 1)"""
}
