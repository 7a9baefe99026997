package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** robots.txt compliance gate — the crawl-pipeline pass that decides, per
  * URL, whether the host's published policy allows fetching it (REP, the
  * Robots Exclusion Protocol: RFC 9309).
  *
  * [[parse]] is a real wire-format parser: it walks the file's
  * `User-agent:` groups, keeps only the `*` group's `Allow:`/`Disallow:`
  * rules (a crawler matching no specific group falls back to `*`), ignores
  * comments, blank-line group breaks, and non-rule directives
  * (`Crawl-delay:`, `Sitemap:`). Decision semantics are the RFC's:
  * longest-matching-prefix rule wins, `Allow` wins length ties, no match ⇒
  * allowed; an empty `Disallow:` matches nothing.
  *
  * Scale shape: a rules relation is TINY (hosts × a few rules) next to a
  * URL corpus, so the gate is `urls ⋈ broadcast(rules)` on host with a
  * prefix predicate, then one per-URL `max(struct(rule_len, allow))` —
  * map-side broadcast join plus a key aggregate; no URL text beyond
  * (host, path) ever shuffles. The rules themselves parse once per robots
  * fetch, not per URL.
  */
object Robots {

  /** One `*`-group rule: prefix + allow/disallow. */
  final case class Rule(rule: String, allow: Boolean)

  /** Parse a robots.txt body into the `User-agent: *` group's rules. */
  def parse(txt: String): Seq[Rule] = {
    var inStar = false
    var afterRules = false // a User-agent line after rules starts a NEW group
    val out = Seq.newBuilder[Rule]
    txt.split("\n", -1).foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (afterRules) { inStar = false; afterRules = false }
            if (value == "*") inStar = true
          case "allow" | "disallow" =>
            afterRules = true
            if (inStar && value.nonEmpty)
              out += Rule(value, key == "allow")
          case _ => afterRules = true // Crawl-delay etc. also end the UA run
        }
      }
    }
    out.result()
  }

  /** (host, txt) → exploded (host, rule, allow, rule_len) relation. */
  def rulesOf(robots: DataFrame): DataFrame = {
    val s = robots.sparkSession
    import s.implicits._
    robots.select("host", "txt").as[(String, String)]
      .flatMap { case (h, t) =>
        parse(t).map(r => (h, r.rule, r.allow, r.rule.length.toLong))
      }
      .toDF("host", "rule", "allow", "rule_len")
  }

  /** Gate URLs (doc_id, host, path) through the parsed rules: adds
    * `allowed`. Broadcast join on host + prefix match, longest rule wins,
    * Allow wins ties, unmatched ⇒ allowed.
    */
  def gate(urls: DataFrame, rules: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val matched = urls.join(broadcast(rules),
      urls("host") === rules("host") &&
        col("path").startsWith(col("rule")), "left")
    matched
      .groupBy(urls("doc_id"), urls("host"), col("path"))
      .agg(max(struct(col("rule_len"),
        col("allow").cast("int").as("allow"))).as("best"))
      .withColumn("allowed",
        coalesce(col("best.allow") === 1, lit(true)))
      .drop("best")
  }
}
