package graft

import graft.pipeline.Robots
import graft.pipeline.Robots.Rule

/** RFC 9309 parser semantics the oracle's closed-form replay can't see:
  * group selection, stacked user-agents, comments, empty Disallow.
  */
class RobotsSpec extends SparkSpec {

  test("only the * group's rules are kept; other groups are ignored") {
    val txt =
      """User-agent: BadBot
        |Disallow: /
        |
        |User-agent: *
        |Disallow: /private
        |Allow: /private/ok
        |""".stripMargin
    assert(Robots.parse(txt) ===
      Seq(Rule("/private", allow = false), Rule("/private/ok", allow = true)))
  }

  test("stacked user-agent lines share one rule block") {
    val txt =
      """User-agent: SomeBot
        |User-agent: *
        |Disallow: /a
        |""".stripMargin
    assert(Robots.parse(txt) === Seq(Rule("/a", allow = false)))
  }

  test("a user-agent line after rules starts a NEW group") {
    val txt =
      """User-agent: *
        |Disallow: /a
        |User-agent: Other
        |Disallow: /b
        |""".stripMargin
    assert(Robots.parse(txt) === Seq(Rule("/a", allow = false)))
  }

  test("comments, unknown directives, and empty Disallow are inert") {
    val txt =
      """# header comment
        |User-agent: * # trailing comment
        |Crawl-delay: 10
        |Sitemap: http://x/sitemap.xml
        |Disallow:
        |Disallow: /real
        |""".stripMargin
    assert(Robots.parse(txt) === Seq(Rule("/real", allow = false)))
  }

  test("gate: longest match wins, Allow wins ties, unmatched allowed") {
    val s = spark
    import s.implicits._
    val rules = Robots.rulesOf(Seq(
      ("h", "User-agent: *\nDisallow: /d\nAllow: /d/ok\nAllow: /e\nDisallow: /e\n")
    ).toDF("host", "txt"))
    val urls = Seq(
      (1L, "h", "/d/x"),   // prefix /d → disallowed
      (2L, "h", "/d/ok2"), // longer Allow /d/ok wins → allowed
      (3L, "h", "/e/y"),   // equal-length tie → Allow wins
      (4L, "h", "/free"),  // no rule matches → allowed
      (5L, "nohost", "/d/x") // host without rules → allowed
    ).toDF("doc_id", "host", "path")
    val got = Robots.gate(urls, rules).select("doc_id", "allowed")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> true))
  }
}
