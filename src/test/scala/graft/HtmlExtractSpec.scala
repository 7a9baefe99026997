package graft

import org.apache.spark.sql.functions._

import graft.pipeline.HtmlExtract
import graft.quality.RuleFilters

/** Edge cases of the extraction/rule chains that the formula-fixture
  * oracles don't reach: entity double-escaping, nested anchors, block
  * content spanning newlines, bullet/tie rules.
  */
class HtmlExtractSpec extends SparkSpec {

  private def extract(html: String): (String, String, String) = {
    val s = spark
    import s.implicits._
    val r = Seq(html).toDF("h")
      .select(HtmlExtract.text(col("h")), HtmlExtract.anchorText(col("h")),
        HtmlExtract.title(col("h")))
      .head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("entity decode: &amp;lt; yields literal &lt; (double-escape rule)") {
    assert(extract("<p>a &amp;lt; b</p>")._1 === "a &lt; b")
    assert(extract("<p>x &amp;&amp; y</p>")._1 === "x && y")
    assert(extract("<p>&quot;q&quot; &#39;s&#39;&nbsp;end</p>")._1
      === "\"q\" 's' end")
  }

  test("script/style content vanishes even across newlines") {
    val html = "<style>\nbody { a: 1; }\n.x { b: 2 }\n</style><p>kept</p>" +
      "<script>\nvar s = '<p>not text</p>';\n</script>"
    assert(extract(html)._1 === "kept")
  }

  test("multiple anchors concatenate in document order; title extracted") {
    val html = "<html><head><title>T1</title></head><body>" +
      "<a href=\"/a\">first</a> mid <a href=\"/b\">second</a></body></html>"
    val (_, anchors, title) = extract(html)
    assert(anchors === "first second")
    assert(title === "T1")
  }

  test("link density gate in integer form") {
    val s = spark
    import s.implicits._
    // 4 anchor chars vs 20 text chars → 4*10 <= 20*3 → ok
    val linky = "<p>123456789012345</p><a href=\"x\">abcd</a>"
    val got = Seq(linky).toDF("h")
      .select(HtmlExtract.lowLinkDensity(col("h"))).head().getBoolean(0)
    assert(got)
    // nearly all anchor text → not low density
    val farm = "<a href=\"x\">all of this page is links</a><p>no</p>"
    val got2 = Seq(farm).toDF("h")
      .select(HtmlExtract.lowLinkDensity(col("h"))).head().getBoolean(0)
    assert(!got2)
  }

  test("C4 line rules: terminal punctuation, min words, bullets, blocklist") {
    val s = spark
    import s.implicits._
    val lines = Seq(
      "a good long sentence here.", // kept
      "too short.",                 // < 4 words
      "no terminal punctuation at all", // no punct
      "- a bullet line with words.",    // bullet
      "ends with a question mark?")     // kept
    val df = Seq(Tuple1(lines)).toDF("lines")
    val kept = df.select(RuleFilters.c4KeptLines(col("lines")))
      .head().getSeq[String](0)
    assert(kept === Seq("a good long sentence here.",
      "ends with a question mark?"))
    val drop = df.select(RuleFilters.c4PageDrop(col("lines")))
      .head().getBoolean(0)
    assert(!drop)
    val df2 = Seq(Tuple1(lines :+ "Lorem Ipsum dolor.")).toDF("lines")
    assert(df2.select(RuleFilters.c4PageDrop(col("lines")))
      .head().getBoolean(0)) // blocklist is case-insensitive
  }
}
