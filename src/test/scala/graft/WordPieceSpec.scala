package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftx.WordPiece

class WordPieceSpec extends SparkSpec {

  test("greedy longest-match: known decompositions") {
    // greedy is per-position longest, not globally optimal: "nation"
    // takes "n" (no 2+ piece starts at pos 0), then "at", then "ion"
    assert(WordPiece.tokenizeWord("nation") === Seq("n", "at", "ion"))
    assert(WordPiece.tokenizeWord("sing") === Seq("si", "ng"))
    assert(WordPiece.tokenizeWord("ing") === Seq("ing"))
    assert(WordPiece.tokenizeWord("tion") === Seq("tion"))
    assert(WordPiece.tokenizeWord("x") === Seq("x"))
    assert(WordPiece.tokenizeWord("") === Seq())
  }

  test("pieces always reassemble to the word (lossless, total)") {
    val words = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "").distinct()
      .collect().map(_.getString(0))
    assert(words.nonEmpty)
    words.foreach { w =>
      val pieces = WordPiece.tokenizeWord(w)
      assert(pieces.mkString("") === w, s"lossy tokenization of '$w'")
      assert(pieces.forall(_.nonEmpty))
    }
    // non-ASCII falls back to 1-char self pieces, still lossless
    assert(WordPiece.tokenizeWord("héllo").mkString("") === "héllo")
  }

  test("expression matches the Scala kernel and runs without UDFs") {
    import org.apache.spark.sql.graftx.WordPiece.subword_pieces
    val df = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"), col("text"),
        subword_pieces(col("text")).as("pieces"))
    df.collect().foreach { r =>
      val expect = r.getString(1).split(" ").filter(_.nonEmpty)
        .flatMap(WordPiece.tokenizeWord).toSeq
      assert(r.getSeq[String](2) === expect)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }
}
