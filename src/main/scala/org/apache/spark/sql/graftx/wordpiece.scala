// Lives under org.apache.spark.sql.* for the same `private[sql]` bridge
// reasons as exprs.scala. All logic is graft's own.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization (the WordPiece inference
  * algorithm, Wu et al. 2016 §4.1) as a native Catalyst expression with
  * codegen — `subword_pieces(text)` explodes a document into its subword
  * pieces at scan speed, the token-accounting primitive of an LLM data
  * pipeline (length filtering, packing budgets, per-language token counts
  * all operate on subword counts, not whitespace words).
  *
  * The vocabulary ([[WordPiece.MultiChar]] + [[WordPiece.SingleChar]]) contains every printable-ASCII
  * single char (so greedy matching always advances — no unk path) plus
  * multi-char merges; at each position the longest matching piece is
  * unique because at most one string of each length matches. Inference is
  * vocab-driven; a production run would swap in a trained vocab file, the
  * algorithm and plan shape are identical.
  *
  * Scale: one pass per document inside whole-stage codegen (static-method
  * call like [[RollingHash]]) — a pure map stage, no shuffle, no UDF.
  */
case class SubwordPieces(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    WordPiece.piecesData(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.WordPiece.piecesData($c)")

  override protected def withNewChildInternal(newChild: Expression): SubwordPieces =
    copy(child = newChild)

  override def prettyName: String = "subword_pieces"
}

object WordPiece {

  /** Multi-char merges — frequency-ordered English bigrams/affixes. The
    * CONTENT is a stand-in for a trained vocab; the greedy machinery does
    * not depend on it. Shared verbatim with the DuckDB oracle generator.
    */
  val MultiChar: Seq[String] = Seq(
    "tion", "ing", "ent", "and", "ers", "ion", "for", "ter",
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "es", "or", "te", "ed", "is", "it", "al", "ar", "st", "to",
    "nt", "ng", "se", "ha", "as", "ou", "io", "le", "ve", "co",
    "me", "de", "ri", "ro", "ic", "ne", "ea", "ra", "ce", "li",
    "ch", "ll", "be", "ma", "si", "om", "ur")

  /** Every printable ASCII char is a piece → greedy always advances. */
  val SingleChar: Seq[String] = (32 to 126).map(_.toChar.toString)

  val MaxPieceLen: Int = MultiChar.map(_.length).max

  /** Pieces by length for longest-first probing (space excluded: it is the
    * word separator, never a piece).
    */
  private val byLen: Array[Set[String]] = {
    val all = (MultiChar ++ SingleChar).filterNot(_ == " ")
    Array.tabulate(MaxPieceLen + 1)(l => all.filter(_.length == l).toSet)
  }

  /** Greedy longest-match pieces of a single word (no spaces). */
  def tokenizeWord(word: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < word.length) {
      var len = math.min(MaxPieceLen, word.length - pos)
      var hit: String = null
      while (hit == null && len >= 1) {
        val cand = word.substring(pos, pos + len)
        if (byLen(len).contains(cand)) hit = cand else len -= 1
      }
      // single-char vocab is total over printable ASCII; anything else
      // (non-ASCII input) falls back to a 1-char piece of itself so the
      // tokenizer is total and lossless
      if (hit == null) hit = word.substring(pos, pos + 1)
      out += hit
      pos += hit.length
    }
    out.toSeq
  }

  /** All pieces of a space-separated text, word by word, empty words
    * skipped. Static so generated Java calls it directly.
    */
  def piecesData(text: UTF8String): ArrayData = {
    val words = text.toString.split(" ")
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty)
        tokenizeWord(words(i)).foreach(p => out += UTF8String.fromString(p))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def subword_pieces(c: Column): Column =
    Bridge.toColumn(SubwordPieces(Bridge.toExpr(c)))
}
