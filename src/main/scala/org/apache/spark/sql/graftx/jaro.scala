// Lives under org.apache.spark.sql.* to reach `private[sql]` surface
// (Column<->Expression bridging) — same pattern as exprs.scala; logic is
// graft's own.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a native codegen `Expression` —
  * Spark ships levenshtein but not Jaro–Winkler, and entity-resolution
  * verify stages want it (edit distance over-penalizes transpositions in
  * person/product names). Codegen keeps it inside whole-stage codegen:
  * fuzzy-join verification over 100 TB stays a pure map stage, no UDF
  * boxing.
  *
  * Standard definition: match window ⌊max(|a|,|b|)/2⌋−1, transpositions
  * counted pairwise / 2, Winkler prefix boost p=0.1 over ≤4 common lead
  * chars applied iff jaro > 0.7, empty input → 0, equal strings → 1.
  * This is the same contract DuckDB's `jaro_winkler_similarity`
  * implements — which is what makes the oracle comparison possible.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.jw(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graftx.JaroWinkler.jw($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {

  /** Static so generated Java can call it directly. */
  def jw(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val am = new Array[Boolean](la)
    val bm = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var unmatched = true
      while (j <= hi && unmatched) {
        if (!bm(j) && a.charAt(i) == b.charAt(j)) {
          am(i) = true; bm(j) = true; m += 1; unmatched = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (am(i)) {
        while (!bm(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val mt = t / 2
    val jaro = (m.toDouble / la + m.toDouble / lb + (m - mt).toDouble / m) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && a.charAt(l) == b.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }

  def jaro_winkler(a: Column, b: Column): Column =
    Bridge.toColumn(JaroWinkler(Bridge.toExpr(a), Bridge.toExpr(b)))
}
