// Lives under org.apache.spark.sql.* to reach `private[sql]` surface
// (Column<->Expression bridging, AbstractDataType) — the standard pattern for
// third-party catalyst extensions. All logic here is graft's own.
package org.apache.spark.sql.graftx

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Column <-> catalyst Expression bridge for Spark 4.x, where `Column` is
  * backed by a `ColumnNode` and no longer exposes `.expr` publicly.
  */
object Bridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpr(c: Column): Expression = ExpressionUtils.expression(c)
}

/** 64-bit polynomial rolling-hash document fingerprint.
  *
  * `fp(s) = sum_i byte(i) * 1000003^(n-1-i) mod 2^64` over the UTF-8 bytes.
  * A native Catalyst `Expression` WITH `doGenCode` — it runs inside
  * whole-stage codegen (no UDF boxing, no serialization), so fingerprinting
  * 100 TB of documents is a pure map stage at scan speed.
  *
  * The reference has no hashing at all (its only string op is `||` concat,
  * `/root/reference/sqoop_table.py:125`); this is a north-star text-pipeline
  * primitive (doc identity keys, shift-tolerant near-dup blocks).
  */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = LongType
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    RollingHash.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"org.apache.spark.sql.graftx.RollingHash.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  final val Base = 1000003L

  /** Static so generated Java can call it directly. */
  def hashBytes(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * Base + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  def rolling_hash(c: Column): Column = Bridge.toColumn(RollingHash(Bridge.toExpr(c)))
}
