package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers for oracle-parity aggregates.
  *
  * The driver hash-compares our results against DuckDB on the same parquet
  * inputs. `sum(double)` is order-dependent and differs between engines in the
  * last ulp, so every monetary aggregate routes through exact decimal
  * arithmetic and only casts to double at the very end — the decimal value is
  * identical in both engines, and decimal→double rounding is deterministic
  * (IEEE round-to-nearest), so the final doubles are bit-identical.
  *
  * At scale this costs nothing extra: Spark's decimal sum is codegen'd and the
  * cast happens once per output row, not per input row.
  */
object Exact {
  private val Money = DecimalType(18, 4)
  private val Frac  = DecimalType(8, 4)

  /** Exact decimal view of a double money/quantity column. */
  def dec(c: Column): Column = c.cast(Money)

  /** Exact decimal view of a fraction in [0, 1] (discount, tax). */
  def frac(c: Column): Column = c.cast(Frac)

  /** sum(x) computed exactly, returned as double. DuckDB equivalent:
    * `CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`.
    */
  def sumExact(c: Column): Column = sum(dec(c)).cast("double")

  /** sum(price * (1 - frac)) computed exactly, returned as double. */
  def sumDisc(price: Column, fracCol: Column): Column =
    sum(dec(price) * (lit(1).cast(Frac) - frac(fracCol))).cast("double")

  /** avg as exact-sum / count, both deterministic, divided in double. */
  def avgExact(c: Column): Column = sumExact(c) / count(lit(1))
}
