package graft.dedup

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed aggregate merging MinHash signatures element-wise-min — the sketch
  * union property: `sig(A ∪ B) = min(sig(A), sig(B))`. With it a corpus
  * signature (or per-group signatures: per source, per language, per day)
  * is maintained incrementally: aggregate new docs' signatures and merge
  * with yesterday's — no rescan of history. This is the custom-`Aggregator`
  * extension point from SURVEY §2.11/§7 (the reference has no UDAF surface
  * at all).
  *
  * Partial aggregation applies: executors merge locally, only k-long arrays
  * shuffle.
  */
object MinHashMerge extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.empty

  private def mergeSigs(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length, s"signature lengths differ: ${a.length} vs ${b.length}")
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = math.min(a(i), b(i)); i += 1 }
      out
    }

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] = mergeSigs(buf, sig)
  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = mergeSigs(b1, b2)
  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashMergeOps {

  /** Estimated Jaccard similarity between two merged signatures: fraction of
    * agreeing components.
    */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}
