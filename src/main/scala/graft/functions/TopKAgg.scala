package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for a bounded top-k buffer. */
case class ScoredId(score: Double, id: Long)

/** Bounded top-k-per-group as a typed `Aggregator` (order: score desc,
  * id asc — the id tie-break makes results deterministic).
  *
  * The window formulation (`row_number` ≤ k) shuffles and sorts EVERY row
  * of every group; this aggregator is partial-aggregation-friendly
  * (ObjectHashAggregate), so each map task sends at most k rows per group
  * into the shuffle — at 100 TB the shuffle volume drops from the fact
  * table's size to k × groups × tasks. The buffer is a k-bounded sorted
  * vector; reduce is an insertion, merge is a sorted merge, both O(k).
  */
class TopKAgg(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    if (buf.size >= k && !lt(x, buf.last)) buf
    else {
      val i = buf.indexWhere(e => lt(x, e))
      val at = if (i < 0) buf.size else i
      (buf.take(at) :+ x) ++ buf.drop(at) match {
        case v if v.size > k => v.take(k)
        case v => v
      }
    }
  }

  override def merge(b1: Seq[ScoredId], b2: Seq[ScoredId]): Seq[ScoredId] =
    b2.foldLeft(b1)(reduce)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] = ExpressionEncoder()
}
