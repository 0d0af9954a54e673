package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed custom aggregate (the `Aggregator` path of the build brief):
  * bounded top-k ids by (score desc, id asc) per group. The buffer is a
  * small sorted list capped at k, so partial aggregation ships O(k) per
  * group regardless of group size — the property that makes per-group
  * top-k viable at 100 TB without a window shuffle of the full data.
  *
  * Deterministic: ties in score break on the smaller id.
  */
final case class ScoredId(score: Double, id: Long)

class TopKAggregator(k: Int) extends Aggregator[ScoredId, Seq[ScoredId], Seq[Long]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] = {
    val (front, back) = buf.span(better(_, x))
    (front ++ (x +: back)).take(k)
  }

  override def zero: Seq[ScoredId] = Seq.empty

  override def reduce(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size == k && better(buf.last, x)) buf else insert(buf, x)

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] =
    b.foldLeft(a)(insert)

  override def finish(buf: Seq[ScoredId]): Seq[Long] = buf.map(_.id)

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}

object TopKAggregator {
  /** Column form: `topKIds(k)(scoreCol, idCol)` usable in `agg(...)`. */
  def topKIds(k: Int)(score: Column, id: Column): Column = {
    val agg = udaf(new TopKAggregator(k), Encoders.product[ScoredId])
    agg(score, id)
  }
}
