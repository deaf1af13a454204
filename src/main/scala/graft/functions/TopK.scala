package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: keeps the k best (score desc, id asc) pairs
  * per group with an O(k) buffer.
  *
  * This is the scale-correct shape for "top-k neighbors per query": the
  * window formulation (`row_number().over(partitionBy(q).orderBy(sim
  * desc)) <= k`) must shuffle and sort EVERY candidate row; this
  * aggregator reduces each map-side partition to k rows before the
  * shuffle (Catalyst plans partial+final for Aggregators), so shuffled
  * volume is `partitions × k`, not `corpus`. Same pattern as Spark's own
  * TakeOrderedAndProject, but usable per group.
  *
  * Determinism: total order (score desc, id asc); merge is associative —
  * any merge tree yields the same k.
  */
final case class ScoredId(score: Double, id: Long)

class TopKByScore(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {

  private def better(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[ScoredId], x: ScoredId): Seq[ScoredId] =
    if (buf.size < k) (buf :+ x).sortWith(better)
    else if (better(x, buf.last)) (buf.init :+ x).sortWith(better)
    else buf

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    insert(buf, a)

  override def merge(x: Seq[ScoredId], y: Seq[ScoredId]): Seq[ScoredId] =
    y.foldLeft(x)(insert)

  override def finish(r: Seq[ScoredId]): Seq[ScoredId] = r

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()

  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredId]]()
}
