package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; the mergeable
  * "summary" form of Agarwal et al., PODS'12) as a typed Aggregator.
  *
  * Buffer = at most k (item, credit) pairs. Reduce is the classic
  * decrement-all step; merge sums two summaries and, when more than k
  * items survive, subtracts the (k+1)-th largest credit from every entry
  * and drops the non-positive ones — the standard mergeable-summary
  * compression, so Catalyst's partial+final aggregation (any merge tree)
  * keeps the guarantee:
  *
  *   true_count(x) − credit(x) ≤ n / (k+1)   for every item x,
  *
  * hence every item with true frequency above n/(k+1) is present in the
  * final summary (a guaranteed SUPERSET of the heavy hitters). The scale
  * contract: state is O(k) regardless of stream length or cardinality,
  * map-side partials shuffle k rows per partition, and a second exact
  * counting pass restricted to the ≤k candidates turns the sketch into
  * an EXACT heavy-hitters answer (TextAnalysis.q79HeavyHitters).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] =
    b.get(x) match {
      case Some(c) => b.updated(x, c + 1L)
      case None if b.size < k => b.updated(x, 1L)
      case None =>
        // decrement-all: one unit of every counter pays for the arrival
        b.flatMap { case (w, c) =>
          if (c > 1L) Some(w -> (c - 1L)) else None
        }
    }

  override def merge(x: Map[String, Long],
      y: Map[String, Long]): Map[String, Long] = {
    val sum = y.foldLeft(x) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      val cut = sum.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (w, c) =>
        if (c > cut) Some(w -> (c - cut)) else None
      }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
