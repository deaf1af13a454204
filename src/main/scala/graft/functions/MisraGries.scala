package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; the mergeable
  * "summary" form of Agarwal et al., PODS'12) as a typed Aggregator.
  *
  * Buffer = at most 2k (item, credit) pairs while reducing, compressed
  * to ≤ k on merge/finish. Reduce always inserts/increments — O(1) per
  * element — and when the buffer exceeds 2k runs one COMPRESSION:
  * subtract the (k+1)-th largest credit from every entry and drop the
  * non-positive ones (the same step merge uses). This is the amortized
  * form of the classic decrement-all: a compression runs at most once
  * per k arrivals, and its O(k) work uses a flat array + builder, so the
  * per-element cost is O(1) amortized instead of the decrement-all
  * path's O(k)-per-unseen-arrival rebuild — the difference between
  * O(n) and O(n·k) on adversarial (all-distinct) token streams.
  *
  * The guarantee is unchanged: every compression subtracts `cut` from
  * at least k+1 entries, so (k+1)·Σcut ≤ n and
  *
  *   true_count(x) − credit(x) ≤ Σcut ≤ n / (k+1)   for every item x,
  *
  * hence every item with true frequency above n/(k+1) has positive
  * credit at every point and is present in the final summary (a
  * guaranteed SUPERSET of the heavy hitters). Catalyst's partial+final
  * aggregation (any merge tree) keeps the bound. The scale contract:
  * state is O(k) regardless of stream length or cardinality, map-side
  * partials shuffle ≤ k rows per partition, and a second exact counting
  * pass restricted to the candidates turns the sketch into an EXACT
  * heavy-hitters answer (TextAnalysis.q79HeavyHitters).
  */
class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "capacity must be positive")

  /** Subtract the (k+1)-th largest credit from every entry; drop the
    * non-positive. No-op at ≤ k entries. Mutable scratch (flat array
    * sort + builder) — never a per-entry persistent-map rebuild. */
  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      val credits = m.values.toArray
      java.util.Arrays.sort(credits)
      val cut = credits(credits.length - (k + 1))
      val b = Map.newBuilder[String, Long]
      m.foreach { case (w, c) => if (c > cut) b += w -> (c - cut) }
      b.result()
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], x: String): Map[String, Long] = {
    val nb = b.updated(x, b.getOrElse(x, 0L) + 1L)
    if (nb.size > 2 * k) compress(nb) else nb
  }

  override def merge(x: Map[String, Long],
      y: Map[String, Long]): Map[String, Long] = {
    val (big, small) = if (x.size >= y.size) (x, y) else (y, x)
    compress(small.foldLeft(big) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    })
  }

  /** Single-partition aggregations skip merge, so the ≤ k output
    * contract is enforced here too. */
  override def finish(r: Map[String, Long]): Map[String, Long] = compress(r)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
