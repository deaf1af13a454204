package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2B "UDF/UDAF/UDTF" row): the
  * `Aggregator[IN, BUF, OUT]` API, demonstrated with an exact weighted
  * mean. The buffer sums in `BigDecimal`, so merging partial buffers is
  * order-independent — the same determinism convention as the rest of the
  * engine (`operators.sumDec`) carried into custom-aggregation land.
  * Registered per-use with `.toColumn`; Catalyst plans it as a regular
  * partial+final typed aggregate.
  */
object TypedAggregators {

  /** Exact weighted mean of (value, weight) pairs: Σvw / Σw. Per-row
    * products are IEEE doubles rounded once to 8 decimals (matching the
    * engine-wide `CAST(x*w AS DECIMAL(30,8))` oracle convention), summed
    * exactly, divided as doubles — so the result is bit-identical at any
    * partitioning/merge order. */
  object WeightedMean
      extends Aggregator[(Double, Double), (BigDecimal, BigDecimal), Double] {
    private def dec8(d: Double): BigDecimal =
      // exact binary expansion (java BigDecimal(double)), NOT the
      // shortest-string constructor — SQL engines cast double→decimal from
      // the binary value, and the two differ by 1e-8 on round-trip edges
      BigDecimal(new java.math.BigDecimal(d))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP)
    override def zero: (BigDecimal, BigDecimal) = (BigDecimal(0), BigDecimal(0))
    override def reduce(b: (BigDecimal, BigDecimal), a: (Double, Double)) =
      (b._1 + dec8(a._1 * a._2), b._2 + dec8(a._2))
    override def merge(x: (BigDecimal, BigDecimal), y: (BigDecimal, BigDecimal)) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (BigDecimal, BigDecimal)): Double =
      if (r._2.signum == 0) 0.0 else r._1.toDouble / r._2.toDouble
    override def bufferEncoder: Encoder[(BigDecimal, BigDecimal)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(BigDecimal, BigDecimal)]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
