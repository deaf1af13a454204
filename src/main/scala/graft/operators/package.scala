package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the operator suite. */
package object operators {

  /** Exact decimal sum of a (possibly computed) double column, returned as
    * double. Decimal addition is associative/commutative, so the result is
    * independent of partitioning and partial-aggregation order — required
    * for bit-exact agreement with the single-threaded DuckDB oracle.
    *
    * Scale 4, not higher: the money math here has ≤4 true decimals (2dp ×
    * 2dp), so nothing is lost — and the final decimal→double cast is only
    * guaranteed identical across engines while the unscaled value stays
    * under 2^53 (DuckDB converts int128→double then ×10⁻ˢ; beyond 2^53
    * that double-rounding can sit 1 ulp off the JVM's correctly-rounded
    * conversion). Scale 4 keeps sums up to ~9·10¹¹ in the exact range. */
  def sumDec(c: Column): Column =
    sum(c.cast(DecimalType(30, 4))).cast(DoubleType)

  /** Windowed variant of [[sumDec]] for running sums. */
  def sumDecOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(30, 4))).over(w).cast(DoubleType)

  /** Timestamp-NTZ literal (the testdata timestamps read as timestamp_ntz). */
  def tsNtz(s: String): Column = lit(s).cast("timestamp_ntz")

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
}
