package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the operator suite. */
package object operators {

  /** Exact decimal sum of a (possibly computed) double column, returned as
    * double. Decimal addition is associative/commutative, so the result is
    * independent of partitioning and partial-aggregation order — required
    * for bit-exact agreement with the single-threaded DuckDB oracle. */
  def sumDec(c: Column): Column =
    sum(c.cast(DecimalType(30, 8))).cast(DoubleType)

  /** Windowed variant of [[sumDec]] for running sums. */
  def sumDecOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(DecimalType(30, 8))).over(w).cast(DoubleType)

  /** Timestamp-NTZ literal (the testdata timestamps read as timestamp_ntz). */
  def tsNtz(s: String): Column = lit(s).cast("timestamp_ntz")

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)
}
