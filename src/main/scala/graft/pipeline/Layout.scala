package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for the canonical layer.
  *
  * Why it exists: parquet file/row-group skipping prunes on per-file
  * min/max ranges, which a plain sort optimizes for ONE column only — a
  * table sorted by time answers time filters with few files but touches
  * every file for a user filter. Interleaving the bits of both columns'
  * bucket ranks puts rows close in BOTH dimensions into the same files,
  * so min/max pruning works for either predicate (the layout trick
  * popularized by Delta/Iceberg `OPTIMIZE ZORDER BY`; the curve itself
  * is Morton 1966). This matters at 100 TB, where "touch every file" is
  * the difference between seconds and hours.
  *
  * Scale design: one O(#columns) stats pass (driver gets 4 scalars, not
  * data), then a map-only z-value projection (pure bit arithmetic inside
  * whole-stage codegen — no UDF), one range shuffle on the z-value, and
  * a per-partition sort. Nothing is ever collected; skew in the value
  * distribution degrades file balance, not correctness (range
  * partitioning samples the z-distribution).
  */
object Layout {

  /** Bit-interleaved Morton code of two non-negative bucket ranks, each
    * using the low `bits` bits: x occupies even bit positions, y odd. */
  def zValue(x: Column, y: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Map a numeric column onto 0 .. 2^bits-1 given its [mn, mx] range
    * (degenerate ranges collapse to bucket 0). */
  def bucketize(c: Column, mn: Double, mx: Double, bits: Int): Column = {
    val n = (1L << bits) - 1
    if (mx > mn)
      least(lit(n), greatest(lit(0L),
        floor((c.cast("double") - mn) / (mx - mn) * n).cast("long")))
    else lit(0L)
  }

  /** Numeric view of a clustering column: timestamps/dates go through
    * TIMESTAMP first (TIMESTAMP_NTZ has no direct double cast on
    * Spark 4), everything else casts directly. */
  private def asNum(df: DataFrame, name: String): Column = {
    import org.apache.spark.sql.types.{DateType, TimestampNTZType}
    df.schema(name).dataType match {
      case TimestampNTZType | DateType =>
        col(name).cast("timestamp").cast("double")
      case _ => col(name).cast("double")
    }
  }

  /** Rewrite `df` into `outDir` as `numFiles` parquet files clustered on
    * the Morton curve of (`cx`, `cy`). Both columns must be numeric,
    * timestamp, or date (timestamps bucket on epoch seconds). Row
    * content is unchanged — this is a pure layout operation. */
  def zorderWrite(df: DataFrame, cx: String, cy: String, outDir: String,
      numFiles: Int, bits: Int = 16): Unit = {
    val stats = df.agg(
      min(asNum(df, cx)), max(asNum(df, cx)),
      min(asNum(df, cy)), max(asNum(df, cy))).head()
    val (xMn, xMx) = (stats.getDouble(0), stats.getDouble(1))
    val (yMn, yMx) = (stats.getDouble(2), stats.getDouble(3))
    val z = zValue(
      bucketize(asNum(df, cx), xMn, xMx, bits),
      bucketize(asNum(df, cy), yMn, yMx, bits), bits)
    df.withColumn("_zorder", z)
      .repartitionByRange(numFiles, col("_zorder"))
      .sortWithinPartitions("_zorder")
      .drop("_zorder")
      .write.mode("overwrite").parquet(outDir)
  }
}
