package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of (point-in-time) join — the canonical operator Spark
  * lacks natively (SURVEY.md §2B joins row). Implemented with the
  * union + carry-forward technique rather than a range join:
  *
  *   1. tag left/right rows, union on (keys, ts);
  *   2. one shuffle+sort per key group;
  *   3. carry the nearest right row to each left row with
  *      last(_, ignoreNulls) (backward) or first following (forward);
  *   4. optional tolerance nulls out matches farther than `toleranceUs`.
  *
  * Scale rationale: cost is one shuffle of |L|+|R| rows keyed by the join
  * keys — no range-bucket cross-product, no per-key state beyond the sort,
  * skew-safe for high-cardinality keys. Ties (equal ts) match, in both
  * directions, matching standard ASOF `>=`/`<=` semantics — pinned by the
  * q26-family oracles.
  */
object AsOf {

  /** As-of join. Right columns come back in a struct column `asof`
    * (null when no match within direction/tolerance).
    *
    * @param keys        equality keys present in both inputs
    * @param lTsUs       left event-time column (epoch micros, long)
    * @param rTsUs       right event-time column (epoch micros, long)
    * @param forward     false = most recent right at-or-before left
    *                    (backward, the default); true = earliest right
    *                    at-or-after left
    * @param toleranceUs max |gap| in micros; matches farther away → null
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTsUs: String,
      rTsUs: String,
      forward: Boolean = false,
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(right.columns.map(col).toSeq: _*)
    val l = left.select(
      keys.map(col) ++ Seq(
        col(lTsUs).as("__ts"), lit(0).as("__tag"),
        leftStruct.as("__l"), lit(null).cast(
          right.schema.fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (st, f) => st.add(f))).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rTsUs).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(
          left.schema.fields.foldLeft(new org.apache.spark.sql.types.StructType())(
            (st, f) => st.add(f))).as("__l"),
        rightStruct.as("__r")): _*)
    val all = l.unionByName(r)
    // backward: right rows sort before left at equal ts so ties match;
    // forward: right rows sort after left at equal ts — then the first
    // following right includes the tie (frame starts at currentRow).
    val tagOrder = if (forward) col("__tag").asc else col("__tag").desc
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, tagOrder)
    val w =
      if (forward) base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      else base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rOnly = when(col("__tag") === 1, col("__r"))
    val matchedExpr =
      if (forward) first(rOnly, ignoreNulls = true).over(w)
      else last(rOnly, ignoreNulls = true).over(w)
    val withMatch = all
      .withColumn("__m", matchedExpr)
      .filter(col("__tag") === 0)
    val gapOk = toleranceUs match {
      case Some(tol) =>
        val gap =
          if (forward) col("__m").getField(rTsUs) - col("__ts")
          else col("__ts") - col("__m").getField(rTsUs)
        col("__m").isNotNull && gap <= tol
      case None => col("__m").isNotNull
    }
    withMatch.select(col("__l.*"),
      when(gapOk, col("__m")).otherwise(lit(null)).as("asof"))
  }

  /** NEAREST as-of: the closer of the backward and forward matches, ties
    * to backward (pandas `merge_asof(direction='nearest')` semantics).
    * Completes the direction family (backward/forward/tolerance above).
    *
    * Still ONE shuffle: both directions come out of the SAME sorted
    * window pass — `last` over the preceding frame and `first` over the
    * following frame share one partition+order, so Spark plans a single
    * sort and a single WindowExec. (Right rows sort before left at equal
    * ts, so an equal-ts match lands in the backward frame at gap 0 —
    * which nearest-ties-to-backward picks regardless.)
    */
  def asofNearest(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTsUs: String,
      rTsUs: String,
      toleranceUs: Option[Long] = None): DataFrame = {
    val leftStruct = struct(left.columns.map(col).toSeq: _*)
    val rightStruct = struct(right.columns.map(col).toSeq: _*)
    val rType = right.schema.fields.foldLeft(
      new org.apache.spark.sql.types.StructType())((st, f) => st.add(f))
    val lType = left.schema.fields.foldLeft(
      new org.apache.spark.sql.types.StructType())((st, f) => st.add(f))
    val l = left.select(
      keys.map(col) ++ Seq(col(lTsUs).as("__ts"), lit(0).as("__tag"),
        leftStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r = right.select(
      keys.map(col) ++ Seq(col(rTsUs).as("__ts"), lit(1).as("__tag"),
        lit(null).cast(lType).as("__l"), rightStruct.as("__r")): _*)
    val base = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").desc)
    val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val rOnly = when(col("__tag") === 1, col("__r"))
    val withBoth = l.unionByName(r)
      .withColumn("__mb", last(rOnly, ignoreNulls = true).over(wB))
      .withColumn("__mf", first(rOnly, ignoreNulls = true).over(wF))
      .filter(col("__tag") === 0)
    val gapB = col("__ts") - col("__mb").getField(rTsUs)
    val gapF = col("__mf").getField(rTsUs) - col("__ts")
    val nearest = when(col("__mb").isNull, col("__mf"))
      .when(col("__mf").isNull, col("__mb"))
      .when(gapB <= gapF, col("__mb"))
      .otherwise(col("__mf"))
    val gapOk = toleranceUs match {
      case Some(tol) =>
        val gap = abs(col("__ts") - nearest.getField(rTsUs))
        nearest.isNotNull && gap <= tol
      case None => nearest.isNotNull
    }
    withBoth.select(col("__l.*"),
      when(gapOk, nearest).otherwise(lit(null)).as("asof"))
  }
}
