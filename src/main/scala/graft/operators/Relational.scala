package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational operator surface (SURVEY.md §2B): the full declared/delegated
  * query capability of the reference warehouse, expressed Spark-first.
  *
  * The reference registers typed external tables (`sync-canvas-data-files
  * .py:170-235`) precisely so a SQL engine can scan/filter/join/aggregate/
  * window over them; here those capabilities are native Catalyst plans.
  *
  * Float-determinism convention: any aggregate over double "money" columns
  * is computed in exact decimal arithmetic (`sumDec`) and only the final
  * value is cast back to double. Decimal sums are order-independent, so the
  * Spark result is bit-identical to the DuckDB oracle regardless of
  * partitioning/parallelism — a requirement for the driver's hash compare.
  */
object Relational {

  /** Exact decimal sum of a (possibly computed) double column, returned as
    * double. Safe under any aggregation order. */
  private def sumDec(c: Column): Column =
    sum(c.cast(DecimalType(30, 8))).cast(DoubleType)

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------
  // q1_agg — TPC-H Q1-style pricing summary: multi-aggregate hash
  // aggregation with partial (map-side) + final phases, grouped scan.
  // ---------------------------------------------------------------------
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        sumDec(col("l_extendedprice")).as("sum_base_price"),
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  val q1AggSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q6_filter_agg — TPC-H Q6-style selective scan: predicate + projection
  // pushdown into the parquet scan, single global aggregate.
  // ---------------------------------------------------------------------
  def q6FilterAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(
        sumDec(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6FilterAggSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,8))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin
}
