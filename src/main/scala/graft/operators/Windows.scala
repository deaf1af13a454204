package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface (SURVEY.md §2B "Window functions"): ranking,
  * analytic (lag/lead/first/last), and frame-based running aggregates.
  *
  * Determinism convention: every ORDER BY inside a window carries a unique
  * tie-breaker key, so ranks/lags are identical across engines and runs.
  *
  * Scale notes: windows shuffle once on their partition key; all three
  * window queries below partition on a high-cardinality key (custkey /
  * suppkey), so partitions stay small and state never exceeds a single
  * key's rows. No global (empty-partition) windows — those serialize the
  * whole dataset through one task at 100 TB.
  */
object Windows {

  // ---------------------------------------------------------------------
  // q9_window_rank — row_number / rank / dense_rank / ntile per customer,
  // keeping each customer's top-3 orders by price.
  // ---------------------------------------------------------------------
  def q9WindowRank(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rn"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(2).over(w).as("half"))
      .filter(col("rn") <= 3)
  }

  val q9WindowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk,
      |  CAST(drk AS INT) AS drk, CAST(half AS INT) AS half
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER w AS rn,
      |    RANK() OVER w AS rk,
      |    DENSE_RANK() OVER w AS drk,
      |    NTILE(2) OVER w AS half
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_totalprice DESC, o_orderkey ASC)
      |) WHERE rn <= 3""".stripMargin

  // ---------------------------------------------------------------------
  // q10_window_running — running (cumulative) sum per supplier in shipdate
  // order, plus min/max over the growing frame. Decimal-summed so the
  // result is exact at any parallelism.
  // ---------------------------------------------------------------------
  def q10WindowRunning(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data at
    // larger SFs — tiebreak down to (partkey, quantity, extendedprice) so
    // the frame order is total (or remaining ties are value-identical and
    // the running sums are order-invariant)
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
        col("l_linenumber").asc, col("l_partkey").asc,
        col("l_quantity").asc, col("l_extendedprice").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.select(
      col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
      sumDecOver(col("l_quantity"), w).as("run_qty"),
      min(col("l_quantity")).over(w).as("min_qty"),
      max(col("l_quantity")).over(w).as("max_qty"))
  }

  val q10WindowRunningSql: String =
    """SELECT l_suppkey, l_orderkey, l_linenumber,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) OVER w AS DOUBLE) AS run_qty,
      |  MIN(l_quantity) OVER w AS min_qty,
      |  MAX(l_quantity) OVER w AS max_qty
      |FROM lineitem
      |WINDOW w AS (PARTITION BY l_suppkey
      |             ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC,
      |                      l_partkey ASC, l_quantity ASC, l_extendedprice ASC
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  // ---------------------------------------------------------------------
  // q11_window_lag — lag/lead analytics per customer order history:
  // previous/next order price and days since previous order.
  // ---------------------------------------------------------------------
  def q11WindowLag(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    o.select(
      col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      datediff(col("o_orderdate").cast("date"),
        lag(col("o_orderdate"), 1).over(w).cast("date")).as("days_since_prev"))
  }

  val q11WindowLagSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |  LAG(o_totalprice, 1) OVER w AS prev_price,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  CAST(DATE_DIFF('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE),
      |       CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey
      |             ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin

  // ---------------------------------------------------------------------
  // q60_range_frame — RANGE (value-based) frames: per customer, count and
  // spend of orders in the 90 days *of event time* preceding each order —
  // peers at the same timestamp are all included, so unlike ROWS frames no
  // tie-breaking is needed. Plus percent_rank/cume_dist distribution
  // functions over a totally-ordered window.
  // ---------------------------------------------------------------------
  def q60RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .withColumn("od_s", unix_micros(col("o_orderdate").cast("timestamp"))
        / lit(1000000L))
    val ninetyDaysS = 90L * 86400L
    val wRange = Window.partitionBy(col("o_custkey")).orderBy(col("od_s"))
      .rangeBetween(-ninetyDaysS, Window.currentRow)
    val wRank = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.select(
      col("o_custkey"), col("o_orderkey"),
      count(lit(1)).over(wRange).as("n_90d"),
      sumDecOver(col("o_totalprice"), wRange).as("spend_90d"),
      round(percent_rank().over(wRank), 8).as("pr"),
      round(cume_dist().over(wRank), 8).as("cd"))
  }

  val q60RangeFrameSql: String =
    """SELECT o_custkey, o_orderkey,
      |  COUNT(*) OVER wr AS n_90d,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) OVER wr AS DOUBLE)
      |    AS spend_90d,
      |  ROUND(PERCENT_RANK() OVER wk, 8) AS pr,
      |  ROUND(CUME_DIST() OVER wk, 8) AS cd
      |FROM (SELECT *, epoch_us(o_orderdate) // 1000000 AS od_s FROM orders)
      |WINDOW wr AS (PARTITION BY o_custkey ORDER BY od_s
      |              RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW),
      |       wk AS (PARTITION BY o_custkey
      |              ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin

  // ---------------------------------------------------------------------
  // q15_rollup — hierarchical subtotals + grand total with grouping_id.
  // ---------------------------------------------------------------------
  def q15Rollup(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sumDec(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"),
        grouping_id().as("gid"))
  }

  val q15RollupSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n_rows,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------------
  // q16_cube — all grouping combinations with grouping_id.
  // ---------------------------------------------------------------------
  def q16Cube(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice")).as("spend"),
        grouping_id().as("gid"))
  }

  val q16CubeSql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS spend,
      |  GROUPING(o_orderstatus, o_orderpriority) AS gid
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------------
  // q139_equal_freq_binning — equal-frequency discretization: ntile
  // deciles of document length within each language stratum, summarized
  // per bin. The feature-engineering binning step (quantile buckets for
  // calibration / stratified mixing) — distinct from q76's threshold
  // gate (keep/drop at a quantile) and q103's equi-width histogram bins.
  // NTILE's floor-division remainder rule is identical in Spark and
  // DuckDB GIVEN A TOTAL ORDER — the (n_chars, doc_id) tiebreak is what
  // makes bin assignment engine-invariant, same discipline as q131.
  // Scale: windows partition by the stratum — per-task data is one
  // stratum, and a corpus-sized stratum would move this to the q68b
  // two-level bucket decomposition; integer-only output.
  // ---------------------------------------------------------------------
  def equalFreqBins(df: DataFrame, stratum: String, value: String,
      tiebreak: String, nBins: Int): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(col(value).asc, col(tiebreak).asc)
    df.withColumn("bin", ntile(nBins).over(w))
      .groupBy(col(stratum), col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(value)).as("lo"), max(col(value)).as("hi"))
  }

  def q139EqualFreqBinning(s: SparkSession, dir: String): DataFrame =
    equalFreqBins(t(s, dir, "documents"), "lang", "n_chars", "doc_id",
      nBins = 10)

  val q139EqualFreqBinningSql: String =
    """SELECT lang, bin, COUNT(*) AS n_rows,
      |  MIN(n_chars) AS lo, MAX(n_chars) AS hi
      |FROM (
      |  SELECT lang, n_chars,
      |    CAST(NTILE(10) OVER (PARTITION BY lang
      |      ORDER BY n_chars, doc_id) AS INT) AS bin
      |  FROM documents)
      |GROUP BY lang, bin""".stripMargin

  // ---------------------------------------------------------------------
  // q144_quantile_normalize — percent-rank normalization within a
  // stratum: each document's length mapped to [0,1] by
  // (rank−1)/(n−1). The monotone feature transform that makes scores
  // comparable ACROSS strata (a 2k-char doc is long for lang A, median
  // for lang B). The double is an exact-integer division — bit-identical
  // cross-engine, no rounding needed. Same stratum-window scale shape
  // as q139.
  // ---------------------------------------------------------------------
  def q144QuantileNormalize(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").asc, col("doc_id").asc)
    t(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"),
        percent_rank().over(w).as("pr"))
  }

  val q144QuantileNormalizeSql: String =
    """SELECT doc_id, lang, n_chars,
      |  PERCENT_RANK() OVER (PARTITION BY lang
      |    ORDER BY n_chars, doc_id) AS pr
      |FROM documents""".stripMargin
}
