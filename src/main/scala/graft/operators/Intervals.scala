package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Interval-union aggregation ("coverage"): the total length covered
  * by the UNION of per-key [start, end) intervals, overlaps merged — the
  * classic sweep-line turned relational. Distinct from the range JOIN
  * (q55: pair intervals against points) — this collapses a key's whole
  * interval set to merged islands. The warehouse uses: machine-uptime /
  * session-coverage / "how many distinct days was this supplier actually
  * shipping" questions that a naive SUM(end − start) double-counts.
  *
  * Shape: one shuffle on the key, one per-key sort (the window), zero
  * joins, zero self-products. Island detection is O(1) per row: a row
  * starts a new island iff its start lies strictly past the running
  * max(end) of all PRECEDING rows (rowsBetween(unboundedPreceding, −1))
  * in (start, end, tiebreak…) order; adjacent intervals (start = prev
  * max) merge, matching half-open [s, e) adjacency. The island id is a
  * running sum of the new-island flags — the standard gaps-and-islands
  * construction, expressed identically in the DuckDB oracle so the
  * per-row flags (and therefore every downstream integer) agree exactly.
  *
  * Tie discipline: the window ORDER BY ends with a unique tiebreak.
  * With ties on start alone, which of two equal-start rows sees the
  * other's end in its prefix max is order-dependent — underspecified
  * ordering here is a cross-engine hash flip waiting to happen.
  *
  * 100 TB: per-key state is the sort buffer, never a pair expansion; a
  * key with 10^6 intervals costs one sorted pass. Skewed keys land in
  * one window task each — for a pathological single key holding a whole
  * corpus, pre-merge within (key, coarse-time-bucket) salts first, then
  * re-merge bucket boundaries; not needed at gate scale.
  */
object Intervals {

  /** Merged-coverage summary per key over half-open intervals
    * [`start`, `end`) given as integer day/tick columns: total covered
    * ticks, island count, and interval count. `tiebreak` must make the
    * per-key ordering total (deterministic island flags). */
  def coverage(df: DataFrame, key: String, start: String, end: String,
      tiebreak: Seq[String]): DataFrame = {
    val ord = col(start).asc +: col(end).asc +:
      tiebreak.map(col(_).asc)
    val prefix = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val running = Window.partitionBy(col(key)).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = df
      .withColumn("__pmax", max(col(end)).over(prefix))
      .withColumn("__new",
        when(col("__pmax").isNull || col(start) > col("__pmax"), 1L)
          .otherwise(0L))
      .withColumn("__island", sum(col("__new")).over(running))
    flagged
      .groupBy(col(key), col("__island"))
      .agg(min(col(start)).as("__s"), max(col(end)).as("__e"),
        count(lit(1)).as("__n"))
      .groupBy(col(key))
      .agg(sum(col("__e") - col("__s")).as("covered"),
        count(lit(1)).as("n_islands"),
        sum(col("__n")).as("n_intervals"))
  }

  /** Gate: supplier "shipping coverage" in days over intervals
    * [shipdate, shipdate + (orderkey mod 10) + 1) — deterministic
    * synthetic durations from the fixture's own integer columns.
    * Integer-only output. */
  def q131IntervalCoverage(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
          .cast("long").as("d0"),
        col("l_orderkey"), col("l_linenumber"))
      .select(col("l_suppkey"), col("d0").as("start"),
        (col("d0") + pmod(col("l_orderkey"), lit(10)) + lit(1))
          .as("end"),
        col("l_orderkey"), col("l_linenumber"))
    coverage(li, "l_suppkey", "start", "end",
        Seq("l_orderkey", "l_linenumber"))
      .select(col("l_suppkey"), col("covered"), col("n_islands"),
        col("n_intervals"))
  }

  val q131IntervalCoverageSql: String =
    """WITH iv AS (
      |  SELECT l_suppkey,
      |    datediff('day', DATE '1992-01-01',
      |             CAST(l_shipdate AS DATE))::BIGINT AS s,
      |    datediff('day', DATE '1992-01-01',
      |             CAST(l_shipdate AS DATE))::BIGINT
      |      + (l_orderkey % 10) + 1 AS e,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |flagged AS (
      |  SELECT l_suppkey, s, e,
      |    CASE WHEN MAX(e) OVER (PARTITION BY l_suppkey
      |        ORDER BY s, e, l_orderkey, l_linenumber
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > MAX(e) OVER (PARTITION BY l_suppkey
      |        ORDER BY s, e, l_orderkey, l_linenumber
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island,
      |    l_orderkey, l_linenumber
      |  FROM iv),
      |islands AS (
      |  SELECT l_suppkey, s, e,
      |    SUM(new_island) OVER (PARTITION BY l_suppkey
      |      ORDER BY s, e, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flagged),
      |per_island AS (
      |  SELECT l_suppkey, island, MIN(s) AS s, MAX(e) AS e,
      |    COUNT(*) AS n
      |  FROM islands GROUP BY l_suppkey, island)
      |SELECT l_suppkey, CAST(SUM(e - s) AS BIGINT) AS covered,
      |  COUNT(*) AS n_islands, CAST(SUM(n) AS BIGINT) AS n_intervals
      |FROM per_island GROUP BY l_suppkey""".stripMargin
}
