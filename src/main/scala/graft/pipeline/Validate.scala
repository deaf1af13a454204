package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality constraint suite (deequ-style) — the validation layer a
  * warehouse runs after every load. The reference's pipeline validates at
  * file granularity (S3 key exists → skip, `sync-canvas-data-files
  * .py:62-67`); these are the record-granularity checks the landed data
  * needs before anything downstream trusts it: nullness, key uniqueness,
  * referential integrity, value ranges, accepted values.
  *
  * Output contract: one row per check — (chk, violations, passed) —
  * so the suite result is tiny, joinable into the sync summary (A13),
  * and trivially alert-able.
  *
  * Scale shapes, per check:
  *  - row-local predicates (not-null, range, accepted values): ALL such
  *    checks on one table fuse into ONE conditional-sum aggregate pass —
  *    a table scanned once no matter how many predicates are declared;
  *  - uniqueness: one shuffle-on-key count (map-side partial), violations
  *    = rows − distinct keys, computed in the same aggregate;
  *  - referential integrity: LEFT ANTI equi-join child→parent on the key
  *    — shuffle-on-key, broadcast when the parent is small; never a
  *    cartesian.
  */
object Validate {

  /** A row-local predicate check: `violations` counts rows where the
    * predicate is FALSE or NULL (a null check result is a violation —
    * the conservative reading). */
  final case class RowRule(name: String, pred: Column)

  /** All row-local rules on one table in a single scan. */
  def rowChecks(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val sums = rules.map(r =>
      sum(when(coalesce(r.pred, lit(false)), lit(0L)).otherwise(lit(1L)))
        .as(r.name))
    val one = df.agg(sums.head, sums.tail: _*)
    // rule names contain dots ("orders.o_orderkey.not_null") — backticks
    // keep col() from parsing them as struct-field paths
    val pairs = rules.map(r =>
      struct(lit(r.name).as("chk"),
        coalesce(col(s"`${r.name}`"), lit(0L)).as("violations")))
    one.select(explode(array(pairs: _*)).as("c"))
      .select(col("c.chk"), col("c.violations"),
        (col("c.violations") === 0L).as("passed"))
  }

  /** Key uniqueness: violations = rows − distinct keys (0 iff unique).
    * NULL keys count as violations (a NULL key is never a valid primary
    * key). */
  def uniqueCheck(df: DataFrame, name: String, key: String): DataFrame =
    df.agg(count(lit(1)).as("n"), count_distinct(col(key)).as("d"))
      .select(lit(name).as("chk"),
        (col("n") - col("d")).as("violations"),
        (col("n") === col("d")).as("passed"))

  /** Referential integrity: violations = child rows whose key has no
    * parent (NULL child keys pass — use a RowRule to forbid them). */
  def fkCheck(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(name).as("chk"), col("violations"),
        (col("violations") === 0L).as("passed"))

  // ---------------------------------------------------------------------
  // q124_validate — the landed-warehouse suite over orders/lineitem:
  // fused row-local pass per table + uniqueness + two FK checks. The
  // planted expectations: all pass except the range check (l_quantity
  // caps at 50 in TPC-H data; the rule demands < 50 so the gate also
  // exercises the failing path).
  // ---------------------------------------------------------------------
  def q124Validate(s: SparkSession, dir: String): DataFrame = {
    val o = graft.operators.t(s, dir, "orders")
    val li = graft.operators.t(s, dir, "lineitem")
    val c = graft.operators.t(s, dir, "customer")
    val orderRows = rowChecks(o, Seq(
      RowRule("orders.o_orderkey.not_null", col("o_orderkey").isNotNull),
      RowRule("orders.o_orderstatus.accepted",
        col("o_orderstatus").isin("O", "F", "P")),
      RowRule("orders.o_totalprice.positive", col("o_totalprice") > 0.0)))
    val liRows = rowChecks(li, Seq(
      RowRule("lineitem.l_quantity.lt_50", col("l_quantity") < 50.0),
      RowRule("lineitem.l_discount.range",
        col("l_discount") >= 0.0 && col("l_discount") <= 0.1)))
    orderRows
      .unionByName(liRows)
      .unionByName(uniqueCheck(o, "orders.o_orderkey.unique", "o_orderkey"))
      .unionByName(fkCheck(o, "o_custkey", c, "c_custkey",
        "orders.o_custkey.fk_customer"))
      .unionByName(fkCheck(li, "l_orderkey", o, "o_orderkey",
        "lineitem.l_orderkey.fk_orders"))
  }

  val q124ValidateSql: String =
    """WITH ord AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 0 ELSE 1 END)
      |      AS BIGINT) AS v_nn,
      |    CAST(SUM(CASE WHEN COALESCE(o_orderstatus IN ('O','F','P'),
      |      false) THEN 0 ELSE 1 END) AS BIGINT) AS v_acc,
      |    CAST(SUM(CASE WHEN COALESCE(o_totalprice > 0.0, false)
      |      THEN 0 ELSE 1 END) AS BIGINT) AS v_pos
      |  FROM orders),
      |li AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN COALESCE(l_quantity < 50.0, false)
      |      THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
      |    CAST(SUM(CASE WHEN COALESCE(l_discount >= 0.0
      |      AND l_discount <= 0.1, false) THEN 0 ELSE 1 END) AS BIGINT)
      |      AS v_disc
      |  FROM lineitem)
      |SELECT 'orders.o_orderkey.not_null' AS chk, v_nn AS violations,
      |  v_nn = 0 AS passed FROM ord
      |UNION ALL
      |SELECT 'orders.o_orderstatus.accepted', v_acc, v_acc = 0 FROM ord
      |UNION ALL
      |SELECT 'orders.o_totalprice.positive', v_pos, v_pos = 0 FROM ord
      |UNION ALL
      |SELECT 'lineitem.l_quantity.lt_50', v_qty, v_qty = 0 FROM li
      |UNION ALL
      |SELECT 'lineitem.l_discount.range', v_disc, v_disc = 0 FROM li
      |UNION ALL
      |SELECT 'orders.o_orderkey.unique',
      |  COUNT(*) - COUNT(DISTINCT o_orderkey),
      |  COUNT(*) = COUNT(DISTINCT o_orderkey)
      |FROM orders
      |UNION ALL
      |SELECT 'orders.o_custkey.fk_customer', COUNT(*), COUNT(*) = 0
      |FROM orders o
      |WHERE o.o_custkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM customer c
      |                  WHERE c.c_custkey = o.o_custkey)
      |UNION ALL
      |SELECT 'lineitem.l_orderkey.fk_orders', COUNT(*), COUNT(*) = 0
      |FROM lineitem l
      |WHERE l.l_orderkey IS NOT NULL
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_orderkey = l.l_orderkey)""".stripMargin

  /** CALENDAR-GAP audit — which (key, day) cells are MISSING from an
    * expected daily series: the completeness check a late-or-lost
    * ingestion surfaces as silence, which no row-level rule can see.
    * The expected grid is keys × the key's own [min, max] day span
    * (engine-side sequence, never a driver loop); observed days
    * anti-join away; emitted per key: span, observed, missing, and the
    * first missing day. */
  def calendarGaps(df: DataFrame, key: String, dayCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val observed = df.select(col(key), col(dayCol).cast("long").as("__d"))
      .distinct()
    val spans = observed.groupBy(col(key))
      .agg(min(col("__d")).as("__d0"), max(col("__d")).as("__d1"),
        count(lit(1)).as("n_observed"))
    val grid = spans.select(col(key), col("n_observed"),
      (col("__d1") - col("__d0") + 1).as("span_days"),
      explode(sequence(col("__d0"), col("__d1"))).as("__d"))
    grid.join(observed, Seq(key, "__d"), "left_anti")
      .groupBy(col(key))
      .agg(max(col("span_days")).as("span_days"),
        max(col("n_observed")).as("n_observed"),
        count(lit(1)).as("n_missing"),
        min(col("__d")).as("first_missing_day"))
  }

  // ---------------------------------------------------------------------
  // q225_calendar_gaps — per-event-type daily completeness with planted
  // holes (drop every day ≡ 3 mod 7 for one type): the audit must name
  // exactly the planted gaps and stay silent for complete types (they
  // emit no row — absence of problems is absence of rows).
  // ---------------------------------------------------------------------
  def q225CalendarGaps(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val daily = graft.Tables.load(s, dir, "events")
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long")
          .as("day"))
      .distinct()
      .filter(!(col("event_type") === "view" && col("day") % 7 === 3))
    calendarGaps(daily, "event_type", "day")
  }

  val q225CalendarGapsSql: String =
    """WITH daily AS (
      |  SELECT DISTINCT event_type,
      |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
      |      AS day
      |  FROM events),
      |obs AS (
      |  SELECT * FROM daily
      |  WHERE NOT (event_type = 'view' AND day % 7 = 3)),
      |spans AS (
      |  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1,
      |    COUNT(*) AS n_observed
      |  FROM obs GROUP BY event_type),
      |grid AS (
      |  SELECT s.event_type, s.n_observed, s.d1 - s.d0 + 1 AS span_days,
      |    g.d AS day
      |  FROM spans s, LATERAL unnest(range(s.d0, s.d1 + 1)) AS g(d)),
      |missing AS (
      |  SELECT g.* FROM grid g
      |  LEFT JOIN obs o ON g.event_type = o.event_type AND g.day = o.day
      |  WHERE o.event_type IS NULL)
      |SELECT event_type, CAST(MAX(span_days) AS BIGINT) AS span_days,
      |  CAST(MAX(n_observed) AS BIGINT) AS n_observed,
      |  COUNT(*) AS n_missing, MIN(day) AS first_missing_day
      |FROM missing GROUP BY event_type""".stripMargin

  /** MONOTONICITY audit — does a sequence column only move forward per
    * key? Counts regressions (value < previous in the declared order)
    * with the first offending position — the watermark/ordering
    * assumption check behind every incremental consumer. One lag
    * window per key. */
  def monotonicCheck(df: DataFrame, key: String, order: String,
      value: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy(col(key)).orderBy(col(order).asc)
    df.select(col(key), col(order), col(value))
      .withColumn("__prev", lag(col(value), 1).over(w))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col(value) < col("__prev"), 1L).otherwise(0L))
          .as("n_regressions"),
        min(when(col(value) < col("__prev"), col(order)))
          .as("first_regression_at"))
  }

  // ---------------------------------------------------------------------
  // q226_monotonic — per-user: is the event value's DAILY RUNNING MAX
  // monotone when replayed in event order? Planted regressions via a
  // scrambled order column for half the users; the clean half shows 0.
  // ---------------------------------------------------------------------
  def q226Monotonic(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = graft.Tables.load(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        when(col("user_id") % 2 === 0, col("event_id"))
          .otherwise(-col("event_id")).as("seq"))
    monotonicCheck(e, "user_id", "event_id", "seq")
  }

  val q226MonotonicSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN user_id % 2 = 0 THEN event_id
      |         ELSE -event_id END AS seq
      |  FROM events),
      |x AS (
      |  SELECT user_id, event_id, seq,
      |    LAG(seq) OVER (PARTITION BY user_id ORDER BY event_id ASC)
      |      AS prev
      |  FROM e)
      |SELECT user_id, COUNT(*) AS n_rows,
      |  CAST(SUM(CASE WHEN seq < prev THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_regressions,
      |  MIN(CASE WHEN seq < prev THEN event_id END)
      |    AS first_regression_at
      |FROM x GROUP BY user_id""".stripMargin

}
