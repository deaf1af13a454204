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
}
