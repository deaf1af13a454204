package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** SQL-parser surface (SURVEY.md §3.3): the reference's entire analyst
  * query path is "hand SQL to the engine over catalog-resolved tables"
  * (Athena over Glue, `sync-canvas-data-files.py:223-235`). Here the same
  * text is handed to Spark's parser/analyzer over the session catalog.
  *
  * Each query below is ONE dialect-neutral SQL string executed verbatim by
  * both Spark and the DuckDB oracle — demonstrating grouping sets,
  * correlated EXISTS / NOT EXISTS, correlated and uncorrelated scalar
  * subqueries, and IN-subqueries (Catalyst decorrelates all of these into
  * joins; no custom code needed).
  */
object SqlSurface {

  private def run(s: SparkSession, dir: String, sql: String): DataFrame = {
    Tables.registerAll(s, dir)
    s.sql(sql)
  }

  // q17_grouping_sets — explicit grouping sets incl. grand total.
  val q17GroupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  COUNT(*) AS n_rows,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  def q17GroupingSets(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q17GroupingSetsSql)

  // q27_exists — correlated EXISTS + NOT EXISTS (decorrelated by Catalyst
  // into semi/anti joins; same algebra as the sync diff A4/A5).
  val q27ExistsSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48.0)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      |GROUP BY o_orderstatus""".stripMargin

  def q27Exists(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q27ExistsSql)

  // q28_scalar_subquery — uncorrelated scalar subquery (global threshold)
  // and correlated scalar subquery (per-customer average), both through
  // the exact-decimal convention so the threshold is bit-identical.
  val q28ScalarSubquerySql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_above
      |FROM orders o
      |WHERE o_totalprice >
      |  (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(30,8))) AS DOUBLE)
      |          / COUNT(*)
      |   FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
      |GROUP BY o_orderpriority""".stripMargin

  def q28ScalarSubquery(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q28ScalarSubquerySql)

  // q29_in_subquery — IN (subquery) membership, semi-join under the hood.
  val q29InSubquerySql: String =
    """SELECT p_brand, COUNT(*) AS n_parts
      |FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem
      |                    WHERE l_quantity >= 49.0)
      |  AND p_size > 25
      |GROUP BY p_brand""".stripMargin

  def q29InSubquery(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q29InSubquerySql)

  // q69_lateral_topk — correlated LATERAL subquery with ORDER BY + LIMIT:
  // per region, the top-2 nations by total supplier balance. The classic
  // top-k-per-group as SQL text; Catalyst plans the decorrelated
  // DomainJoin + per-group limit. Dialect-neutral: LATERAL is SQL:1999,
  // identical in Spark and DuckDB.
  val q69LateralTopkSql: String =
    """SELECT r.r_name, t.n_name, t.total_bal
      |FROM region r,
      |  LATERAL (
      |    SELECT n.n_name,
      |      CAST(SUM(CAST(s.s_acctbal AS DECIMAL(30,8))) AS DOUBLE)
      |        AS total_bal
      |    FROM nation n JOIN supplier s ON s.s_nationkey = n.n_nationkey
      |    WHERE n.n_regionkey = r.r_regionkey
      |    GROUP BY n.n_name
      |    ORDER BY total_bal DESC, n.n_name ASC
      |    LIMIT 2) t""".stripMargin

  def q69LateralTopk(s: SparkSession, dir: String): DataFrame =
    run(s, dir, q69LateralTopkSql)
}
