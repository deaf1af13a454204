package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator surface (SURVEY.md §2B): the declared/delegated query
  * capability of the reference warehouse — scans, filters, projections,
  * joins of every flavor, aggregation, set ops — expressed Spark-first.
  *
  * The reference registers typed external tables (`sync-canvas-data-files
  * .py:170-235`) precisely so a SQL engine can scan/filter/join/aggregate
  * over them; here those capabilities are native Catalyst plans.
  *
  * Scale notes (100 TB design intent):
  *  - dim→fact joins broadcast the dim side (`broadcast(...)` hints), so the
  *    fact table never shuffles for those joins;
  *  - aggregates are declarative `groupBy.agg` → Catalyst plans partial
  *    (map-side) + final hash aggregation automatically;
  *  - all filters/projections sit directly on the scan → parquet pushdown;
  *  - double sums go through exact decimal (see [[operators.sumDec]]) which
  *    also makes results independent of the cluster's aggregation order.
  */
object Relational {

  // ---------------------------------------------------------------------
  // q1_agg — TPC-H Q1-style pricing summary: multi-aggregate hash
  // aggregation with partial (map-side) + final phases, grouped scan.
  // ---------------------------------------------------------------------
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(col("l_shipdate") <= tsNtz("1998-09-02"))
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
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // q2_filter_project — selective scan + projection with scalar string
  // expressions; predicates and column pruning reach the parquet reader.
  // ---------------------------------------------------------------------
  def q2FilterProject(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    p.filter(col("p_size").between(10, 20) && col("p_retailprice") > 950.0)
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_u"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        col("p_retailprice"))
  }

  val q2FilterProjectSql: String =
    """SELECT p_partkey, UPPER(p_name) AS name_u,
      |  p_brand || ':' || p_type AS brand_type, p_retailprice
      |FROM part
      |WHERE p_size BETWEEN 10 AND 20 AND p_retailprice > 950.0""".stripMargin

  // ---------------------------------------------------------------------
  // q3_join_agg — dim ⋈ fact ⋈ fact chain with broadcast dim: revenue per
  // market segment. customer is broadcast (never shuffles lineitem on
  // c_custkey); orders⋈lineitem is the one genuine shuffle.
  // ---------------------------------------------------------------------
  def q3JoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .filter(col("o_orderdate") < tsNtz("1998-01-01"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  val q3JoinAggSql: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lines
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderdate < TIMESTAMP '1998-01-01'
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q4_semi_join — EXISTS as left-semi join (the pipeline's own A4 "is this
  // key in the manifest" membership test, relationally): orders having at
  // least one heavy line.
  // ---------------------------------------------------------------------
  def q4SemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem").filter(col("l_quantity") > 45.0)
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  val q4SemiJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
      |GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q5_multi_join — 6-table star join (TPC-H Q5 shape): local-supplier
  // revenue per nation within one region. All dims broadcast; the only
  // shuffle is lineitem⋈orders.
  // ---------------------------------------------------------------------
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val c = t(s, dir, "customer")
    val sup = t(s, dir, "supplier")
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup),
        col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sumDec(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  val q5MultiJoinSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(30,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name""".stripMargin

  // ---------------------------------------------------------------------
  // q6_filter_agg — TPC-H Q6-style selective scan: predicate + projection
  // pushdown into the parquet scan, single global aggregate.
  // ---------------------------------------------------------------------
  def q6FilterAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= tsNtz("1995-01-01") &&
        col("l_shipdate") < tsNtz("1996-01-01") &&
        col("l_discount").between(0.02, 0.06) &&
        col("l_quantity") < 24)
      .agg(
        sumDec(col("l_extendedprice") * col("l_discount")).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  val q6FilterAggSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.02 AND 0.06
      |  AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------------
  // q7_anti_join — NOT EXISTS as left-anti join. This is the exact shape of
  // the reference's sync diff: manifest keys not in state → fetch set
  // (`sync-canvas-data-files.py:62-86`), state keys not in manifest →
  // delete set (`:103-112`).
  // ---------------------------------------------------------------------
  def q7AntiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    o.join(li, col("o_orderkey") === col("l_orderkey"), "left_anti")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), min(col("o_orderkey")).as("min_key"))
  }

  val q7AntiJoinSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders, MIN(o_orderkey) AS min_key
      |FROM orders
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)
      |GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q87_bloom_diff — the q7 sync diff with a BLOOM-PRUNED fast path, the
  // shape that keeps the reference's "what's new" anti-join cheap when the
  // state side is huge: build one bloom sketch over the state keys
  // (Catalyst's own BloomFilterAggregate — see functions/Bloom), probe it
  // MAP-SIDE on the manifest. `NOT might_contain` rows are *guaranteed*
  // new (blooms have no false negatives) and skip the join entirely; only
  // the `might_contain` survivors — true matches plus the ~2% false
  // positives — pay the exact anti-join shuffle. At 100 TB the sketch is
  // a few MB shipped once per executor via the scalar subquery's one-row
  // broadcast, the manifest scan stays exchange-free for the fast path,
  // and the anti-join's shuffled input shrinks from |manifest| to
  // |matches| + 2% — the identical economics to Spark's InjectRuntimeFilter,
  // applied to a join direction (anti) the optimizer never rewrites.
  // ---------------------------------------------------------------------

  /** Rows of `left` with no match in `right` (left-anti semantics),
    * computed via the bloom fast path. Exactness does not depend on the
    * sketch: false positives are re-checked by the exact anti-join, false
    * negatives are impossible. `estItems` sizes the sketch (8 bits/item). */
  def bloomPrunedAntiJoin(s: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      estItems: Long = 1000000L): DataFrame = {
    graft.functions.Bloom.register(s)
    // per-call unique view names, dropped after planning: fixed names
    // would clobber caller views and race concurrent calls on a shared
    // session (sql() resolves the plan eagerly, so dropping is safe)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "")
    val lv = s"__bpaj_left_$tag"
    val rv = s"__bpaj_right_$tag"
    left.createOrReplaceTempView(lv)
    right.createOrReplaceTempView(rv)
    // COALESCE(…, false): an EMPTY right side aggregates to a NULL sketch
    // and might_contain(NULL, k) is NULL — without the coalesce both
    // branches would drop every row, when the correct answer is "all of
    // the left is new"
    try s.sql(
      s"""WITH bloom AS (
         |  SELECT graft_bloom_agg(xxhash64($rightKey),
         |           CAST($estItems AS BIGINT)) AS bf
         |  FROM $rv)
         |SELECT l.* FROM $lv l
         |WHERE NOT COALESCE(graft_might_contain((SELECT bf FROM bloom),
         |        xxhash64(l.$leftKey)), false)
         |UNION ALL
         |SELECT l.* FROM $lv l
         |WHERE COALESCE(graft_might_contain((SELECT bf FROM bloom),
         |        xxhash64(l.$leftKey)), false)
         |  AND NOT EXISTS (SELECT 1 FROM $rv r
         |                  WHERE r.$rightKey = l.$leftKey)""".stripMargin)
    finally {
      s.catalog.dropTempView(lv)
      s.catalog.dropTempView(rv)
    }
  }

  def q87BloomDiff(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    val state = orders.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("state_key"))
    val manifest = orders.select(col("o_orderkey"))
    bloomPrunedAntiJoin(s, manifest, state, "o_orderkey", "state_key")
      .groupBy((col("o_orderkey") % 10).as("bucket"))
      .agg(count(lit(1)).as("n_new"), min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
  }

  val q87BloomDiffSql: String =
    """WITH state AS (
      |  SELECT o_orderkey AS state_key FROM orders WHERE o_orderkey % 3 <> 0),
      |new_keys AS (
      |  SELECT o_orderkey FROM orders m
      |  WHERE NOT EXISTS (SELECT 1 FROM state s
      |                    WHERE s.state_key = m.o_orderkey))
      |SELECT o_orderkey % 10 AS bucket, COUNT(*) AS n_new,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM new_keys GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q8_outer_join — left outer join preserving customers with no orders;
  // null-safe aggregation over the outer side.
  // ---------------------------------------------------------------------
  def q8OuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sumDec(coalesce(col("o_totalprice"), lit(0.0))).as("spend"))
  }

  val q8OuterJoinSql: String =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(30,4))) AS DOUBLE) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey""".stripMargin

  // ---------------------------------------------------------------------
  // q8b_full_outer — full outer join of two aggregated sides (nations seen
  // from supplier vs customer), nulls where a side is absent.
  // ---------------------------------------------------------------------
  def q8bFullOuter(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier").groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val c = t(s, dir, "customer").groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    sup.join(c, col("s_nationkey") === col("c_nationkey"), "full_outer")
      .select(
        coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
        col("n_suppliers"), col("n_customers"))
  }

  val q8bFullOuterSql: String =
    """SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
      |       n_suppliers, n_customers
      |FROM (SELECT s_nationkey, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1) sup
      |FULL OUTER JOIN
      |     (SELECT c_nationkey, COUNT(*) AS n_customers FROM customer GROUP BY 1) cus
      |ON s_nationkey = c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q12_topk — global top-k: Catalyst plans TakeOrderedAndProject (per-
  // partition heap + driver merge), never a full sort at scale.
  // ---------------------------------------------------------------------
  def q12TopK(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .limit(20)
  }

  val q12TopKSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey ASC
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------------
  // q13_setops — union / union all / intersect / except over key sets.
  // Same algebra as the reference's diff sets (fetch = manifest ∖ state,
  // stale = state ∖ manifest).
  // ---------------------------------------------------------------------
  def q13SetOps(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val b = c.filter(col("c_acctbal") > 5000.0).select(col("c_custkey"))
    // one action: six single-row aggregates composed with cross joins, so
    // all set-op subplans execute inside a single job
    def one(df: DataFrame, name: String): DataFrame =
      df.agg(count(lit(1)).as(name))
    one(a.union(b).distinct(), "n_union")
      .crossJoin(one(a.union(b), "n_union_all"))
      .crossJoin(one(a.intersect(b), "n_intersect"))
      .crossJoin(one(a.except(b), "n_except"))
      .crossJoin(one(a.intersectAll(b), "n_intersect_all"))
      .crossJoin(one(a.exceptAll(b), "n_except_all"))
  }

  val q13SetOpsSql: String =
    """WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
      |     b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0)
      |SELECT
      |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS n_union,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a UNION ALL SELECT * FROM b)) AS n_union_all,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS n_intersect,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT SELECT * FROM b)) AS n_except,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)) AS n_intersect_all,
      |  (SELECT COUNT(*) FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)) AS n_except_all""".stripMargin

  // ---------------------------------------------------------------------
  // q14_distinct_agg — exact distinct counts per group (expands to a
  // two-phase aggregate under Catalyst).
  // ---------------------------------------------------------------------
  def q14DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_parts"),
        countDistinct(col("l_suppkey")).as("nd_suppliers"),
        count(lit(1)).as("n_rows"))
  }

  val q14DistinctAggSql: String =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS nd_parts,
      |  COUNT(DISTINCT l_suppkey) AS nd_suppliers,
      |  COUNT(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  // ---------------------------------------------------------------------
  // q18_scalar_funcs — scalar string/date/math function surface evaluated
  // per row inside whole-stage codegen.
  // ---------------------------------------------------------------------
  def q18ScalarFuncs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") % 97 === 0)
    o.select(
      col("o_orderkey"),
      substring(col("o_orderpriority"), 1, 1).cast(IntegerType).as("prio_num"),
      lower(col("o_orderstatus")).as("status_lc"),
      length(col("o_orderpriority")).as("prio_len"),
      year(col("o_orderdate")).as("o_year"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      (col("o_orderkey") % 7).as("key_mod7"),
      abs(col("o_totalprice") - 100000.0).as("price_dev"),
      floor(col("o_totalprice")).as("price_floor"),
      ceil(col("o_totalprice")).as("price_ceil"))
  }

  val q18ScalarFuncsSql: String =
    """SELECT o_orderkey,
      |  CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS prio_num,
      |  LOWER(o_orderstatus) AS status_lc,
      |  CAST(LENGTH(o_orderpriority) AS INT) AS prio_len,
      |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  CAST(EXTRACT(month FROM o_orderdate) AS INT) AS o_month,
      |  CAST(EXTRACT(day FROM o_orderdate) AS INT) AS o_day,
      |  o_orderkey % 7 AS key_mod7,
      |  ABS(o_totalprice - 100000.0) AS price_dev,
      |  CAST(FLOOR(o_totalprice) AS BIGINT) AS price_floor,
      |  CAST(CEIL(o_totalprice) AS BIGINT) AS price_ceil
      |FROM orders WHERE o_orderkey % 97 = 0""".stripMargin

  // ---------------------------------------------------------------------
  // q19_case_when — conditional aggregation (hand-rolled pivot).
  // ---------------------------------------------------------------------
  def q19CaseWhen(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("n_f"),
        sum(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("n_o"),
        sum(when(col("o_orderstatus") === "P", 1).otherwise(0)).as("n_p"),
        sumDec(when(col("o_orderstatus") === "F", col("o_totalprice"))
          .otherwise(lit(0.0))).as("spend_f"))
  }

  val q19CaseWhenSql: String =
    """SELECT o_orderpriority,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
      |  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END AS DECIMAL(30,4))) AS DOUBLE) AS spend_f
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q20_theta_join — equi + band (theta) join: suppliers/customers in the
  // same nation with account balances within 100 of each other. The equi
  // part keys the shuffle; the band predicate is a post-join filter, so
  // this stays a hash/sort-merge join, not a nested loop.
  // ---------------------------------------------------------------------
  def q20ThetaJoin(s: SparkSession, dir: String): DataFrame = {
    val sup = t(s, dir, "supplier")
    val c = t(s, dir, "customer")
    sup.join(c,
        col("s_nationkey") === col("c_nationkey") &&
        abs(col("s_acctbal") - col("c_acctbal")) < 100.0)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val q20ThetaJoinSql: String =
    """SELECT s_nationkey, COUNT(*) AS n_pairs
      |FROM supplier JOIN customer
      |  ON s_nationkey = c_nationkey
      | AND ABS(s_acctbal - c_acctbal) < 100.0
      |GROUP BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q21_cross_join — explicit cartesian product on small dims (BNLJ).
  // ---------------------------------------------------------------------
  def q21CrossJoin(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").select(col("r_regionkey"), col("r_name"))
    val n = t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))
    r.crossJoin(n)
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
  }

  val q21CrossJoinSql: String =
    """SELECT r_regionkey, r_name, n_nationkey, n_name
      |FROM region CROSS JOIN nation""".stripMargin

  /** SCHEMA-EVOLUTION union — append frames whose schemas drifted
    * (columns added/dropped over time, the shape of any long-lived
    * extract): columns are matched BY NAME across all inputs and
    * missing ones surface as NULL, never positional mis-binding (the
    * classic silent corruption of positional UNION on evolved files).
    * Thin composition over Spark's `unionByName(_, allowMissing)` —
    * the operator is the CONTRACT (name-matched, null-filled, order-
    * free), pinned by the q205 oracle against DuckDB's UNION BY NAME. */
  def alignUnion(dfs: Seq[DataFrame]): DataFrame = {
    require(dfs.nonEmpty, "alignUnion needs at least one input")
    dfs.reduce((a, b) => a.unionByName(b, allowMissingColumns = true))
  }

  // ---------------------------------------------------------------------
  // q205_union_evolve — two generations of the customer extract: the old
  // files lack the segment column, the new ones lack the legacy comment
  // field; the evolved union groups across both. A positional union
  // would bind acctbal under nation and hash-fail loudly here.
  // ---------------------------------------------------------------------
  def q205UnionEvolve(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val oldGen = c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal"), lit("legacy").as("note"))
    val newGen = c.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_acctbal"),
        col("c_mktsegment"), col("c_nationkey"))
    alignUnion(Seq(oldGen, newGen))
      .groupBy(col("c_nationkey"),
        coalesce(col("c_mktsegment"), lit("<missing>")).as("segment"),
        coalesce(col("note"), lit("<none>")).as("note"))
      .agg(count(lit(1)).as("n"), sumDec(col("c_acctbal")).as("sum_bal"))
  }

  val q205UnionEvolveSql: String =
    """WITH old_gen AS (
      |  SELECT c_custkey, c_nationkey, c_acctbal, 'legacy' AS note
      |  FROM customer WHERE c_custkey % 2 = 0),
      |new_gen AS (
      |  SELECT c_custkey, c_acctbal, c_mktsegment, c_nationkey
      |  FROM customer WHERE c_custkey % 2 = 1),
      |u AS (SELECT * FROM old_gen UNION ALL BY NAME
      |      SELECT * FROM new_gen)
      |SELECT c_nationkey,
      |  COALESCE(c_mktsegment, '<missing>') AS segment,
      |  COALESCE(note, '<none>') AS note,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
      |FROM u GROUP BY 1, 2, 3""".stripMargin

  /** 2-D SKYLINE (Pareto front) — rows not dominated in (maximize x,
    * maximize y): the multi-objective shortlist ("no doc is both
    * higher-quality AND longer") behind curation trade-off picks.
    * Sort-based, not the quadratic dominance join: scan in (x desc,
    * y desc, id) order keeping a running maximum of y over STRICTLY
    * greater x — a row survives iff its y exceeds every y seen at
    * higher x. One window per group; ties on x cannot dominate each
    * other along x, which the strict-predecessor frame (RANGE-style
    * via the x-change guard) preserves exactly. */
  def skyline2D(df: DataFrame, group: String, x: String, y: String,
      id: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // two-pass sort shape: per DISTINCT x the max y at that x, then a
    // running max over strictly-greater x rows (distinct x + ordered
    // frame ending at -1 makes "greater" strict). A row survives iff
    //   (a) it carries its x's max y — an equal-x row with higher y
    //       dominates it — and
    //   (b) that max beats every y seen at strictly greater x.
    // Equal (x, y) pairs tie on both axes, dominate nothing, both stay.
    val perX = df.groupBy(col(group), col(x))
      .agg(max(col(y)).as("__ymax_at_x"))
    val wx = Window.partitionBy(col(group)).orderBy(col(x).desc)
      .rowsBetween(Long.MinValue, -1)
    val dom = perX.withColumn("__ymax_gt_x",
      max(col("__ymax_at_x")).over(wx))
    df.join(dom, Seq(group, x))
      .filter(col(y) === col("__ymax_at_x") &&
        (col("__ymax_gt_x").isNull || col(y) > col("__ymax_gt_x")))
      .select(df.columns.map(col): _*)
  }

  // ---------------------------------------------------------------------
  // q208_skyline — per-source Pareto front of documents over (quality
  // proxy, length): the shortlist no other doc beats on both axes. The
  // oracle states dominance directly (NOT EXISTS a strictly-better
  // doc) — the quadratic formulation the sort-based plan must equal.
  // ---------------------------------------------------------------------
  def q208Skyline(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"), col("source"),
      (length(col("text")) % 97).cast("long").as("quality"),
      col("n_chars"))
    skyline2D(d, "source", "quality", "n_chars", "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_front"), min(col("doc_id")).as("min_id"),
        max(col("quality")).as("max_quality"),
        max(col("n_chars")).as("max_chars"))
  }

  val q208SkylineSql: String =
    """WITH d AS (
      |  SELECT doc_id, source, CAST(length(text) % 97 AS BIGINT)
      |    AS quality, n_chars
      |  FROM documents),
      |front AS (
      |  SELECT * FROM d a
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM d b
      |    WHERE b.source = a.source
      |      AND b.quality >= a.quality AND b.n_chars >= a.n_chars
      |      AND (b.quality > a.quality OR b.n_chars > a.n_chars)))
      |SELECT source, COUNT(*) AS n_front, MIN(doc_id) AS min_id,
      |  MAX(quality) AS max_quality, MAX(n_chars) AS max_chars
      |FROM front GROUP BY source""".stripMargin

}
