package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining scalar/semi-structured surface: array functions + collected
  * aggregates, date arithmetic, null semantics, pivot, regex tokenization.
  */
object Misc {

  // ---------------------------------------------------------------------
  // q46_array_funcs — array construction/aggregation: deterministic
  // collect (sorted set), element access, containment, flatten.
  // ---------------------------------------------------------------------
  def q46ArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    // the array travels as a joined string: raw list cells are not
    // sortable/hashable in a pandas-based compare
    o.groupBy(col("o_orderpriority")).agg(
        array_sort(collect_set(col("o_orderstatus"))).as("statuses"),
        countDistinct(col("o_orderstatus")).as("n_statuses"))
      .select(
        col("o_orderpriority"),
        concat_ws(",", col("statuses")).as("statuses_csv"),
        col("n_statuses"),
        element_at(col("statuses"), 1).as("first_status"),
        array_contains(col("statuses"), "P").as("has_p"))
  }

  val q46ArrayFuncsSql: String =
    """SELECT o_orderpriority,
      |  array_to_string(statuses, ',') AS statuses_csv, n_statuses,
      |  statuses[1] AS first_status,
      |  list_contains(statuses, 'P') AS has_p
      |FROM (
      |  SELECT o_orderpriority,
      |    list_sort(list(DISTINCT o_orderstatus)) AS statuses,
      |    COUNT(DISTINCT o_orderstatus) AS n_statuses
      |  FROM orders GROUP BY o_orderpriority)""".stripMargin

  // ---------------------------------------------------------------------
  // q47_date_funcs — date arithmetic: truncation, offsets, extraction,
  // end-of-month, day-of-week.
  // ---------------------------------------------------------------------
  // Date-typed outputs travel as ISO strings: pandas represents Spark's
  // date32 as datetime.date but DuckDB's DATE as Timestamp — equal values,
  // unequal objects under a strict hash compare.
  def q47DateFuncs(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders").filter(col("o_orderkey") % 101 === 0)
    def iso(c: org.apache.spark.sql.Column) = date_format(c, "yyyy-MM-dd")
    o.select(
      col("o_orderkey"),
      iso(date_trunc("month", col("o_orderdate"))).as("month_start"),
      iso(add_months(col("o_orderdate").cast("date"), 3)).as("plus_3m"),
      iso(date_add(col("o_orderdate").cast("date"), 45)).as("plus_45d"),
      iso(last_day(col("o_orderdate"))).as("eom"),
      dayofweek(col("o_orderdate")).as("dow"),
      quarter(col("o_orderdate")).as("qtr"),
      (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
        .as("yyyymm"))
  }

  // DuckDB dayofweek: 0=Sunday..6; Spark: 1=Sunday..7 → +1 aligns.
  val q47DateFuncsSql: String =
    """SELECT o_orderkey,
      |  strftime(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  strftime(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
      |  strftime(CAST(o_orderdate AS DATE) + 45, '%Y-%m-%d') AS plus_45d,
      |  strftime(LAST_DAY(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(QUARTER(o_orderdate) AS INT) AS qtr,
      |  CAST(EXTRACT(year FROM o_orderdate) * 100
      |     + EXTRACT(month FROM o_orderdate) AS INT) AS yyyymm
      |FROM orders WHERE o_orderkey % 101 = 0""".stripMargin

  // ---------------------------------------------------------------------
  // q48_null_semantics — three-valued logic: coalesce/nullif, null-safe
  // equality (<=> / IS NOT DISTINCT FROM), count vs count(col),
  // null-skipping aggregates over an outer join's null side.
  // ---------------------------------------------------------------------
  def q48NullSemantics(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    val j = c.join(o, col("c_custkey") === col("o_custkey"), "left")
    j.groupBy(col("c_mktsegment")).agg(
      count(lit(1)).as("n_rows"),
      count(col("o_orderkey")).as("n_nonnull"),
      sum(when(col("o_orderkey").isNull, 1).otherwise(0)).as("n_null"),
      sum(when(col("o_orderstatus") <=> lit("F"), 1).otherwise(0))
        .as("n_f_nullsafe"),
      sum(when(nullif(col("o_orderstatus"), lit("O")).isNull &&
        col("o_orderkey").isNotNull, 1).otherwise(0)).as("n_o_via_nullif"),
      max(coalesce(col("o_orderstatus"), lit("NONE"))).as("max_status"))
  }

  val q48NullSemanticsSql: String =
    """SELECT c_mktsegment,
      |  COUNT(*) AS n_rows,
      |  COUNT(o_orderkey) AS n_nonnull,
      |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  CAST(SUM(CASE WHEN o_orderstatus IS NOT DISTINCT FROM 'F'
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_f_nullsafe,
      |  CAST(SUM(CASE WHEN NULLIF(o_orderstatus, 'O') IS NULL
      |            AND o_orderkey IS NOT NULL
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_o_via_nullif,
      |  MAX(COALESCE(o_orderstatus, 'NONE')) AS max_status
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q49_pivot — pivoted conditional aggregation with an explicit value
  // list (dynamic pivots are driver-side schema discovery; a fixed list
  // keeps the plan static — the right call at scale too).
  // ---------------------------------------------------------------------
  def q49Pivot(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .toDF("o_orderpriority", "n_f", "n_o", "n_p")
  }

  val q49PivotSql: String =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
      |  COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
      |  COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q57_unpivot — wide→long melt of the per-priority status counts (the
  // inverse of q49's pivot), via Dataset.unpivot (Spark's native melt).
  // ---------------------------------------------------------------------
  def q57Unpivot(s: SparkSession, dir: String): DataFrame =
    q49Pivot(s, dir).unpivot(
      Array(col("o_orderpriority")),
      Array(col("n_f"), col("n_o"), col("n_p")),
      "status_col", "n_orders")

  val q57UnpivotSql: String =
    """WITH p AS (
      |  SELECT o_orderpriority,
      |    COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
      |    COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
      |    COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, 'n_f' AS status_col, n_f AS n_orders FROM p
      |UNION ALL
      |SELECT o_orderpriority, 'n_o', n_o FROM p
      |UNION ALL
      |SELECT o_orderpriority, 'n_p', n_p FROM p""".stripMargin

  // ---------------------------------------------------------------------
  // q58_regex — regex extraction/matching surface: capture groups,
  // boolean match, global replace (patterns chosen inside the common
  // Java-regex ∩ RE2 dialect so both engines agree).
  // ---------------------------------------------------------------------
  def q58Regex(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    p.select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int")
          .as("brand_num"),
        col("p_type").rlike("^(PROMO|ECONOMY)").as("is_cheap_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
      .filter(col("p_partkey") % 37 === 0)
  }

  val q58RegexSql: String =
    """SELECT p_partkey,
      |  CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT) AS brand_num,
      |  regexp_matches(p_type, '^(PROMO|ECONOMY)') AS is_cheap_type,
      |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      |FROM part WHERE p_partkey % 37 = 0""".stripMargin

  // ---------------------------------------------------------------------
  // q59_map_hof — MapType + exists/forall higher-order predicates: a
  // per-priority map of status→count (q49's pivot as a map value), keyed
  // lookups, plus exists/forall over token arrays.
  // ---------------------------------------------------------------------
  def q59MapHof(s: SparkSession, dir: String): DataFrame = {
    val statusMap = q49Pivot(s, dir).select(
      col("o_orderpriority"),
      map(lit("F"), col("n_f"), lit("O"), col("n_o"), lit("P"), col("n_p"))
        .as("by_status"))
    val lookups = statusMap.select(
      col("o_orderpriority"),
      element_at(col("by_status"), "F").as("f_count"),
      size(map_keys(col("by_status"))).as("n_keys"))
    val d = t(s, dir, "documents")
    val w = split(col("text"), " ")
    val hof = d.select(col("lang"),
        exists(w, x => x === "the").as("has_the"),
        forall(w, x => length(x) < 10).as("all_short"))
      .groupBy(col("lang")).agg(
        sum(when(col("has_the"), 1).otherwise(0)).as("n_has_the"),
        sum(when(col("all_short"), 1).otherwise(0)).as("n_all_short"))
    lookups.crossJoin(broadcast(hof))
  }

  val q59MapHofSql: String =
    """WITH p AS (
      |  SELECT o_orderpriority,
      |    COUNT(*) FILTER (o_orderstatus = 'F') AS f_count,
      |    3 AS n_keys
      |  FROM orders GROUP BY o_orderpriority),
      |h AS (
      |  SELECT lang,
      |    CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
      |          x -> x = 'the')) > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_has_the,
      |    CAST(SUM(CASE WHEN len(list_filter(string_split(text, ' '),
      |          x -> NOT length(x) < 10)) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_all_short
      |  FROM documents GROUP BY lang)
      |SELECT * FROM p CROSS JOIN h""".stripMargin

  // ---------------------------------------------------------------------
  // q52_tokenize — BPE-ish regex tokenization (word pieces + digits +
  // punctuation runs), the standard pre-tokenizer shape, over documents.
  // Same RE semantics in Java regex and RE2 for this pattern.
  // ---------------------------------------------------------------------
  def q52Tokenize(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    d.select(col("doc_id"), col("lang"),
        regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]+"), lit(0))
          .as("toks"))
      .groupBy(col("lang")).agg(
        sum(size(col("toks"))).as("total_tokens"),
        sum(size(array_distinct(col("toks")))).as("sum_distinct_tokens"),
        max(size(col("toks"))).as("max_tokens"))
  }

  val q52TokenizeSql: String =
    """SELECT lang,
      |  CAST(SUM(len(toks)) AS BIGINT) AS total_tokens,
      |  CAST(SUM(len(list_distinct(toks))) AS BIGINT) AS sum_distinct_tokens,
      |  CAST(MAX(len(toks)) AS INT) AS max_tokens
      |FROM (
      |  SELECT lang,
      |    regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]+', 0) AS toks
      |  FROM documents)
      |GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q209_string_agg — ordered LISTAGG/string_agg surface: per nation,
  // its market segments as one '|'-joined DETERMINISTICALLY ORDERED
  // string. Spark spells it array_sort(collect_set) + array_join (the
  // engine-portable form of the ORDER BY clause inside string_agg);
  // the driver-facing string is identical byte-wise or the hash fails.
  // ---------------------------------------------------------------------
  def q209StringAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        array_join(array_sort(collect_set(col("c_mktsegment"))), "|")
          .as("segments"))

  val q209StringAggSql: String =
    """SELECT c_nationkey, COUNT(*) AS n,
      |  string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
      |    AS segments
      |FROM customer GROUP BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------------
  // q210_extract_all — regexp_extract_all + explode surface: every
  // dollar-amount-looking token in order comments, flattened to one row
  // per match with its per-comment match index. The multi-match regex
  // path q58's single-extract does not cover.
  // ---------------------------------------------------------------------
  def q210ExtractAll(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        posexplode(regexp_extract_all(col("o_orderpriority"),
          lit("[A-Z]+"), lit(0))).as(Seq("match_idx", "token")))
      .groupBy(col("token"), col("match_idx"))
      .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("min_key"))

  val q210ExtractAllSql: String =
    """WITH m AS (
      |  SELECT o_orderkey,
      |    unnest(regexp_extract_all(o_orderpriority, '[A-Z]+')) AS token,
      |    CAST(generate_subscripts(
      |      regexp_extract_all(o_orderpriority, '[A-Z]+'), 1) - 1
      |      AS INT) AS match_idx
      |  FROM orders)
      |SELECT token, match_idx, COUNT(*) AS n, MIN(o_orderkey) AS min_key
      |FROM m GROUP BY token, match_idx""".stripMargin

}
