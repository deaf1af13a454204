package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Label aggregation: per-item majority vote over repeated
  * observations — the reduction step for crowd/preference-label data
  * (N annotators per item → one training label) and for any
  * "modal value per key" profile question.
  *
  * Scale shape: one shuffle-on-(item,label) count, then the per-item
  * argmax runs in a window PARTITIONED BY item — each window task holds
  * one item's distinct labels (bounded by the label vocabulary, not the
  * corpus), never a global sort. Deterministic tie-break: higher count
  * first, then lexicographically smallest label — a total order, so the
  * winner is partition-invariant.
  */
object Labels {

  /** One row per item: (item, label, votes, total_votes, vote_share). */
  def majorityVote(df: DataFrame, item: String, label: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(item), col(label))
      .agg(count(lit(1)).as("votes"))
    val byItem = Window.partitionBy(col(item))
    val pick = Window.partitionBy(col(item))
      .orderBy(col("votes").desc, col(label).asc)
    counts
      .withColumn("total_votes", sum(col("votes")).over(byItem))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col(item), col(label), col("votes"), col("total_votes"))
  }

  // ---------------------------------------------------------------------
  // q126_majority_label — modal event_type per user over the event
  // stream (the "dominant behavior" profile). Vote share stays
  // rational-exact as (votes, total_votes) ints; no float leaves the
  // operator.
  // ---------------------------------------------------------------------
  def q126MajorityLabel(s: SparkSession, dir: String): DataFrame =
    majorityVote(t(s, dir, "events"), "user_id", "event_type")

  val q126MajorityLabelSql: String =
    """WITH counts AS (
      |  SELECT user_id, event_type, COUNT(*) AS votes
      |  FROM events GROUP BY user_id, event_type),
      |ranked AS (
      |  SELECT user_id, event_type, votes,
      |    SUM(votes) OVER (PARTITION BY user_id) AS total_votes,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY votes DESC, event_type ASC) AS rn
      |  FROM counts)
      |SELECT user_id, event_type, votes,
      |  CAST(total_votes AS BIGINT) AS total_votes
      |FROM ranked WHERE rn = 1""".stripMargin

  /** Inter-rater agreement (Cohen's kappa, Cohen 1960): chance-corrected
    * agreement between two labelings of the same items — the QA gate a
    * labeling pipeline runs before trusting annotator (or model-judge)
    * output. κ = (p_o − p_e)/(1 − p_e) with p_o the observed agreement
    * rate and p_e the expected-by-chance rate from the marginals.
    *
    * Determinism: everything up to the last step is integer counts; the
    * three doubles (p_o, p_e, κ) come from identical expression shapes
    * in both engines and are emitted rounded 6 dp alongside the exact
    * integer evidence (n, n_agree, the marginal product sum).
    *
    * Scale shape: one shuffle to the confusion table (≤ |labels|² rows —
    * vocabulary-bounded, not corpus-bounded); marginals and the chance
    * sum are reaggregates of THAT table; the final row is a broadcast
    * cross of two one-row frames. Nothing re-touches the corpus.
    */
  def cohenKappa(df: DataFrame, raterA: org.apache.spark.sql.Column,
      raterB: org.apache.spark.sql.Column): DataFrame = {
    val cells = df.select(raterA.as("ra"), raterB.as("rb"))
      .groupBy(col("ra"), col("rb")).agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum(col("n")).as("n_total"),
      sum(when(col("ra") === col("rb"), col("n")).otherwise(lit(0L)))
        .as("n_agree"))
    val ma = cells.groupBy(col("ra")).agg(sum(col("n")).as("na"))
    val mb = cells.groupBy(col("rb")).agg(sum(col("n")).as("nb"))
    val chance = ma.join(mb, ma("ra") === mb("rb"))
      .agg(sum(col("na") * col("nb")).as("chance_sum"))
    tot.crossJoin(broadcast(chance))
      .select(col("n_total"), col("n_agree"),
        coalesce(col("chance_sum"), lit(0L)).as("chance_sum"))
      .select(col("n_total"), col("n_agree"), col("chance_sum"),
        round(col("n_agree").cast("double") / col("n_total").cast("double"),
          6).as("po"),
        round(col("chance_sum").cast("double") /
          (col("n_total").cast("double") * col("n_total").cast("double")),
          6).as("pe"),
        round((col("n_agree").cast("double") / col("n_total").cast("double")
          - col("chance_sum").cast("double") /
            (col("n_total").cast("double") * col("n_total").cast("double")))
          / (lit(1.0) - col("chance_sum").cast("double") /
            (col("n_total").cast("double") * col("n_total").cast("double"))),
          6).as("kappa"))
  }

  // ---------------------------------------------------------------------
  // q149_cohen_kappa — agreement between two derived binary "raters" on
  // orders: rater A calls an order 'hi' when its priority is urgent/high,
  // rater B when its price clears 250k. The planted disagreement
  // structure exercises the marginal math (the raters' 'hi' rates
  // differ); exact integer evidence rides along with the rounded κ.
  // ---------------------------------------------------------------------
  def q149CohenKappa(s: SparkSession, dir: String): DataFrame =
    cohenKappa(t(s, dir, "orders"),
      when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit("hi"))
        .otherwise(lit("lo")),
      when(col("o_totalprice") >= 250000.0, lit("hi")).otherwise(lit("lo")))

  val q149CohenKappaSql: String =
    """WITH labeled AS (
      |  SELECT
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 'hi' ELSE 'lo' END AS ra,
      |    CASE WHEN o_totalprice >= 250000.0
      |      THEN 'hi' ELSE 'lo' END AS rb
      |  FROM orders),
      |cells AS (SELECT ra, rb, COUNT(*) AS n FROM labeled GROUP BY 1, 2),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
      |    CAST(SUM(CASE WHEN ra = rb THEN n ELSE 0 END) AS BIGINT)
      |      AS n_agree
      |  FROM cells),
      |ma AS (SELECT ra, SUM(n) AS na FROM cells GROUP BY ra),
      |mb AS (SELECT rb, SUM(n) AS nb FROM cells GROUP BY rb),
      |chance AS (
      |  SELECT CAST(COALESCE(SUM(na * nb), 0) AS BIGINT) AS chance_sum
      |  FROM ma JOIN mb ON ma.ra = mb.rb)
      |SELECT n_total, n_agree, chance_sum,
      |  ROUND(CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS po,
      |  ROUND(CAST(chance_sum AS DOUBLE)
      |    / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)), 6) AS pe,
      |  ROUND((CAST(n_agree AS DOUBLE) / CAST(n_total AS DOUBLE)
      |    - CAST(chance_sum AS DOUBLE)
      |      / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE)))
      |    / (1.0 - CAST(chance_sum AS DOUBLE)
      |      / (CAST(n_total AS DOUBLE) * CAST(n_total AS DOUBLE))),
      |    6) AS kappa
      |FROM tot CROSS JOIN chance""".stripMargin

  /** Per-group label-distribution diversity: Shannon entropy and Gini
    * impurity of the label histogram — the class-balance / behavioral-
    * diversity profile (is this user one-note? is this source's label
    * mix degenerate?). Gini = 1 − Σc²/n² stays a ratio of exact
    * integers until one division; entropy's Σp·ln p is a float fold, so
    * it runs as a LEFT-TO-RIGHT ordered fold over the label-sorted term
    * list (the q92 discipline) — bit-identical on any partitioning and
    * in DuckDB's list_reduce over the same ordered list.
    *
    * Scale shape: one shuffle to (group, label) counts; per-group lists
    * are vocabulary-bounded, never corpus-bounded.
    */
  def labelDiversity(df: DataFrame, group: String, label: String)
      : DataFrame = {
    val counts = df.groupBy(col(group), col(label))
      .agg(count(lit(1)).as("c"))
    counts.groupBy(col(group))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("n_labels"),
        sum(col("c") * col("c")).as("sumsq"),
        sort_array(collect_list(struct(col(label).as("l"), col("c"))))
          .as("xs"))
      .select(col(group), col("n"), col("n_labels"),
        round(lit(1.0) - col("sumsq").cast("double") /
          (col("n").cast("double") * col("n").cast("double")), 6)
          .as("gini"),
        round(-aggregate(col("xs"), lit(0.0d), (a, x) =>
          a + (x.getField("c").cast("double") / col("n").cast("double")) *
            log(x.getField("c").cast("double") / col("n").cast("double"))),
          6).as("entropy"))
  }

  // ---------------------------------------------------------------------
  // q159_label_diversity — per-user event-type diversity over the event
  // stream: the "is this account a bot doing one thing" profile signal.
  // ---------------------------------------------------------------------
  def q159LabelDiversity(s: SparkSession, dir: String): DataFrame =
    labelDiversity(t(s, dir, "events"), "user_id", "event_type")

  val q159LabelDiversitySql: String =
    """WITH counts AS (
      |  SELECT user_id, event_type, COUNT(*) AS c
      |  FROM events GROUP BY 1, 2),
      |g AS (
      |  SELECT user_id,
      |    CAST(SUM(c) AS BIGINT) AS n,
      |    CAST(COUNT(*) AS BIGINT) AS n_labels,
      |    CAST(SUM(c * c) AS BIGINT) AS sumsq,
      |    list((CAST(c AS DOUBLE)) ORDER BY event_type) AS cs
      |  FROM counts GROUP BY user_id)
      |SELECT user_id, n, n_labels,
      |  ROUND(1.0 - CAST(sumsq AS DOUBLE)
      |    / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS gini,
      |  ROUND(-list_reduce(
      |    list_prepend(0.0::DOUBLE,
      |      list_transform(cs,
      |        c -> (c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)))),
      |    (a, b) -> a + b), 6) AS entropy
      |FROM g""".stripMargin
}
