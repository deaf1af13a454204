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
    val counts = df.groupBy(col(item), col(label))
      .agg(count(lit(1)).as("votes"))
    // argmax + total as ONE aggregate over the counts table (r15): min
    // over (−votes, label) structs ≡ the former row_number pick over
    // (votes desc, label asc); the vote total rides the same groupBy —
    // no per-item sort, partial aggregation map-side (guide §2.3)
    counts
      .groupBy(col(item))
      .agg(min(struct((-col("votes")).as("negv"), col(label).as("lbl")))
          .as("__m"),
        sum(col("votes")).as("total_votes"))
      .select(col(item), col("__m.lbl").as(label),
        (-col("__m.negv")).as("votes"), col("total_votes"))
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

  /** Fleiss' kappa (Fleiss 1971): chance-corrected agreement when EVERY
    * item gets n categorical ratings from interchangeable raters — the
    * multi-annotator generalization of [[cohenKappa]] (which compares
    * two FIXED raters). Items are truncated to their first n ratings in
    * `order`-asc order (and items with fewer dropped), which pins the
    * fixed-n design the statistic assumes AND keeps everything exact:
    * with a common n, P̄ = (S − N·n)/(N·n·(n−1)) and
    * P_e = T/(N·n)² are ratios of pure int64 sums
    * (S = ΣᵢΣⱼ c²ᵢⱼ, T = Σⱼ(Σᵢ cᵢⱼ)²) — no per-item float fold
    * anywhere, so the final three doubles hash exactly.
    *
    * Scale shape: one shuffle to (item, label) counts after the
    * per-item top-n window (bounded by ratings-per-item); S folds per
    * item then globally as int64; T folds over the |labels| marginal.
    */
  def fleissKappa(df: DataFrame, item: String, label: String,
      order: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 2, s"Fleiss needs >= 2 ratings per item, got $n")
    val w = Window.partitionBy(col(item))
      .orderBy(col(order).asc)
    val firstN = df
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
    val complete = firstN.groupBy(col(item))
      .agg(count(lit(1)).as("__cnt"))
      .filter(col("__cnt") === n)
      .select(col(item))
    val cells = firstN.join(complete, item)
      .groupBy(col(item), col(label)).agg(count(lit(1)).as("c"))
    val s = cells.agg(sum(col("c") * col("c")).as("s_sum"),
      (sum(col("c")) / n).as("n_items"))
    val tTbl = cells.groupBy(col(label)).agg(sum(col("c")).as("cj"))
      .agg(sum(col("cj") * col("cj")).as("t_sum"))
    val nd = lit(n.toDouble)
    val joined = s.crossJoin(broadcast(tTbl))
      .select(col("n_items").cast("long").as("n_items"),
        lit(n).as("n_per_item"), col("s_sum"), col("t_sum"))
    val ni = col("n_items").cast("double")
    val pbar = (col("s_sum").cast("double") - ni * nd) /
      (ni * nd * (nd - lit(1.0)))
    val pe = col("t_sum").cast("double") / ((ni * nd) * (ni * nd))
    joined.select(col("n_items"), col("n_per_item"), col("s_sum"),
      col("t_sum"),
      round(pbar, 6).as("pbar"), round(pe, 6).as("pe"),
      round((pbar - pe) / (lit(1.0) - pe), 6).as("kappa"))
  }

  // ---------------------------------------------------------------------
  // q163_fleiss_kappa — within-user behavioral consistency: each user's
  // first 5 events are 5 interchangeable "ratings" of the user with the
  // event type as the category; κ asks whether users repeat themselves
  // beyond what global type frequencies predict. Exact int64 evidence
  // (S, T) alongside the rounded statistic.
  // ---------------------------------------------------------------------
  def q163FleissKappa(s: SparkSession, dir: String): DataFrame =
    fleissKappa(t(s, dir, "events"), "user_id", "event_type",
      "event_id", n = 5)

  val q163FleissKappaSql: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY event_id ASC) AS rn
      |  FROM events),
      |firstn AS (SELECT user_id, event_type FROM ranked WHERE rn <= 5),
      |complete AS (
      |  SELECT user_id FROM firstn GROUP BY user_id
      |  HAVING COUNT(*) = 5),
      |cells AS (
      |  SELECT f.user_id, f.event_type, COUNT(*) AS c
      |  FROM firstn f JOIN complete USING (user_id)
      |  GROUP BY 1, 2),
      |s AS (
      |  SELECT CAST(SUM(c * c) AS BIGINT) AS s_sum,
      |    CAST(SUM(c) / 5 AS BIGINT) AS n_items
      |  FROM cells),
      |tt AS (
      |  SELECT CAST(SUM(cj * cj) AS BIGINT) AS t_sum FROM (
      |    SELECT CAST(SUM(c) AS BIGINT) AS cj
      |    FROM cells GROUP BY event_type))
      |SELECT n_items, 5 AS n_per_item, s_sum, t_sum,
      |  ROUND((CAST(s_sum AS DOUBLE) - CAST(n_items AS DOUBLE) * 5.0)
      |    / (CAST(n_items AS DOUBLE) * 5.0 * 4.0), 6) AS pbar,
      |  ROUND(CAST(t_sum AS DOUBLE)
      |    / ((CAST(n_items AS DOUBLE) * 5.0)
      |      * (CAST(n_items AS DOUBLE) * 5.0)), 6) AS pe,
      |  ROUND(((CAST(s_sum AS DOUBLE) - CAST(n_items AS DOUBLE) * 5.0)
      |    / (CAST(n_items AS DOUBLE) * 5.0 * 4.0)
      |    - CAST(t_sum AS DOUBLE)
      |      / ((CAST(n_items AS DOUBLE) * 5.0)
      |        * (CAST(n_items AS DOUBLE) * 5.0)))
      |    / (1.0 - CAST(t_sum AS DOUBLE)
      |      / ((CAST(n_items AS DOUBLE) * 5.0)
      |        * (CAST(n_items AS DOUBLE) * 5.0))), 6) AS kappa
      |FROM s CROSS JOIN tt""".stripMargin

  /** Krippendorff's alpha (nominal) — the agreement statistic that,
    * unlike [[fleissKappa]]'s fixed-n design, accepts MISSING ratings:
    * items keep whatever raters they have (any n_i >= 2 contributes),
    * which is the real shape of crowd/LLM annotation runs where no
    * rater sees every item. Computed from the coincidence matrix
    * WITHOUT materializing it: per item, the within-item disagreeing
    * ordered pairs are n_i² − Σ_c r_ic² and each item's contribution
    * carries weight 1/(n_i − 1) — kept EXACT by scaling every term by
    * L = lcm(1..maxRaters−1) (so L/(n_i−1) is an integer; α is
    * L-invariant, the emitted integer evidence is pinned by the
    * declared maxRaters). Marginals n_c and the expected-disagreement
    * term n² − Σ_c n_c² are pure int64; ONE double division at the
    * end: α = 1 − D'o·(n−1) / (L·(n² − Σ n_c²)).
    *
    * Scale shape: dedupe + two grouped aggregations (item,label) →
    * item, plus a |labels|-sized marginal — no pair expansion ever.
    * An item with n_i > maxRaters raises engine-side (the L guarantee
    * would silently break); duplicate (item, rater) ratings collapse
    * deterministically to the min label. */
  def krippendorffAlpha(df: DataFrame, item: String, rater: String,
      label: String, maxRaters: Int): DataFrame = {
    require(maxRaters >= 2 && maxRaters <= 16,
      s"maxRaters must be in [2,16], got $maxRaters")
    val L: Long = (1 until maxRaters).foldLeft(1L)((a, b) =>
      a / BigInt(a).gcd(BigInt(b)).toLong * b)
    val ratings = df.groupBy(col(item), col(rater))
      .agg(min(col(label)).as("__lab"))
    val cells = ratings.groupBy(col(item), col("__lab"))
      .agg(count(lit(1)).as("r"))
    val perItem = cells.groupBy(col(item))
      .agg(sum(col("r")).as("ni"), sum(col("r") * col("r")).as("s2"))
      .filter(col("ni") >= 2)
    val doTbl = perItem.agg(
      sum(expr(s"(${L}L div (ni - 1)) * (ni * ni - s2)")).as("do_raw"),
      sum(col("ni")).as("n_ratings"),
      count(lit(1)).as("n_items"),
      max(col("ni")).as("__maxni"))
    val marg = cells.join(perItem.select(col(item)), Seq(item), "left_semi")
      .groupBy(col("__lab")).agg(sum(col("r")).as("nc"))
      .agg(sum(col("nc") * col("nc")).as("sum_nc2"))
    val j = doTbl.crossJoin(broadcast(marg))
    val n = col("n_ratings").cast("double")
    val deNum = col("n_ratings") * col("n_ratings") - col("sum_nc2")
    // the raise_error guard sits in the emitted projection (not a
    // prunable side column): an item wider than the declared maxRaters
    // voids the L/(n_i−1) integrality and must fail loudly
    val doGuarded = when(col("__maxni") > maxRaters,
      raise_error(concat(lit("krippendorffAlpha: item with more than " +
        s"$maxRaters raters: "), col("__maxni").cast("string"))))
      .otherwise(col("do_raw"))
    // De = 0 (all usable ratings share one label) leaves α undefined —
    // NULL, guarded before the division (ANSI raises on /0). α is
    // computed FROM the guarded expression so a consumer projecting
    // alpha alone cannot let Catalyst prune the maxRaters check.
    j.select(col("n_items"), col("n_ratings"),
      doGuarded.as("do_scaled"),
      deNum.as("de_num"),
      when(deNum =!= 0,
        round(lit(1.0) - doGuarded.cast("double") * (n - lit(1.0)) /
          (lit(L.toDouble) * deNum.cast("double")), 6)).as("alpha"))
  }

  // ---------------------------------------------------------------------
  // q177_krippendorff — behavioral agreement with MISSING cells: each
  // user's 3-hour slots are 8 potential "raters" of the user (label =
  // lexicographically-first event type in the slot); the event_id % 3
  // thinning leaves real slot gaps, so items carry 2..8 ratings — the
  // missing-data case Fleiss cannot express. Integer evidence
  // (do_scaled at L = lcm(1..7) = 420, de_num) alongside the rounded α.
  // ---------------------------------------------------------------------
  def q177Krippendorff(s: SparkSession, dir: String): DataFrame =
    krippendorffAlpha(
      t(s, dir, "events").filter(col("event_id") % 3 === 0)
        .select(col("user_id"),
          expr("hour(ts) div 3").as("slot"), col("event_type")),
      "user_id", "slot", "event_type", maxRaters = 8)

  val q177KrippendorffSql: String =
    """WITH ratings AS (
      |  SELECT user_id, hour(ts) // 3 AS slot,
      |    MIN(event_type) AS lab
      |  FROM events WHERE event_id % 3 = 0
      |  GROUP BY user_id, hour(ts) // 3),
      |cells AS (
      |  SELECT user_id, lab, COUNT(*) AS r
      |  FROM ratings GROUP BY user_id, lab),
      |per_item AS (
      |  SELECT user_id, SUM(r) AS ni, SUM(r * r) AS s2
      |  FROM cells GROUP BY user_id
      |  HAVING SUM(r) >= 2),
      |d AS (
      |  SELECT CAST(SUM((420 // (ni - 1)) * (ni * ni - s2)) AS BIGINT)
      |      AS do_scaled,
      |    CAST(SUM(ni) AS BIGINT) AS n_ratings,
      |    COUNT(*) AS n_items
      |  FROM per_item),
      |marg AS (
      |  SELECT CAST(SUM(nc * nc) AS BIGINT) AS sum_nc2 FROM (
      |    SELECT CAST(SUM(c.r) AS BIGINT) AS nc
      |    FROM cells c JOIN per_item p ON c.user_id = p.user_id
      |    GROUP BY c.lab))
      |SELECT n_items, n_ratings, do_scaled,
      |  n_ratings * n_ratings - sum_nc2 AS de_num,
      |  CASE WHEN n_ratings * n_ratings - sum_nc2 <> 0 THEN
      |    ROUND(1.0 - CAST(do_scaled AS DOUBLE)
      |        * (CAST(n_ratings AS DOUBLE) - 1.0)
      |      / (420.0 * CAST(n_ratings * n_ratings - sum_nc2 AS DOUBLE)), 6)
      |  END AS alpha
      |FROM d CROSS JOIN marg""".stripMargin
}
