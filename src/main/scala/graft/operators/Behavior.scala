package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Event-sequence analytics over the `events` stream table: ordered
  * funnels and cohort retention — the warehouse queries a product team
  * runs daily over the same event firehose the reference's pipeline lands
  * (`sync-canvas-data-files.py` moves the files; these are the questions
  * asked of them).
  *
  * Scale shapes:
  *  - funnel: one shuffle-on-user min-aggregate per step plus an
  *    equi-join against the previous step's (user, ts) — each step's
  *    state is ONE row per qualifying user, never the user's event list;
  *    a power user with 10^6 events still contributes one row between
  *    steps. No windows, no per-user event sorting.
  *  - retention: cohort table is one row per user (min-aggregate);
  *    activity is the DISTINCT (user, week) projection — both partial-
  *    aggregate map-side before their shuffles. The final cell count is
  *    |cohorts|×|weeks| rows.
  */
object Behavior {

  /** Strictly-ordered funnel: a user reaches step i if an event of
    * `steps(i)` exists strictly after their step-(i-1) arrival (earliest
    * qualifying chain, the standard product-funnel semantics). Returns
    * one row per step with the surviving-user count. */
  def funnel(events: DataFrame, user: String, ts: String, typ: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.filter(col(typ) === steps.head)
      .groupBy(col(user)).agg(min(col(ts)).as("t"))
    var out = reached.agg(count(lit(1)).as("users"))
      .select(lit(1).as("step"), lit(steps.head).as("event_type"),
        col("users"))
    for (i <- 1 until steps.length) {
      reached = events.filter(col(typ) === steps(i))
        .join(reached.select(col(user), col("t").as("prev_t")), user)
        .filter(col(ts) > col("prev_t"))
        .groupBy(col(user)).agg(min(col(ts)).as("t"))
      out = out.unionByName(
        reached.agg(count(lit(1)).as("users"))
          .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
            col("users")))
    }
    out
  }

  /** Weekly cohort retention: users grouped by the ISO week of their
    * first event; cell (cohort_week, week_offset) counts the cohort's
    * users active in that later week. */
  def retentionCohorts(events: DataFrame, user: String, ts: String): DataFrame = {
    val wk = (c: Column) => date_trunc("week", c).cast("date")
    val cohort = events.groupBy(col(user))
      .agg(min(col(ts)).as("first_ts"))
      .select(col(user), wk(col("first_ts")).as("cohort_week"))
    val active = events.select(col(user), wk(col(ts)).as("active_week"))
      .distinct()
    active.join(cohort, user)
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / lit(7))
          .cast("int").as("week_offset"))
      .agg(count(lit(1)).as("users"))
      // ISO string out (the q47 convention): parquet DATE and DuckDB DATE
      // surface as different host types in the driver's compare
      .select(date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("users"))
  }

  // ---------------------------------------------------------------------
  // q120_funnel — view → click → purchase, strict temporal order.
  // ---------------------------------------------------------------------
  def q120Funnel(s: SparkSession, dir: String): DataFrame =
    funnel(t(s, dir, "events"), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))

  val q120FunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, MIN(ts) AS t FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s2 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN s1 ON e.user_id = s1.user_id
      |  WHERE e.event_type = 'click' AND e.ts > s1.t
      |  GROUP BY e.user_id),
      |s3 AS (
      |  SELECT e.user_id, MIN(e.ts) AS t
      |  FROM events e JOIN s2 ON e.user_id = s2.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts > s2.t
      |  GROUP BY e.user_id)
      |SELECT 1 AS step, 'view' AS event_type, COUNT(*) AS users FROM s1
      |UNION ALL
      |SELECT 2, 'click', COUNT(*) FROM s2
      |UNION ALL
      |SELECT 3, 'purchase', COUNT(*) FROM s3""".stripMargin

  // ---------------------------------------------------------------------
  // q121_retention — weekly cohorts × week offset.
  // ---------------------------------------------------------------------
  def q121Retention(s: SparkSession, dir: String): DataFrame =
    retentionCohorts(t(s, dir, "events"), "user_id", "ts")

  val q121RetentionSql: String =
    """WITH cohort AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id),
      |active AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS active_week
      |  FROM events)
      |SELECT strftime(c.cohort_week, '%Y-%m-%d') AS cohort_week,
      |  CAST(datediff('day', c.cohort_week, a.active_week) / 7 AS INT)
      |    AS week_offset,
      |  COUNT(*) AS users
      |FROM active a JOIN cohort c ON a.user_id = c.user_id
      |GROUP BY 1, 2""".stripMargin

  /** First-order Markov transition matrix over each user's event stream:
    * count and row-normalized probability per (prev_type → event_type)
    * step. The sequence model behind "what do users do after X"
    * dashboards and behavioral anomaly scoring — and the event-stream
    * sibling of q115's token bigram LM.
    *
    * Scale shape: ONE shuffle (the per-user window sort on (ts,
    * event_id) — the unique tiebreak makes `lag` deterministic under
    * timestamp ties); the transition table is |types|² rows, so the
    * row-normalizing totals join is a broadcast. Per-user state is the
    * sort, never a collected event list. The probability is one exact-
    * int division, bit-identical across engines. */
  def markovTransitions(events: DataFrame, user: String, ts: String,
      typ: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(user))
      .orderBy(col(ts).asc, col(tiebreak).asc)
    val steps = events
      .select(col(user), col(ts), col(tiebreak), col(typ))
      .withColumn("prev_type", lag(col(typ), 1).over(w))
      .filter(col("prev_type").isNotNull)
    val counts = steps.groupBy(col("prev_type"), col(typ).as("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("row_total"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"),
        (col("n").cast("double") / col("row_total").cast("double"))
          .as("p"))
  }

  // ---------------------------------------------------------------------
  // q132_markov_transitions — event-type transition matrix over events.
  // ---------------------------------------------------------------------
  def q132MarkovTransitions(s: SparkSession, dir: String): DataFrame =
    markovTransitions(t(s, dir, "events"), "user_id", "ts", "event_type",
      "event_id")

  val q132MarkovTransitionsSql: String =
    """WITH steps AS (
      |  SELECT
      |    LAG(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_type,
      |    event_type
      |  FROM events),
      |counts AS (
      |  SELECT prev_type, event_type, COUNT(*) AS n
      |  FROM steps WHERE prev_type IS NOT NULL
      |  GROUP BY prev_type, event_type),
      |totals AS (
      |  SELECT prev_type, SUM(n) AS row_total FROM counts
      |  GROUP BY prev_type)
      |SELECT c.prev_type, c.event_type, c.n,
      |  CAST(c.n AS DOUBLE) / CAST(t.row_total AS DOUBLE) AS p
      |FROM counts c JOIN totals t USING (prev_type)""".stripMargin

  /** Top-k frequent event paths: each (user, day)'s events in (ts,
    * tiebreak) order joined into a `>`-delimited path string, counted
    * across the corpus, ranked. The clickstream "common journeys" query
    * — q132 models individual steps; this models whole trajectories.
    *
    * Scale shape: one shuffle on (user, day); per-group state is that
    * group's OWN event list (bounded by a user-day, not the corpus —
    * collect_list here is per-key aggregation state, not a driver
    * collect), sorted in-group via array_sort on (ts, tiebreak, type)
    * structs so the path string is partition-invariant; path counting is
    * a second shuffle on the path string; top-k is TakeOrdered. A
    * pathological single user-day with 10^6 events wants a per-group
    * length cap upstream (slice) — standard for path mining, where
    * such sessions are bot traffic anyway. */
  def topPaths(events: DataFrame, user: String, ts: String, typ: String,
      tiebreak: String, k: Int): DataFrame = {
    val day = to_date(col(ts))
    val paths = events
      .select(col(user), day.as("day"),
        struct(col(ts), col(tiebreak), col(typ).as("t")).as("s"))
      .groupBy(col(user), col("day"))
      .agg(array_join(
        transform(array_sort(collect_list(col("s"))), x => x.getField("t")),
        ">").as("path"))
    val counted = paths.groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
    val top = counted
      .orderBy(col("n_sessions").desc, col("path").asc).limit(k)
    Similarity.rankBounded(top, "rnk",
        Seq(col("n_sessions").desc, col("path").asc))
      .select(col("rnk").cast("int").as("rnk"), col("path"),
        col("n_sessions"))
  }

  // ---------------------------------------------------------------------
  // q143_session_paths — top-15 user-day event-type paths.
  // ---------------------------------------------------------------------
  def q143SessionPaths(s: SparkSession, dir: String): DataFrame =
    topPaths(t(s, dir, "events"), "user_id", "ts", "event_type",
      "event_id", k = 15)

  val q143SessionPathsSql: String =
    """WITH paths AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      |counted AS (
      |  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path)
      |SELECT CAST(rnk AS INT) AS rnk, path, n_sessions FROM (
      |  SELECT path, n_sessions,
      |    ROW_NUMBER() OVER (
      |      ORDER BY n_sessions DESC, path ASC) AS rnk
      |  FROM counted)
      |WHERE rnk <= 15""".stripMargin

  // ---------------------------------------------------------------------
  // q166_km_survival — Kaplan–Meier survival with right-censoring
  // (Kaplan & Meier 1958): per cohort, the probability a user is still
  // active h days after their first event — q121's retention grid done
  // RIGHT when observation windows are unequal (users near the corpus
  // end haven't had time to churn; counting them as churned biases the
  // curve — censoring is the fix).
  //
  // Per (cohort, lifetime-day t): d_t churned, at-risk n_t = users with
  // lifetime ≥ t (CENSORED USERS INCLUDED — the estimator's point);
  // Ŝ(h) = Π_{death t ≤ h}(1 − d_t/n_t). Each factor is one IEEE
  // divide+subtract from exact integers; the product folds LEFT-TO-RIGHT
  // over the death-time-sorted list (q92 discipline; DuckDB list_reduce
  // over the same ordered list with seed 1.0), so Ŝ hashes exactly.
  // Integer evidence (users, deaths ≤ h) rides along.
  //
  // Scale shape: one shuffle to per-user lifetimes, one to per-(cohort,
  // t) death/censor counts (|cohorts|·|distinct lifetimes| rows); the
  // at-risk window and the horizon folds run on THAT table.
  // ---------------------------------------------------------------------
  def kmSurvival(lifetimes: DataFrame, cohort: String, t: String,
      churned: String, horizons: Seq[Int]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = lifetimes.groupBy(col(cohort), col(t))
      .agg(sum(when(col(churned), 1L).otherwise(0L)).as("d"),
        count(lit(1)).as("all_t"))
    val wDesc = Window.partitionBy(col(cohort)).orderBy(col(t).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val risk = pts.withColumn("n_risk", sum(col("all_t")).over(wDesc))
    val curves = risk.filter(col("d") > 0)
      .select(col(cohort), col(t), col("d"), col("n_risk"),
        (lit(1.0) - col("d").cast("double") / col("n_risk").cast("double"))
          .as("factor"))
      .groupBy(col(cohort))
      .agg(sort_array(collect_list(struct(col(t).as("tt"), col("d"),
        col("factor")))).as("xs"))
    val users = lifetimes.groupBy(col(cohort))
      .agg(count(lit(1)).as("n_users"))
    val horizonRows = horizons.map { h =>
      curves.select(col(cohort), lit(h).as("horizon"),
        aggregate(expr(s"filter(xs, x -> x.tt <= $h)"), lit(0L),
          (a, x) => a + x.getField("d")).as("d_cum"),
        round(aggregate(expr(s"filter(xs, x -> x.tt <= $h)"), lit(1.0d),
          (a, x) => a * x.getField("factor")), 6).as("survival"))
    }.reduce(_.unionByName(_))
    horizonRows.join(broadcast(users), cohort)
      .select(col(cohort), col("horizon"), col("n_users"), col("d_cum"),
        col("survival"))
  }

  def q166KmSurvival(s: SparkSession, dir: String): DataFrame = {
    // hour-granular lifetimes via exact integer epoch math (unix_micros
    // div — both engines floor-divide the same int64); a user whose last
    // activity is within 12h of the corpus end is CENSORED, not churned
    val e = t(s, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(cast(ts as timestamp)) div 3600000000")
          .as("hr"))
    val span = e.groupBy(col("user_id"))
      .agg(min(col("hr")).as("f"), max(col("hr")).as("l"))
    val corpusEnd = e.agg(max(col("hr")).as("m"))
    val lifetimes = span.crossJoin(broadcast(corpusEnd))
      .select((col("user_id") % 3).as("cohort"),
        (col("l") - col("f")).as("t"),
        (col("l") <= col("m") - 12).as("churned"))
    kmSurvival(lifetimes, "cohort", "t", "churned", Seq(672, 696, 720))
  }

  val q166KmSurvivalSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) // 3600000000 AS hr
      |  FROM events),
      |span AS (
      |  SELECT user_id, MIN(hr) AS f, MAX(hr) AS l
      |  FROM e GROUP BY user_id),
      |m AS (SELECT MAX(hr) AS m FROM e),
      |lt AS (
      |  SELECT user_id % 3 AS cohort, l - f AS t,
      |    l <= m.m - 12 AS churned
      |  FROM span CROSS JOIN m),
      |pts AS (
      |  SELECT cohort, t,
      |    SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS d,
      |    COUNT(*) AS all_t
      |  FROM lt GROUP BY cohort, t),
      |risk AS (
      |  SELECT cohort, t, d,
      |    SUM(all_t) OVER (PARTITION BY cohort ORDER BY t DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
      |  FROM pts),
      |curves AS (
      |  SELECT cohort, t, d,
      |    1.0 - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE) AS factor
      |  FROM risk WHERE d > 0),
      |users AS (SELECT cohort, COUNT(*) AS n_users FROM lt
      |          GROUP BY cohort),
      |h AS (SELECT UNNEST([672, 696, 720]) AS horizon)
      |SELECT c.cohort, h.horizon, u.n_users,
      |  CAST(COALESCE(SUM(c.d) FILTER (WHERE c.t <= h.horizon), 0)
      |    AS BIGINT) AS d_cum,
      |  ROUND(COALESCE(list_reduce(
      |    list_prepend(1.0::DOUBLE,
      |      list(c.factor ORDER BY c.t) FILTER (WHERE c.t <= h.horizon)),
      |    (a, b) -> a * b), 1.0), 6) AS survival
      |FROM curves c
      |CROSS JOIN h
      |JOIN users u ON c.cohort = u.cohort
      |GROUP BY c.cohort, h.horizon, u.n_users""".stripMargin

  /** RECENCY-WEIGHTED engagement score — the time-decayed feature every
    * behavioral ranking/churn model consumes: score(u) = Σ v·2^(−w)
    * with w the event's age in whole WEEKS before the corpus horizon
    * (max ts). Integer week exponents keep the decay factor an exact
    * dyadic rational built by `1 / (1::BIGINT << w)` — shift, not libm
    * `pow` (whose last-ulp is implementation-defined; the q162 sqrt
    * note). The per-user sum is an ordered fold over event-sorted
    * terms (the q92 discipline). One shuffle on the user; the horizon
    * is a one-row broadcast. Ages ≥ 62 weeks clamp (decay ~2e-19 —
    * below any score's resolution). */
  def timeDecayScore(events: DataFrame, user: String, ts: String,
      value: String, tiebreak: String): DataFrame = {
    val horizon = events.agg(max(col(ts)).as("__h"))
    val terms = events.crossJoin(broadcast(horizon))
      .withColumn("__w", least(lit(62),
        expr(s"datediff(to_date(__h), to_date($ts)) div 7").cast("int")))
      .select(col(user),
        struct(col(ts), col(tiebreak),
          (col(value) / expr("cast(shiftleft(1L, __w) as double)"))
            .as("term")).as("st"))
    terms.groupBy(col(user))
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(col("st"))).as("__ts"))
      .select(col(user), col("n_events"),
        round(aggregate(col("__ts"), lit(0.0d),
          (acc, x) => acc + x.getField("term")), 6).as("decay_score"))
  }

  // ---------------------------------------------------------------------
  // q190_time_decay — per-user recency-weighted value mass with a 1-week
  // half-life against the corpus horizon. The decay factors are exact
  // powers of two on both engines (shift + divide, no pow), so the
  // ordered fold hash-matches.
  // ---------------------------------------------------------------------
  def q190TimeDecay(s: SparkSession, dir: String): DataFrame =
    timeDecayScore(t(s, dir, "events"), "user_id", "ts", "value",
      "event_id")

  val q190TimeDecaySql: String =
    """WITH h AS (SELECT MAX(ts) AS h FROM events),
      |terms AS (
      |  SELECT user_id, ts, event_id,
      |    value / CAST(1::BIGINT << LEAST(62,
      |      CAST(datediff('day', CAST(ts AS DATE), CAST(h.h AS DATE)) // 7
      |        AS INT)) AS DOUBLE) AS term
      |  FROM events CROSS JOIN h)
      |SELECT user_id, COUNT(*) AS n_events,
      |  ROUND(list_reduce(list_prepend(0.0::DOUBLE,
      |    list(term ORDER BY ts, event_id)), (a, b) -> a + b), 6)
      |    AS decay_score
      |FROM terms GROUP BY user_id""".stripMargin

  /** SEASONAL-NAIVE forecast error — the baseline every real forecast
    * must beat: predict each day's value with the value `season` days
    * earlier, report per-key MAE/RMSE over days where both exist.
    * Exact decimal |diff| sums (values are money-grade), power sums for
    * RMSE; the self-join is an equi-join on (key, day − season) — one
    * shuffle, no windows over the corpus. */
  def seasonalNaiveError(df: DataFrame, key: String, day: String,
      value: String, season: Int): DataFrame = {
    val actual = df.select(col(key), col(day).as("__d"),
      col(value).as("__a"))
    val predicted = df.select(col(key), (col(day) + season).as("__d"),
      col(value).as("__p"))
    val joined = actual.join(predicted, Seq(key, "__d"))
    joined.groupBy(col(key))
      .agg(count(lit(1)).as("n_days"),
        round(sumDec(abs(col("__a") - col("__p"))) /
          count(lit(1)).cast("double"), 6).as("mae"),
        round(sqrt(sum(((col("__a") - col("__p")) * (col("__a") - col("__p")))
            .cast(org.apache.spark.sql.types.DecimalType(30, 8)))
          .cast("double") / count(lit(1)).cast("double")), 6).as("rmse"))
  }

  // ---------------------------------------------------------------------
  // q191_forecast_error — how wrong is "same as last week" for daily
  // per-type event value mass: the eval floor for any demand model over
  // this stream. |diff| sums exact decimal; rmse from decimal power
  // sums of IEEE squares (the q44/s2 discipline).
  // ---------------------------------------------------------------------
  def q191ForecastError(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "events")
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01")).cast("long")
          .as("day"))
      .agg(sumDec(col("value")).as("v"))
    seasonalNaiveError(daily, "event_type", "day", "v", season = 7)
  }

  val q191ForecastErrorSql: String =
    """WITH daily AS (
      |  SELECT event_type,
      |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT
      |      AS day,
      |    CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS v
      |  FROM events GROUP BY 1, 2),
      |j AS (
      |  SELECT a.event_type, a.v AS av, p.v AS pv
      |  FROM daily a JOIN daily p
      |    ON a.event_type = p.event_type AND a.day = p.day + 7)
      |SELECT event_type, COUNT(*) AS n_days,
      |  ROUND(CAST(SUM(CAST(ABS(av - pv) AS DECIMAL(30,4))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mae,
      |  ROUND(sqrt(CAST(SUM(CAST((av - pv) * (av - pv) AS DECIMAL(30,8)))
      |      AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE)), 6) AS rmse
      |FROM j GROUP BY event_type""".stripMargin

  /** COHORT LTV curve — cumulative value per signup cohort over week
    * offsets: the retention table (q121) upgraded from presence to
    * MONEY, the panel every growth team reads. Exact decimal revenue
    * per (cohort, offset) cell, then a running sum over offsets inside
    * each cohort — the window is |offsets|-wide per cohort, never
    * corpus-sized. Offsets with no activity are absent (observed-cell
    * convention, same as q121). */
  def cohortLtv(events: DataFrame, user: String, ts: String,
      value: String): DataFrame = {
    val wk = (c: Column) => date_trunc("week", c).cast("date")
    val cohort = events.groupBy(col(user))
      .agg(min(col(ts)).as("first_ts"))
      .select(col(user), wk(col("first_ts")).as("cohort_week"))
    val cells = events.join(cohort, user)
      .groupBy(col("cohort_week"),
        (datediff(wk(col(ts)), col("cohort_week")) / lit(7))
          .cast("int").as("week_offset"))
      .agg(sumDec(col(value)).as("revenue"),
        countDistinct(col(user)).as("active_users"))
    val w = Window.partitionBy(col("cohort_week"))
      .orderBy(col("week_offset").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("cum_revenue",
        round(sum(col("revenue").cast(org.apache.spark.sql.types
          .DecimalType(30, 4))).over(w).cast("double"), 4))
      .select(date_format(col("cohort_week"), "yyyy-MM-dd")
          .as("cohort_week"),
        col("week_offset"), col("active_users"),
        round(col("revenue"), 4).as("revenue"), col("cum_revenue"))
  }

  // ---------------------------------------------------------------------
  // q212_cohort_ltv — weekly cohorts' cumulative event-value mass by
  // offset. Decimal-exact cells and running sums; ISO week strings (the
  // q47/q121 date convention).
  // ---------------------------------------------------------------------
  def q212CohortLtv(s: SparkSession, dir: String): DataFrame =
    cohortLtv(t(s, dir, "events"), "user_id", "ts", "value")

  val q212CohortLtvSql: String =
    """WITH cohort AS (
      |  SELECT user_id,
      |    CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      |  FROM events GROUP BY user_id),
      |cells AS (
      |  SELECT c.cohort_week,
      |    CAST(datediff('day', c.cohort_week,
      |      CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT)
      |      AS week_offset,
      |    CAST(SUM(CAST(e.value AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
      |    COUNT(DISTINCT e.user_id) AS active_users
      |  FROM events e JOIN cohort c ON e.user_id = c.user_id
      |  GROUP BY 1, 2)
      |SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
      |  week_offset, CAST(active_users AS BIGINT) AS active_users,
      |  ROUND(revenue, 4) AS revenue,
      |  ROUND(CAST(SUM(CAST(revenue AS DECIMAL(30,4))) OVER (
      |    PARTITION BY cohort_week ORDER BY week_offset ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE),
      |    4) AS cum_revenue
      |FROM cells""".stripMargin

  /** RFM SEGMENTATION — the classic customer triage (recency ×
    * frequency × monetary, each cut at the tercile boundaries), built
    * the scale-safe way: the three boundaries come from the POSITIONAL
    * threshold machinery over (metric, distinct-value) tables
    * ([[graft.operators.Curation.quantileThresholds]] with a
    * non-foldable constant key — never an ntile over all users, which
    * would serialize the corpus through one window task). Scores are
    * then a map-only broadcast compare; ties at a boundary go to the
    * higher score (>= threshold), deterministically. */
  def rfmSegments(events: DataFrame, user: String, tsUsCol: String,
      value: String): DataFrame = {
    import graft.operators.Curation.quantileThresholds
    val horizon = events.agg(max(col(tsUsCol)).as("__h"))
    val perUser = events.crossJoin(broadcast(horizon))
      .groupBy(col(user))
      .agg(max(col("__h")).as("__hm"), max(col(tsUsCol)).as("__tm"),
        count(lit(1)).as("frequency"),
        sumDec(col(value)).as("monetary"))
      // integer div, not double-divide-then-cast: a quotient that IEEE
      // rounds UP to an integer would truncate differently than floor
      // (the q190 lesson)
      .withColumn("recency_days",
        expr("(__hm - __tm) div 86400000000L"))
      .drop("__hm", "__tm")
    // the constant partition key must be UNFOLDABLE: for a NON-NULLABLE
    // metric (count(*)) the optimizer folds `x * 0` to a literal,
    // strips the window partition, and replans the warning-spewing
    // no-partition WindowExec; `x - x` is equally constant but has no
    // simplification rule
    def thr(metric: String) = quantileThresholds(
      perUser.select((col(metric) - col(metric)).as("k"), col(metric)),
      "k", metric, 1.0 / 3.0)
      .select(col("threshold").as(s"__t_$metric"))
    // top-tercile boundary per metric (recency is better LOW, so its
    // score inverts)
    val j = perUser
      .crossJoin(broadcast(thr("recency_days")))
      .crossJoin(broadcast(thr("frequency")))
      .crossJoin(broadcast(thr("monetary")))
      .select(col(user),
        when(col("recency_days") < col("__t_recency_days"), 3)
          .otherwise(1).as("r_score"),
        when(col("frequency") >= col("__t_frequency"), 3)
          .otherwise(1).as("f_score"),
        when(col("monetary") >= col("__t_monetary"), 3)
          .otherwise(1).as("m_score"))
    j.groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_users"))
  }

  // ---------------------------------------------------------------------
  // q213_rfm — user counts per (R,F,M) cell over the event stream,
  // boundaries at the top-third positional rule. The oracle replays the
  // cumulative threshold rule per metric and the same comparisons.
  // ---------------------------------------------------------------------
  def q213Rfm(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp"))
        .as("ts_us"), col("value"))
    rfmSegments(e, "user_id", "ts_us", "value")
  }

  val q213RfmSql: String =
    """WITH h AS (SELECT MAX(epoch_us(ts)) AS h FROM events),
      |per_user AS (
      |  SELECT user_id,
      |    CAST((h.h - MAX(epoch_us(ts))) // 86400000000 AS BIGINT)
      |      AS recency_days,
      |    COUNT(*) AS frequency,
      |    CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS monetary
      |  FROM events CROSS JOIN h GROUP BY user_id, h.h),
      |tr AS (
      |  SELECT MAX(v) AS t FROM (
      |    SELECT recency_days AS v,
      |      SUM(c) OVER (ORDER BY recency_days DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      SUM(c) OVER () AS n
      |    FROM (SELECT recency_days, COUNT(*) AS c FROM per_user
      |          GROUP BY recency_days))
      |  WHERE cum >= CEIL(n / 3.0)),
      |tf AS (
      |  SELECT MAX(v) AS t FROM (
      |    SELECT frequency AS v,
      |      SUM(c) OVER (ORDER BY frequency DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      SUM(c) OVER () AS n
      |    FROM (SELECT frequency, COUNT(*) AS c FROM per_user
      |          GROUP BY frequency))
      |  WHERE cum >= CEIL(n / 3.0)),
      |tm AS (
      |  SELECT MAX(v) AS t FROM (
      |    SELECT monetary AS v,
      |      SUM(c) OVER (ORDER BY monetary DESC
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |      SUM(c) OVER () AS n
      |    FROM (SELECT monetary, COUNT(*) AS c FROM per_user
      |          GROUP BY monetary))
      |  WHERE cum >= CEIL(n / 3.0))
      |SELECT
      |  CASE WHEN p.recency_days < tr.t THEN 3 ELSE 1 END AS r_score,
      |  CASE WHEN p.frequency >= tf.t THEN 3 ELSE 1 END AS f_score,
      |  CASE WHEN p.monetary >= tm.t THEN 3 ELSE 1 END AS m_score,
      |  COUNT(*) AS n_users
      |FROM per_user p CROSS JOIN tr CROSS JOIN tf CROSS JOIN tm
      |GROUP BY 1, 2, 3""".stripMargin

  // ---------------------------------------------------------------------
  // q238_markov_attribution — data-driven multi-touch attribution by
  // Markov removal effect (Anderl et al., IJRM 2016): model each
  // user-day journey (cut at the first conversion) as a first-order
  // chain over channel states plus __START__/__CONV__/__NULL__, compute
  // the chain's conversion probability, and credit each channel by how
  // much that probability drops when the channel's inflow is removed
  // (share = normalized removal effect). The principled alternative to
  // the rule-based position attribution of q207.
  //
  // Two-tier computation, each tier in its honest place:
  //  - the TRANSITION MODEL is relational (the q132 lag/count/normalize
  //    shape over journey-cut streams) — the only part that touches
  //    corpus-scale data; one (user, day) window + one (src, dst)
  //    aggregate.
  //  - the ABSORPTION SOLVE runs on the driver over the collected
  //    |states|² matrix (model arity — a channel taxonomy, like NB's
  //    class count; the centroid-load class of bounded collect), as
  //    FINITE-HORIZON value iteration: v_k(s) = Σ_dst p(s→dst)·v_{k-1},
  //    K fixed — no data-dependent convergence test, so the doubles are
  //    replayable. Removing channel c zeroes the v-contribution of
  //    every edge INTO c (mass that walked into c converts never).
  //
  // Determinism: every fold (value iteration per state, the share
  // denominator) runs in dst-/channel-sorted order with plain IEEE
  // adds; the oracle replays the SAME K iterations as K unrolled CTE
  // stages with list folds ORDER BY dst — matrices, iterations, and
  // final arithmetic agree term for term. Integer touch counts ride
  // along as evidence.
  // ---------------------------------------------------------------------
  val AttrStart = "__START__"
  val AttrConv = "__CONV__"
  val AttrNull = "__NULL__"

  /** Journey-cut transition rows (src, dst, n, p) + touch counts —
    * the relational tier. Journeys are (user, day) streams cut at the
    * first `convType` event (inclusive); every kept non-conversion row
    * emits exactly one outgoing edge (to the next touch, to __CONV__,
    * or to __NULL__ at an unconverted journey end), so touch counts
    * equal outflow mass by construction. */
  def attributionTransitions(events: DataFrame, user: String, ts: String,
      typ: String, tiebreak: String, convType: String)
      : (DataFrame, DataFrame) = {
    val day = to_date(col(ts)).as("day")
    val w = Window.partitionBy(col(user), col("day"))
      .orderBy(col(ts).asc, col(tiebreak).asc)
    val kept = events
      .select(col(user), day, col(ts), col(tiebreak), col(typ))
      .withColumn("conv_before",
        coalesce(sum(when(col(typ) === convType, 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .filter(col("conv_before") === 0L)
      .withColumn("state",
        when(col(typ) === convType, lit(AttrConv)).otherwise(col(typ)))
    val steps = kept
      .withColumn("src", coalesce(lag(col("state"), 1).over(w),
        lit(AttrStart)))
      .withColumn("rev", row_number().over(
        Window.partitionBy(col(user), col("day"))
          .orderBy(col(ts).desc, col(tiebreak).desc)))
    val pairTrans = steps.select(col("src"), col("state").as("dst"))
    val terminal = steps
      .filter(col("rev") === 1 && col("state") =!= AttrConv)
      .select(col("state").as("src"), lit(AttrNull).as("dst"))
    val counts = pairTrans.unionByName(terminal)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("t"))
    val trans = counts.join(broadcast(totals), Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        (col("n").cast("double") / col("t").cast("double")).as("p"))
    val touches = kept.filter(col("state") =!= AttrConv)
      .groupBy(col("state").as("channel"))
      .agg(count(lit(1)).as("n_touches"))
    (trans, touches)
  }

  /** Finite-horizon conversion probability from __START__ under the
    * chain with every edge into `removed` zeroed ("" = no removal).
    * Folds run in dst-sorted order — the oracle's list folds replay
    * them exactly. */
  private def absorb(trans: Seq[(String, String, Double)],
      removed: String, horizon: Int): Double = {
    val bySrc = trans.groupBy(_._1).view
      .mapValues(_.sortBy(_._2)).toMap
    val transient = bySrc.keySet.toList.sorted
    var v = transient.map(_ -> 0.0).toMap
    var k = 0
    while (k < horizon) {
      v = transient.map { s =>
        s -> bySrc(s).foldLeft(0.0) { case (acc, (_, dst, p)) =>
          val vd =
            if (dst == removed) 0.0
            else if (dst == AttrConv) 1.0
            else if (dst == AttrNull) 0.0
            else v.getOrElse(dst, 0.0)
          acc + p * vd
        }
      }.toMap
      k += 1
    }
    v.getOrElse(AttrStart, 0.0)
  }

  /** One row per channel: integer touch count, removal effect
    * (p_base − p_removed)/p_base, and the normalized attribution
    * share. */
  def markovRemovalAttribution(events: DataFrame, user: String,
      ts: String, typ: String, tiebreak: String, convType: String,
      horizon: Int): DataFrame = {
    val (transDf, touches) = attributionTransitions(
      events, user, ts, typ, tiebreak, convType)
    val trans = transDf.select(col("src"), col("dst"), col("p"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
      .toSeq
    val channels = trans.map(_._1).distinct.filter(_ != AttrStart)
      .sorted
    val pBase = absorb(trans, "", horizon)
    val res = channels.map { c =>
      val re = if (pBase == 0.0) Double.NaN
        else (pBase - absorb(trans, c, horizon)) / pBase
      (c, re)
    }
    // den = 0 (channels exist but none carries conversion mass — every
    // conversion is a direct START→CONV journey) yields NaN shares in
    // BOTH engines (0/0): a verdict, not a number, like q187's NULL ndcg.
    val den = res.foldLeft(0.0)((acc, r) => acc + r._2)
    val sp = events.sparkSession
    import sp.implicits._
    val rows = res.map { case (c, re) => (c, re, re / den) }
      .toDF("channel", "re_raw", "share_raw")
    rows.join(touches, Seq("channel"))
      .select(col("channel"), col("n_touches"),
        round(col("re_raw"), 6).as("removal_effect"),
        round(col("share_raw"), 6).as("share"))
  }

  // shared by the gate AND its oracle generator — one definition only
  private val AttrHorizon = 24

  def q238MarkovAttribution(s: SparkSession, dir: String): DataFrame =
    markovRemovalAttribution(t(s, dir, "events"), "user_id", "ts",
      "event_type", "event_id", "purchase", horizon = AttrHorizon)

  /** The oracle unrolls the K value-iteration steps as chained CTE
    * stages (recursive CTEs cannot aggregate per iteration), each an
    * exact replay of the driver fold: same CASE order, same dst-sorted
    * list fold, same one-divide-per-ratio arithmetic. */
  val q238MarkovAttributionSql: String = {
    val horizon = AttrHorizon
    val base =
      """WITH kept AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
        |    CASE WHEN event_type = 'purchase' THEN '__CONV__'
        |         ELSE event_type END AS state
        |  FROM (
        |    SELECT *,
        |      COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
        |                        ELSE 0 END)
        |        OVER (PARTITION BY user_id, CAST(ts AS DATE)
        |              ORDER BY ts ASC, event_id ASC
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0) AS conv_before
        |    FROM events)
        |  WHERE conv_before = 0),
        |steps AS (
        |  SELECT state,
        |    COALESCE(LAG(state) OVER (PARTITION BY user_id, day
        |      ORDER BY ts ASC, event_id ASC), '__START__') AS src,
        |    ROW_NUMBER() OVER (PARTITION BY user_id, day
        |      ORDER BY ts DESC, event_id DESC) AS rev
        |  FROM kept),
        |edges AS (
        |  SELECT src, state AS dst FROM steps
        |  UNION ALL
        |  SELECT state AS src, '__NULL__' AS dst FROM steps
        |  WHERE rev = 1 AND state <> '__CONV__'),
        |counts AS (SELECT src, dst, COUNT(*) AS n FROM edges
        |           GROUP BY src, dst),
        |tot AS (SELECT src, SUM(n) AS t FROM counts GROUP BY src),
        |trans AS (
        |  SELECT c.src, c.dst,
        |    CAST(c.n AS DOUBLE) / CAST(t.t AS DOUBLE) AS p
        |  FROM counts c JOIN tot t USING (src)),
        |rem AS (
        |  SELECT '' AS removed
        |  UNION ALL
        |  SELECT DISTINCT src FROM counts WHERE src <> '__START__'),
        |v0 AS (
        |  SELECT r.removed, s.src AS state, 0.0::DOUBLE AS v
        |  FROM (SELECT DISTINCT src FROM trans) s CROSS JOIN rem r)""".stripMargin
    // AS MATERIALIZED: without it DuckDB inlines each stage into the
    // next and optimization cost grows superlinearly in the chain
    // depth (measured: 3.5 s at K=8, minutes at K=24; materialized:
    // 1.3 s at K=24). Oracle-only syntax — Spark never parses this.
    val iters = (1 to horizon).map { k =>
      s"""v$k AS MATERIALIZED (
         |  SELECT r.removed, t.src AS state,
         |    list_reduce(list_prepend(0.0::DOUBLE,
         |      list(t.p * (CASE WHEN t.dst = r.removed THEN 0.0
         |                       WHEN t.dst = '__CONV__' THEN 1.0
         |                       WHEN t.dst = '__NULL__' THEN 0.0
         |                       ELSE COALESCE(pv.v, 0.0) END)
         |        ORDER BY t.dst)),
         |      (a, b) -> a + b) AS v
         |  FROM trans t CROSS JOIN rem r
         |  LEFT JOIN v${k - 1} pv
         |    ON pv.removed = r.removed AND pv.state = t.dst
         |  GROUP BY r.removed, t.src)""".stripMargin
    }.mkString(",\n", ",\n", "")
    val tail =
      s""",
         |fin AS (SELECT removed, v FROM v$horizon
         |        WHERE state = '__START__'),
         |re AS (
         |  SELECT f.removed AS channel,
         |    (b.v - f.v) / b.v AS re
         |  FROM fin f CROSS JOIN (SELECT v FROM fin WHERE removed = '') b
         |  WHERE f.removed <> ''),
         |den AS (
         |  SELECT list_reduce(list_prepend(0.0::DOUBLE,
         |      list(re ORDER BY channel)), (a, b) -> a + b) AS d
         |  FROM re),
         |touches AS (
         |  SELECT state AS channel, COUNT(*) AS n_touches FROM kept
         |  WHERE state <> '__CONV__' GROUP BY state)
         |SELECT r.channel, t.n_touches,
         |  ROUND(r.re, 6) AS removal_effect,
         |  ROUND(r.re / d.d, 6) AS share
         |FROM re r JOIN touches t USING (channel) CROSS JOIN den d""".stripMargin
    base + iters + tail
  }
}
