package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table (SURVEY.md §2B "Streaming"
  * row, batch equivalents): JSON extraction, tumbling/sliding windows,
  * gap-based sessionization, and an as-of join.
  *
  * The same window/session logic runs in true Structured Streaming form in
  * [[graft.streaming.EventStreams]]; these batch versions are the
  * oracle-checkable semantics.
  *
  * Scale notes: everything partitions by `user_id` or a time bucket — both
  * high-cardinality — and the as-of join is the union+last_value technique
  * (one shuffle by user, no range cross-product), which is the standard way
  * to keep as-of joins skew-safe at 100 TB.
  */
object EventTime {

  /** Event timestamp in epoch microseconds (engine-neutral int64). */
  private def tsUs(c: org.apache.spark.sql.Column) =
    unix_micros(c.cast("timestamp"))

  // ---------------------------------------------------------------------
  // q22_json — semi-structured extraction: the events.props JSON payload
  // (reference analog: Lambda event payloads, `sync-canvas-data-files
  // .py:72-82`, parsed as JSON).
  // ---------------------------------------------------------------------
  def q22Json(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        count(col("k")).as("n_k"),
        (sum(col("k")).cast("double") / count(col("k"))).as("avg_k"))
  }

  val q22JsonSql: String =
    """SELECT event_type,
      |  CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n_k,
      |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
      |FROM (SELECT event_type,
      |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      |      FROM events)
      |GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------------
  // q23_tumbling — 1-hour tumbling event-time windows via Spark's native
  // window() (identical semantics to the streaming version).
  // ---------------------------------------------------------------------
  def q23Tumbling(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))
  }

  val q23TumblingSql: String =
    """SELECT DATE_TRUNC('hour', ts) AS bucket_start, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q24_sliding — 1-hour windows sliding every 30 minutes: each event lands
  // in exactly two windows. Spark's window() expands this natively; the
  // oracle mirrors it with a two-bucket UNION ALL. Bucket identity is
  // emitted as epoch seconds (engine-neutral).
  // ---------------------------------------------------------------------
  def q24Sliding(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sumDec(col("value")).as("sum_value"))
      .select(
        unix_seconds(col("window.start").cast("timestamp"))
          .as("bucket_start_s"),
        col("n_events"), col("sum_value"))
  }

  val q24SlidingSql: String =
    """WITH e AS (
      |  SELECT CAST(FLOOR(epoch_us(ts) / 1800000000) * 1800 AS BIGINT) AS c1,
      |         value
      |  FROM events),
      |b AS (
      |  SELECT c1 AS bucket_start_s, value FROM e
      |  UNION ALL
      |  SELECT c1 - 1800 AS bucket_start_s, value FROM e)
      |SELECT bucket_start_s, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value
      |FROM b GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q25_sessionize — gap-based sessions (30-min inactivity) per user via
  // lag + running sum; the batch twin of session_window /
  // flatMapGroupsWithState in the streaming module.
  // ---------------------------------------------------------------------
  def q25Sessionize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), tsUs(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    e.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        ((max(col("ts_us")) - min(col("ts_us"))).cast("double") / 1000000.0)
          .as("dur_s"))
  }

  val q25SessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events),
      |x AS (
      |  SELECT *, CASE WHEN LAG(ts_us) OVER w IS NULL
      |                   OR ts_us - LAG(ts_us) OVER w > 1800000000
      |                 THEN 1 ELSE 0 END AS new_sess
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC)),
      |y AS (
      |  SELECT *, CAST(SUM(new_sess) OVER (
      |      PARTITION BY user_id ORDER BY ts_us ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS sess_id
      |  FROM x)
      |SELECT user_id, sess_id, COUNT(*) AS n_events,
      |  MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
      |  CAST(MAX(ts_us) - MIN(ts_us) AS DOUBLE) / 1000000.0 AS dur_s
      |FROM y GROUP BY user_id, sess_id""".stripMargin

  // ---------------------------------------------------------------------
  // q26_asof_join — for every purchase, the most recent click at-or-before
  // it by the same user. Implemented with the union + last_value(ignore
  // nulls) technique: tag both streams, sort once per user, carry the last
  // click forward. One shuffle on user_id; no range cross-product — the
  // skew-safe 100 TB formulation. The oracle uses DuckDB's native ASOF
  // LEFT JOIN, pinning the exact semantics (ties: ts equality matches).
  // ---------------------------------------------------------------------
  def q26AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsUs(col("ts")).as("ts_us"))
    // On equal ts_us, 'click' sorts before 'purchase' (lexicographic), so a
    // same-instant click is visible to the purchase — matching ASOF >=.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_type").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("click_us",
        when(col("event_type") === "click", col("ts_us")))
      .withColumn("last_click_us",
        last(col("click_us"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"),
        col("last_click_us"),
        (col("ts_us") - col("last_click_us")).as("gap_us"))
  }

  val q26AsofJoinSql: String =
    """SELECT p.event_id, p.user_id,
      |  epoch_us(p.ts) AS purchase_us,
      |  epoch_us(c.ts) AS last_click_us,
      |  epoch_us(p.ts) - epoch_us(c.ts) AS gap_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  private def purchasesAndClicks(s: SparkSession, dir: String) = {
    val e = t(s, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        tsUs(col("ts")).as("ts_us"))
    (e.filter(col("event_type") === "purchase").drop("event_type"),
     e.filter(col("event_type") === "click").drop("event_type"))
  }

  // ---------------------------------------------------------------------
  // q26b_asof_tolerance — as-of with a 30-minute tolerance through the
  // generalized AsOf operator: matches older than the tolerance become
  // NULL (the "stale quote" rule in point-in-time joins).
  // ---------------------------------------------------------------------
  def q26bAsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    AsOf.asofJoin(purchases, clicks, Seq("user_id"), "ts_us", "ts_us",
        forward = false, toleranceUs = Some(1800L * 1000000L))
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"),
        col("asof.ts_us").as("click_us"))
  }

  val q26bAsofToleranceSql: String =
    """SELECT p.event_id, p.user_id,
      |  epoch_us(p.ts) AS purchase_us,
      |  CASE WHEN epoch_us(p.ts) - epoch_us(c.ts) <= 1800000000
      |       THEN epoch_us(c.ts) END AS click_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  // ---------------------------------------------------------------------
  // q26c_asof_forward — forward as-of: earliest click at-or-after each
  // purchase (next-touch attribution).
  // ---------------------------------------------------------------------
  def q26cAsofForward(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    AsOf.asofJoin(purchases, clicks, Seq("user_id"), "ts_us", "ts_us",
        forward = true)
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"),
        col("asof.ts_us").as("next_click_us"))
  }

  val q26cAsofForwardSql: String =
    """SELECT p.event_id, p.user_id,
      |  epoch_us(p.ts) AS purchase_us,
      |  epoch_us(c.ts) AS next_click_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id AND p.ts <= c.ts""".stripMargin

  // ---------------------------------------------------------------------
  // q160_asof_nearest — NEAREST as-of: the closer of last-click-before
  // and first-click-after each purchase, ties to backward (pandas
  // merge_asof direction='nearest'). Completes the as-of direction
  // family q26/q26b/q26c; both directions come out of ONE sorted window
  // pass. The oracle derives nearest from DuckDB's own backward and
  // forward ASOF joins plus the same tie rule.
  // ---------------------------------------------------------------------
  def q160AsofNearest(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    AsOf.asofNearest(purchases, clicks, Seq("user_id"), "ts_us", "ts_us")
      .select(col("event_id"), col("user_id"),
        col("ts_us").as("purchase_us"),
        col("asof.ts_us").as("nearest_click_us"))
  }

  val q160AsofNearestSql: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM events WHERE event_type = 'click'),
      |b AS (
      |  SELECT p.event_id, p.user_id, epoch_us(p.ts) AS pus,
      |    epoch_us(cb.ts) AS bus
      |  FROM p ASOF LEFT JOIN c cb
      |    ON p.user_id = cb.user_id AND p.ts >= cb.ts),
      |f AS (
      |  SELECT p.event_id, epoch_us(cf.ts) AS fus
      |  FROM p ASOF LEFT JOIN c cf
      |    ON p.user_id = cf.user_id AND p.ts <= cf.ts)
      |SELECT b.event_id, b.user_id, b.pus AS purchase_us,
      |  CASE WHEN b.bus IS NULL THEN f.fus
      |       WHEN f.fus IS NULL THEN b.bus
      |       WHEN b.pus - b.bus <= f.fus - b.pus THEN b.bus
      |       ELSE f.fus END AS nearest_click_us
      |FROM b JOIN f USING (event_id)""".stripMargin

  /** Time-grid resampling with forward fill: densify a sparse per-key
    * observation series onto a regular tick grid, carrying each key's
    * most recent observation forward — the gap-filling step before any
    * sliding-window feature or drift computation runs over a series with
    * holes. Built BY COMPOSITION: grid = keys × sequence(), fill = the
    * existing backward [[AsOf.asofJoin]] — resampling is not a new
    * engine primitive, it's as-of against a generated axis.
    *
    * Scale shape: the grid is |keys|·span rows generated engine-side
    * (sequence + explode — never a driver loop); the fill inherits
    * as-of's one-shuffle union+carry plan, so cost is one shuffle of
    * |grid|+|obs| rows on the key. Span is a parameter: a year of days
    * is 365 rows per key, linear growth, no quadratic anything. */
  def resampleFfill(obs: DataFrame, key: String, obsTick: String,
      span: Int): DataFrame = {
    val bounds = obs.agg(min(col(obsTick)).as("__d0"))
    val grid = obs.select(col(key)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(key),
        explode(sequence(col("__d0"), col("__d0") + lit(span - 1)))
          .as("tick"))
    AsOf.asofJoin(grid, obs, Seq(key), "tick", obsTick)
  }

  // ---------------------------------------------------------------------
  // q133_resample_ffill — per-supplier daily shipment counts densified
  // onto the first 60 days of the corpus, forward-filled. Integer-only
  // output: (key, tick, source obs day, filled count).
  // ---------------------------------------------------------------------
  def q133ResampleFfill(s: SparkSession, dir: String): DataFrame = {
    val obs = graft.operators.t(s, dir, "lineitem")
      .select(col("l_suppkey").as("k"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
          .cast("long").as("obs_day"))
      .groupBy(col("k"), col("obs_day"))
      .agg(count(lit(1)).as("n"))
    resampleFfill(obs, "k", "obs_day", span = 60)
      .select(col("k").as("l_suppkey"), col("tick").as("day"),
        col("asof.obs_day").as("obs_day"),
        col("asof.n").as("n_filled"))
  }

  val q133ResampleFfillSql: String =
    """WITH obs AS (
      |  SELECT l_suppkey AS k,
      |    datediff('day', DATE '1992-01-01',
      |             CAST(l_shipdate AS DATE))::BIGINT AS obs_day,
      |    COUNT(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |b AS (SELECT MIN(obs_day) AS d0 FROM obs),
      |grid AS (
      |  SELECT k.k, b.d0 + g.x AS day
      |  FROM (SELECT DISTINCT k FROM obs) k
      |  CROSS JOIN b
      |  CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS x) g)
      |SELECT g.k AS l_suppkey, g.day,
      |  last_value(o.obs_day IGNORE NULLS) OVER w AS obs_day,
      |  last_value(o.n IGNORE NULLS) OVER w AS n_filled
      |FROM grid g LEFT JOIN obs o ON g.k = o.k AND g.day = o.obs_day
      |WINDOW w AS (PARTITION BY g.k ORDER BY g.day
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""".stripMargin

  /** Time-grid resampling with LINEAR INTERPOLATION — the companion of
    * [[resampleFfill]] for continuous quantities (a forward fill of a
    * gauge invents plateaus; interpolation draws the line through the
    * surrounding observations). Grid tick t between observations
    * (t_p, v_p) and (t_n, v_n) gets v_p + (v_n − v_p)·(t − t_p)/(t_n −
    * t_p); before the first / after the last observation it takes the
    * nearest one (flat extrapolation); a tick ON an observation gets
    * that value exactly (the fraction is 0).
    *
    * ONE shuffle and ONE sort: grid and observation rows union-tag and
    * both directions come out of the same sorted window pass (the
    * [[AsOf.asofNearest]] single-WindowExec discipline); observations
    * OUTSIDE the grid span still anchor edge ticks — the union carries
    * all of them, which a grid⋈obs equi-join formulation would lose. */
  def resampleInterpolate(obs: DataFrame, key: String, obsTick: String,
      valueCol: String, span: Int): DataFrame = {
    val bounds = obs.agg(min(col(obsTick)).as("__d0"))
    val grid = obs.select(col(key)).distinct()
      .crossJoin(broadcast(bounds))
      .select(col(key),
        explode(sequence(col("__d0"), col("__d0") + lit(span - 1)))
          .as("tick"))
    val l = grid.select(col(key), col("tick").as("__ts"), lit(0).as("__tag"),
      lit(null).cast("long").as("__d"), lit(null).cast("double").as("__v"))
    val r = obs.select(col(key), col(obsTick).cast("long").as("__ts"),
      lit(1).as("__tag"), col(obsTick).cast("long").as("__d"),
      col(valueCol).cast("double").as("__v"))
    val base = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__tag").desc)
    val wB = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val dOnly = when(col("__tag") === 1, col("__d"))
    val vOnly = when(col("__tag") === 1, col("__v"))
    val both = l.unionByName(r)
      .withColumn("__pd", last(dOnly, ignoreNulls = true).over(wB))
      .withColumn("__pv", last(vOnly, ignoreNulls = true).over(wB))
      .withColumn("__nd", first(dOnly, ignoreNulls = true).over(wF))
      .withColumn("__nv", first(vOnly, ignoreNulls = true).over(wF))
      .filter(col("__tag") === 0)
    // equal-ts obs rows sort BEFORE the grid row, so an on-observation
    // tick lands in the backward frame at gap 0 and the fraction
    // vanishes; when both anchors exist, __nd > __ts >= __pd keeps the
    // denominator >= 1 (no ANSI /0)
    val interp = when(col("__pd").isNull, col("__nv"))
      .when(col("__nd").isNull, col("__pv"))
      .otherwise(col("__pv") + (col("__nv") - col("__pv")) *
        ((col("__ts") - col("__pd")).cast("double") /
         (col("__nd") - col("__pd")).cast("double")))
    both.select(col(key), col("__ts").as("tick"),
      col("__pd").as("prev_tick"), col("__nd").as("next_tick"),
      round(interp, 6).as("value"))
  }

  // ---------------------------------------------------------------------
  // q184_interpolate — per-supplier daily shipped quantity interpolated
  // onto the same 60-day grid as q133: sparse observation days anchor a
  // line, edge ticks extrapolate flat. The oracle replays the identical
  // union+two-frame window (a grid⋈obs equi-join would miss anchors
  // beyond the span — planted by construction since suppliers ship for
  // ~2500 days).
  // ---------------------------------------------------------------------
  def q184Interpolate(s: SparkSession, dir: String): DataFrame = {
    val obs = graft.operators.t(s, dir, "lineitem")
      .select(col("l_suppkey").as("k"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01"))
          .cast("long").as("obs_day"), col("l_quantity"))
      .groupBy(col("k"), col("obs_day"))
      .agg(sumDec(col("l_quantity")).as("qty"))
    resampleInterpolate(obs, "k", "obs_day", "qty", span = 60)
      .select(col("k").as("l_suppkey"), col("tick").as("day"),
        col("prev_tick"), col("next_tick"), col("value"))
  }

  val q184InterpolateSql: String =
    """WITH obs AS (
      |  SELECT l_suppkey AS k,
      |    datediff('day', DATE '1992-01-01',
      |             CAST(l_shipdate AS DATE))::BIGINT AS obs_day,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS qty
      |  FROM lineitem GROUP BY 1, 2),
      |b AS (SELECT MIN(obs_day) AS d0 FROM obs),
      |grid AS (
      |  SELECT k.k, b.d0 + g.x AS day
      |  FROM (SELECT DISTINCT k FROM obs) k
      |  CROSS JOIN b
      |  CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS x) g),
      |comb AS (
      |  SELECT k, day AS ts, 0 AS tag,
      |    NULL::BIGINT AS od, NULL::DOUBLE AS v FROM grid
      |  UNION ALL
      |  SELECT k, obs_day, 1, obs_day, qty FROM obs),
      |w AS (
      |  SELECT k, ts, tag,
      |    last_value(od IGNORE NULLS) OVER wb AS pd,
      |    last_value(v IGNORE NULLS) OVER wb AS pv,
      |    first_value(od IGNORE NULLS) OVER wf AS nd,
      |    first_value(v IGNORE NULLS) OVER wf AS nv
      |  FROM comb
      |  WINDOW wb AS (PARTITION BY k ORDER BY ts ASC, tag DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      |  wf AS (PARTITION BY k ORDER BY ts ASC, tag DESC
      |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      |SELECT k AS l_suppkey, ts AS day, pd AS prev_tick, nd AS next_tick,
      |  ROUND(CASE WHEN pd IS NULL THEN nv
      |             WHEN nd IS NULL THEN pv
      |             ELSE pv + (nv - pv) *
      |               (CAST(ts - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
      |        END, 6) AS value
      |FROM w WHERE tag = 0""".stripMargin

  // ---------------------------------------------------------------------
  // q168_conversion_latency — click→purchase latency percentiles per
  // user cohort: the attribution-latency panel, built BY COMPOSITION —
  // the backward as-of join supplies each purchase's last click, the
  // continuous-quantile machinery (q68b/q152) supplies per-cohort
  // boundaries without a corpus-sized value window. p50/p90 are
  // TOP-QUANTILE boundaries (max v with #(x ≥ v) ≥ ⌈n·q⌉ at q=0.5/0.1)
  // — positional picks of actual latencies, hash-exact; the oracle
  // mirrors the rule with DuckDB's own ASOF join + RANGE-frame windows.
  // ---------------------------------------------------------------------
  def q168ConversionLatency(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    // localCheckpoint: the quantile machinery evaluates its input three
    // times in SEPARATE jobs (range probe, bucket counts, boundary
    // slice), and here that input is a full as-of join — a shuffle+sort
    // of the event stream per evaluation (r14 lesson: pins pay exactly
    // when the duplication crosses job boundaries). The pinned state is
    // two narrow columns, one row per purchase — the §8 "lightweight
    // proxy" shape, never the event payload.
    val lat = AsOf.asofJoin(purchases, clicks, Seq("user_id"),
        "ts_us", "ts_us")
      .filter(col("asof").isNotNull)
      .select((col("user_id") % 5).as("cohort"),
        (col("ts_us") - col("asof.ts_us")).cast("double").as("lat"))
      .localCheckpoint()
    // both boundaries from ONE corpus pass (the multi-q variant), then
    // a conditional-agg pivot — no second scan, no self-join
    Curation.quantileThresholdsContinuousMulti(lat, "cohort", "lat",
        Seq(0.5, 0.1))
      .groupBy(col("cohort"))
      .agg(max(col("n")).as("n"),
        max(when(col("q") === 0.5, col("threshold"))).as("p50_us"),
        max(when(col("q") === 0.1, col("threshold"))).as("p90_us"))
  }

  val q168ConversionLatencySql: String =
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.user_id,
      |    CAST(epoch_us(p.ts) - epoch_us(cb.ts) AS DOUBLE) AS lat
      |  FROM p ASOF JOIN c cb
      |    ON p.user_id = cb.user_id AND p.ts >= cb.ts),
      |l AS (SELECT user_id % 5 AS cohort, lat FROM j),
      |r AS (
      |  SELECT cohort, lat,
      |    COUNT(*) OVER (PARTITION BY cohort ORDER BY lat DESC
      |      RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_ge,
      |    COUNT(*) OVER (PARTITION BY cohort) AS n
      |  FROM l)
      |SELECT cohort, CAST(MAX(n) AS BIGINT) AS n,
      |  MAX(lat) FILTER (WHERE cum_ge >= CEIL(n * 0.5)) AS p50_us,
      |  MAX(lat) FILTER (WHERE cum_ge >= CEIL(n * 0.1)) AS p90_us
      |FROM r GROUP BY cohort""".stripMargin

  // ---------------------------------------------------------------------
  // q148_ewma — per-key exponentially-weighted moving average of a metric
  // stream, the time-decayed "current level" feature (user engagement,
  // doc quality drift) every behavioral pipeline derives. s_1 = x_1;
  // s_t = (1−α)·s_{t−1} + α·x_t over the key's events in (tick, id)
  // order.
  //
  // Determinism is q92's discipline: the recursion is a LEFT-TO-RIGHT
  // fold over an explicitly totally-ordered list — a pure function of
  // the data on any partitioning — and DuckDB's `list_reduce` without an
  // initializer seeds from the first element exactly as this fold does
  // (seed = element 1, fold over the rest), with the identical
  // mul/mul/add shape per step, so the gate hashes the raw doubles. α is
  // chosen binary-exact in the gate (1/8) so `1−α` is the same double
  // both engines parse.
  //
  // Scale shape: one shuffle on the key; each list is ONE key's events
  // (bounded by per-entity activity, the natural bound sessionized data
  // has). For truly unbounded keys the recursion is still mergeable —
  // a segment of length m summarizes to (decay = (1−α)^m, contribution)
  // and segments compose associatively — so the q92 two-level bucket
  // decomposition applies verbatim; this single-level fold is the
  // per-entity case.
  // ---------------------------------------------------------------------
  def ewmaByKey(df: DataFrame, key: String, tick: String, id: String,
      value: String, alpha: Double): DataFrame = {
    val xs = df.groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(tick), col(id),
        col(value).cast("double").as("v")))).as("xs"),
        count(lit(1)).as("n_events"))
    xs.select(col(key), col("n_events"),
      aggregate(
        slice(col("xs"), lit(2), size(col("xs")) - 1),
        element_at(col("xs"), 1).getField("v"),
        (a, x) => a * lit(1.0 - alpha) + x.getField("v") * lit(alpha))
        .as("ewma"))
  }

  def q148Ewma(s: SparkSession, dir: String): DataFrame =
    ewmaByKey(graft.operators.t(s, dir, "events"),
      "user_id", "ts", "event_id", "value", alpha = 0.125)

  val q148EwmaSql: String =
    """SELECT user_id, COUNT(*) AS n_events,
      |  list_reduce(list(value ORDER BY ts, event_id),
      |    (a, b) -> a * 0.875 + b * 0.125) AS ewma
      |FROM events GROUP BY user_id""".stripMargin

  /** INTER-ARRIVAL profile — per-key gaps between consecutive events
    * (one lag window over the key-sorted stream, total order via the
    * id tiebreak), reduced to integer-exact evidence: gap count,
    * min/max gap, and the exact-ratio mean (micros are int64, so the
    * sum is exact and the mean is one division). The companion of
    * [[graft.operators.Stats.fanoFactor]]: Fano asks "bursty per
    * bucket?", this asks "how long between touches?". */
  def interArrival(events: DataFrame, key: String, tsUsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col(tsUsCol).asc, col(tiebreak).asc)
    val gaps = events
      .withColumn("__gap", col(tsUsCol) - lag(col(tsUsCol), 1).over(w))
      .filter(col("__gap").isNotNull)
    // the mean is emitted in SECONDS: at micros magnitude (~1e10) the
    // 6-dp ROUND itself diverges across engines (x·10⁶ leaves the
    // exact-double range), while seconds keep the rounded product
    // under 2^53 — the min/max stay exact int64 micros
    gaps.groupBy(col(key)).agg(
      count(lit(1)).as("n_gaps"),
      min(col("__gap")).as("min_gap_us"),
      max(col("__gap")).as("max_gap_us"),
      round(sum(col("__gap")).cast("double") /
        count(lit(1)).cast("double") / lit(1000000.0), 6)
        .as("mean_gap_s"))
  }

  // ---------------------------------------------------------------------
  // q206_interarrival — per-user inter-event gap profile over the
  // stream. Integer gap evidence plus the one-division mean.
  // ---------------------------------------------------------------------
  def q206InterArrival(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), tsUs(col("ts")).as("ts_us"))
    interArrival(e, "user_id", "ts_us", "event_id")
  }

  val q206InterArrivalSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS gap
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_gaps,
      |  MIN(gap) AS min_gap_us, MAX(gap) AS max_gap_us,
      |  ROUND(CAST(SUM(gap) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    / 1000000.0, 6) AS mean_gap_s
      |FROM g WHERE gap IS NOT NULL GROUP BY user_id""".stripMargin

  /** FIRST-TOUCH vs LAST-TOUCH attribution — the marketing-credit
    * comparison every funnel owner runs: within a lookback window
    * before each conversion, which click gets the credit under each
    * rule, per channel. The window join runs through
    * [[RangeJoin.pointInInterval]] (bucketed equi-join — the 100 TB
    * shape; a raw inequality join is the oracle's non-scalable
    * formulation, which is the point), then one min/max per conversion
    * with a (ts, id) total order. */
  def attributionCompare(purchases: DataFrame, clicks: DataFrame,
      lookbackUs: Long, bucketUs: Long,
      channel: org.apache.spark.sql.Column): DataFrame = {
    val intervals = purchases.select(col("user_id"),
      col("event_id").as("p_id"),
      (col("ts_us") - lookbackUs).as("lo"), col("ts_us").as("hi"))
    val points = clicks.select(col("user_id"),
      col("event_id").as("c_id"), col("ts_us").as("cts"),
      channel.as("channel"))
    val joined = RangeJoin.pointInInterval(points, intervals, "user_id",
      "cts", "lo", "hi", bucketUs)
    val perConv = joined.groupBy(col("p_id")).agg(
      min_by(col("channel"), struct(col("cts"), col("c_id")))
        .as("first_touch"),
      max_by(col("channel"), struct(col("cts"), col("c_id")))
        .as("last_touch"))
    val f = perConv.groupBy(col("first_touch").as("channel"))
      .agg(count(lit(1)).as("n_first_touch"))
    val l = perConv.groupBy(col("last_touch").as("channel"))
      .agg(count(lit(1)).as("n_last_touch"))
    f.join(l, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("n_first_touch"), lit(0L)).as("n_first_touch"),
        coalesce(col("n_last_touch"), lit(0L)).as("n_last_touch"))
  }

  // ---------------------------------------------------------------------
  // q207_attribution — per-channel first- vs last-touch credit for
  // purchases with a 24h click lookback (channel = click id % 3, a
  // deterministic stand-in). The oracle derives both credits with an
  // inequality join + ROW_NUMBER — same semantics, the non-scalable
  // plan.
  // ---------------------------------------------------------------------
  def q207Attribution(s: SparkSession, dir: String): DataFrame = {
    val (purchases, clicks) = purchasesAndClicks(s, dir)
    attributionCompare(purchases, clicks,
      lookbackUs = 24L * 3600 * 1000000, bucketUs = 6L * 3600 * 1000000,
      channel = concat(lit("ch"), (col("event_id") % 3).cast("string")))
  }

  val q207AttributionSql: String =
    """WITH p AS (
      |  SELECT event_id AS p_id, user_id, epoch_us(ts) AS pts
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (
      |  SELECT event_id AS c_id, user_id, epoch_us(ts) AS cts,
      |    'ch' || CAST(event_id % 3 AS VARCHAR) AS channel
      |  FROM events WHERE event_type = 'click'),
      |j AS (
      |  SELECT p.p_id, c.channel, c.cts, c.c_id,
      |    ROW_NUMBER() OVER (PARTITION BY p.p_id
      |      ORDER BY c.cts ASC, c.c_id ASC) AS rf,
      |    ROW_NUMBER() OVER (PARTITION BY p.p_id
      |      ORDER BY c.cts DESC, c.c_id DESC) AS rl
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c.cts >= p.pts - 86400000000 AND c.cts <= p.pts),
      |f AS (SELECT channel, COUNT(*) AS n_first_touch
      |      FROM j WHERE rf = 1 GROUP BY channel),
      |l AS (SELECT channel, COUNT(*) AS n_last_touch
      |      FROM j WHERE rl = 1 GROUP BY channel)
      |SELECT COALESCE(f.channel, l.channel) AS channel,
      |  COALESCE(f.n_first_touch, 0) AS n_first_touch,
      |  COALESCE(l.n_last_touch, 0) AS n_last_touch
      |FROM f FULL OUTER JOIN l ON f.channel = l.channel""".stripMargin

  // ---------------------------------------------------------------------
  // q211_session_conversion — the sessionized funnel readout: per
  // session-size bucket, how many sessions exist and what fraction
  // convert (contain a purchase). Pure composition over q25's session
  // machinery — one added flag aggregate; integer evidence plus one
  // exact-ratio division.
  // ---------------------------------------------------------------------
  def q211SessionConversion(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        tsUs(col("ts")).as("ts_us"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").asc, col("event_id").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gapUs = 1800L * 1000000L
    val sess = e.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(wRun))
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sess.groupBy(least(col("n_events"), lit(10L)).as("size_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"),
        round(sum(col("converted")).cast("double") /
          count(lit(1)).cast("double"), 6).as("conversion_rate"))
  }

  val q211SessionConversionSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us
      |  FROM events),
      |x AS (
      |  SELECT *, CASE WHEN LAG(ts_us) OVER w IS NULL
      |                   OR ts_us - LAG(ts_us) OVER w > 1800000000
      |                 THEN 1 ELSE 0 END AS new_sess
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us ASC,
      |    event_id ASC)),
      |y AS (
      |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
      |      ORDER BY ts_us ASC, event_id ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM x),
      |sess AS (
      |  SELECT user_id, sess_id, COUNT(*) AS n_events,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS converted
      |  FROM y GROUP BY user_id, sess_id)
      |SELECT LEAST(n_events, 10) AS size_bucket,
      |  COUNT(*) AS n_sessions,
      |  CAST(SUM(converted) AS BIGINT) AS n_converted,
      |  ROUND(CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
      |    6) AS conversion_rate
      |FROM sess GROUP BY LEAST(n_events, 10)""".stripMargin

}
