package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
}
