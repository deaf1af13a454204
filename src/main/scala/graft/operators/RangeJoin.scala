package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join — with an equi-key plus time-bucketing so
  * it scales (SURVEY.md §2B joins row: "range/as-of").
  *
  * A naive `l.join(r, key && point between lo and hi)` forces Spark into a
  * per-key nested loop; fine when the equi-key is selective, quadratic when
  * it isn't. The bucketed formulation chops each interval into fixed-width
  * time buckets, joins on (key, bucket) — a plain hash join — and
  * re-applies the exact range predicate. Cost: |R| × avg_buckets_per_
  * interval replicated rows, pair work bounded per bucket. This is the
  * standard interval-join of the streaming engines, batch-shaped.
  */
object RangeJoin {

  /** Join points (`pointUs` in `left`) to intervals (`[loUs, hiUs]` in
    * `right`) sharing `key`. `bucketUs` should be ≥ the typical interval
    * width. Returns matched pairs (inner join). */
  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      key: String,
      pointUs: String,
      loUs: String,
      hiUs: String,
      bucketUs: Long): DataFrame = {
    val lb = left.withColumn("__bucket", (col(pointUs) / bucketUs).cast("long"))
    val rb = right.withColumn("__bucket",
      explode(sequence((col(loUs) / bucketUs).cast("long"),
        (col(hiUs) / bucketUs).cast("long"))))
    lb.join(rb, Seq(key, "__bucket"))
      .filter(col(pointUs) >= col(loUs) && col(pointUs) <= col(hiUs))
      .drop("__bucket")
  }

  // ---------------------------------------------------------------------
  // q55_range_join — events joined to the sessions they fall inside
  // (sessions derived per q25's gap logic): for each user's sessions,
  // count the OTHER event types landing within the session interval.
  // Oracle: plain inequality join in DuckDB — same result, different
  // (non-scalable) plan, which is exactly the point.
  // ---------------------------------------------------------------------
  def q55RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val sessions = EventTime.q25Sessionize(s, dir)
      .select(col("user_id"), col("sess_id"), col("start_us"), col("end_us"))
      .filter(col("n_events") >= 2)
    val errors = graft.Tables.load(s, dir, "events")
      .filter(col("event_type") === "error")
      .select(col("user_id"),
        unix_micros(col("ts").cast("timestamp")).as("ts_us"))
    pointInInterval(errors, sessions, "user_id", "ts_us",
        "start_us", "end_us", bucketUs = 3600L * 1000000L)
      .groupBy(col("user_id"), col("sess_id"))
      .agg(count(lit(1)).as("n_errors_in_session"))
  }

  val q55RangeJoinSql: String =
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
      |  FROM x),
      |sessions AS (
      |  SELECT user_id, sess_id, MIN(ts_us) AS start_us, MAX(ts_us) AS end_us
      |  FROM y GROUP BY user_id, sess_id HAVING COUNT(*) >= 2),
      |errors AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us FROM events
      |  WHERE event_type = 'error')
      |SELECT s.user_id AS user_id, s.sess_id AS sess_id,
      |  COUNT(*) AS n_errors_in_session
      |FROM errors er JOIN sessions s
      |  ON er.user_id = s.user_id
      | AND er.ts_us >= s.start_us AND er.ts_us <= s.end_us
      |GROUP BY s.user_id, s.sess_id""".stripMargin
}
