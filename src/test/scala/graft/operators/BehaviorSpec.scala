package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String)*) =
    rows.toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp_ntz").as("ts"),
        col("event_type"))

  private def evId(rows: (Long, Long, String, String)*) =
    rows.toDF("event_id", "user_id", "ts_s", "event_type")
      .select(col("event_id"), col("user_id"),
        col("ts_s").cast("timestamp_ntz").as("ts"), col("event_type"))

  test("markov attribution: hand-computed removal effects on an acyclic chain") {
    // journeys (one day each): u1 click→purchase, u2 click→(null),
    // u3 view→purchase. Chain: START→click 2/3, START→view 1/3;
    // click→CONV 1/2, click→NULL 1/2; view→CONV 1.
    // p_base = 2/3·1/2 + 1/3 = 2/3; removing either channel leaves 1/3
    // → RE = 1/2 each, shares 1/2 each.
    val e = evId(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (2L, 1L, "2024-01-01 10:05:00", "purchase"),
      (3L, 2L, "2024-01-01 11:00:00", "click"),
      (4L, 3L, "2024-01-01 12:00:00", "view"),
      (5L, 3L, "2024-01-01 12:30:00", "purchase"))
    val got = Behavior.markovRemovalAttribution(e, "user_id", "ts",
        "event_type", "event_id", "purchase", horizon = 24)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == Set("click", "view"))
    assert(got("click")._1 == 2L && got("view")._1 == 1L)
    assert(math.abs(got("click")._2 - 0.5) < 1e-9)
    assert(math.abs(got("view")._2 - 0.5) < 1e-9)
    assert(math.abs(got("click")._3 - 0.5) < 1e-9)
    assert(math.abs(got("view")._3 - 0.5) < 1e-9)
  }

  test("markov attribution: journeys cut at the FIRST conversion; post-conv touches ignored") {
    // u1's post-purchase error touch must appear nowhere (not a touch,
    // not a transition); removing click still kills the only conversion
    val e = evId(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (2L, 1L, "2024-01-01 10:05:00", "purchase"),
      (3L, 1L, "2024-01-01 10:10:00", "error"))
    val got = Behavior.markovRemovalAttribution(e, "user_id", "ts",
        "event_type", "event_id", "purchase", horizon = 24)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set("click"), s"got $got")
    assert(got("click") == ((1L, 1.0)))
  }

  test("markov attribution: cyclic chains stay bounded; shares sum to 1") {
    // click↔view loop with occasional conversion — value iteration over
    // a cyclic chain must produce effects in [0, 1] and normalized shares
    val e = evId(
      (1L, 1L, "2024-01-01 10:00:00", "click"),
      (2L, 1L, "2024-01-01 10:01:00", "view"),
      (3L, 1L, "2024-01-01 10:02:00", "click"),
      (4L, 1L, "2024-01-01 10:03:00", "view"),
      (5L, 1L, "2024-01-01 10:04:00", "purchase"),
      (6L, 2L, "2024-01-01 10:00:00", "view"),
      (7L, 2L, "2024-01-01 10:01:00", "click"),
      (8L, 3L, "2024-01-01 10:00:00", "click"),
      (9L, 3L, "2024-01-01 10:01:00", "purchase"))
    val rows = Behavior.markovRemovalAttribution(e, "user_id", "ts",
        "event_type", "event_id", "purchase", horizon = 24)
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getDouble(3)))
    assert(rows.forall { case (_, re, _) => re >= 0.0 && re <= 1.0 },
      rows.mkString(","))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-6)
  }

  test("funnel: strict temporal order, per-step survivor counts") {
    // u1: full ordered chain; u2: purchase BEFORE click (only step 1);
    // u3: no view at all (counted nowhere); u4: click at the exact view
    // timestamp (strict > drops it at step 2)
    val e = ev(
      (1L, "2024-01-01 10:00:00", "view"),
      (1L, "2024-01-01 10:05:00", "click"),
      (1L, "2024-01-01 10:10:00", "purchase"),
      (2L, "2024-01-01 09:00:00", "view"),
      (2L, "2024-01-01 09:30:00", "purchase"),
      (3L, "2024-01-01 08:00:00", "click"),
      (3L, "2024-01-01 08:10:00", "purchase"),
      (4L, "2024-01-01 07:00:00", "view"),
      (4L, "2024-01-01 07:00:00", "click"))
    val got = Behavior
      .funnel(e, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("step", "users").as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("funnel: later same-type events can satisfy a step the earliest missed") {
    // u5's first click precedes its view; the SECOND click (after the
    // view) must carry it through step 2
    val e = ev(
      (5L, "2024-01-01 10:00:00", "click"),
      (5L, "2024-01-01 11:00:00", "view"),
      (5L, "2024-01-01 12:00:00", "click"))
    val got = Behavior
      .funnel(e, "user_id", "ts", "event_type", Seq("view", "click"))
      .select("step", "users").as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 1L, 2 -> 1L))
  }

  test("retention: cohort by first-event week, offsets in weeks") {
    // 2024-01-01 is a Monday. uA cohort w0, active w0 + w2; uB cohort
    // w0, active w0 only; uC cohort w1, active w1.
    val e = ev(
      (10L, "2024-01-02 10:00:00", "view"),
      (10L, "2024-01-16 10:00:00", "view"),
      (11L, "2024-01-03 10:00:00", "view"),
      (12L, "2024-01-09 10:00:00", "view"))
    val got = Behavior.retentionCohorts(e, "user_id", "ts")
      .as[(String, Int, Long)].collect().toSet
    assert(got === Set(
      ("2024-01-01", 0, 2L), ("2024-01-01", 2, 1L),
      ("2024-01-08", 0, 1L)))
  }

  test("topPaths orders within user-day and counts identical trajectories") {
    import spark.implicits._
    def ts(day: Int, min: Int) =
      new java.sql.Timestamp((day * 1440L + min) * 60000L)
    val ev = Seq(
      // two user-days with the same path view>click
      (1L, 1L, ts(1, 10), "view"), (2L, 1L, ts(1, 20), "click"),
      (3L, 2L, ts(1, 5), "view"), (4L, 2L, ts(1, 6), "click"),
      // one user-day with view only
      (5L, 3L, ts(1, 1), "view"),
      // same user, different day → separate trajectory
      (6L, 1L, ts(2, 1), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Behavior.topPaths(ev, "user_id", "ts", "event_type",
        "event_id", k = 10)
      .select("path", "n_sessions").as[(String, Long)].collect().toMap
    assert(got == Map("view>click" -> 2L, "view" -> 1L, "purchase" -> 1L))
  }

  test("topPaths: out-of-order arrival does not change the path string") {
    import spark.implicits._
    def ts(min: Int) = new java.sql.Timestamp(1440L * 60000L + min * 60000L)
    val inOrder = Seq(
      (1L, 1L, ts(1), "a"), (2L, 1L, ts(2), "b"), (3L, 1L, ts(3), "c"))
    val shuffled = inOrder.reverse
    def run(rows: Seq[(Long, Long, java.sql.Timestamp, String)]) =
      Behavior.topPaths(rows.toDF("event_id", "user_id", "ts", "event_type"),
          "user_id", "ts", "event_type", "event_id", k = 5)
        .select("path").as[String].collect().toSeq
    assert(run(inOrder) == Seq("a>b>c"))
    assert(run(shuffled) == Seq("a>b>c"))
  }

  test("kmSurvival: hand-computed curve; censored users stay at risk") {
    import spark.implicits._
    // deaths at t=1 (risk 5), t=2 (risk 4), t=3 (risk 2);
    // censored at t=2 and t=4 — they raise the risk sets but never
    // drop the curve. S(1)=0.8, S(2)=0.8*0.75=0.6, S(4)=0.6*0.5=0.3
    val lt = Seq(("c", 1L, true), ("c", 2L, true), ("c", 2L, false),
      ("c", 3L, true), ("c", 4L, false)).toDF("g", "t", "churned")
    val got = Behavior.kmSurvival(lt, "g", "t", "churned", Seq(1, 2, 4))
      .collect().map(r => r.getInt(1) -> ((r.getAs[Long]("n_users"),
        r.getAs[Long]("d_cum"), r.getAs[Double]("survival")))).toMap
    assert(got(1) == ((5L, 1L, 0.8)))
    assert(got(2) == ((5L, 2L, 0.6)))
    assert(got(4) == ((5L, 3L, 0.3)))
    // counting censored users as churned instead would give S(4) =
    // (1-1/5)(1-2/4)(1-1/2)(1-1/1) = 0 — the bias censoring exists
    // to avoid; assert we did NOT do that
    assert(got(4)._3 > 0.0)
  }

  test("timeDecayScore: exact dyadic halving per whole week of age") {
    import spark.implicits._
    val df = Seq(
      (1L, "2024-01-15 00:00:00", 8.0, 1L),   // horizon day: weight 1
      (1L, "2024-01-08 00:00:00", 8.0, 2L),   // 7 days old: 1/2
      (1L, "2024-01-01 00:00:00", 8.0, 3L),   // 14 days: 1/4
      (2L, "2024-01-14 00:00:00", 5.0, 4L))   // 1 day old: week 0
      .toDF("user_id", "s", "value", "event_id")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val m = Behavior.timeDecayScore(df, "user_id", "ts", "value",
        "event_id").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(m(1L) == ((3L, 8.0 + 4.0 + 2.0)))
    assert(m(2L) == ((1L, 5.0)))
  }

  test("seasonalNaiveError: hand-computed MAE/RMSE; unmatched days drop") {
    import spark.implicits._
    // days 0..8 for one key; season 2 -> pairs (2,0),(3,1),...,(8,6)
    val df = (0L to 8L).map(d => ("k", d, d.toDouble * d))
      .toDF("g", "day", "v")
    val r = Behavior.seasonalNaiveError(df, "g", "day", "v", 2).head()
    val diffs = (2L to 8L).map(d => (d * d - (d - 2) * (d - 2)).toDouble)
    assert(r.getAs[Long]("n_days") == 7L)
    assert(r.getAs[Double]("mae") ==
      math.rint(diffs.map(math.abs).sum / 7.0 * 1e6) / 1e6)
    assert(math.abs(r.getAs[Double]("rmse") -
      math.sqrt(diffs.map(x => x * x).sum / 7.0)) < 1e-6)
  }

  test("cohortLtv: cumulative revenue accumulates within the cohort only") {
    import spark.implicits._
    val e = Seq(
      (1L, "2024-01-01 10:00:00", 10.0), (1L, "2024-01-09 10:00:00", 5.0),
      (2L, "2024-01-09 10:00:00", 7.0))
      .toDF("user_id", "s", "value")
      .withColumn("ts", col("s").cast("timestamp_ntz")).drop("s")
    val rows = Behavior.cohortLtv(e, "user_id", "ts", "value").collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // user 1: cohort week of Jan 1; offset 0 rev 10, offset 1 rev 5 cum 15
    assert(rows(("2024-01-01", 0)) == ((1L, 10.0, 10.0)))
    assert(rows(("2024-01-01", 1)) == ((1L, 5.0, 15.0)))
    // user 2's own cohort week starts fresh
    assert(rows(("2024-01-08", 0)) == ((1L, 7.0, 7.0)))
  }

  test("rfmSegments: planted heavy users land in the 3/3/3 cell") {
    import spark.implicits._
    // 3 users: u1 recent+frequent+big, u2 40 days stale + rare + small,
    // u3 10 days stale, middling (gaps must span DAYS — recency is in
    // whole days)
    val day = 86400000000L
    val h = 100L * day
    val rows =
      (1 to 9).map(i => (1L, h - 9 + i, 100.0)) ++
      Seq((2L, h - 40L * day, 1.0)) ++
      (1 to 3).map(i => (3L, h - 10L * day + i, 10.0))
    val e = rows.toDF("user_id", "ts_us", "value")
    val m = Behavior.rfmSegments(e, "user_id", "ts_us", "value")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)) ->
        r.getLong(3)).toMap
    assert(m.values.sum == 3L)
    // recency threshold 40 (top third), freq 9, monetary 900
    assert(m == Map((3, 3, 3) -> 1L, (1, 1, 1) -> 1L, (3, 1, 1) -> 1L),
      m.toString)
  }
}
