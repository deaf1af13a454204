package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  private def mk(rows: Seq[(Long, Long, Long)], names: (String, String, String)) = {
    import spark.implicits._
    rows.toDF(names._1, names._2, names._3)
  }

  test("backward as-of picks the latest right at-or-before, ties match") {
    val left = mk(Seq((1L, 1L, 100L), (2L, 1L, 200L), (3L, 2L, 50L)),
      ("l_id", "k", "ts"))
    val right = mk(Seq((10L, 1L, 100L), (11L, 1L, 150L), (12L, 1L, 250L)),
      ("r_id", "k", "ts"))
    val res = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select(col("l_id"), col("asof.r_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(res(1L) == 10L)   // tie at ts=100 matches
    assert(res(2L) == 11L)   // latest ≤ 200
    assert(res(3L) == -1L)   // key 2 has no rights → null
  }

  test("forward as-of picks the earliest right at-or-after") {
    val left = mk(Seq((1L, 1L, 100L), (2L, 1L, 260L)), ("l_id", "k", "ts"))
    val right = mk(Seq((10L, 1L, 100L), (11L, 1L, 150L), (12L, 1L, 250L)),
      ("r_id", "k", "ts"))
    val res = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts", forward = true)
      .select(col("l_id"), col("asof.r_id"))
      .collect().map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(res(1L) == 10L)   // tie matches forward too
    assert(res(2L) == -1L)   // nothing at-or-after 260
  }

  test("tolerance nulls out matches beyond the bound") {
    val left = mk(Seq((1L, 1L, 1000L)), ("l_id", "k", "ts"))
    val right = mk(Seq((10L, 1L, 100L)), ("r_id", "k", "ts"))
    val within = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts",
      toleranceUs = Some(1000L)).select(col("asof.r_id")).head()
    assert(within.getLong(0) == 10L)
    val beyond = AsOf.asofJoin(left, right, Seq("k"), "ts", "ts",
      toleranceUs = Some(100L)).select(col("asof.r_id")).head()
    assert(beyond.isNullAt(0))
  }

  test("operator agrees with the hand-rolled window formulation (q26)") {
    val viaOperator = {
      val e = graft.Tables.load(spark, sfDir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts").cast("timestamp")).as("ts_us"))
      val p = e.filter(col("event_type") === "purchase").drop("event_type")
      val c = e.filter(col("event_type") === "click").drop("event_type")
      AsOf.asofJoin(p, c, Seq("user_id"), "ts_us", "ts_us")
        .select(col("event_id"), col("asof.ts_us").as("last_click_us"))
        .collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
    }
    val viaWindow = EventTime.q26AsofJoin(spark, sfDir)
      .select(col("event_id"), col("last_click_us"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toSet
    assert(viaOperator == viaWindow)
  }

  test("nearest as-of: closer side wins, ties to backward, one shuffle") {
    val left = mk(Seq((1L, 1L, 10L), (2L, 1L, 100L), (3L, 1L, 200L),
      (4L, 2L, 5L)), ("l_id", "k", "ts"))
    val right = mk(Seq((10L, 1L, 8L), (11L, 1L, 11L), (12L, 1L, 104L),
      (13L, 1L, 96L), (14L, 1L, 200L)), ("r_id", "k", "ts"))
    val df = AsOf.asofNearest(left, right, Seq("k"), "ts", "ts")
    val res = df.select(col("l_id"), col("asof.r_id"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(res(1L) == 11L)   // gap 1 forward beats gap 2 backward
    assert(res(2L) == 13L)   // equal gaps (4) -> backward wins
    assert(res(3L) == 14L)   // exact ts hit, gap 0
    assert(res(4L) == -1L)   // key 2 has no rights
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllMatchIn(plan).length == 1,
      "both directions must come from one sorted window pass\n" +
        plan.take(1200))
  }

  test("nearest as-of honors the tolerance") {
    val left = mk(Seq((1L, 1L, 100L)), ("l_id", "k", "ts"))
    val right = mk(Seq((10L, 1L, 80L), (11L, 1L, 130L)), ("r_id", "k", "ts"))
    val res = AsOf.asofNearest(left, right, Seq("k"), "ts", "ts",
        toleranceUs = Some(10L))
      .select(col("asof.r_id")).collect().head
    assert(res.isNullAt(0), "nearest match (gap 20) is beyond tol 10")
  }
}
