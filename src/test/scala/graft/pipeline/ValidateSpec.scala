package graft.pipeline

import graft.SparkSpec
import graft.pipeline.Validate.RowRule
import org.apache.spark.sql.functions._

class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("rowChecks: one scan, NULL predicate results count as violations") {
    val df = Seq(
      (Some(1), Some("ok")), (None, Some("ok")),
      (Some(3), None), (Some(-4), Some("bad"))
    ).toDF("k", "v")
    val asMap = Validate.rowChecks(df, Seq(
        RowRule("k.not_null", col("k").isNotNull),
        RowRule("k.positive", col("k") > 0),       // NULL k -> violation
        RowRule("v.accepted", col("v").isin("ok")) // NULL v -> violation
      ))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getBoolean(2))))
      .toMap
    assert(asMap.size === 3)
    assert(asMap("k.not_null") === ((1L, false)))
    assert(asMap("k.positive") === ((2L, false))) // null + negative
    assert(asMap("v.accepted") === ((2L, false))) // null + 'bad'
  }

  test("rowChecks: clean table passes every rule") {
    val df = Seq((1, "ok"), (2, "ok")).toDF("k", "v")
    val rows = Validate.rowChecks(df, Seq(
        RowRule("k.not_null", col("k").isNotNull)))
      .collect()
    assert(rows.length === 1 && rows(0).getLong(1) === 0L
      && rows(0).getBoolean(2))
  }

  test("uniqueCheck counts duplicate and NULL keys as violations") {
    val df = Seq(Some(1), Some(1), Some(2), None).toDF("k")
    val r = Validate.uniqueCheck(df, "k.unique", "k").collect()(0)
    // 4 rows, 2 distinct non-null keys -> 2 violations (dup + null)
    assert(r.getLong(1) === 2L && !r.getBoolean(2))
  }

  test("fkCheck finds orphans, passes NULL child keys") {
    val child = Seq(Some(1), Some(2), Some(99), None).toDF("fk")
    val parent = Seq(1, 2, 3).toDF("pk")
    val r = Validate.fkCheck(child, "fk", parent, "pk", "fk.ok").collect()(0)
    assert(r.getLong(1) === 1L && !r.getBoolean(2)) // only the 99 orphan
  }

  test("calendarGaps: planted holes named exactly; complete keys emit nothing") {
    import spark.implicits._
    val daily = Seq(
      ("a", 10L), ("a", 11L), ("a", 13L), ("a", 15L),  // missing 12, 14
      ("b", 5L), ("b", 6L), ("b", 7L))                 // complete
      .toDF("k", "day")
    val m = Validate.calendarGaps(daily, "k", "day").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(m("a") == ((6L, 4L, 2L, 12L)))
    assert(!m.contains("b"), "complete series must emit no audit row")
  }

  test("monotonicCheck: counts regressions with the first offending position") {
    import spark.implicits._
    val df = Seq(
      ("u", 1L, 10L), ("u", 2L, 20L), ("u", 3L, 15L), ("u", 4L, 30L),
      ("v", 1L, 1L), ("v", 2L, 2L))
      .toDF("k", "ord", "v")
    val m = Validate.monotonicCheck(df, "k", "ord", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3))))).toMap
    assert(m("u") == ((4L, 1L, Some(3L))))
    assert(m("v") == ((2L, 0L, None)))
  }
}
