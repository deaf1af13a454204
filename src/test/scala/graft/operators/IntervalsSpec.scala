package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def cov(rows: Seq[(Int, Long, Long, Int)]) =
    Intervals.coverage(
      rows.toDF("k", "start", "end", "id"), "k", "start", "end", Seq("id"))
      .collect().map(r => (r.getInt(0),
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("disjoint intervals sum lengths; islands counted") {
    val m = cov(Seq((1, 0L, 2L, 1), (1, 5L, 7L, 2)))
    assert(m(1) == ((4L, 2L, 2L)))
  }

  test("overlapping intervals merge; covered counts once") {
    // [0,4) ∪ [2,6) = [0,6) → 6
    val m = cov(Seq((1, 0L, 4L, 1), (1, 2L, 6L, 2)))
    assert(m(1) == ((6L, 1L, 2L)))
  }

  test("adjacent half-open intervals merge into one island") {
    // [1,3) ∪ [3,5) → [1,5), no gap between them
    val m = cov(Seq((1, 1L, 3L, 1), (1, 3L, 5L, 2)))
    assert(m(1) == ((4L, 1L, 2L)))
  }

  test("contained interval adds nothing") {
    val m = cov(Seq((1, 0L, 10L, 1), (1, 3L, 5L, 2)))
    assert(m(1) == ((10L, 1L, 2L)))
  }

  test("an early long interval bridges later short ones (prefix max, not lag)") {
    // [0,10) then [2,3) then [4,12): naive lag(end) would see 3 < 4 and
    // split — the prefix MAX keeps 10 and merges everything
    val m = cov(Seq((1, 0L, 10L, 1), (1, 2L, 3L, 2), (1, 4L, 12L, 3)))
    assert(m(1) == ((12L, 1L, 3L)))
  }

  test("keys are independent") {
    val m = cov(Seq((1, 0L, 2L, 1), (2, 0L, 5L, 2), (2, 9L, 10L, 3)))
    assert(m(1) == ((2L, 1L, 1L)) && m(2) == ((6L, 2L, 2L)))
  }

  test("equal-start ties are deterministic under any input order") {
    val rows = Seq((1, 0L, 2L, 1), (1, 0L, 8L, 2), (1, 3L, 4L, 3))
    assert(cov(rows) == cov(rows.reverse))
    assert(cov(rows)(1) == ((8L, 1L, 3L)))
  }

  test("q131 gate shape: positive coverage, islands <= intervals") {
    val out = Intervals.q131IntervalCoverage(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert(r.getLong(2) <= r.getLong(3))
    }
  }
}
