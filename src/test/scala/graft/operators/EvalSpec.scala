package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def rows(rs: (String, Long, Long, Long)*) =
    rs.toDF("q", "item", "score", "rel")

  test("ndcgAtK: perfect ranking scores 1; reversed ranking scores less") {
    // 3 items, rel 1/1/0; scores align with relevance
    val perfect = Eval.ndcgAtK(
      rows(("a", 1L, 30L, 1L), ("a", 2L, 20L, 1L), ("a", 3L, 10L, 0L)),
      "q", "item", "score", "rel", 3).head()
    assert(perfect.getAs[Double]("ndcg") == 1.0)
    // imperfect ranking: relevant items at ranks 1 and 3 (ideal: 1 and 2)
    val rev = Eval.ndcgAtK(
      rows(("a", 1L, 10L, 1L), ("a", 2L, 20L, 0L), ("a", 3L, 30L, 1L)),
      "q", "item", "score", "rel", 3).head()
    val dcg = 1.0 + 1.0 / 2.0                               // ranks 1, 3
    val idcg = 1.0 + 1.0 / (math.log(3.0) / math.log(2.0))  // ranks 1, 2
    assert(math.abs(rev.getAs[Double]("ndcg") - dcg / idcg) < 2e-6)
    assert(rev.getAs[Double]("ndcg") < 1.0)
  }

  test("ndcgAtK: the cut at k ignores relevance beyond position k") {
    // relevant item ranked at position 3 with k=2 contributes nothing
    val r = Eval.ndcgAtK(
      rows(("a", 1L, 30L, 0L), ("a", 2L, 20L, 0L), ("a", 3L, 10L, 1L)),
      "q", "item", "score", "rel", 2).head()
    assert(r.getAs[Double]("dcg") == 0.0)
    assert(r.getAs[Double]("idcg") == 1.0) // ideal puts it at rank 1
    assert(r.getAs[Double]("ndcg") == 0.0)
  }

  test("ndcgAtK: a query with no relevant item surfaces NULL ndcg") {
    val r = Eval.ndcgAtK(
      rows(("a", 1L, 30L, 0L), ("a", 2L, 20L, 0L)),
      "q", "item", "score", "rel", 2).head()
    assert(r.isNullAt(r.fieldIndex("ndcg")))
  }

  test("calibrationCurve: bin edges, 1.0 folds into the top bin, exact counts") {
    val df = Seq((0.0, 0L), (0.05, 0L), (0.1, 1L), (0.95, 1L), (1.0, 1L))
      .toDF("p", "y")
    val m = Eval.calibrationCurve(df, "p", "y", 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(m(0L) == ((2L, 0L)))   // 0.0 and 0.05
    assert(m(1L) == ((1L, 1L)))   // 0.1
    assert(m(9L) == ((2L, 2L)))   // 0.95 and the folded 1.0
  }

  test("calibrationCurve: mean_score is the exact decimal mean") {
    val df = Seq((0.91, 1L), (0.99, 0L)).toDF("p", "y")
    val r = Eval.calibrationCurve(df, "p", "y", 10).head()
    assert(r.getAs[Double]("mean_score") == 0.95)
    assert(r.getAs[Double]("frac_pos") == 0.5)
  }
}
