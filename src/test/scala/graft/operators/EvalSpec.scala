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

  /** Rows reproducing a per-bin (n, pos) profile for 10 bins: n rows at
    * p = (bin + 0.5)/10, pos of them labeled 1. */
  private def binsToRows(profile: Seq[(Int, Int, Int)]) =
    profile.flatMap { case (bin, n, pos) =>
      (0 until n).map(i => ((bin + 0.5) / 10.0, if (i < pos) 1L else 0L))
    }.toDF("p", "y").withColumn("g", lit("g"))

  /** Reference PAV: left-to-right pool-adjacent-violators stack with
    * integer block sums (one exact division per final block). */
  private def pavLocal(profile: Seq[(Int, Int, Int)]): Map[Int, Double] = {
    case class Block(bins: List[Int], n: Long, pos: Long) {
      def mean: Double = pos.toDouble / n.toDouble
    }
    var stack = List.empty[Block]
    profile.sortBy(_._1).foreach { case (b, n, pos) =>
      var cur = Block(List(b), n.toLong, pos.toLong)
      while (stack.nonEmpty && stack.head.mean >= cur.mean) {
        val prev = stack.head
        stack = stack.tail
        cur = Block(prev.bins ++ cur.bins, prev.n + cur.n, prev.pos + cur.pos)
      }
      stack = cur :: stack
    }
    stack.flatMap(blk => blk.bins.map(_ -> blk.mean)).toMap
  }

  test("isotonicCalibration: hand case pools the violating middle bins") {
    // bin means 0.2, 0.8, 0.4, 1.0 → PAV pools bins 1-2 to (4+2)/10=0.6
    val prof = Seq((0, 5, 1), (1, 5, 4), (2, 5, 2), (3, 5, 5))
    val got = Eval.isotonicCalibration(binsToRows(prof), "g", "p", "y", 10)
      .collect().map(r => r.getLong(1).toInt -> r.getDouble(4)).toMap
    assert(got == Map(0 -> 0.2, 1 -> 0.6, 2 -> 0.6, 3 -> 1.0))
  }

  test("isotonicCalibration property: equals the sequential PAV stack bit-exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val profGen = Gen.chooseNum(2, 8).flatMap(nb =>
      Gen.sequence[Seq[(Int, Int, Int)], (Int, Int, Int)](
        (0 until nb).map(b => Gen.chooseNum(1, 5).flatMap(n =>
          Gen.chooseNum(0, n).map(pos => (b, n, pos))))))
    val prop = Prop.forAll(profGen) { prof =>
      val got = Eval.isotonicCalibration(binsToRows(prof), "g", "p", "y", 10)
        .collect().map(r => r.getLong(1).toInt -> r.getDouble(4)).toMap
      val expect = pavLocal(prof)
      val monotone = got.toList.sortBy(_._1).map(_._2)
        .sliding(2).forall(w => w.size < 2 || w(0) <= w(1))
      // pooled blocks preserve the total positive mass
      val mass = prof.map { case (b, n, _) => got(b) * n }.sum
      got == expect && monotone &&
        math.abs(mass - prof.map(_._3).sum) < 1e-9
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  private def aucRows(rs: (String, Long, Long)*) =
    rs.toDF("g", "score", "y")

  test("rocAuc: perfect separation is 1, inverted is 0, constant score is 0.5") {
    val r = Eval.rocAuc(aucRows(
        ("up", 1L, 0L), ("up", 2L, 0L), ("up", 3L, 1L), ("up", 4L, 1L),
        ("dn", 1L, 1L), ("dn", 2L, 1L), ("dn", 3L, 0L), ("dn", 4L, 0L),
        ("tie", 7L, 0L), ("tie", 7L, 1L), ("tie", 7L, 0L), ("tie", 7L, 1L)),
      "g", "score", "y").collect()
      .map(x => x.getString(0) -> x.getAs[Double]("auc")).toMap
    assert(r("up") == 1.0)
    assert(r("dn") == 0.0)
    assert(r("tie") == 0.5)
  }

  test("rocAuc: tie blocks take average ranks (hand-computed)") {
    // scores [1,1,2,3], labels [1,0,0,1]: avg ranks 1.5/1.5/3/4,
    // sum of positive ranks = 5.5, AUC = (5.5 - 3) / (2*2) = 0.625
    val r = Eval.rocAuc(aucRows(
        ("a", 1L, 1L), ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 1L)),
      "g", "score", "y").head()
    assert(r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getAs[Double]("auc") == 0.625)
  }

  test("rocAuc: a one-class group surfaces NULL, not a number") {
    val r = Eval.rocAuc(aucRows(("a", 1L, 1L), ("a", 2L, 1L)),
      "g", "score", "y").head()
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("rocAuc property: equals the brute-force pairwise definition") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val rowGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0L, 6L), Gen.oneOf(0L, 1L)))
    val prop = Prop.forAll(rowGen) { rows =>
      val nPos = rows.count(_._2 == 1L)
      val nNeg = rows.size - nPos
      (nPos == 0 || nNeg == 0) || {
        // brute force: P(score_pos > score_neg) + 0.5·P(tie) — sums of
        // halves are exact in double, and a/b == (2a)/(2b) in IEEE, so
        // the operator's integer-rank form must match BIT-exactly
        val pos = rows.filter(_._2 == 1L).map(_._1)
        val neg = rows.filter(_._2 == 0L).map(_._1)
        val raw = pos.map(p => neg.map(n =>
          if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum).sum /
          (nPos.toDouble * nNeg.toDouble)
        val expect = new java.math.BigDecimal(raw)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val got = Eval.rocAuc(
            rows.map { case (s, y) => ("g", s, y) }.toDF("g", "score", "y"),
            "g", "score", "y")
          .head().getAs[Double]("auc")
        got == expect
      }
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("rocAuc: integer rank algebra is partitioning-invariant") {
    val base = (1 to 500).map(i =>
      ("g" + (i % 3), (i * 37 % 101).toLong, (i % 5 min 1).toLong))
    def run(parts: Int) = Eval.rocAuc(
        base.toDF("g", "score", "y").repartition(parts), "g", "score", "y")
      .collect().map(x => x.getString(0) -> x.getAs[Double]("auc")).toMap
    val a = run(1)
    assert(a == run(8))
  }
}
