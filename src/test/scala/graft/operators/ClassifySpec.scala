package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def train(rs: (String, String)*) = rs.toDF("lbl", "text")
  private def pred(rs: (Long, String)*) = rs.toDF("doc_id", "text")

  test("naiveBayesPredict: disjoint vocabularies classify perfectly") {
    val tr = train(("A", "x x y"), ("A", "y x"), ("B", "p q"), ("B", "q q p"))
    val pr = pred((1L, "x y x"), (2L, "q p"), (3L, "y"), (4L, "p"))
    val out = Classify.naiveBayesPredict(tr, pr, "lbl", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "A", 2L -> "B", 3L -> "A", 4L -> "B"))
  }

  test("naiveBayesScores: hand-computed add-one log-posterior") {
    // class A: tokens {x:2, y:1} t=3; class B: {p:1} t=1; V=3
    val tr = train(("A", "x x y"), ("B", "p"))
    val pr = pred((1L, "x p"))
    val s = Classify.naiveBayesScores(tr, pr, "lbl", "doc_id")
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val expA = math.log(0.5) +
      math.log(3.0 / 6.0) + math.log(1.0 / 6.0) // x: (2+1)/(3+3), p: (0+1)/(3+3)
    val expB = math.log(0.5) +
      math.log(1.0 / 4.0) + math.log(2.0 / 4.0) // x: (0+1)/(1+3), p: (1+1)/(1+3)
    assert(math.abs(s("A") - expA) < 1e-12)
    assert(math.abs(s("B") - expB) < 1e-12)
  }

  test("naiveBayesPredict: unseen token falls to the class floor; prior decides") {
    // A has 3 docs of 1 token, B has 1: score_l(z) = ln(prior_l) + ln(1/(t_l+V))
    // A: ln(3/4 · 1/5) = ln(0.15)  >  B: ln(1/4 · 1/3) = ln(0.0833)
    val tr = train(("A", "x"), ("A", "x"), ("A", "x"), ("B", "y"))
    val out = Classify.naiveBayesPredict(tr, pred((9L, "z")), "lbl", "doc_id")
      .head()
    assert(out.getString(1) == "A")
  }

  test("naiveBayesPredict: exact score ties break to the smaller class") {
    val tr = train(("B", "x"), ("A", "x"))
    val out = Classify.naiveBayesPredict(tr, pred((1L, "x")), "lbl", "doc_id")
      .head()
    assert(out.getString(1) == "A")
  }

  test("tokenClassMi: informative tokens outrank neutral ones; evidence exact") {
    // x marks class A (MI = ln 2), y marks B (ln 2), u is split (MI = 0),
    // z is in every doc (MI = 0). Ranking: x, y then the zero pair by tok.
    val df = Seq(
      ("A", 1L, "x u z"), ("A", 2L, "x z"),
      ("B", 3L, "y u z"), ("B", 4L, "y z")
    ).toDF("lbl", "doc_id", "text")
    val got = Classify.tokenClassMi(df, "lbl", "doc_id", 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    assert(got == List((1, "x", 2L), (2, "y", 2L), (3, "u", 2L), (4, "z", 4L)))
  }

  test("tokenClassMi counts doc-level PRESENCE, not token frequency") {
    // "x" repeated many times inside one B doc must not drown its
    // A-presence signal: presence counts are per-document.
    val df = Seq(
      ("A", 1L, "x"), ("A", 2L, "x"), ("A", 3L, "x"),
      ("B", 4L, "x x x x x x x x x x"), ("B", 5L, "w"), ("B", 6L, "w")
    ).toDF("lbl", "doc_id", "text")
    val got = Classify.tokenClassMi(df, "lbl", "doc_id", 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).toList
    // both tokens are informative; x present in 4 DOCS (3 A + 1 B)
    assert(got.toMap.apply("x") == 4L)
    assert(got.toMap.apply("w") == 2L)
  }

  test("tokenClassMi is partitioning-invariant (ordered fold)") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    def run(parts: Int) = Classify.tokenClassMi(
        d.repartition(parts), "lang", "doc_id", 15)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toList
    assert(run(1) == run(9))
  }

  test("naiveBayesScores property: bit-exact vs a local reference model") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val docGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d"))
      .map(_.mkString(" "))
    val trainGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("A", "B"), docGen)).map(_.take(6))
    val predGen = Gen.nonEmptyListOf(docGen).map(_.take(4))
    val prop = Prop.forAll(trainGen, predGen) { (tr, pr) =>
      // local reference mirroring the operator's exact float recipe:
      // add-one logp per sorted distinct token, left-to-right fold,
      // prior added last. NB: Spark's Ln expression evaluates via
      // StrictMath.log (FDLIBM), which differs from the Math.log
      // intrinsic by 1 ulp on some arguments — a bit-exact local
      // reference MUST call StrictMath.
      val classTok = tr.flatMap { case (l, t) => t.split(" ").map(l -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val classTot = classTok.groupBy(_._1._1).view
        .mapValues(_.values.sum).toMap
      val v = classTok.keySet.map(_._2).size.toDouble
      val nAll = tr.size.toDouble
      val prior = tr.groupBy(_._1).view
        .mapValues(d => StrictMath.log(d.size.toDouble / nAll)).toMap
      val labels = classTot.keySet.toList.sorted
      val expect = (for {
        (doc, i) <- pr.zipWithIndex
        lbl <- labels
      } yield {
        val counts = doc.split(" ").groupBy(identity).view
          .mapValues(_.length.toLong).toMap
        val fold = counts.keys.toList.sorted.foldLeft(0.0) { (acc, tok) =>
          val t = classTot(lbl).toDouble
          val lp = classTok.get((lbl, tok)) match {
            case Some(c) => StrictMath.log((c.toDouble + 1.0) / (t + v))
            case None    => StrictMath.log(1.0 / (t + v))
          }
          acc + counts(tok).toDouble * lp
        }
        (i.toLong, lbl) -> (prior(lbl) + fold)
      }).toMap
      val got = Classify.naiveBayesScores(
          tr.toDF("lbl", "text"),
          pr.zipWithIndex.map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text"),
          "lbl", "doc_id")
        .collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
      got == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("naiveBayesScores: ordered fold makes scores partitioning-invariant") {
    val d = graft.Tables.load(spark, sfDir, "documents")
    def run(parts: Int) = Classify.naiveBayesScores(
        d.select(col("lang"), col("text")).repartition(parts),
        d.select(col("doc_id"), col("text")).repartition(parts),
        "lang", "doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val a = run(1)
    val b = run(7)
    assert(a.size == b.size && a.forall { case (k, v) => b(k) == v })
  }
}
