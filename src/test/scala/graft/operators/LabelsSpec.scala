package graft.operators

import graft.SparkSpec

class LabelsSpec extends SparkSpec {
  import spark.implicits._

  test("majority vote picks the modal label; ties go to the smallest label") {
    val votes = Seq(
      (1L, "b"), (1L, "b"), (1L, "a"),            // clear winner b
      (2L, "z"), (2L, "a"),                        // tie -> a
      (3L, "only")                                 // singleton
    ).toDF("item", "label")
    val got = Labels.majorityVote(votes, "item", "label")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === Set(
      (1L, "b", 2L, 3L),
      (2L, "a", 1L, 2L),
      (3L, "only", 1L, 1L)))
  }

  test("result is partition-invariant") {
    val votes = (1 to 500).map(i => ((i % 17).toLong, s"l${i % 5}"))
      .toDF("item", "label")
    val a = Labels.majorityVote(votes, "item", "label").collect().toSet
    val b = Labels.majorityVote(votes.repartition(11), "item", "label")
      .collect().toSet
    assert(a === b)
  }

  test("cohenKappa: perfect agreement is 1; textbook 2x2 case is exact") {
    import org.apache.spark.sql.functions.col
    val perfect = Seq(("y", "y"), ("n", "n"), ("y", "y"))
      .toDF("a", "b")
    val k1 = Labels.cohenKappa(perfect, col("a"), col("b"))
      .collect().head
    assert(k1.getAs[Double]("po") == 1.0 &&
      k1.getAs[Double]("kappa") == 1.0)
    // classic confusion table: yes/yes=20, no/no=15, yes/no=10, no/yes=5
    // n=50, po=0.7; marginals A: yes 30 no 20, B: yes 25 no 25;
    // pe=(30*25+20*25)/2500=0.5; kappa=(0.7-0.5)/(1-0.5)=0.4
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(15)(("n", "n")) ++
      Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y"))
    val k2 = Labels.cohenKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .collect().head
    assert(k2.getAs[Long]("n_total") == 50L)
    assert(k2.getAs[Long]("n_agree") == 35L)
    assert(k2.getAs[Long]("chance_sum") == 1250L)
    assert(k2.getAs[Double]("po") == 0.7)
    assert(k2.getAs[Double]("pe") == 0.5)
    assert(k2.getAs[Double]("kappa") == 0.4)
  }

  test("cohenKappa: disjoint label spaces yield pe=0, kappa=po") {
    import org.apache.spark.sql.functions.col
    // raters never use a shared label — the chance join is empty and
    // must coalesce to 0, not NULL-poison the output row
    val rows = Seq(("x", "u"), ("y", "v"), ("x", "v")).toDF("a", "b")
    val k = Labels.cohenKappa(rows, col("a"), col("b")).collect().head
    assert(k.getAs[Long]("chance_sum") == 0L)
    assert(k.getAs[Double]("pe") == 0.0)
    assert(k.getAs[Double]("po") == 0.0 && k.getAs[Double]("kappa") == 0.0)
  }

  test("labelDiversity: uniform vs degenerate distributions; exact gini") {
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "a"), (1L, "b"),      // uniform over 2 labels
      (2L, "a"), (2L, "a"), (2L, "a"),         // one-note
      (3L, "a"), (3L, "a"), (3L, "b"), (3L, "c")) // skewed
      .toDF("g", "l")
    val got = Labels.labelDiversity(rows, "g", "l").collect()
      .map(r => r.getLong(0) -> ((r.getAs[Long]("n"),
        r.getAs[Long]("n_labels"), r.getAs[Double]("gini"),
        r.getAs[Double]("entropy")))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // fold runs left-to-right over label-sorted terms: ((0+ta)+tb)+tc
    def ent(ps: Seq[Double]) =
      r6(-ps.foldLeft(0.0)((a, p) => a + p * math.log(p)))
    assert(got(1L) == ((2L, 2L, 0.5, ent(Seq(0.5, 0.5)))))
    val d = got(2L)
    assert(d._3 == 0.0 && d._4 == 0.0, "degenerate: zero diversity")
    // gini = 1 - (4+1+1)/16 = 0.625
    assert(got(3L) == ((4L, 3L, 0.625, ent(Seq(0.5, 0.25, 0.25)))))
  }

  test("fleissKappa: textbook integers; short items drop, long ones truncate") {
    // items at n=2: item 1 = (a,a), item 2 = (a,b)
    // S = 4 + 2 = 6 -> pbar = (6-4)/(2*2*1) = 0.5
    // marginals a=3 b=1 -> T = 10 -> pe = 10/16 = 0.625
    // kappa = (0.5-0.625)/0.375 = -1/3
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (2L, 3L, "b"),          // third rating ignored (first-n truncation)
      (3L, 1L, "a")           // only one rating -> item dropped
    ).toDF("item", "rid", "lab")
    val r = Labels.fleissKappa(rows, "item", "lab", "rid", n = 2)
      .collect().head
    assert(r.getAs[Long]("n_items") == 2L)
    assert(r.getAs[Long]("s_sum") == 6L)
    assert(r.getAs[Long]("t_sum") == 10L)
    assert(r.getAs[Double]("pbar") == 0.5)
    assert(r.getAs[Double]("pe") == 0.625)
    assert(r.getAs[Double]("kappa") == -0.333333)
  }

  test("krippendorffAlpha: hand-computed nominal alpha with missing cells") {
    import spark.implicits._
    // item1 (x,x); item2 (x,y,y); item3 (y,y); item4 single rating drops
    val df = Seq(
      (1, "A", "x"), (1, "B", "x"),
      (2, "A", "x"), (2, "B", "y"), (2, "C", "y"),
      (3, "A", "y"), (3, "B", "y"),
      (4, "A", "x")).toDF("item", "rater", "lab")
    val r = Labels.krippendorffAlpha(df, "item", "rater", "lab", 3).head()
    // L = lcm(1,2) = 2; D'o = 2*(4-4)/1? no: item1 0, item2 (9-5)*1 = 4
    assert(r.getAs[Long]("n_items") == 3L)
    assert(r.getAs[Long]("n_ratings") == 7L)
    assert(r.getAs[Long]("do_scaled") == 4L)
    assert(r.getAs[Long]("de_num") == 24L)
    assert(r.getAs[Double]("alpha") == 0.5)
  }

  test("krippendorffAlpha: perfect agreement is 1; result partition-invariant") {
    import spark.implicits._
    val df = Seq(
      (1, "A", "x"), (1, "B", "x"), (2, "A", "y"), (2, "B", "y"),
      (2, "C", "y")).toDF("item", "rater", "lab")
    val r1 = Labels.krippendorffAlpha(df, "item", "rater", "lab", 4).head()
    val r2 = Labels.krippendorffAlpha(df.repartition(7), "item", "rater",
      "lab", 4).head()
    assert(r1.getAs[Double]("alpha") == 1.0)
    assert(r1 == r2)
  }

  test("krippendorffAlpha: duplicate (item, rater) collapses to min label") {
    import spark.implicits._
    val df = Seq(
      (1, "A", "z"), (1, "A", "x"), (1, "B", "x"),
      (2, "A", "y"), (2, "B", "y")).toDF("item", "rater", "lab")
    val r = Labels.krippendorffAlpha(df, "item", "rater", "lab", 2).head()
    // A's item-1 rating dedupes to x -> perfect agreement on both items
    assert(r.getAs[Long]("n_ratings") == 4L && r.getAs[Double]("alpha") == 1.0)
  }

  test("krippendorffAlpha: an item wider than maxRaters raises") {
    import spark.implicits._
    val df = Seq(
      (1, "A", "x"), (1, "B", "x"), (1, "C", "x"),
      (2, "A", "x"), (2, "B", "y")).toDF("item", "rater", "lab")
    val ex = intercept[Exception] {
      Labels.krippendorffAlpha(df, "item", "rater", "lab", 2).collect()
    }
    assert(ex.getMessage.contains("krippendorffAlpha") ||
      ex.getCause != null)
  }

  test("krippendorffAlpha: guard survives projecting alpha alone") {
    import spark.implicits._
    // the maxRaters guard must live in every emitted column that
    // depends on D'o — selecting alpha without do_scaled must NOT let
    // Catalyst prune the raise_error away
    val df = Seq(
      (1, "A", "x"), (1, "B", "x"), (1, "C", "x"),
      (2, "A", "x"), (2, "B", "y")).toDF("item", "rater", "lab")
    val ex = intercept[Exception] {
      Labels.krippendorffAlpha(df, "item", "rater", "lab", 2)
        .select("alpha").collect()
    }
    assert(ex.getMessage.contains("krippendorffAlpha") ||
      ex.getCause != null)
    // and the guarded alpha is numerically unchanged on valid input
    val ok = Seq(
      (1, "A", "x"), (1, "B", "x"),
      (2, "A", "x"), (2, "B", "y"), (2, "C", "y"),
      (3, "A", "y"), (3, "B", "y")).toDF("item", "rater", "lab")
    val r = Labels.krippendorffAlpha(ok, "item", "rater", "lab", 3).head()
    assert(r.getAs[Double]("alpha") == 0.5)
  }
}
