package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** PMI collocations, grouped OLS, chi-square cells, and the native
  * jaro_winkler expression — the scoring family added with
  * q130/q134/q135/q138. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  test("pmiCollocations ranks an always-together pair above a promiscuous one") {
    // "fleet week" always co-occur (5×); "the" pairs with everything
    val docs = Seq.tabulate(5)(i =>
      (i.toLong, s"fleet week the a$i the b$i"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 5, k = 5)
      .collect()
    assert(out.nonEmpty)
    val top = out.minBy(_.getInt(0))
    assert((top.getString(1), top.getString(2)) == (("fleet", "week")))
    // evidence columns are the exact counts
    assert(top.getLong(3) == 5L) // c12
  }

  test("pmiCollocations: min-support filter drops rare pairs") {
    val docs = Seq((1L, "rare pair"), (2L, "x y x y x y x y x y"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.pmiCollocations(docs, minCount = 3, k = 10)
      .collect()
    assert(!out.exists(r => r.getString(1) == "rare"))
  }

  test("groupOls recovers an exact line per group") {
    // group 1: y = 2x + 3 exactly; group 2: y = -x + 10
    val rows = (1 to 20).map(i => (1, i.toDouble, 2.0 * i + 3.0)) ++
      (1 to 20).map(i => (2, i.toDouble, -i.toDouble + 10.0))
    val out = Stats.groupOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect().map(r => (r.getInt(0),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1) == ((2.0, 3.0)))
    assert(out(2) == ((-1.0, 10.0)))
  }

  test("groupOls2 recovers an exact plane; the simple slope is biased") {
    // y = x + z exactly on correlated (x, z): the SIMPLE y~x slope
    // absorbs z's effect (5.0/2.8 = 1.785714...), the partial slopes
    // recover the true coefficients — the omitted-variable bias q134
    // cannot see, made visible
    val pts = Seq((0.0, 0.0), (1.0, 1.0), (2.0, 2.0), (1.0, 0.0),
      (2.0, 1.0))
    val rows = pts.map { case (x, z) => (1, x, z, x + z) }
    val df = rows.toDF("g", "x", "z", "y")
    val m = Stats.groupOls2(df, "g", "x", "z", "y").head()
    assert(m.getDouble(2) == 0.0) // intercept
    assert(m.getDouble(3) == 1.0) // b_x
    assert(m.getDouble(4) == 1.0) // c_z
    assert(m.getDouble(5) == 1.0) // exact plane → R² = 1
    val simple = Stats.groupOls(df, "g", "x", "y").head()
    assert(simple.getDouble(2) == 1.785714, "simple slope absorbs z")
  }

  test("groupOls2 drops collinear (singular) groups instead of dividing") {
    // group 1: z = 2x exactly (singular); group 2: well-posed
    val rows = Seq((1, 1.0, 2.0, 5.0), (1, 2.0, 4.0, 8.0),
      (1, 3.0, 6.0, 11.0),
      (2, 0.0, 0.0, 1.0), (2, 1.0, 0.0, 2.0), (2, 0.0, 1.0, 4.0),
      (2, 1.0, 1.0, 5.0))
    val out = Stats.groupOls2(rows.toDF("g", "x", "z", "y"),
      "g", "x", "z", "y")
      .collect().map(r => r.getInt(0)).toSet
    assert(out == Set(2))
  }

  test("groupOls drops zero-variance-x groups instead of dividing by zero") {
    val rows = Seq((1, 5.0, 1.0), (1, 5.0, 2.0), (2, 1.0, 1.0),
      (2, 2.0, 2.0))
    val out = Stats.groupOls(rows.toDF("g", "x", "y"), "g", "x", "y")
      .collect()
    assert(out.map(_.getInt(0)).toSet == Set(2))
  }

  test("chi2Cells: independent uniform table has zero contributions") {
    val rows = for { r <- Seq("a", "b"); c <- Seq("x", "y") }
      yield (r, c)
    val out = Stats.chi2Cells(rows.toDF("r", "c"), "r", "c").collect()
    assert(out.length == 4)
    out.foreach { row =>
      assert(row.getLong(2) == 1L)
      assert(row.getDouble(3) == 1.0) // expected
      assert(row.getDouble(4) == 0.0) // contribution
    }
  }

  test("chi2Cells: dependence shows up as positive contributions") {
    // r=a occurs only with c=x (8×); r=b only with c=y (2×)
    val rows = Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("b", "y"))
    val out = Stats.chi2Cells(rows.toDF("r", "c"), "r", "c")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    // E(a,x) = 8*8/10 = 6.4; contrib = (8-6.4)^2/6.4 = 0.4
    assert(out(("a", "x")) == ((8L, 6.4, 0.4)))
  }

  private def jw(a: String, b: String): Double =
    graft.functions.JaroWinklerImpl.similarity(
      UTF8String.fromString(a), UTF8String.fromString(b))

  test("jaro_winkler matches DuckDB's values on pinned cases") {
    // every constant below was read off duckdb 1.0.0's
    // jaro_winkler_similarity on this host
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-15)
    assert(math.abs(jw("kitten", "sitting") - 0.746031746031746) < 1e-15)
    // boost threshold: jaro = 2/3 <= 0.7 stays unboosted despite prefix 3
    assert(math.abs(jw("abcdef", "abcxyz") - 2.0 / 3.0) < 1e-15)
    // prefix bonus caps at 4 even with a 6-char common prefix
    assert(math.abs(jw("aaaaaaab", "aaaaaaba") - 0.975) < 1e-15)
    // odd out-of-order count halves by INTEGER division (3-cycle case)
    assert(math.abs(jw("abcyyyy", "cabyyyy") - 0.9523809523809524) < 1e-15)
    // window ⌊max/2⌋−1 = 0 blocks the adjacent transposition entirely
    assert(jw("ab", "ba") == 0.0)
    // DuckDB's empty-string convention is 0, including both-empty
    assert(jw("", "") == 0.0 && jw("abc", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
  }

  test("jaro_winkler expression evaluates under codegen and handles nulls") {
    graft.functions.JaroWinkler.register(spark)
    val out = Seq(("MARTHA", "MARHTA"), ("abc", null))
      .toDF("a", "b")
      .select(expr("jaro_winkler(a, b)").as("s")).collect()
    assert(math.abs(out(0).getDouble(0) - 0.9611111111111111) < 1e-15)
    assert(out(1).isNullAt(0))
  }

  test("q138 gate: rerank keeps exactly the edit-distance candidates") {
    val pairs = FuzzyJoin.q138JaroRerank(spark, sfDir)
    val base = FuzzyJoin.q117EditdistJoin(spark, sfDir)
    assert(pairs.count() == base.count())
    // scores are in [0, 1] and identical pairs score 1
    val rows = pairs.collect()
    assert(rows.forall(r => r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0))
  }

  test("cTfIdf: class-exclusive terms outrank corpus-wide ones; exact evidence") {
    import spark.implicits._
    val docs = Seq(
      ("A", "apple apple banana"),
      ("B", "carrot banana")
    ).toDF("source", "text")
    val got = TextAnalysis.cTfIdf(docs, "source", k = 5).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val byClass = got.groupBy(_._1)
    // apple is exclusive to A and twice as frequent there; banana is
    // corpus-wide — apple must rank first in A, carrot first in B
    assert(byClass("A").minBy(_._2)._3 == "apple")
    assert(byClass("B").minBy(_._2)._3 == "carrot")
    val apple = got.find(r => r._1 == "A" && r._3 == "apple").get
    assert(apple._4 == 2L && apple._5 == 2L) // tf_c=2, f_t=2
    val banana = got.find(r => r._1 == "A" && r._3 == "banana").get
    assert(banana._4 == 1L && banana._5 == 2L) // appears once per class
  }

  test("skipgramPmi: window pairs catch what adjacency misses; counts exact") {
    import spark.implicits._
    // 'a...b' co-occurs at distance 2 twice; no adjacent pair repeats
    val docs = Seq((1L, "a x b a y b")).toDF("doc_id", "text")
    val got = TextAnalysis.skipgramPmi(docs, window = 2, minCount = 2,
      k = 10).collect()
    assert(got.length == 1)
    val r = got.head
    assert((r.getString(1), r.getString(2), r.getLong(3)) == ("a", "b", 2L))
    // the adjacent-only extraction (q130 path) cannot see the pair
    assert(TextAnalysis.pmiCollocations(docs, minCount = 2, k = 10)
      .isEmpty)
  }

  test("ngramNovelty: counts gram occurrences unseen in the reference") {
    import spark.implicits._
    val ref = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b c d e x"),   // gram1 seen, gram2 novel
      (11L, "p q r s t"),     // single gram, novel
      (12L, "a b c")          // shorter than n -> no grams, no row
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(ref, docs, n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((10L, 2L, 1L), (11L, 1L, 1L)))
  }

  test("fleschReadingEase: hand-computed counts and score") {
    import spark.implicits._
    val df = Seq((1L, "The cat sat. The dog ran!")).toDF("id", "text")
    val r = TextAnalysis.fleschReadingEase(df, "text").head()
    // words: the,cat,sat,the,dog,ran = 6; sentences 2; vowel runs 6
    assert(r.getAs[Long]("n_words") == 6L)
    assert(r.getAs[Long]("n_sentences") == 2L)
    assert(r.getAs[Long]("n_syllables") == 6L)
    val exp = 206.835 - 1.015 * (6.0 / 2.0) - 84.6 * (6.0 / 6.0)
    assert(math.abs(r.getAs[Double]("flesch") - exp) < 1e-9)
  }

  test("fleschReadingEase: wordless text gets NULL score, sentences floor at 1") {
    import spark.implicits._
    val r = TextAnalysis.fleschReadingEase(
      Seq((1L, "123 456")).toDF("id", "text"), "text").head()
    assert(r.getAs[Long]("n_words") == 0L)
    assert(r.getAs[Long]("n_sentences") == 1L)
    assert(r.isNullAt(r.fieldIndex("flesch")))
  }

  test("umassCoherence: always-co-occurring terms beat never-co-occurring") {
    import spark.implicits._
    // group A: docs always contain both top terms; group B: never
    val docs = Seq(
      (1L, "A", "alpha beta"), (2L, "A", "alpha beta"),
      (3L, "A", "alpha beta"),
      (4L, "B", "gamma x"), (5L, "B", "gamma y"),
      (6L, "B", "delta z"), (7L, "B", "delta w"))
      .toDF("doc_id", "grp", "text")
    val m = TextAnalysis.umassCoherence(docs, "grp", "text", "doc_id", 2)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // A: pair (alpha,beta) co-occurs in all 3 docs: ln(4/3) > 0
    assert(math.abs(m("A") - math.log(4.0 / 3.0)) < 1e-6)
    // B: top terms delta,gamma never co-occur: ln(1/2) < 0
    assert(m("B") < 0.0)
    assert(m("A") > m("B"))
  }

  test("strataAdjustedDiff: hand means; one-sided strata drop from the ATE") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("s1", 1, 10.0), ("s1", 1, 14.0), ("s1", 0, 5.0), ("s1", 0, 7.0),
      ("s2", 1, 20.0), ("s2", 0, 10.0), ("s2", 0, 14.0),
      ("s3", 1, 99.0))                       // treated-only: no support
      .toDF("st", "t", "y")
    val rows = Stats.strataAdjustedDiff(df, "st", col("t") === 1, "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows("s1").getAs[Double]("diff") == 6.0)   // 12 - 6
    assert(rows("s2").getAs[Double]("diff") == 8.0)   // 20 - 12
    assert(rows("s3").isNullAt(rows("s3").fieldIndex("diff")))
    // ATE = (4*6 + 3*8) / 7 over the supported strata only
    val ate = rows("s1").getAs[Double]("ate")
    assert(ate == math.rint((4 * 6.0 + 3 * 8.0) / 7.0 * 1e6) / 1e6, ate)
  }

  test("vocabKl: a lexical outlier source scores higher than a typical one") {
    import spark.implicits._
    val docs = (
      Seq.fill(5)(("typ", "alpha beta gamma delta")) ++
      Seq.fill(5)(("typ2", "alpha beta gamma delta")) ++
      Seq.fill(5)(("odd", "zeta zeta zeta eta"))
    ).zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "src", "text")
    val m = TextAnalysis.vocabKl(docs, "src", "text", 6)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("odd") > m("typ"), m.toString)
    assert(m("typ") == m("typ2"), "identical sources must tie exactly")
    assert(m.values.forall(_ >= 0.0), "KL is nonnegative")
  }

  test("lexicalRichness: repeated text has low TTR, all-unique text high") {
    import spark.implicits._
    val docs = Seq(
      (1L, "rep", "the the the the cat"),
      (2L, "uniq", "alpha beta gamma delta")).toDF("doc_id", "src", "text")
    val m = TextAnalysis.lexicalRichness(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(m("rep") == ((5L, 2L, 1L, 0.4)))
    assert(m("uniq") == ((4L, 4L, 4L, 1.0)))
  }

  test("compression_ratio: redundancy orders ratios; deterministic; codegen") {
    import spark.implicits._
    graft.functions.CompressionRatio.register(spark)
    val df = Seq(
      (1L, "spam " * 200),
      (2L, (1 to 200).map(i => s"w${i * 7919}").mkString(" ")),
      (3L, "")).toDF("id", "text")
      .selectExpr("id", "compression_ratio(text) AS r")
    val m = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(m(1L) < 0.1, s"boilerplate must compress hard: ${m(1L)}")
    assert(m(2L) > m(1L) * 3, "varied text must compress far less")
    assert(m(3L) == 1.0, "empty input is ratio 1 by convention")
    // byte-deterministic across evaluations (thread-local deflater reuse)
    val again = df.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(again == m)
    // stays inside whole-stage codegen (no UDF boxing)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"))
  }
}
