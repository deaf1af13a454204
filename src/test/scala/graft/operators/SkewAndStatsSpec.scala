package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.RollingHash

class SkewAndStatsSpec extends SparkSpec {

  test("salted join equals plain join (correctness invariance under salting)") {
    val li = graft.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = SkewJoin.saltedInnerJoin(li, o, "l_orderkey", 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    // skewed left: one key with 10k rows
    val left = (1 to 10000).map(i => (1L, i)).toDF("k", "v")
    val right = Seq((1L, "hot")).toDF("k", "name")
    val parts = SkewJoin.saltedInnerJoin(left, right, "k", 8)
      .rdd.getNumPartitions
    assert(parts > 1)
    assert(SkewJoin.saltedInnerJoin(left, right, "k", 8).count() == 10000L)
  }

  test("skew evidence is NULL-aware: a mostly-NULL probe side with " +
      "flat non-null keys selects the plain join; empty / all-null " +
      "sides don't crash and never salt") {
    import spark.implicits._
    // 60% NULL-keyed, non-null keys perfectly flat (10 rows each):
    // counting the NULL group as a key would read max_n=6000 vs mean
    // ~545 → "skew 11×"; with 150 flat keys at threshold 16 it stays
    // plain either way, so make the null mass extreme enough that the
    // null-counting bug WOULD flip it: 6000 nulls vs 100 keys × 10.
    val probe = ((1 to 6000).map(_ => (None: Option[Long], 1)) ++
      (1 to 1000).map(i => (Some((i % 100).toLong), 1))).toDF("k", "v")
    val st = SkewJoin.chooseSkewStrategy(probe, "k")
    assert(!st.useSalting && st.nKeys == 100L && st.nRows == 1000L &&
      st.maxN == 10L,
      s"NULL keys must not count as skew evidence: $st")
    // inner-join output identity is unaffected either way (nulls never
    // match), so the selector's only job here is cost — and the plain
    // plan is the cheap one
    val dim = (0L to 99L).map(k => (k, k * 2)).toDF("k", "w")
    assert(SkewJoin.innerJoinAuto(probe, dim, "k").count() == 1000L)
    // empty left: evidence is all-zero, no NPE, plain join, empty out
    val empty = Seq.empty[(Option[Long], Int)].toDF("k", "v")
    val stE = SkewJoin.chooseSkewStrategy(empty, "k")
    assert(stE == SkewJoin.SkewStrategy(0L, 0L, 0L, 0.0,
      useSalting = false))
    assert(SkewJoin.innerJoinAuto(empty, dim, "k").count() == 0L)
    // all-NULL left behaves like empty
    val allNull = (1 to 50).map(_ => (None: Option[Long], 1)).toDF("k", "v")
    assert(SkewJoin.chooseSkewStrategy(allNull, "k") ==
      SkewJoin.SkewStrategy(0L, 0L, 0L, 0.0, useSalting = false))
    assert(SkewJoin.innerJoinAuto(allNull, dim, "k").count() == 0L)
  }

  test("rolling_hash windows match a direct per-window recompute") {
    RollingHash.register(spark)
    import spark.implicits._
    val s = "the quick brown fox jumps"
    val k = 5
    val got = Seq(s).toDF("t")
      .select(expr(s"rolling_hash(t, $k)")).as[Seq[Long]].head()
    val B = 1000003L
    val want = (0 to s.length - k).map { i =>
      s.substring(i, i + k).getBytes("UTF-8")
        .foldLeft(0L)((h, b) => h * B + (b & 0xFF))
    }
    assert(got == want)
    // shorter-than-k input → empty
    val empty = Seq("ab").toDF("t")
      .select(expr(s"rolling_hash(t, $k)")).as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("winnowing fingerprints overlap heavily for near-dup docs") {
    RollingHash.register(spark)
    import spark.implicits._
    val doc = "the fast key order sort table scan merge part window " * 4
    val edited = doc.replaceFirst("order", "merge")
    def fps(text: String): Set[Long] = {
      val kg = Seq(text).toDF("t")
        .select(expr("rolling_hash(t, 8)")).as[Seq[Long]].head()
      kg.sliding(16).map(_.min).toSet
    }
    val a = fps(doc)
    val b = fps(edited)
    val jac = (a & b).size.toDouble / (a | b).size
    assert(jac > 0.5, s"winnow overlap $jac too low for a 1-word edit")
  }

  test("winnow_min equals a direct sliding-window minimum") {
    graft.functions.WinnowMinFn.register(spark)
    import spark.implicits._
    val arr = Seq(5L, 3L, 8L, 3L, 9L, 1L, 7L, 7L, 2L)
    val w = 3
    val got = Seq(Tuple1(arr)).toDF("a")
      .select(expr(s"winnow_min(a, $w)")).as[Seq[Long]].head()
    val direct = arr.sliding(w).map(_.min).toSeq
    // expression emits consecutive-deduped minima; same distinct content,
    // order-preserved subsequence
    assert(got.toSet == direct.toSet)
    assert(got == direct.foldLeft(Vector.empty[Long])(
      (acc, m) => if (acc.nonEmpty && acc.last == m) acc else acc :+ m))
    // degenerate windows
    val whole = Seq(Tuple1(Seq(4L, 2L, 6L))).toDF("a")
      .select(expr("winnow_min(a, 10)")).as[Seq[Long]].head()
    assert(whole == Seq(2L))
    val empty = Seq(Tuple1(Seq.empty[Long])).toDF("a")
      .select(expr("winnow_min(a, 3)")).as[Seq[Long]].head()
    assert(empty.isEmpty)
  }

  test("approx_count_distinct stays within 5% of exact") {
    // the query now emits its tolerance verdict directly (the oracle
    // asserts the same boolean as TRUE)
    val rows = Stats.q54ApproxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_5pct"),
        s"HLL++ out of contract for ${r.getAs[String]("l_returnflag")}: " +
          s"exact=${r.getAs[Long]("exact_parts")}")
    }
  }

  test("quantile sketch gate: exact median is a data value, sketch in contract") {
    val rows = Stats.q76QuantileGate(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val orders = graft.Tables.load(spark, sfDir, "orders")
    val vals = orders.select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val k = r.getAs[String]("o_orderpriority")
      val m = r.getAs[Double]("exact_median")
      assert(vals(k).contains(m), s"$k: median $m is not a data value")
      val need = math.ceil(vals(k).length * 0.5).toLong
      assert(vals(k).count(_ >= m) >= need)
      assert(r.getAs[Boolean]("within_5pct"), s"$k: sketch out of contract")
    }
  }
  test("Misra-Gries: superset guarantee, error bound, merge-order invariance") {
    val mg = new graft.functions.MisraGries(8)
    // adversarial stream: two heavy items among 50 light ones
    val stream = (Seq.fill(40)("heavy1") ++ Seq.fill(25)("heavy2") ++
      (1 to 50).flatMap(i => Seq.fill(2)(s"light$i"))).toVector
    val n = stream.length
    val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // sequential reduce (finish compresses the working buffer to ≤ k,
    // as Spark does on the single-partition path)
    val seqSummary = mg.finish(stream.foldLeft(mg.zero)(mg.reduce))
    // arbitrary merge tree over chunked partials (the partial+final path)
    val merged = mg.finish(stream.grouped(13)
      .map(_.foldLeft(mg.zero)(mg.reduce))
      .reduce(mg.merge))
    for (summary <- Seq(seqSummary, merged)) {
      assert(summary.size <= 8)
      // anything with true count > n/(k+1) must be present
      truth.filter(_._2 > n / 9).keys.foreach(w =>
        assert(summary.contains(w), s"$w missing from $summary"))
      // credits never overcount and undercount by at most n/(k+1)
      summary.foreach { case (w, c) =>
        assert(c <= truth(w), s"$w overcounted: $c > ${truth(w)}")
        assert(truth(w) - c <= n / 9 + 1, s"$w undercut past the bound")
      }
    }
  }

  test("q79: two-pass heavy hitters equals the naive exact GROUP BY") {
    val rows = TextAnalysis.q79HeavyHitters(spark, sfDir).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("n_occurrences"))
      .toMap
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val counts = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val tot = counts.map(_._2).sum
    val expected = counts.filter { case (_, c) => c * 100 > tot }.toMap
    assert(rows == expected)
  }

  test("profile: nulls, distincts, and NUMERIC min/max order, one pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 9 vs 10 catches string-ordered min/max ("10" < "9" lexically)
    val df = Seq(
      (Some(9L), Some("b")), (Some(10L), Some("a")),
      (None, Some("a")), (Some(10L), None)
    ).toDF("k", "s")
    val r = Stats.profile(df, Seq("k", "s"), exactDistinct = true)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3),
          x.getString(4), x.getString(5))).toMap
    assert(r("k") === ((4L, 1L, 2L, "9", "10")))
    assert(r("s") === ((4L, 1L, 2L, "a", "b")))
    // the production (sketch) variant returns the same shape and exact
    // null/min/max; only n_distinct is approximate
    val a = Stats.profile(df, Seq("k"), exactDistinct = false)
      .collect().head
    assert(a.getString(4) == "9" && a.getString(5) == "10")
    assert(a.getLong(3) >= 1L)
  }
  test("unicode_norm: composes/decomposes per form, ASCII passes through, matches the JDK") {
    graft.functions.UnicodeNormalize.register(spark)
    import spark.implicits._
    // decomposed e+U+0301, A+U+030A, compatibility ligature U+FB01 (fi),
    // fullwidth digit U+FF11 (1), plus plain ASCII
    val decomposed = "pre\u0301fix A\u030A \ufb01le \uff111 ok"
    val rows = Seq(decomposed, "plain ascii only", "", "caf\u00e9").toDF("t")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = rows.select(expr(s"unicode_norm(t, '$form')")).as[String].collect()
      val want = Seq(decomposed, "plain ascii only", "", "caf\u00e9").map(s =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
      assert(got.toSeq == want, s"$form mismatch")
      // idempotence: normalizing twice is a fixpoint
      val twice = rows
        .select(expr(s"unicode_norm(unicode_norm(t, '$form'), '$form')"))
        .as[String].collect()
      assert(twice.toSeq == want, s"$form not idempotent")
    }
    // NFC composes the combining marks; NFKC additionally folds
    // compatibility chars (ligature fi -> "fi", fullwidth 1 -> "1")
    val nfc = rows.select(expr("unicode_norm(t, 'NFC')")).as[String].head()
    assert(nfc == "pr\u00e9fix \u00c5 \ufb01le \uff111 ok")
    val nfkc = rows.select(expr("unicode_norm(t, 'NFKC')")).as[String].head()
    assert(nfkc == "pr\u00e9fix \u00c5 file 11 ok")
    // NULL propagates
    val n = Seq(Option.empty[String]).toDF("t")
      .select(expr("unicode_norm(t, 'NFC')")).collect()
    assert(n(0).isNullAt(0))
  }

  test("zscore outliers: planted outlier flagged, z matches host arithmetic") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0),
      ("a", 4L, 10.0), ("a", 5L, 100.0),
      ("b", 6L, 5.0), ("b", 7L, 5.0), ("b", 8L, 5.0))
      .toDF("g", "id", "x")
    val got = Stats.zscoreOutliers(df, "g", "x", "id", threshold = 1.5)
      .as[(String, Long, Double)].collect()
    // group a: n=5, sum=140, sumsq=10400; var=(10400-140*140/5)/4=1620
    val std = math.sqrt((10400.0 - 140.0 * 140.0 / 5.0) / 4.0)
    val zExp = BigDecimal((100.0 - 140.0 / 5.0) / std)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.toSeq === Seq(("a", 5L, zExp)))
    // group b: zero variance -> std 0 -> z NULL/NaN filtered out, no rows
    assert(!got.exists(_._1 == "b"))
  }

  test("welchTTest: hand-derived t and Welch-Satterthwaite df") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (Seq(1.0, 2.0, 3.0).map(("s1", "A", _)) ++
      Seq(2.0, 4.0, 6.0).map(("s1", "B", _)) ++
      Seq(5.0).map(("s2", "A", _)) ++          // n=1 arm -> stratum drops
      Seq(5.0, 6.0).map(("s2", "B", _)) ++
      Seq(7.0, 7.0).map(("s3", "A", _)) ++     // zero variance both arms
      Seq(9.0, 9.0).map(("s3", "B", _)))
      .toDF("g", "arm", "x")
    val got = Stats.welchTTest(df, "g", col("arm"), "A", "B", col("x"))
      .collect()
    assert(got.length == 1 && got.head.getString(0) == "s1",
      "s2 (n=1 arm) and s3 (se2=0) must drop")
    val r = got.head
    // A=[1,2,3]: mean 2, var 1; B=[2,4,6]: mean 4, var 4
    val se2 = 1.0 / 3.0 + 4.0 / 3.0
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 3L)
    assert(r.getAs[Double]("mean_a") == 2.0 &&
      r.getAs[Double]("mean_b") == 4.0)
    assert(r.getAs[Double]("t_stat") == r6((2.0 - 4.0) / math.sqrt(se2)))
    val dfExp = se2 * se2 /
      ((1.0 / 3.0) * (1.0 / 3.0) / 2.0 + (4.0 / 3.0) * (4.0 / 3.0) / 2.0)
    assert(r.getAs[Double]("df_w") == r6(dfExp))
  }

  test("medianMad: positional median and MAD on odd and even groups") {
    import spark.implicits._
    val df = (Seq(1.0, 3.0, 5.0, 7.0, 9.0).map(("odd", _)) ++
      Seq(1.0, 2.0, 3.0, 4.0).map(("even", _)))
      .toDF("g", "x")
    val got = Stats.medianMad(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n"),
        r.getAs[Double]("median"), r.getAs[Double]("mad"))).toSet
    // odd: median 5, |x-5|=[4,2,0,2,4] -> positional median 2
    // even (upper-median rule, need=ceil(4*.5)=2 counted from the top):
    // median 3, |x-3|=[2,1,0,1] -> mad 1
    assert(got == Set(("odd", 5L, 5.0, 2.0), ("even", 4L, 3.0, 1.0)))
  }

  test("mannWhitney: hand-computed U and tie-corrected z") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // no ties: A=[1,2] B=[3,4] -> ranks 1,2,3,4; R1=3, U1=0
    val clean = Seq(("s", "A", 1.0), ("s", "A", 2.0),
      ("s", "B", 3.0), ("s", "B", 4.0)).toDF("g", "arm", "x")
    val r1 = Stats.mannWhitney(clean, "g", col("arm"), "A", "B", col("x"))
      .collect().head
    assert(r1.getAs[Long]("two_u1") == 0L)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getAs[Double]("z") ==
      r6((0.0 - 2.0) / math.sqrt(4.0 / 12.0 * 5.0)))
    // tie block of 3 at x=1: avg rank 2 -> R1=4, U1=1; ties term 24
    // sig2 = 4/12 * (5 - 24/12) = 1 -> z = (1-2)/1 = -1
    val tied = Seq(("s", "A", 1.0), ("s", "A", 1.0),
      ("s", "B", 1.0), ("s", "B", 2.0)).toDF("g", "arm", "x")
    val r2 = Stats.mannWhitney(tied, "g", col("arm"), "A", "B", col("x"))
      .collect().head
    assert(r2.getAs[Long]("n1") == 2L && r2.getAs[Long]("n2") == 2L)
    assert(r2.getAs[Long]("two_u1") == 2L)
    assert(r2.getAs[Double]("z") == -1.0)
    // all values tied -> sig2 = 0 -> stratum drops instead of NaN
    val flat = Seq(("s", "A", 5.0), ("s", "B", 5.0)).toDF("g", "arm", "x")
    assert(Stats.mannWhitney(flat, "g", col("arm"), "A", "B", col("x"))
      .isEmpty)
  }

  test("ksTest: hand ECDF distance, deterministic witness, zero for identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // A=[1,2] B=[2,3]: |F1-F2| numerators over x: 2,2,0 -> max 2 at x=1
    val df = Seq(("s", "A", 1.0), ("s", "A", 2.0),
      ("s", "B", 2.0), ("s", "B", 3.0)).toDF("g", "arm", "x")
    val r = Stats.ksTest(df, "g", col("arm"), "A", "B", col("x"))
      .collect().head
    assert(r.getAs[Long]("d_num") == 2L)
    assert(r.getAs[Double]("d_at") == 1.0, "ties take the smallest x")
    assert(r.getAs[Double]("ks_d") == 0.5)
    // identical samples -> D = 0
    val same = Seq(("s", "A", 1.0), ("s", "A", 2.0),
      ("s", "B", 1.0), ("s", "B", 2.0)).toDF("g", "arm", "x")
    val r2 = Stats.ksTest(same, "g", col("arm"), "A", "B", col("x"))
      .collect().head
    assert(r2.getAs[Long]("d_num") == 0L && r2.getAs[Double]("ks_d") == 0.0)
  }

  test("medianMad is partition-invariant (exact doubles)") {
    import spark.implicits._
    val df = (1 to 400)
      .map(i => (s"g${i % 3}", (i * 37 % 101).toDouble / 4.0))
      .toDF("g", "x")
    val a = Stats.medianMad(df, "g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3))).toSet
    val b = Stats.medianMad(df.repartition(13), "g", "x").collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getDouble(3))).toSet
    assert(a == b)
  }

  test("acf: linear series has lag-k autocorrelation exactly 1 after rounding") {
    import spark.implicits._
    val df = (1 to 50).map(i => ("g", i, i.toDouble)).toDF("g", "t", "x")
    val r = Stats.acf(df, "g", Seq(col("t").asc), "x", 3)
      .collect().map(x => x.getInt(1) -> ((x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r(1) == ((49L, 1.0)) && r(2) == ((48L, 1.0)) && r(3) == ((47L, 1.0)))
  }

  test("acf: alternating series has lag-1 acf -1, lag-2 acf +1") {
    import spark.implicits._
    val df = (1 to 40).map(i => ("g", i, if (i % 2 == 0) 1.0 else -1.0))
      .toDF("g", "t", "x")
    val r = Stats.acf(df, "g", Seq(col("t").asc), "x", 2)
      .collect().map(x => x.getInt(1) -> x.getDouble(3)).toMap
    assert(r(1) == -1.0 && r(2) == 1.0)
  }

  test("acf: series shorter than lag+1 emits no row for that lag") {
    import spark.implicits._
    val df = Seq(("g", 1, 5.0), ("g", 2, 7.0)).toDF("g", "t", "x")
    val lags = Stats.acf(df, "g", Seq(col("t").asc), "x", 3)
      .collect().map(_.getInt(1)).toSet
    assert(lags == Set(1))
  }

  test("benford: digit extraction handles magnitudes, sign, zero and null") {
    import spark.implicits._
    val df = Seq[java.lang.Double](123.4, 0.00456, -7.2, 0.0, null, 987.0)
      .toDF("x")
    val m = Stats.benford(df, "x").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("1" -> 1L, "4" -> 1L, "7" -> 1L, "9" -> 1L))
  }

  test("benford: expected counts follow log10(1+1/d) and sum to n") {
    import spark.implicits._
    val df = (1 to 900).map(i => i.toDouble).toDF("x")
    val rows = Stats.benford(df, "x").collect()
    val n = rows.map(_.getLong(1)).sum
    assert(n == 900L)
    val exp = rows.map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(exp("1") - 900.0 * math.log10(2.0)) < 0.001)
  }

  test("joinFanout: the product of per-side counts, top-k by fanout") {
    import spark.implicits._
    val l = Seq(1, 1, 1, 2, 3).map(k => (k, "x")).toDF("k", "v")
    val r = Seq(1, 1, 2, 2, 2).map(k => (k, "y")).toDF("k", "v")
    val rows = SkewJoin.joinFanout(l, r, "k", 10).collect()
      .map(x => x.getInt(1) -> ((x.getLong(2), x.getLong(3),
        x.getLong(4)))).toMap
    assert(rows(1) == ((3L, 2L, 6L)))
    assert(rows(2) == ((1L, 3L, 3L)))
    assert(!rows.contains(3), "keys absent from one side cannot fan out")
  }

  test("zipfFit: an exact power law recovers its slope with r2 = 1") {
    import spark.implicits._
    // corpus where the r-th word appears floor(1000/r) times, r = 1..20
    // — near-exact Zipf; slope must sit close to -1 with high r2.
    // Letter-only words: the tokenizer splits on non-letters.
    val words = (1 to 20).flatMap(r =>
      Seq.fill(1000 / r)("w" + ('a' + r - 1).toChar.toString * 2))
    val docs = Seq(words.mkString(" ")).toDF("text")
    val row = TextAnalysis.zipfFit(docs, "text", 20).head()
    assert(row.getAs[Long]("n_terms") == 20L)
    assert(math.abs(row.getAs[Double]("slope") + 1.0) < 0.02,
      row.getAs[Double]("slope"))
    assert(row.getAs[Double]("r2") > 0.999)
  }

  test("qqTable: positional quantiles per cohort follow the top-count rule") {
    import spark.implicits._
    val df = (1 to 10).map(i => ("a", i.toDouble)).toDF("c", "v")
    val r = Stats.qqTable(df, "c", "v", Seq(0.5, 0.1)).head()
    // top-rule: max v with #(x >= v) >= ceil(10q): q=.5 -> 6, q=.1 -> 10
    assert(r.getAs[Double]("p50") == 6.0)
    assert(r.getAs[Double]("p90") == 10.0)
    assert(r.getAs[Long]("n") == 10L)
  }

  test("giniByGroup: uniform values score 0; total concentration nears 1") {
    import spark.implicits._
    val uni = (1 to 8).map(i => ("u", 5.0, i)).toDF("g", "v", "id")
    assert(Stats.giniByGroup(uni, "g", "v", "id").head()
      .getAs[Double]("gini") == 0.0)
    val conc = (("c", 1000.0, 0) +: (1 to 9).map(i => ("c", 0.0, i)))
      .toDF("g", "v", "id")
    // one holder of all mass among n=10: G = (n-1)/n = 0.9
    assert(Stats.giniByGroup(conc, "g", "v", "id").head()
      .getAs[Double]("gini") == 0.9)
  }

  test("fanoFactor: constant arrivals 0; planted burst raises it above 1") {
    import spark.implicits._
    val steady = (1 to 6).map(d => ("u1", d)).toDF("k", "b")
    val f1 = Stats.fanoFactor(steady, "k", col("b") % 3).head()
    assert(f1.getAs[Double]("fano") == 0.0)   // 2 events in each of 3 buckets
    val bursty = (Seq.fill(9)(("u2", 1)) :+ (("u2", 2))).toDF("k", "b")
    val f2 = Stats.fanoFactor(bursty, "k", col("b")).head()
    // counts (9, 1): mean 5, var 32 -> fano 6.4
    assert(f2.getAs[Double]("fano") == 6.4)
  }

  test("skyline2D: dominance semantics on hand points, ties both kept") {
    import spark.implicits._
    val pts = Seq(
      ("g", 5L, 10L, 1L),  // front
      ("g", 5L, 7L, 2L),   // dominated by (5,10) at equal x
      ("g", 7L, 6L, 3L),   // front (higher x, lower y)
      ("g", 3L, 10L, 4L),  // dominated by (5,10)
      ("g", 7L, 6L, 5L),   // exact tie of id 3: both stay
      ("g", 1L, 12L, 6L))  // front (highest y)
      .toDF("grp", "x", "y", "id")
    val got = Relational.skyline2D(pts, "grp", "x", "y", "id")
      .collect().map(_.getLong(3)).toSet
    assert(got == Set(1L, 3L, 5L, 6L), got)
  }

  test("degenerate groups surface NULL, never an ANSI division error") {
    import spark.implicits._
    // single-bucket key: Fano drops it (and must not raise pre-filter)
    val one = Seq(("solo", 1)).toDF("k", "b")
    assert(Stats.fanoFactor(one, "k", col("b")).collect().isEmpty)
    // all-zero mass: Gini and top-share are NULL
    val zeros = Seq(("z", 0.0, 1), ("z", 0.0, 2)).toDF("g", "v", "id")
    val gr = Stats.giniByGroup(zeros, "g", "v", "id").head()
    assert(gr.isNullAt(gr.fieldIndex("gini")))
    val ts = Stats.topShare(zeros.withColumnRenamed("v", "x"), "g", "x",
      0.5).head()
    assert(ts.isNullAt(ts.fieldIndex("top_share")))
  }

  test("rollingQuantile: trailing-window median follows the positional rule") {
    import spark.implicits._
    // days 0..5 values 10,20,30,40,50,60; window 3, q=0.5:
    // day 2 sees {10,20,30} -> top-rule median 20; day 5 {40,50,60} -> 50
    val daily = (0L to 5L).map(d => ("k", d, (d + 1) * 10.0))
      .toDF("g", "day", "v")
    val m = Stats.rollingQuantile(daily, "g", "day", "v", 3, 0.5)
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(m(0L) == ((1L, 10.0)))   // leading edge: only itself
    assert(m(2L) == ((3L, 20.0)))
    assert(m(5L) == ((3L, 50.0)))
  }

  test("seasonalityStrength: a pure weekday pattern explains all variance") {
    import spark.implicits._
    // value depends only on day % 7 -> residual SS 0 -> strength 1
    val daily = (0L to 27L).map(d => ("k", d, ((d % 7) + 1).toDouble))
      .toDF("g", "day", "v")
    val r = Stats.seasonalityStrength(daily, "g", "day", "v").head()
    assert(r.getAs[Double]("seasonality_strength") == 1.0)
    // constant series: zero total variance -> NULL
    val const = (0L to 13L).map(d => ("c", d, 5.0)).toDF("g", "day", "v")
    val c = Stats.seasonalityStrength(const, "g", "day", "v").head()
    assert(c.isNullAt(c.fieldIndex("seasonality_strength")))
  }

  test("bucketSkew: uniform ids spread; a constant key collapses to 1 bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val df = (1 to 640).map(_.toLong).toDF("id")
    val even = SkewJoin.bucketSkew(df, pmod(col("id"), lit(64L)), 64).head()
    assert(even.getAs[Long]("n_nonempty") == 64L)
    assert(even.getAs[Double]("skew_ratio") == 1.0)
    val hot = SkewJoin.bucketSkew(df, (col("id") - col("id")), 64).head()
    assert(hot.getAs[Long]("n_nonempty") == 1L)
    assert(hot.getAs[Double]("skew_ratio") == 64.0)
  }

  test("innerJoinAuto: uniform keys pick the plain join, a planted hot " +
      "key picks salting, and both paths produce identical output") {
    import spark.implicits._
    val uniform = (1L to 2000L).map(k => (k % 100, k)).toDF("k", "v")
    assert(!SkewJoin.chooseSkewStrategy(uniform, "k").useSalting,
      "flat keys must not pay the salt explode")
    // one key carries half the rows: 50x the mean share
    val hotLeft = ((1L to 1000L).map(_ => (0L, 1L)) ++
      (1L to 1000L).map(k => (k % 100 + 1, k))).toDF("k", "v")
    val st = SkewJoin.chooseSkewStrategy(hotLeft, "k")
    assert(st.useSalting && st.maxN == 1000L, s"$st")
    val dim = hotLeft.select(col("k")).distinct()
      .select(col("k"), (col("k") * 3).as("w"))
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.agg(count(lit(1)), sum(col("w")), sum(col("v"))).head().toSeq
    assert(agg(SkewJoin.innerJoinAuto(hotLeft, dim, "k")) ==
      agg(hotLeft.join(dim, Seq("k"))),
      "the salted path must be output-identical to the plain join")
  }

  test("chooseSkewStrategyFromCatalog reads the maintained histogram — " +
      "zero scan — and agrees with the scan-based selector on both a " +
      "hot-keyed and a flat table") {
    import spark.implicits._
    val db = "skstatdb"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def registered(name: String,
        df: org.apache.spark.sql.DataFrame): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"sks_$name").toString
      df.write.mode("overwrite").parquet(s"$dir/t")
      graft.operators.Stats.initProfileStore(spark, s"$dir/prof",
        spark.read.parquet(s"$dir/t"), Seq("k"), "b0",
        hists = Seq(graft.pipeline.Rollup.Hist("k", 1.0)))
      spark.sql(s"DROP TABLE IF EXISTS $db.$name")
      spark.sql(s"CREATE TABLE $db.$name USING PARQUET LOCATION '$dir/t'")
      graft.catalog.CatalogStats.pushFromProfileStore(spark, db, name,
        s"$dir/prof", Seq("k"), sizeInBytes = 4096L,
        hists = Seq(graft.pipeline.Rollup.Hist("k", 1.0)))
      s"$dir/t"
    }
    // half the rows on one key → salting
    val hotPath = registered("hot", ((1L to 1000L).map(_ => 0L) ++
      (1L to 1000L).map(_ % 100 + 1)).toDF("k"))
    val hot = SkewJoin.chooseSkewStrategyFromCatalog(spark, db, "hot", "k")
    assert(hot.useSalting, s"$hot")
    // the histogram-borne mass estimate is within a bin height of truth
    assert(math.abs(hot.maxN - 1000L) <= math.ceil(2000.0 / 64).toLong,
      s"$hot")
    assert(hot.useSalting == SkewJoin
      .chooseSkewStrategy(spark.read.parquet(hotPath), "k").useSalting)
    // flat keys → plain join, no scan either
    val flatPath = registered("flat",
      (1L to 2000L).map(_ % 100).toDF("k"))
    val flat =
      SkewJoin.chooseSkewStrategyFromCatalog(spark, db, "flat", "k")
    assert(!flat.useSalting, s"$flat")
    assert(flat.useSalting == SkewJoin
      .chooseSkewStrategy(spark.read.parquet(flatPath), "k").useSalting)
    // MANY flat keys: no zero-width bins = no concentration signal —
    // the estimate must fall back to the mean, not the bin height
    // (height here is total/64 = 62 >> mean 2, which would falsely
    // salt a perfectly flat join)
    registered("flatwide", (1L to 4000L).map(_ % 2000).toDF("k"))
    val wide =
      SkewJoin.chooseSkewStrategyFromCatalog(spark, db, "flatwide", "k")
    assert(!wide.useSalting && wide.maxN <= 3L, s"$wide")
    // no stats → loud refusal, not a silent default
    spark.sql(s"DROP TABLE IF EXISTS $db.bare")
    spark.sql(s"CREATE TABLE $db.bare (k BIGINT) USING PARQUET")
    intercept[IllegalStateException] {
      SkewJoin.chooseSkewStrategyFromCatalog(spark, db, "bare", "k")
    }
  }

  test("innerJoinAutoCatalog: pushed stats decide the strategy with " +
      "ZERO probe-side jobs, output is identical to the scan-based " +
      "auto join, and a stats-less table falls back to the scan") {
    import spark.implicits._
    val db = "skstatdb"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    def registered(name: String, df: org.apache.spark.sql.DataFrame,
        push: Boolean): String = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"sksj_$name").toString
      df.write.mode("overwrite").parquet(s"$dir/t")
      spark.sql(s"DROP TABLE IF EXISTS $db.$name")
      spark.sql(s"CREATE TABLE $db.$name USING PARQUET LOCATION '$dir/t'")
      if (push) {
        graft.operators.Stats.initProfileStore(spark, s"$dir/prof",
          spark.read.parquet(s"$dir/t"), Seq("k"), "b0",
          hists = Seq(graft.pipeline.Rollup.Hist("k", 1.0)))
        graft.catalog.CatalogStats.pushFromProfileStore(spark, db, name,
          s"$dir/prof", Seq("k"), sizeInBytes = 4096L,
          hists = Seq(graft.pipeline.Rollup.Hist("k", 1.0)))
      }
      s"$dir/t"
    }
    val hotRows = (1L to 1000L).map(_ => 0L) ++ (1L to 1000L).map(_ % 97)
    val hotPath = registered("hot_j", hotRows.toDF("k"), push = true)
    val left = spark.read.parquet(hotPath)
    val dim = (0L to 97L).map(k => (k, k % 7)).toDF("k", "w")
    // strategy + plan construction must launch NO jobs when the stats
    // are in the catalog (the scan-based selector pays one aggregate)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val joined =
      try {
        val j = SkewJoin.innerJoinAutoCatalog(spark, db, "hot_j",
          left, dim, "k")
        Thread.sleep(1500) // listener bus drains asynchronously
        j
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() == 0,
      s"catalog-backed strategy selection launched ${jobs.get()} job(s)")
    // identical output to the scan-based auto join AND the plain join
    def canon(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.groupBy(col("k"), col("w")).count().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val viaScan = SkewJoin.innerJoinAuto(left, dim, "k")
    assert(canon(joined) == canon(viaScan))
    assert(canon(joined) == canon(left.join(dim, Seq("k"))))
    // no pushed stats → falls back to the scan-based evidence (jobs
    // run), same output
    registered("hot_j_ns", hotRows.toDF("k"), push = false)
    val jobs2 = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener2 = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs2.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener2)
    val fallback =
      try {
        val j = SkewJoin.innerJoinAutoCatalog(spark, db, "hot_j_ns",
          left, dim, "k")
        Thread.sleep(1500)
        j
      } finally spark.sparkContext.removeSparkListener(listener2)
    assert(jobs2.get() > 0, "the fallback must have paid the scan")
    assert(canon(fallback) == canon(joined))
  }
}
