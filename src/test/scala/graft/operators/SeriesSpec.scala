package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Markov transitions, grid resampling with forward fill, and CUSUM
  * change-point detection — the ordered-series family added with
  * q132/q133/q136. */
class SeriesSpec extends SparkSpec {
  import spark.implicits._

  test("markovTransitions counts ordered steps and row-normalizes") {
    val ev = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"), (3L, 1L, "a"),
      (4L, 2L, "a"), (5L, 2L, "b"),
      (6L, 3L, "a")) // single event → no transition
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", col("event_id").cast("timestamp"))
    val out = Behavior.markovTransitions(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // user1: a→b, b→a; user2: a→b  ⇒  a→b: 2 of 2, b→a: 1 of 1
    assert(out == Map(
      ("a", "b") -> ((2L, 1.0)),
      ("b", "a") -> ((1L, 1.0))))
  }

  test("markovTransitions splits a row's mass across successors") {
    val ev = Seq(
      (1L, 1L, "x"), (2L, 1L, "y"),
      (3L, 2L, "x"), (4L, 2L, "z"))
      .toDF("event_id", "user_id", "event_type")
      .withColumn("ts", col("event_id").cast("timestamp"))
    val out = Behavior.markovTransitions(ev, "user_id", "ts", "event_type",
        "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
      .toMap
    assert(out(("x", "y")) == 0.5 && out(("x", "z")) == 0.5)
  }

  test("markovTransitions: timestamp ties broken by the tiebreak column") {
    val ev = Seq( // same ts for both events of user 1
      (10L, 1L, "a", 100L), (11L, 1L, "b", 100L))
      .toDF("event_id", "user_id", "event_type", "t")
      .withColumn("ts", col("t").cast("timestamp")).drop("t")
    val out = Behavior.markovTransitions(ev, "user_id", "ts", "event_type",
        "event_id").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "a" && out(0).getString(1) == "b")
  }

  test("resampleFfill densifies the grid and carries values forward") {
    val obs = Seq((1, 10L, 5L), (1, 12L, 7L), (2, 11L, 9L))
      .toDF("k", "obs_day", "n")
    val out = EventTime.resampleFfill(obs, "k", "obs_day", span = 4)
      .select(col("k"), col("tick"),
        col("asof.n").as("n"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // global min obs_day = 10, span 4 → grid days 10..13 for both keys
    assert(out == Map(
      (1, 10L) -> 5L, (1, 11L) -> 5L, (1, 12L) -> 7L, (1, 13L) -> 7L,
      (2, 10L) -> -1L, (2, 11L) -> 9L, (2, 12L) -> 9L, (2, 13L) -> 9L))
  }

  test("resampleFfill: grid size is keys × span exactly") {
    val obs = Seq((1, 0L, 1L), (2, 5L, 1L), (3, 9L, 1L))
      .toDF("k", "obs_day", "n")
    val out = EventTime.resampleFfill(obs, "k", "obs_day", span = 10)
    assert(out.count() == 30)
  }

  test("cusumChangepoint finds a planted level shift") {
    // 5 ticks at 10 then 5 ticks at 50 → S* peaks at the boundary (tick 4)
    val rows = (0L until 5L).map(d => (1, d, 10L)) ++
      (5L until 10L).map(d => (1, d, 50L))
    val out = Stats.cusumChangepoint(rows.toDF("k", "tick", "v"),
      "k", "tick", "v").collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 10L) // n_ticks
    assert(r.getLong(2) == 4L)  // cp at the last pre-shift tick
    // S*_5 = 10*50 - 5*300 = -1000
    assert(r.getLong(3) == 1000L)
  }

  test("cusumChangepoint: constant series has zero deviation") {
    val rows = (0L until 6L).map(d => (1, d, 7L))
    val out = Stats.cusumChangepoint(rows.toDF("k", "tick", "v"),
      "k", "tick", "v").collect()
    assert(out(0).getLong(3) == 0L)
    assert(out(0).getLong(2) == 0L) // tie → earliest tick
  }

  test("spearmanTrend: monotone ±1, constant NULL, monotone-transform invariant") {
    val up = (0L until 8L).map(t => (1, t, math.exp(t.toDouble))) // convex
    val upLin = (0L until 8L).map(t => (2, t, t.toDouble))        // linear
    val down = (0L until 8L).map(t => (3, t, -t.toDouble))
    val flat = (0L until 8L).map(t => (4, t, 5.0))
    val out = Stats.spearmanTrend(
        (up ++ upLin ++ down ++ flat).toDF("k", "t", "v"), "k", "t", "v")
      .collect().map(r => r.getInt(0) ->
        Option(r.get(2)).map(_.asInstanceOf[Double])).toMap
    // rank correlation sees only the ordering: exp and linear both 1.0
    assert(out(1).contains(1.0) && out(2).contains(1.0))
    assert(out(3).contains(-1.0))
    assert(out(4).isEmpty)
  }

  test("spearmanTrend property: equals a local reference with tied ranks") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val seriesGen = Gen.listOfN(10, Gen.choose(0L, 5L)) // heavy ties
    val prop = Prop.forAll(seriesGen) { ys =>
      val n = ys.size
      val xs = (1 to n).map(_.toLong)
      val y2 = ys.map(v =>
        2L * ys.count(_ < v) + ys.count(_ == v) + 1L)
      val (sx, sy) = (xs.sum, y2.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = y2.map(y => y * y).sum
      val sxy = xs.zip(y2).map { case (x, y) => x * y }.sum
      val nD = n.toDouble
      val den = math.sqrt(nD * sxx - sx.toDouble * sx.toDouble) *
        math.sqrt(nD * syy - sy.toDouble * sy.toDouble)
      val expect =
        if (den == 0.0) None
        else Some(new java.math.BigDecimal(java.lang.Double.toString(
            (nD * sxy - sx.toDouble * sy.toDouble) / den))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      val rows = ys.zipWithIndex.map { case (v, i) =>
        (1, i.toLong, v.toDouble) }
      val r = Stats.spearmanTrend(rows.toDF("k", "t", "v"),
        "k", "t", "v").head()
      Option(r.get(2)).map(_.asInstanceOf[Double]) == expect
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("mannKendall: monotone series scores S = n(n-1)/2; ties kill the test") {
    val up = (0L until 10L).map(t => (1, t, t.toDouble + 1.0))
    val down = (0L until 10L).map(t => (2, t, 100.0 - t.toDouble))
    val flat = (0L until 10L).map(t => (3, t, 7.0))
    val out = Stats.mannKendall((up ++ down ++ flat).toDF("k", "t", "v"),
        "k", "t", "v")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(1)._1 == 45L && out(2)._1 == -45L && out(3)._1 == 0L)
    // Var(S) = 10*9*25/18 = 125; z_up = 44/sqrt(125) ≈ 3.935480
    assert(out(1)._2.exists(z => math.abs(z - 44.0 / math.sqrt(125.0)) < 1e-5))
    // exact antisymmetry: (-44)/σ is the IEEE negation of 44/σ
    assert(out(2)._2.get == -out(1)._2.get)
    // all-tied series: Var = 0 → NULL verdict
    assert(out(3)._2.isEmpty)
  }

  test("theilSen: robust to a wild outlier that wrecks the OLS slope") {
    // clean line y = 2t with ONE corrupted tick: the median slope stays
    // 2.0 while OLS is dragged far off
    val rows = (0L until 9L).map(t => (1, t, 2.0 * t)) :+ ((1, 9L, 500.0))
    val df = rows.toDF("k", "t", "v")
    val ts = Stats.theilSen(df, "k", "t", "v").head()
    assert(ts.getLong(1) == 45L) // 10 choose 2
    assert(ts.getDouble(2) == 2.0, s"median slope ${ts.getDouble(2)}")
    val ols = Stats.groupOls(df, "k", "t", "v").head()
    assert(ols.getDouble(2) > 10.0, "OLS must be wrecked for contrast")
  }

  test("theilSen: even pair count averages the two middle slopes") {
    // 4 points → 6 slopes; values chosen so the middle two differ
    val rows = Seq((1, 0L, 0.0), (1, 1L, 1.0), (1, 2L, 4.0), (1, 3L, 5.0))
    // slopes: (0,1)=1, (0,2)=2, (0,3)=5/3, (1,2)=3, (1,3)=2, (2,3)=1
    // sorted: 1, 1, 5/3, 2, 2, 3 → middle pair (5/3, 2) → 11/6,
    // emitted on the 6dp output grid
    val ts = Stats.theilSen(rows.toDF("k", "t", "v"), "k", "t", "v").head()
    assert(ts.getLong(1) == 6L)
    assert(ts.getDouble(2) == 1.833333)
  }

  test("crossCorrelation: a shifted copy peaks at exactly its lead") {
    // b(t) = a(t-1): pairing a(t) with b(t+1) reproduces a perfectly
    val av = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0)
    val a = av.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "x")
    val b = av.zipWithIndex.map { case (v, t) => (t.toLong + 1, v) }
      .toDF("t", "y")
    val got = Stats.crossCorrelation(a, b, 3).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2))
        .map(_.asInstanceOf[Double])))).toMap
    assert(got(1)._2.contains(1.0), s"lag 1 must be exact: ${got(1)}")
    assert(got(1)._1 == 10L)
    // other lags pair fewer, imperfect points
    assert(got(0)._1 == 9L && got(0)._2.exists(_ < 1.0))
  }

  test("crossCorrelation symmetry: ccf(a,b)(l) == ccf(b,a)(-l) bit-exactly") {
    val r = new scala.util.Random(5)
    val av = Seq.fill(12)(r.nextInt(50).toDouble)
    val bv = Seq.fill(12)(r.nextInt(50).toDouble)
    val a = av.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "x")
    val bAsY = bv.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "y")
    val bAsX = bv.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "x")
    val aAsY = av.zipWithIndex.map { case (v, t) => (t.toLong, v) }
      .toDF("t", "y")
    def m(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2))))).toMap
    val ab = m(Stats.crossCorrelation(a, bAsY, 3))
    val ba = m(Stats.crossCorrelation(bAsX, aAsY, 3))
    assert((-3 to 3).forall(l => ab(l) == ba(-l)), s"$ab vs $ba")
  }

  test("segmentedBreak fits a clean level shift with zero SSE") {
    // [1,1,1,9,9,9]: the b=3 split is exact — SSE 0, means 1 and 9
    val rows = (0L until 3L).map(d => (1, d, 1L)) ++
      (3L until 6L).map(d => (1, d, 9L))
    val r = Stats.segmentedBreak(rows.toDF("k", "tick", "v"),
      "k", "tick", "v").head()
    assert(r.getLong(1) == 6L)          // n_ticks
    assert(r.getLong(2) == 2L)          // break AT the last left tick
    assert(r.getDouble(3) == 0.0)       // sse
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 9.0)
  }

  test("segmentedBreak: constant series ties break to the earliest tick") {
    val rows = (0L until 6L).map(d => (1, d, 7L))
    val r = Stats.segmentedBreak(rows.toDF("k", "tick", "v"),
      "k", "tick", "v").head()
    assert(r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0)
  }

  test("segmentedBreak property: equals the brute-force argmin bit-exactly") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val seriesGen = Gen.listOfN(9, Gen.choose(0L, 20L))
    val prop = Prop.forAll(seriesGen) { ys =>
      val n = ys.size
      // local replay of the exact double expression tree
      val cands = (1 until n).map { b =>
        val sp = ys.take(b).sum.toDouble
        val qp = ys.take(b).map(y => y * y).sum.toDouble
        val s = ys.sum.toDouble
        val q = ys.map(y => y * y).sum.toDouble
        val sse = (qp - sp * sp / b.toDouble) +
          ((q - qp) - (s - sp) * (s - sp) / (n.toDouble - b.toDouble))
        (b, sse)
      }
      val (bBest, sseBest) = cands.minBy { case (b, sse) => (sse, b) }
      val rows = ys.zipWithIndex.map { case (y, i) => (1, i.toLong, y) }
      val r = Stats.segmentedBreak(rows.toDF("k", "tick", "v"),
        "k", "tick", "v").head()
      r.getLong(2) == (bBest - 1).toLong &&
        r.getDouble(3) == (new java.math.BigDecimal(
          java.lang.Double.toString(sseBest))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("cusumChangepoint is input-order invariant") {
    val rows = ((0L until 5L).map(d => (1, d, 10L)) ++
      (5L until 10L).map(d => (1, d, 50L)))
    val a = Stats.cusumChangepoint(rows.toDF("k", "tick", "v"),
      "k", "tick", "v").collect().toSeq
    val b = Stats.cusumChangepoint(rows.reverse.toDF("k", "tick", "v"),
      "k", "tick", "v").collect().toSeq
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
  }

  test("ewmaByKey: hand-computed recursion, singleton = its value") {
    val df = Seq(
      (1L, 1L, 10L, 10.0), (1L, 2L, 11L, 20.0),        // 0.5: 15.0
      (2L, 1L, 12L, 7.0),                               // singleton
      (3L, 1L, 13L, 1.0), (3L, 2L, 14L, 2.0), (3L, 3L, 15L, 3.0)
    ).toDF("k", "tick", "id", "v")
    val out = EventTime.ewmaByKey(df, "k", "tick", "id", "v", alpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSet
    // key 3: s=1 -> 1*.5+2*.5=1.5 -> 1.5*.5+3*.5=2.25
    assert(out == Set((1L, 2L, 15.0), (2L, 1L, 7.0), (3L, 3L, 2.25)))
  }

  test("ewmaByKey: tick ties break on the id column; partition-invariant") {
    val tied = Seq(
      (1L, 5L, 1L, 100.0), (1L, 5L, 2L, 0.0)) // same tick, id orders them
    val fwd = EventTime.ewmaByKey(tied.toDF("k", "tick", "id", "v"),
      "k", "tick", "id", "v", 0.25).collect().head.getDouble(2)
    val rev = EventTime.ewmaByKey(tied.reverse.toDF("k", "tick", "id", "v"),
      "k", "tick", "id", "v", 0.25).collect().head.getDouble(2)
    assert(fwd == rev && fwd == 100.0 * 0.75 + 0.0 * 0.25)
    val big = (1 to 500).map(i =>
      ((i % 13).toLong, (i / 13).toLong, i.toLong, (i * 7 % 23).toDouble))
      .toDF("k", "tick", "id", "v")
    val a = EventTime.ewmaByKey(big, "k", "tick", "id", "v", 0.125)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    val b = EventTime.ewmaByKey(big.repartition(11), "k", "tick", "id",
      "v", 0.125)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSet
    assert(a == b, "ordered fold must be bit-identical on any partitioning")
  }

  test("resampleInterpolate: line through anchors, flat edges, exact on-obs") {
    import spark.implicits._
    // obs at t=10 v=0 and t=20 v=10; grid d0=10 span 15 (ticks 10..24)
    val obs = Seq(("k", 10L, 0.0), ("k", 20L, 10.0))
      .toDF("g", "d", "v")
    val r = EventTime.resampleInterpolate(obs, "g", "d", "v", span = 15)
      .collect().map(x => x.getLong(1) -> x.getDouble(4)).toMap
    assert(r(10L) == 0.0)           // on-observation: exact
    assert(r(13L) == 3.0)           // interior: linear
    assert(r(17L) == 7.0)
    assert(r(20L) == 10.0)
    assert(r(24L) == 10.0)          // after last: flat
    assert(r.size == 15)
  }

  test("resampleInterpolate: anchors beyond the grid span still pull the line") {
    import spark.implicits._
    // obs at t=0 v=0 and t=100 v=100 — the second anchor is outside the
    // 10-tick grid, but interior ticks must still climb toward it
    val obs = Seq(("k", 0L, 0.0), ("k", 100L, 100.0)).toDF("g", "d", "v")
    val r = EventTime.resampleInterpolate(obs, "g", "d", "v", span = 10)
      .collect().map(x => x.getLong(1) -> x.getDouble(4)).toMap
    assert(r(5L) == 5.0 && r(9L) == 9.0)
  }

  test("interArrival: hand-computed gaps; single-event keys drop") {
    import spark.implicits._
    val e = Seq(("u", 1L, 0L), ("u", 2L, 1000000L), ("u", 3L, 4000000L),
      ("lone", 9L, 5L)).toDF("k", "id", "ts_us")
    val m = EventTime.interArrival(e, "k", "ts_us", "id").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))).toMap
    assert(m("u") == ((2L, 1000000L, 3000000L, 2.0)))
    assert(!m.contains("lone"))
  }

  test("attributionCompare: first and last touch diverge on a planted path") {
    import spark.implicits._
    // user clicks ch0 at t=1, ch1 at t=5; buys at t=10 (lookback 100)
    val purchases = Seq((100L, 1L, 10L)).toDF("event_id", "user_id", "ts_us")
    val clicks = Seq((0L, 1L, 1L), (1L, 1L, 5L))
      .toDF("event_id", "user_id", "ts_us")
    val m = EventTime.attributionCompare(purchases, clicks,
        lookbackUs = 100L, bucketUs = 10L,
        channel = concat(lit("ch"), (col("event_id") % 3).cast("string")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(m("ch0") == ((1L, 0L)))   // first touch
    assert(m("ch1") == ((0L, 1L)))   // last touch
  }

  test("attributionCompare: clicks outside the lookback get no credit") {
    import spark.implicits._
    val purchases = Seq((100L, 1L, 1000L)).toDF("event_id", "user_id", "ts_us")
    val clicks = Seq((0L, 1L, 1L), (1L, 1L, 999L))
      .toDF("event_id", "user_id", "ts_us")
    val m = EventTime.attributionCompare(purchases, clicks,
        lookbackUs = 50L, bucketUs = 10L,
        channel = concat(lit("ch"), (col("event_id") % 3).cast("string")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(m == Map("ch1" -> ((1L, 1L))), m.toString)
  }
}
