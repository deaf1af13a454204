package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental rollup maintenance: merging batches must equal a
  * from-scratch aggregate bit-for-bit, replays must not double-count,
  * and a crashed swap must heal. */
class RollupSpec extends SparkSpec {

  private def facts(lo: Long, n: Long) = {
    import spark.implicits._
    (lo until lo + n).map(i =>
      (s"g${i % 3}", i % 7 + 0.25, i)).toDF("grp", "x", "id")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("grp", "n", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("init + merges equal the from-scratch aggregate exactly") {
    val store = Files.createTempDirectory("ru").toString + "/s"
    Rollup.init(spark, store, facts(0, 100), Seq("grp"), Seq("x"), "b0")
    assert(Rollup.merge(spark, store, facts(100, 50),
      Seq("grp"), Seq("x"), "b1"))
    assert(Rollup.merge(spark, store, facts(150, 7),
      Seq("grp"), Seq("x"), "b2"))
    val want = canon(facts(0, 157).groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), graft.operators.sumDec(col("x")).as("sum_x")))
    assert(canon(Rollup.read(spark, store, Seq("x"))) === want)
  }

  test("replaying an applied batch id is a no-op") {
    val store = Files.createTempDirectory("ru2").toString + "/s"
    Rollup.init(spark, store, facts(0, 30), Seq("grp"), Seq("x"), "b0")
    assert(Rollup.merge(spark, store, facts(30, 30),
      Seq("grp"), Seq("x"), "b1"))
    val once = canon(Rollup.read(spark, store, Seq("x")))
    assert(!Rollup.merge(spark, store, facts(30, 30),
      Seq("grp"), Seq("x"), "b1"), "replay must report no-op")
    assert(canon(Rollup.read(spark, store, Seq("x"))) === once,
      "replay must not change the store")
  }

  test("min/max/null/HLL partials merge to the from-scratch aggregate") {
    import spark.implicits._
    def rows(lo: Long, n: Long) = (lo until lo + n).map { i =>
      (s"g${i % 2}", i,
        if (i % 5 == 0) Option.empty[Long] else Some(i % 37))
    }.toDF("grp", "v", "w")
    val spec = Rollup.Spec(Seq("grp"), minCols = Seq("v"),
      maxCols = Seq("v"), nullCountCols = Seq("w"),
      distinctSketchCols = Seq("w"))
    val store = Files.createTempDirectory("ru4").toString + "/s"
    Rollup.init(spark, store, rows(0, 40), spec, "b0")
    assert(Rollup.merge(spark, store, rows(40, 40), spec, "b1"))
    assert(!Rollup.merge(spark, store, rows(40, 40), spec, "b1"),
      "replay must no-op")
    assert(Rollup.merge(spark, store, rows(80, 20), spec, "b2"))
    val got = Rollup.read(spark, store, spec)
      .select("grp", "n", "min_v", "max_v", "nulls_w", "nd_w").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    // from-scratch truth, including the SAME sketch estimator: the merge
    // of per-batch HLL sketches must equal the sketch of the union —
    // batch boundaries cannot move the estimate
    val want = rows(0, 100).groupBy(col("grp")).agg(
        count(lit(1)).as("n"), min(col("v")).as("min_v"),
        max(col("v")).as("max_v"),
        sum(when(col("w").isNull, 1L).otherwise(0L)).as("nulls_w"),
        hll_sketch_estimate(hll_sketch_agg(col("w"))).as("nd_w"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got === want)
  }

  test("histogram partials merge to the from-scratch bins and quantile bounds") {
    import spark.implicits._
    def rows(lo: Long, n: Long) = (lo until lo + n).map { i =>
      (s"g${i % 2}",
        if (i % 11 == 0) Option.empty[Double]
        else Some((i * 37 % 250) + i * 0.001)) // unique-ish doubles
    }.toDF("grp", "score")
    val spec = Rollup.Spec(Seq("grp"),
      histCols = Seq(Rollup.Hist("score", 10.0)))
    val store = Files.createTempDirectory("ruh").toString + "/s"
    // deliberately uneven chopping, plus a replay
    Rollup.init(spark, store, rows(0, 13), spec, "b0")
    assert(Rollup.merge(spark, store, rows(13, 77), spec, "b1"))
    assert(!Rollup.merge(spark, store, rows(13, 77), spec, "b1"))
    assert(Rollup.merge(spark, store, rows(90, 110), spec, "b2"))
    val got = Rollup.histQuantiles(spark, store, spec, "score",
        Seq(0.25, 0.5, 0.9)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    // from-scratch truth with the same binning rule, built relationally
    val all = rows(0, 200).filter(col("score").isNotNull)
      .withColumn("bin", floor(col("score") / 10.0).cast("long"))
      .groupBy(col("grp"), col("bin")).agg(count(lit(1)).as("cnt"))
    val wGrp = org.apache.spark.sql.expressions.Window.partitionBy("grp")
    val wCum = wGrp.orderBy(col("bin").asc)
    val cum = all
      .withColumn("n", sum(col("cnt")).over(wGrp))
      .withColumn("cum", sum(col("cnt")).over(wCum))
    val want = cum.groupBy(col("grp")).agg(
        max(col("n")).as("n_scored"),
        min(when(col("cum") >= ceil(col("n") * 0.25),
          (col("bin") + 1) * 10.0)).as("p25_ub"),
        min(when(col("cum") >= ceil(col("n") * 0.5),
          (col("bin") + 1) * 10.0)).as("p50_ub"),
        min(when(col("cum") >= ceil(col("n") * 0.9),
          (col("bin") + 1) * 10.0)).as("p90_ub")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toSet
    assert(got === want,
      "merged histogram quantile bounds must equal the from-scratch bounds")
    // bound semantics: the true order statistic lies within binWidth
    val p50 = got.map(t => t._1 -> t._4).toMap
    val exact = rows(0, 200).filter(col("score").isNotNull)
      .groupBy(col("grp"))
      .agg(expr("percentile(score, 0.5)").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (g, m) =>
      assert(m <= p50(g) && m > p50(g) - 2 * 10.0,
        s"true median $m outside histogram bound window for $g (${p50(g)})")
    }
    // an all-NULL group surfaces n_scored=0 and NULL bounds
    val nullStore = Files.createTempDirectory("ruh2").toString + "/s"
    Rollup.init(spark, nullStore,
      Seq(("g0", Option.empty[Double]), ("g0", None)).toDF("grp", "score"),
      spec, "b0")
    val nr = Rollup.histQuantiles(spark, nullStore, spec, "score", Seq(0.5))
      .collect()
    assert(nr.length == 1 && nr(0).getLong(1) == 0L && nr(0).isNullAt(2))
  }

  test("a NULL group key keeps its histogram (null-safe partial attach)") {
    import spark.implicits._
    // grp = NULL is a real group: groupBy keeps it and base counts its
    // rows, but a plain USING join on the key would never re-attach its
    // bin map (NULL != NULL) and silently hand it an empty histogram
    val spec = Rollup.Spec(Seq("grp"),
      histCols = Seq(Rollup.Hist("score", 10.0)))
    val store = Files.createTempDirectory("ruhn").toString + "/s"
    Rollup.init(spark, store, Seq(
        (Some("a"), Some(5.0)),
        (None, Some(15.0)), (None, Some(25.0)),
        (None, Option.empty[Double])).toDF("grp", "score"),
      spec, "b0")
    // the merge path re-attaches through the same join — exercise both
    assert(Rollup.merge(spark, store,
      Seq((None: Option[String], Some(35.0))).toDF("grp", "score"),
      spec, "b1"))
    val got = Rollup.histQuantiles(spark, store, spec, "score", Seq(0.5))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getDouble(2)))
      .toSet
    // NULL group: bins {1, 2, 3}, n = 3, p50 at cum ceil(1.5) = 2 → bin 2
    // upper bound 30.0; group a: one value in bin 0 → bound 10.0
    assert(got == Set((Some("a"), 1L, 10.0), (None, 3L, 30.0)))
  }

  test("histDrift: planted shift dominates; one-sided groups surface") {
    import spark.implicits._
    val base = Files.createTempDirectory("drift").toString
    val spec = Rollup.Spec(Seq("grp"),
      histCols = Seq(Rollup.Hist("score", 10.0)))
    // ref: groups a and b over bins 0-4; gone: only in ref
    val ref = (1 to 500).map(i => ("a", (i % 50).toDouble)) ++
      (1 to 500).map(i => ("b", (i % 50).toDouble)) ++
      (1 to 50).map(i => ("gone", (i % 50).toDouble))
    // cur: a unchanged, b shifted wholesale into bins 10-14; new: only cur
    val cur = (1 to 500).map(i => ("a", (i % 50).toDouble)) ++
      (1 to 500).map(i => ("b", 100.0 + (i % 50))) ++
      (1 to 50).map(i => ("new", (i % 50).toDouble))
    Rollup.init(spark, s"$base/ref", ref.toDF("grp", "score"), spec, "r")
    Rollup.init(spark, s"$base/cur", cur.toDF("grp", "score"), spec, "c")
    val got = Rollup.histDrift(spark, s"$base/ref", s"$base/cur",
        spec, "score").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(4)))).toMap
    assert(got.keySet == Set("a", "b", "gone", "new"),
      "groups present in only one store must surface, not drop")
    assert(got("a")._3 < 0.01, s"identical distribution: ${got("a")}")
    assert(got("b")._3 > 1.0,
      s"a wholesale bin shift must alarm loudly: ${got("b")}")
    assert(got("gone")._1 == 50L && got("gone")._2 == 0L)
    assert(got("new")._1 == 0L && got("new")._2 == 50L)
  }

  test("streaming sink: micro-batch boundaries and replays don't change the store") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = (0L until 90L).map(i => (s"g${i % 3}", i % 7 + 0.25))
    val spec = Rollup.Spec(Seq("grp"), sumCols = Seq("x"))
    def ingest(store: String, chunks: Seq[Seq[(String, Double)]]): Unit = {
      val mem = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, Double)]
      val q = mem.toDF().toDF("grp", "x")
        .writeStream.foreachBatch(Rollup.foreachBatchSink(store, spec))
        .start()
      try chunks.foreach { c => mem.addData(c); q.processAllAvailable() }
      finally q.stop()
    }
    val oneShot = Files.createTempDirectory("rus1").toString + "/s"
    val chopped = Files.createTempDirectory("rus2").toString + "/s"
    ingest(oneShot, Seq(rows))
    ingest(chopped, Seq(rows.take(30), rows.slice(30, 31), rows.drop(31)))
    def canon2(store: String) = Rollup.read(spark, store, Seq("x"))
      .select("grp", "n", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(canon2(oneShot) === canon2(chopped),
      "micro-batch chopping must not change the maintained aggregate")
    assert(canon2(oneShot) === canon(rows.toDF("grp", "x")
      .groupBy(col("grp")).agg(count(lit(1)).as("n"),
        graft.operators.sumDec(col("x")).as("sum_x"))))
    // engine-style replay: re-delivering micro-batch id 1 must no-op
    val replayed = rows.slice(30, 31).toDF("grp", "x")
    Rollup.foreachBatchSink(chopped, spec)(replayed, 1L)
    assert(canon2(chopped) === canon2(oneShot),
      "a re-delivered micro-batch id must not double-count")
  }

  test("a crashed swap heals: aside tree restored, ledger intact") {
    val store = Files.createTempDirectory("ru3").toString + "/s"
    Rollup.init(spark, store, facts(0, 40), Seq("grp"), Seq("x"), "b0")
    val before = canon(Rollup.read(spark, store, Seq("x")))
    // simulate a crash between SafeSwap's renames: live tree gone, last
    // complete state under the hidden aside name
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(store), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(store)
    fs.rename(p, new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.__old"))
    // both read and merge recover; the ledger still suppresses b0
    assert(canon(Rollup.read(spark, store, Seq("x"))) === before)
    assert(!Rollup.merge(spark, store, facts(0, 40),
      Seq("grp"), Seq("x"), "b0"))
  }

  test("histogram bin-scale versioning: a temporal-hist store carries " +
      "the marker; a legacy store (no marker) refuses merge and " +
      "retract instead of mixing bin-id unit systems; numeric-only " +
      "hists are unaffected") {
    import spark.implicits._
    val rows = (0L until 50L).map(i =>
      ("g", java.sql.Timestamp.valueOf(
        s"2024-01-0${i % 9 + 1} 00:00:0${i % 10}"), i % 7 + 0.25))
      .toDF("grp", "ts", "score")
    val spec = Rollup.Spec(Seq("grp"),
      histCols = Seq(Rollup.Hist("ts", 3.6e9), // hourly, micros scale
        Rollup.Hist("score", 10.0)))
    val store = Files.createTempDirectory("ru_scale").toString + "/s"
    Rollup.init(spark, store, rows, spec, Seq("b0"))
    assert(Rollup.histScaleCurrent(spark, store, spec, rows.schema))
    assert(Rollup.merge(spark, store, rows.limit(5), spec, Seq("b1")))
    // simulate a pre-scale-change store: drop the marker
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(store), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(store, "_hist_scale"), false)
    assert(!Rollup.histScaleCurrent(spark, store, spec, rows.schema))
    val exM = intercept[IllegalArgumentException] {
      Rollup.merge(spark, store, rows.limit(5), spec, Seq("b2"))
    }
    assert(exM.getMessage.contains("LEGACY bin scale"), exM.getMessage)
    val exR = intercept[IllegalArgumentException] {
      Rollup.retract(spark, store, rows.limit(3), spec, "r1")
    }
    assert(exR.getMessage.contains("LEGACY bin scale"), exR.getMessage)
    // a NUMERIC-only hist spec never changed scale: no marker needed
    val numSpec = Rollup.Spec(Seq("grp"),
      histCols = Seq(Rollup.Hist("score", 10.0)))
    val numStore = Files.createTempDirectory("ru_num").toString + "/s"
    Rollup.init(spark, numStore,
      rows.select("grp", "score"), numSpec, Seq("b0"))
    fs.delete(
      new org.apache.hadoop.fs.Path(numStore, "_hist_scale"), false)
    assert(Rollup.histScaleCurrent(spark, numStore, numSpec,
      rows.select("grp", "score").schema))
    assert(Rollup.merge(spark, numStore,
      rows.select("grp", "score").limit(5), numSpec, Seq("b1")))
  }
}
