package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Maintained statistics → session catalog → Catalyst planning
  * ([[CatalogStats]]): the broadcast side of a star query must follow
  * what the MAINTAINED numbers say, not disk-size guesswork. */
class CatalogStatsSpec extends SparkSpec {
  import spark.implicits._

  private val db = "statsdb"

  private def register(name: String, df: org.apache.spark.sql.DataFrame)
      : Unit = {
    val dir = Files.createTempDirectory(s"cst_$name").toString + "/t"
    df.write.parquet(dir)
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$name")
    spark.sql(s"CREATE TABLE $db.$name USING PARQUET LOCATION '$dir'")
  }

  /** Tables whose scans sit on the BUILD side of a BroadcastHashJoin
    * in the query's (pre-AQE) physical plan. */
  private def broadcastTables(sql: String): Set[String] = {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    spark.sql(sql).queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec =>
        val side = if (b.buildSide.toString == "BuildRight") b.right
          else b.left
        side.collectLeaves().map(_.toString).mkString
    }.flatMap(dump => Seq("fact", "dim1", "dim2")
      .filter(t => dump.contains(s"$db.$t"))).toSet
  }

  test("a 3-table star query's broadcast side flips when the " +
      "maintained stats say the small table grew past the threshold") {
    val cboBefore = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      register("fact", (1L to 5000L)
        .map(k => (k, k % 50, k % 40)).toDF("k", "d1", "d2"))
      register("dim1", (0L to 49L).map(k => (k, s"a$k")).toDF("d1", "n1"))
      register("dim2", (0L to 39L).map(k => (k, s"b$k")).toDF("d2", "n2"))
      val q =
        s"""SELECT n1, n2, COUNT(*) FROM $db.fact
           |JOIN $db.dim1 USING (d1) JOIN $db.dim2 USING (d2)
           |GROUP BY n1, n2""".stripMargin
      // maintained truth: fact is huge, dim1 tiny, dim2 past threshold
      CatalogStats.push(spark, db, "fact", 500000000L, 50L << 30)
      CatalogStats.push(spark, db, "dim1", 50L, 1024L,
        Map("d1" -> CatalogStats.ColStat(50L, 0L, Some("0"), Some("49"))))
      CatalogStats.push(spark, db, "dim2", 100000000L, 20L << 30,
        Map("d2" -> CatalogStats.ColStat(40L, 0L, Some("0"), Some("39"))))
      val b1 = broadcastTables(q)
      assert(b1 == Set("dim1"),
        s"dim1 must broadcast, dim2 must not; broadcast set was $b1")
      // the profile store now says dim1 GREW past the threshold and
      // dim2 shrank — the broadcast side must flip with no config or
      // query change
      CatalogStats.push(spark, db, "dim1", 200000000L, 20L << 30,
        Map("d1" -> CatalogStats.ColStat(50L, 0L, Some("0"), Some("49"))))
      CatalogStats.push(spark, db, "dim2", 40L, 1024L,
        Map("d2" -> CatalogStats.ColStat(40L, 0L, Some("0"), Some("39"))))
      val b2 = broadcastTables(q)
      assert(b2 == Set("dim2"),
        s"the broadcast side must follow the maintained stats; got $b2")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboBefore)
  }

  test("pushFromProfileStore copies the maintained profile's numbers " +
      "(rowCount, NDV, nulls, min/max) into the catalog without a " +
      "table rescan") {
    register("orders_p", (1L to 300L)
      .map(k => (k, if (k % 9 == 0) None else Some(k % 30)))
      .toDF("ok", "ck"))
    val store = Files.createTempDirectory("cst_store").toString + "/s"
    graft.operators.Stats.initProfileStore(spark,
      store, spark.table(s"$db.orders_p"), Seq("ok", "ck"), "b0")
    CatalogStats.pushFromProfileStore(spark, db, "orders_p", store,
      Seq("ok", "ck"), sizeInBytes = 12345L)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("orders_p", Some(db)))
    val st = meta.stats.get
    assert(st.rowCount.contains(BigInt(300)) &&
      st.sizeInBytes == BigInt(12345L), s"$st")
    val ck = st.colStats("ck")
    assert(ck.nullCount.contains(BigInt(300 / 9)), s"$ck")
    assert(ck.min.contains("0") && ck.max.contains("29"), s"$ck")
    assert(ck.distinctCount.exists(d => d >= 28 && d <= 32),
      s"HLL estimate off: $ck")
  }

  test("a profiled timestamp/date column pushes min/max in the " +
      "catalog's external stat form (plan-time-parseable by " +
      "construction) and a CBO-enabled plan over the table survives " +
      "toPlanStat") {
    register("events_ts", (1L to 200L).map { k =>
      (k, java.sql.Timestamp.valueOf(s"2020-01-${k % 28 + 1} 03:04:05"),
        java.sql.Date.valueOf(s"2021-02-${k % 28 + 1}"))
    }.toDF("k", "ts", "d"))
    val store = Files.createTempDirectory("cst_ts").toString + "/s"
    graft.operators.Stats.initProfileStore(spark, store,
      spark.table(s"$db.events_ts"), Seq("ts", "d"), "b0")
    CatalogStats.pushFromProfileStore(spark, db, "events_ts", store,
      Seq("ts", "d"), sizeInBytes = 999L)
    val st = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("events_ts",
        Some(db))).stats.get
    // every stored bound must survive the EXACT parser the planner
    // runs (fromExternalString at the current stats VERSION) — an
    // unparseable bound stored verbatim poisons every later CBO plan
    // at toPlanStat, far from the push that caused it
    import org.apache.spark.sql.catalyst.catalog.CatalogColumnStat
    for ((c, dt) <- Seq("ts" -> org.apache.spark.sql.types.TimestampType,
        "d" -> org.apache.spark.sql.types.DateType)) {
      val cs = st.colStats(c)
      assert(cs.min.isDefined && cs.max.isDefined, s"$c: $cs")
      Seq(cs.min.get, cs.max.get).foreach { s =>
        CatalogColumnStat.fromExternalString(s, c, dt,
          CatalogColumnStat.VERSION) // must not throw
      }
    }
    val cboBefore = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      // planning reads the column stats through toPlanStat — this THREW
      // when the display strings were stored verbatim
      val planStats = spark.table(s"$db.events_ts")
        .where(col("ts") > lit(java.sql.Timestamp.valueOf(
          "2020-01-10 00:00:00")) && col("d") < lit(
          java.sql.Date.valueOf("2021-02-20")))
        .queryExecution.optimizedPlan.stats
      assert(planStats.rowCount.exists(_ > BigInt(0)), s"$planStats")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboBefore)
  }

  test("equiHeightHistogram resamples the maintained equi-width map " +
      "into monotone equal-mass bins; a hot value spans many bins") {
    // 900 rows of value 7, 100 rows spread over 0..99
    val bins = (0L to 99L).map(v => v -> 1L).toMap + (7L -> 901L)
    val h = CatalogStats.equiHeightHistogram(bins, 1.0, 64).get
    assert(h.height == 1000.0 / 64)
    assert(h.bins.length == 64)
    // bounds are monotone non-decreasing and cover the value range
    h.bins.foreach(b => assert(b.lo <= b.hi, s"$b"))
    h.bins.sliding(2).foreach { w =>
      assert(w(0).hi <= w(1).lo + 1e-9, s"${w(0)} ${w(1)}") }
    assert(math.abs(h.bins.head.lo - 0.0) < 1e-9)
    assert(math.abs(h.bins.last.hi - 100.0) < 1e-9)
    // the hot value's mass (90% of rows) must surface as ~90% of the
    // equal-mass bins sitting inside [7, 8)
    val hot = h.bins.count(b => b.lo >= 7.0 - 1e-9 && b.hi <= 8.0 + 1e-9)
    assert(hot >= 55 && hot <= 59, s"hot-value bins: $hot")
  }

  test("a pushed histogram makes the CBO estimate a hot-value filter's " +
      "true mass instead of rows/NDV") {
    register("skewed", ((1L to 900L).map(_ => 7L) ++ (0L until 100L))
      .map(v => (v, v * 2)).toDF("v", "p"))
    val store = Files.createTempDirectory("cst_hist").toString + "/s"
    graft.operators.Stats.initProfileStore(spark, store,
      spark.table(s"$db.skewed"), Seq("v"), "b0",
      hists = Seq(graft.pipeline.Rollup.Hist("v", 1.0)))
    val cboBefore = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def estimate(): BigInt = spark.table(s"$db.skewed")
        .where(col("v") === 7L)
        .queryExecution.optimizedPlan.stats.rowCount.get
      // without the histogram: uniform-NDV guesswork (~1000/101 ≈ 10)
      CatalogStats.pushFromProfileStore(spark, db, "skewed", store,
        Seq("v"), sizeInBytes = 4096L)
      val uniform = estimate()
      assert(uniform < BigInt(100), s"uniform estimate: $uniform")
      // with it: the hot value's measured mass (~900)
      CatalogStats.pushFromProfileStore(spark, db, "skewed", store,
        Seq("v"), sizeInBytes = 4096L,
        hists = Seq(graft.pipeline.Rollup.Hist("v", 1.0)))
      val st = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("skewed", Some(db)))
        .stats.get
      assert(st.colStats("v").histogram.isDefined, s"$st")
      val hist = estimate()
      assert(hist > BigInt(500) && hist <= BigInt(1000),
        s"histogram estimate must be the hot value's mass, got $hist " +
          s"(uniform was $uniform)")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboBefore)
  }

  test("a pushed TIMESTAMP histogram (epoch-micro bins) makes the CBO " +
      "estimate a hot day's time-range filter from measured mass " +
      "instead of uniform min/max spread") {
    // 900 events on 2024-03-05, 100 spread over 100 other days
    val hot = java.sql.Timestamp.valueOf("2024-03-05 12:00:00")
    val rows = (1L to 900L).map(i => (i, hot)) ++
      (0L until 100L).map(d => (900L + d,
        java.sql.Timestamp.valueOf(s"2024-0${d % 9 + 1}-0${d % 27 / 9 + 1} " +
          s"0${d % 10}:15:00")))
    register("events_h", rows.toDF("k", "ts"))
    val dayMicros = 86400e6
    val hist = graft.pipeline.Rollup.Hist("ts", dayMicros)
    val store = Files.createTempDirectory("cst_tsh").toString + "/s"
    graft.operators.Stats.initProfileStore(spark, store,
      spark.table(s"$db.events_h"), Seq("ts"), "b0", hists = Seq(hist))
    val cboBefore = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def estimate(): BigInt = spark.table(s"$db.events_h")
        .where(col("ts") >= lit(java.sql.Timestamp.valueOf(
          "2024-03-05 00:00:00")) && col("ts") < lit(
          java.sql.Timestamp.valueOf("2024-03-06 00:00:00")))
        .queryExecution.optimizedPlan.stats.rowCount.get
      CatalogStats.pushFromProfileStore(spark, db, "events_h", store,
        Seq("ts"), sizeInBytes = 4096L)
      val uniform = estimate()
      assert(uniform < BigInt(100),
        s"min/max-only estimate should read the day as a thin range " +
          s"slice: $uniform")
      CatalogStats.pushFromProfileStore(spark, db, "events_h", store,
        Seq("ts"), sizeInBytes = 4096L, hists = Seq(hist))
      val st = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("events_h",
          Some(db))).stats.get
      val h = st.colStats("ts").histogram
      assert(h.isDefined, s"$st")
      // the bounds are on the catalog-internal micro scale — the units
      // FilterEstimation converts timestamp literals to
      val loMicros = h.get.bins.head.lo
      assert(loMicros > 1.5e15 && loMicros < 2.0e15,
        s"bounds must be epoch micros, got $loMicros")
      val measured = estimate()
      assert(measured > BigInt(500) && measured <= BigInt(1000),
        s"the histogram estimate must be the hot day's mass, got " +
          s"$measured (uniform was $uniform)")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboBefore)
  }

  test("a pushed DATE histogram (epoch-day bins) moves a skewed " +
      "date-range filter's estimate to measured mass") {
    val hot = java.sql.Date.valueOf("2023-06-01")
    val rows = (1L to 450L).map(i => (i, hot)) ++
      (0L until 50L).map(d => (450L + d,
        java.sql.Date.valueOf(s"2023-0${d % 9 + 1}-${10 + d % 18}")))
    register("dates_h", rows.toDF("k", "d"))
    val hist = graft.pipeline.Rollup.Hist("d", 1.0) // one bin per day
    val store = Files.createTempDirectory("cst_dh").toString + "/s"
    graft.operators.Stats.initProfileStore(spark, store,
      spark.table(s"$db.dates_h"), Seq("d"), "b0", hists = Seq(hist))
    val cboBefore = spark.conf.get("spark.sql.cbo.enabled", "false")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      def estimate(): BigInt = spark.table(s"$db.dates_h")
        .where(col("d") >= lit(java.sql.Date.valueOf("2023-06-01")) &&
          col("d") <= lit(java.sql.Date.valueOf("2023-06-01")))
        .queryExecution.optimizedPlan.stats.rowCount.get
      CatalogStats.pushFromProfileStore(spark, db, "dates_h", store,
        Seq("d"), sizeInBytes = 4096L)
      val uniform = estimate()
      CatalogStats.pushFromProfileStore(spark, db, "dates_h", store,
        Seq("d"), sizeInBytes = 4096L, hists = Seq(hist))
      val measured = estimate()
      assert(measured > uniform && measured > BigInt(250) &&
        measured <= BigInt(500),
        s"date histogram estimate: $measured (uniform $uniform)")
    } finally spark.conf.set("spark.sql.cbo.enabled", cboBefore)
  }
}
