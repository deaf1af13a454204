package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.types._

/** Feed MAINTAINED statistics into the session catalog so Catalyst's
  * size-based join selection and the cost-based optimizer plan from
  * real numbers instead of defaults — finishing the catalog the
  * reference's sync half-builds: `sync-canvas-data-files.py:170-235`
  * registers schema+location in Glue but never statistics, so every
  * engine reading that catalog falls back to heuristics. Here the
  * numbers already exist: the incremental profile store
  * ([[graft.operators.Stats.profileSpec]], q97b) maintains rowCount,
  * per-column NDV sketches, null counts, and min/max per sync batch
  * WITHOUT table rescans — this object's job is only to copy them into
  * [[CatalogStatistics]].
  *
  * Why it matters at 100 TB: the raw-layer tables resolve through a
  * custom DataSource ([[graft.sources.lazytsv]]) whose relation reports
  * the conservative default size (`spark.sql.defaultSizeInBytes` =
  * Long.Max), so WITHOUT catalog stats a join against even a 10-row
  * raw dimension plans as a shuffle join — and on multi-table star
  * queries the initial join order is guesswork AQE can only repair
  * after a full wasted pass. With stats, `LogicalRelation.computeStats`
  * prefers the catalog numbers and the initial plan is right.
  *
  * min/max attach only to types whose external-string form Spark can
  * parse back ([[CatalogColumnStat.fromExternalString]]); strings and
  * binaries keep NDV/null/len stats only (the ANALYZE convention).
  */
object CatalogStats {

  final case class ColStat(
      nDistinct: Long,
      nNull: Long,
      min: Option[String] = None,
      max: Option[String] = None,
      avgLen: Option[Long] = None,
      maxLen: Option[Long] = None,
      hist: Option[org.apache.spark.sql.catalyst.plans.logical.Histogram] =
        None)

  /** Maintained equi-WIDTH bin counts (`map<bin, count>`, the
    * [[graft.pipeline.Rollup.Hist]] partial) → the CBO's equi-HEIGHT
    * [[org.apache.spark.sql.catalyst.plans.logical.Histogram]].
    *
    * Bounds come from a cumulative walk that STEPS on width-bin lower
    * edges (never interpolates inside a bin): the equal-mass bound at
    * row position r is the lower edge of the width bin holding r. A
    * heavy bin therefore REPEATS its edge across many equal-mass
    * bounds, producing zero-width bins — exactly the shape ANALYZE's
    * percentile-based histograms give heavy hitters, and the shape
    * `FilterEstimation`'s equality path reads: a filter on the hot
    * value counts the zero-width bins holding it and estimates its
    * true mass instead of rows/NDV. (Interpolating inside the width
    * bin instead would smear the hot value's mass across (v, v+w) and
    * a point query on v would see almost none of it.) Granularity
    * error is bounded by one binWidth — the histQuantiles contract.
    * The top bound is the last bin's UPPER edge so the histogram
    * covers the full value range. Per-bin NDV is the bin's value span
    * (ceil) capped by its row count — exact per-bin distinct counts
    * are not maintained; for zero-width (single-value) bins it is 1 by
    * construction. */
  def equiHeightHistogram(binCounts: Map[Long, Long], binWidth: Double,
      numBins: Int = 64)
      : Option[org.apache.spark.sql.catalyst.plans.logical.Histogram] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Histogram,
      HistogramBin}
    val bins = binCounts.toSeq.filter(_._2 > 0L).sortBy(_._1)
    val total = bins.map(_._2).sum
    if (total <= 0L) return None
    // min-then-toInt: total alone can exceed Int.Max at scale, and a
    // raw total.toInt would wrap negative and collapse n to 1
    val n = math.min(numBins.toLong, math.max(1L, total)).toInt
    val height = total.toDouble / n
    val cumBefore = bins.scanLeft(0L)(_ + _._2).init
    // lower edge of the width bin holding cumulative row position r;
    // monotone in r, so the walk pointer only ever advances
    var wi = 0
    def valueAt(r: Double): Double = {
      while (wi < bins.size - 1 && cumBefore(wi) + bins(wi)._2 < r)
        wi += 1
      bins(wi)._1 * binWidth
    }
    val bounds = (0 until n).map(j => valueAt(j * height)) :+
      ((bins.last._1 + 1L) * binWidth)
    val out = (0 until n).map { j =>
      val (lo, hi) = (bounds(j), bounds(j + 1))
      HistogramBin(lo, hi,
        math.max(1L, math.min(math.ceil(height).toLong,
          math.max(1L, math.ceil(hi - lo).toLong))))
    }
    Some(Histogram(height, out.toArray))
  }

  private def minMaxParseable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
        BooleanType => true
    case _ => false
  }

  /** Canonicalize a profile-store min/max (a cast-to-string rendering)
    * into the catalog's CURRENT external stat form, by round-tripping
    * through the exact parser the planner will use:
    * [[CatalogColumnStat.fromExternalString]] at `CatalogColumnStat
    * .VERSION`, re-serialized with `toExternalString`. A value the
    * planner could not parse back DROPS the bound instead of poisoning
    * the catalog — a poisoned min/max surfaces as an exception in
    * `toPlanStat` on EVERY later CBO-enabled plan over the table, far
    * from the push that caused it. Robust by construction: whatever
    * lands in the catalog has, by definition, already survived the
    * plan-time parser. */
  private def toCatalogExternal(dt: DataType, name: String,
      v: Option[String]): Option[String] =
    v.flatMap { s =>
      // lenient in: the current-version parser first, then the v1 form
      // (java.sql `Timestamp.valueOf`/`Date.valueOf`) — the profile
      // store's cast-to-string rendering drops the fractional seconds
      // the v2 timestamp pattern REQUIRES, so the display form only
      // parses as v1. Canonical out: re-serialized with
      // toExternalString, so what lands in the catalog is by
      // construction the form the planner parses back.
      Seq(CatalogColumnStat.VERSION, 1).view
        .flatMap { ver =>
          scala.util.Try(CatalogColumnStat
            .fromExternalString(s, name, dt, ver)).toOption
        }.headOption
        .flatMap { internal =>
          scala.util.Try(CatalogColumnStat
            .toExternalString(internal, name, dt)).toOption
        }
    }

  /** Default length estimate per type (the ANALYZE fallback shape). */
  private def defaultLen(dt: DataType): Long = dt match {
    case t: NumericType => math.max(1, t.defaultSize).toLong
    case DateType => 4L
    case TimestampType | TimestampNTZType => 8L
    case BooleanType => 1L
    case _ => 20L
  }

  /** Write `rowCount`/`sizeInBytes` (+ per-column stats) for a
    * registered table. One metadata write; no data touched. */
  def push(spark: SparkSession, db: String, table: String,
      rowCount: Long, sizeInBytes: Long,
      cols: Map[String, ColStat] = Map.empty): Unit = {
    val ident = TableIdentifier(table, Some(db))
    val schema = spark.sessionState.catalog.getTableMetadata(ident).schema
    val colStats = cols.flatMap { case (name, cs) =>
      schema.find(_.name == name).map { f =>
        val mmOk = minMaxParseable(f.dataType)
        name -> CatalogColumnStat(
          distinctCount = Some(BigInt(cs.nDistinct)),
          min = if (mmOk) toCatalogExternal(f.dataType, name, cs.min)
            else None,
          max = if (mmOk) toCatalogExternal(f.dataType, name, cs.max)
            else None,
          nullCount = Some(BigInt(cs.nNull)),
          avgLen = cs.avgLen.orElse(Some(defaultLen(f.dataType))),
          maxLen = cs.maxLen.orElse(Some(defaultLen(f.dataType))),
          // only meaningful for types FilterEstimation reads ranges on
          histogram = if (mmOk) cs.hist else None)
      }
    }
    spark.sessionState.catalog.alterTableStats(ident,
      Some(CatalogStatistics(BigInt(sizeInBytes), Some(BigInt(rowCount)),
        colStats)))
    // a cached relation keeps its old Statistics — drop it so the next
    // plan resolves against the fresh numbers
    spark.sessionState.catalog.invalidateCachedTable(ident)
  }

  // ---------------------------------------------------------------------
  // q261_catalog_stats — the maintained-stats → catalog round-trip as a
  // driver gate: a registered table gets a profile store
  // (init only — the q97b machinery), the store's numbers push into
  // CatalogStatistics, and the gate emits what the CATALOG now says —
  // rowCount, per-column null counts and min/max external strings —
  // against a DuckDB oracle computing the same from the source table.
  // The HLL NDV estimate is not oracle-exact; it surfaces as a VERDICT
  // column (within ±5% of the exact count — the q97b sketch-gate
  // pattern) that the oracle asserts TRUE.
  // ---------------------------------------------------------------------
  private lazy val gateBase: String =
    java.nio.file.Files.createTempDirectory("graft_cstat_").toString

  def q261CatalogStats(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, when}
    val db = "graftstats"
    val tbl = s"orders_cs_${dir.hashCode.toHexString}"
    val cols = Seq("o_orderkey", "o_custkey")
    val root = s"$gateBase/$tbl"
    // DISK state (the parquet copy + the profile store) builds once per
    // process; CATALOG state is per-SESSION (the bench harness runs
    // query groups in fresh sessions whose in-memory catalog starts
    // empty), so registration + the stats push re-run whenever this
    // session hasn't seen the table — the push just re-reads the
    // store's one partial row
    if (!new java.io.File(s"$root.complete").exists()) {
      graft.operators.t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_orderkey") % 9 =!= 0, col("o_custkey"))
            .as("o_custkey"))
        .write.mode("overwrite").parquet(s"$root/t")
      graft.operators.Stats.initProfileStore(s, s"$root/prof",
        s.read.parquet(s"$root/t"), cols, "b0")
      new java.io.File(s"$root.complete").createNewFile()
    }
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!s.catalog.tableExists(s"$db.$tbl")) {
      s.sql(s"CREATE TABLE $db.$tbl USING PARQUET LOCATION '$root/t'")
      pushFromProfileStore(s, db, tbl, s"$root/prof", cols,
        sizeInBytes = 12345L)
    }
    val st = s.sessionState.catalog.getTableMetadata(
      TableIdentifier(tbl, Some(db))).stats.get
    val exact = s.table(s"$db.$tbl").agg(
      org.apache.spark.sql.functions
        .countDistinct(col("o_orderkey")).as("d1"),
      org.apache.spark.sql.functions
        .countDistinct(col("o_custkey")).as("d2")).head()
    val rows = cols.zip(Seq(exact.getLong(0), exact.getLong(1)))
      .map { case (c, ex) =>
        val cs = st.colStats(c)
        val ndv = cs.distinctCount.get.toLong
        (c, st.rowCount.get.toLong, cs.nullCount.get.toLong,
          cs.min.orNull, cs.max.orNull,
          math.abs(ndv - ex).toDouble <= 0.05 * ex)
      }
    val sqlCtx = s
    import sqlCtx.implicits._
    rows.toDF("col_name", "n_rows", "n_null", "min_val", "max_val",
      "ndv_ok")
  }

  val q261CatalogStatsSql: String =
    """WITH t AS (SELECT o_orderkey,
      |  CASE WHEN o_orderkey % 9 <> 0 THEN o_custkey END AS o_custkey
      |  FROM orders)
      |SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
      |  CAST(0 AS BIGINT) AS n_null,
      |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_val,
      |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_val, TRUE AS ndv_ok
      |FROM t
      |UNION ALL
      |SELECT 'o_custkey', COUNT(*),
      |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT),
      |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR),
      |  TRUE
      |FROM t""".stripMargin

  // ---------------------------------------------------------------------
  // q265_cbo_histogram — the maintained-histogram → CBO round-trip as a
  // driver gate: a profile store over orders.o_custkey carries an
  // equi-width map<bin,count> partial (binWidth 10), the push resamples
  // it into the catalog's 64-bin equi-height Histogram, and the gate
  // emits what the CATALOG now says — every bin's quantized bounds,
  // per-bin NDV, and the bin height — against a DuckDB oracle replaying
  // the identical resample from the source table: same binning
  // (floor(v/10.0)), same cumulative walk (first bin whose cumulative
  // count reaches j·height, value = its lower edge), same fixed IEEE
  // double tree, quantized floor(x·1e8) per the float-discipline rule.
  // Any drift in the maintained partials, the resample, or the catalog
  // round-trip hash-fails.
  // ---------------------------------------------------------------------
  def q265CboHistogram(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    val db = "graftstats"
    val tbl = s"orders_h_${dir.hashCode.toHexString}"
    val root = s"$gateBase/$tbl"
    val hist = graft.pipeline.Rollup.Hist("o_custkey", 10.0)
    if (!new java.io.File(s"$root.complete").exists()) {
      graft.operators.t(s, dir, "orders").select(col("o_custkey"))
        .write.mode("overwrite").parquet(s"$root/t")
      graft.operators.Stats.initProfileStore(s, s"$root/prof",
        s.read.parquet(s"$root/t"), Seq("o_custkey"), "b0",
        hists = Seq(hist))
      new java.io.File(s"$root.complete").createNewFile()
    }
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!s.catalog.tableExists(s"$db.$tbl")) {
      s.sql(s"CREATE TABLE $db.$tbl USING PARQUET LOCATION '$root/t'")
      pushFromProfileStore(s, db, tbl, s"$root/prof", Seq("o_custkey"),
        sizeInBytes = 4096L, hists = Seq(hist))
    }
    val h = s.sessionState.catalog.getTableMetadata(
      TableIdentifier(tbl, Some(db))).stats.get
      .colStats("o_custkey").histogram.get
    val rows = h.bins.toSeq.zipWithIndex.map { case (b, j) =>
      (j.toLong, math.floor(b.lo * 1e8).toLong,
        math.floor(b.hi * 1e8).toLong, b.ndv,
        math.floor(h.height * 1e8).toLong)
    }
    val sqlCtx = s
    import sqlCtx.implicits._
    rows.toDF("bin_idx", "lo_q", "hi_q", "bin_ndv", "height_q")
  }

  val q265CboHistogramSql: String =
    """WITH bins AS (
      |  SELECT CAST(FLOOR(o_custkey / 10.0) AS BIGINT) AS bin,
      |    COUNT(*) AS cnt
      |  FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1),
      |o AS (
      |  SELECT bin, cnt, COALESCE(SUM(cnt) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM bins),
      |p AS (SELECT CAST(SUM(cnt) AS DOUBLE) / 64 AS height,
      |             MAX(bin) AS maxbin FROM bins),
      |bounds AS (
      |  SELECT g.j AS j, COALESCE(
      |    (SELECT CAST(o.bin AS DOUBLE) * 10.0 FROM o
      |     WHERE CAST(o.cumb + o.cnt AS DOUBLE) >=
      |       CAST(g.j AS DOUBLE) * p.height
      |     ORDER BY o.bin LIMIT 1),
      |    CAST(p.maxbin AS DOUBLE) * 10.0) AS v
      |  FROM generate_series(0, 63) AS g(j), p
      |  UNION ALL
      |  SELECT 64, CAST(p.maxbin + 1 AS DOUBLE) * 10.0 FROM p)
      |SELECT lo.j AS bin_idx,
      |  CAST(FLOOR(lo.v * 1e8) AS BIGINT) AS lo_q,
      |  CAST(FLOOR(hi.v * 1e8) AS BIGINT) AS hi_q,
      |  GREATEST(1, LEAST(CAST(CEIL(p.height) AS BIGINT),
      |    GREATEST(1, CAST(CEIL(hi.v - lo.v) AS BIGINT)))) AS bin_ndv,
      |  CAST(FLOOR(p.height * 1e8) AS BIGINT) AS height_q
      |FROM bounds lo, bounds hi, p WHERE hi.j = lo.j + 1""".stripMargin

  /** Copy a maintained profile store's numbers into the catalog — the
    * per-sync refresh path ([[graft.Warehouse]] wires it after each
    * profile merge). `sizeInBytes` comes from the caller's file listing
    * (the sync already holds it); everything else reads from the
    * store's ONE partial row, never from the table. */
  def pushFromProfileStore(spark: SparkSession, db: String, table: String,
      storeDir: String, cols: Seq[String], sizeInBytes: Long,
      hists: Seq[graft.pipeline.Rollup.Hist] = Nil): Unit = {
    val rows = graft.operators.Stats
      .readProfileStore(spark, storeDir, cols).collect()
    if (rows.isEmpty) return
    val rowCount = rows.head.getAs[Long]("n_rows")
    // maintained equi-width partials → CBO equi-height histograms; one
    // bounded map read per hist column, no table scan
    val histByCol: Map[String,
        org.apache.spark.sql.catalyst.plans.logical.Histogram] =
      hists.flatMap { h =>
        equiHeightHistogram(
          graft.pipeline.Rollup.histBins(spark, storeDir, h.col),
          h.binWidth).map(h.col -> _)
      }.toMap
    val colStats = rows.map { r =>
      val name = r.getAs[String]("col_name")
      name -> ColStat(
        nDistinct = r.getAs[Long]("n_distinct"),
        nNull = r.getAs[Long]("n_null"),
        min = Option(r.getAs[String]("min_val")),
        max = Option(r.getAs[String]("max_val")),
        hist = histByCol.get(name))
    }.toMap
    push(spark, db, table, rowCount, sizeInBytes, colStats)
  }
}
