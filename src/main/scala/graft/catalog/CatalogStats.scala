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
      maxLen: Option[Long] = None)

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
          maxLen = cs.maxLen.orElse(Some(defaultLen(f.dataType))))
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

  /** Copy a maintained profile store's numbers into the catalog — the
    * per-sync refresh path ([[graft.Warehouse]] wires it after each
    * profile merge). `sizeInBytes` comes from the caller's file listing
    * (the sync already holds it); everything else reads from the
    * store's ONE partial row, never from the table. */
  def pushFromProfileStore(spark: SparkSession, db: String, table: String,
      storeDir: String, cols: Seq[String], sizeInBytes: Long): Unit = {
    val rows = graft.operators.Stats
      .readProfileStore(spark, storeDir, cols).collect()
    if (rows.isEmpty) return
    val rowCount = rows.head.getAs[Long]("n_rows")
    val colStats = rows.map { r =>
      r.getAs[String]("col_name") -> ColStat(
        nDistinct = r.getAs[Long]("n_distinct"),
        nNull = r.getAs[Long]("n_null"),
        min = Option(r.getAs[String]("min_val")),
        max = Option(r.getAs[String]("max_val")))
    }.toMap
    push(spark, db, table, rowCount, sizeInBytes, colStats)
  }
}
