package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utility: salted equi-join (SURVEY.md §7 "[EXT] at
  * 100 TB" risk list). When one join key carries a disproportionate share
  * of rows, a plain shuffle join lands that key's entire volume on one
  * task. Salting splits the hot key's left rows across `saltFactor`
  * sub-keys and replicates the matching right rows to every sub-key, so
  * the hot key's work spreads over `saltFactor` tasks.
  *
  * AQE's skew-join handles sort-merge skew at runtime, but only for
  * detected-at-shuffle skew; explicit salting is the deterministic tool
  * when skew is known (e.g. null-ish sentinel keys, power-law user ids).
  * Correctness is invariant: spec-tested equal to the unsalted join.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, with `left`'s rows
    * salted across `saltFactor` partitions per key. `right` must be the
    * smaller (replicated) side. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  final case class SkewStrategy(nKeys: Long, nRows: Long, maxN: Long,
      skewRatio: Double, useSalting: Boolean)

  /** Evidence-driven strategy selection for equi-joins — the
    * measured-not-guessed discipline [[graft.operators.Dedup
    * .chooseJaccardStrategy]] set for near-dup joins, applied here: ONE
    * map-side-combined aggregate over the probe side's key counts gives
    * max/mean key skew; a key holding `skewThreshold`× the mean row
    * share serializes a plain shuffle join through a single task, so
    * [[saltedInnerJoin]] wins — on anything flatter the salt explode
    * (×saltFactor on the build side) costs more than it saves. AQE's
    * runtime skew split remains the backstop; this is the deterministic
    * pre-commit choice when the evidence is one aggregate away. */
  def chooseSkewStrategy(left: DataFrame, key: String,
      skewThreshold: Double = 16.0): SkewStrategy = {
    // NULL keys can't match in an inner equi-join, so they're cost-free
    // for the plain plan — counting them in the evidence lets a
    // mostly-NULL probe side read as "one hot key" and flip to salting,
    // replicating the build side saltFactor× for rows that never match.
    val r = left.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n")).head()
    val nKeys = r.getLong(0)
    if (nKeys == 0L) return SkewStrategy(0L, 0L, 0L, 0.0,
      useSalting = false)
    val (nRows, maxN) = (r.getLong(1), r.getLong(2))
    val skew = maxN.toDouble / (nRows.toDouble / nKeys.toDouble)
    SkewStrategy(nKeys, nRows, maxN, skew,
      useSalting = skew >= skewThreshold)
  }

  /** Auto inner equi-join: read the skew evidence, run the winning
    * plan. Output is identical either way (spec'd); only the cost
    * shape differs. `right` must be the smaller side (replicated
    * `saltFactor`× when salting wins). */
  def innerJoinAuto(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, skewThreshold: Double = 16.0): DataFrame =
    if (chooseSkewStrategy(left, key, skewThreshold).useSalting)
      saltedInnerJoin(left, right, key, saltFactor)
    else left.join(right, Seq(key))

  /** CATALOG-FIRST auto inner equi-join: the strategy comes from the
    * maintained catalog statistics when `db.table` (the catalog entry
    * describing `left`) carries them — ZERO probe-side jobs, pure
    * metadata ([[chooseSkewStrategyFromCatalog]]) — and falls back to
    * the one-aggregate scan evidence otherwise. On a 100 TB probe side
    * the scan evidence is itself a full pass; a warehouse that pushes
    * profile stats per sync ([[graft.catalog.CatalogStats]]) gets the
    * same decision for free. Output is identical on every path
    * (spec'd); only the evidence cost differs. */
  def innerJoinAutoCatalog(spark: org.apache.spark.sql.SparkSession,
      db: String, table: String, left: DataFrame, right: DataFrame,
      key: String, saltFactor: Int = 8,
      skewThreshold: Double = 16.0): DataFrame = {
    val fromStats =
      try Some(chooseSkewStrategyFromCatalog(spark, db, table, key,
        skewThreshold))
      catch {
        case _: IllegalStateException => None // no stats pushed
        case _: org.apache.spark.sql.AnalysisException => None // no table
      }
    val useSalting = fromStats.map(_.useSalting).getOrElse(
      chooseSkewStrategy(left, key, skewThreshold).useSalting)
    if (useSalting) saltedInnerJoin(left, right, key, saltFactor)
    else left.join(right, Seq(key))
  }

  // ---------------------------------------------------------------------
  // q260_skew_strategy — the join selector's evidence and verdict,
  // oracle-replayed (the q250 pattern for joins): lineitem keyed by a
  // deliberately skewed derived key (30% of rows collapse onto one hot
  // key) must measure the skew, pick SALTING, and still produce the
  // exact join aggregates a plain declarative join yields — pinning
  // both the evidence arithmetic and the salted path's output identity
  // inside one gate.
  // ---------------------------------------------------------------------
  def q260SkewStrategy(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val li = t(s, dir, "lineitem")
      .select(when(col("l_orderkey") % 10 < 3, lit(-1L))
        .otherwise(col("l_orderkey")).as("k"))
    val dim = li.select(col("k")).distinct()
      .select(col("k"), pmod(col("k"), lit(97L)).as("w"))
    val st = chooseSkewStrategy(li, "k")
    // the verdict is already in hand — run the winning plan directly
    // instead of innerJoinAuto re-measuring the same evidence (one fewer
    // full probe-side aggregate job; identical decision by construction)
    val joined = (if (st.useSalting) saltedInnerJoin(li, dim, "k", 8)
      else li.join(dim, Seq("k")))
      .agg(count(lit(1)).as("jn"), sum(col("w")).as("jw")).head()
    val sqlCtx = s
    import sqlCtx.implicits._
    Seq((st.nKeys, st.nRows, st.maxN,
        BigDecimal(st.skewRatio).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
        st.useSalting, joined.getLong(0),
        if (joined.isNullAt(1)) 0L else joined.getLong(1)))
      .toDF("n_keys", "n_rows", "max_n", "skew_ratio", "use_salting",
        "join_rows", "join_w_sum")
  }

  val q260SkewStrategySql: String =
    """WITH k AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 3 THEN -1
      |              ELSE l_orderkey END AS k
      |  FROM lineitem),
      |cnt AS (SELECT k, COUNT(*) AS n FROM k GROUP BY k),
      |ev AS (
      |  SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
      |    CAST(MAX(n) AS BIGINT) AS max_n,
      |    CAST(MAX(n) AS DOUBLE)
      |      / (CAST(SUM(n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
      |      AS skew
      |  FROM cnt),
      |j AS (
      |  SELECT COUNT(*) AS join_rows,
      |    CAST(SUM(((k % 97) + 97) % 97) AS BIGINT) AS join_w_sum
      |  FROM k)
      |SELECT n_keys, n_rows, max_n, ROUND(skew, 6) AS skew_ratio,
      |  skew >= 16.0 AS use_salting, join_rows, join_w_sum
      |FROM ev CROSS JOIN j""".stripMargin

  /** Skew strategy from MAINTAINED CATALOG STATISTICS — zero scan.
    * [[chooseSkewStrategy]] pays one aggregate over the probe side per
    * join; when the table's stats are maintained per sync
    * ([[graft.catalog.CatalogStats]], pushed from the incremental
    * profile store with histogram partials), the same evidence is
    * already in the catalog: rowCount − nullCount bounds the matchable
    * rows, the NDV sketch gives the key count, and the equi-height
    * histogram's ZERO-WIDTH bins mark mass concentrated on one bin
    * edge — the longest run of an identical zero-width bound, times
    * the bin height, estimates the hottest bin's mass. Resolution is
    * the profile's binWidth: a hot BIN of many keys reads as one hot
    * key, which errs toward salting — correct output, merely broader
    * replication than strictly needed. Use this on the 100 TB probe
    * side where even one evidence aggregate is a full scan; fall back
    * to [[chooseSkewStrategy]] when no stats are maintained. */
  def chooseSkewStrategyFromCatalog(
      spark: org.apache.spark.sql.SparkSession, db: String, table: String,
      key: String, skewThreshold: Double = 16.0): SkewStrategy = {
    val st = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table, Some(db)))
      .stats.getOrElse(throw new IllegalStateException(
        s"$db.$table has no catalog statistics — push them " +
          "(CatalogStats) or use chooseSkewStrategy"))
    val cs = st.colStats.getOrElse(key, throw new IllegalStateException(
      s"$db.$table.$key has no column statistics"))
    val nRows = st.rowCount.map(_.toLong).getOrElse(0L) -
      cs.nullCount.map(_.toLong).getOrElse(0L)
    val nKeys = cs.distinctCount.map(_.toLong).getOrElse(0L)
    if (nRows <= 0L || nKeys <= 0L)
      return SkewStrategy(nKeys, math.max(0L, nRows), 0L, 0.0,
        useSalting = false)
    // the uniform estimate — the histogram-less fallback AND the
    // no-concentration-signal case below
    val mean = (nRows + nKeys - 1L) / nKeys
    val maxN = cs.histogram match {
      case Some(h) =>
        val runs = h.bins.toSeq.filter(b => b.lo == b.hi)
          .groupBy(_.lo).map(_._2.size)
        // no zero-width bins = no mass concentration the histogram can
        // see (every bin < ~2×height). Estimating the hot key at bin
        // height here would be total/numBins — for a flat table with
        // many keys that is >> mean and would salt a join that needs
        // no salting. No signal → the uniform estimate; a hot key
        // below bin resolution is genuinely undetectable from these
        // stats (bounded by ~2·height), which AQE's runtime skew split
        // still backstops.
        if (runs.isEmpty) mean
        else math.ceil(h.height * runs.max).toLong
      case None => mean
    }
    val skew = maxN.toDouble / (nRows.toDouble / nKeys.toDouble)
    SkewStrategy(nKeys, nRows, maxN, skew,
      useSalting = skew >= skewThreshold)
  }

  // ---------------------------------------------------------------------
  // q266_skew_from_stats — the zero-scan strategy selection, oracle-
  // replayed: the q260 skewed key (30% of lineitem collapses onto one
  // hot key) lands in a profile store with a binWidth-1000 histogram
  // partial, pushes into the catalog, and the strategy derives from the
  // CATALOG ALONE. The histogram-borne evidence (bin height × longest
  // zero-width-bound run) is deterministic, so the oracle replays it
  // from the source table through the identical resample (the q265
  // derivation); the HLL-borne parts surface as verdict columns
  // (±5% NDV; the salting verdict, and its agreement with the scan-
  // based selector, are robustly TRUE at this skew).
  // ---------------------------------------------------------------------
  private lazy val gateBase: String =
    java.nio.file.Files.createTempDirectory("graft_skstat_").toString

  def q266SkewFromStats(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val db = "graftstats"
    val tbl = s"li_sk_${dir.hashCode.toHexString}"
    val root = s"$gateBase/$tbl"
    val hist = graft.pipeline.Rollup.Hist("k", 1000.0)
    if (!new java.io.File(s"$root.complete").exists()) {
      t(s, dir, "lineitem")
        .select(when(col("l_orderkey") % 10 < 3, lit(-1L))
          .otherwise(col("l_orderkey")).as("k"))
        .write.mode("overwrite").parquet(s"$root/t")
      graft.operators.Stats.initProfileStore(s, s"$root/prof",
        s.read.parquet(s"$root/t"), Seq("k"), "b0", hists = Seq(hist))
      new java.io.File(s"$root.complete").createNewFile()
    }
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!s.catalog.tableExists(s"$db.$tbl")) {
      s.sql(s"CREATE TABLE $db.$tbl USING PARQUET LOCATION '$root/t'")
      graft.catalog.CatalogStats.pushFromProfileStore(s, db, tbl,
        s"$root/prof", Seq("k"), sizeInBytes = 4096L, hists = Seq(hist))
    }
    val fromStats = chooseSkewStrategyFromCatalog(s, db, tbl, "k")
    val fromScan = chooseSkewStrategy(s.read.parquet(s"$root/t"), "k")
    val exactKeys = s.read.parquet(s"$root/t")
      .agg(countDistinct(col("k"))).head().getLong(0)
    val sqlCtx = s
    import sqlCtx.implicits._
    Seq((fromStats.nRows, fromStats.maxN,
        math.abs(fromStats.nKeys - exactKeys).toDouble <= 0.05 * exactKeys,
        fromStats.useSalting,
        fromStats.useSalting == fromScan.useSalting))
      .toDF("n_rows", "max_n_est", "ndv_ok", "use_salting", "agrees_scan")
  }

  val q266SkewFromStatsSql: String =
    """WITH k AS (
      |  SELECT CASE WHEN l_orderkey % 10 < 3 THEN CAST(-1 AS BIGINT)
      |              ELSE l_orderkey END AS k
      |  FROM lineitem),
      |bins AS (
      |  SELECT CAST(FLOOR(k / 1000.0) AS BIGINT) AS bin, COUNT(*) AS cnt
      |  FROM k GROUP BY 1),
      |o AS (
      |  SELECT bin, cnt, COALESCE(SUM(cnt) OVER (ORDER BY bin
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      |  FROM bins),
      |p AS (SELECT CAST(SUM(cnt) AS DOUBLE) / 64 AS height,
      |             MAX(bin) AS maxbin FROM bins),
      |bounds AS (
      |  SELECT g.j AS j, COALESCE(
      |    (SELECT CAST(o.bin AS DOUBLE) * 1000.0 FROM o
      |     WHERE CAST(o.cumb + o.cnt AS DOUBLE) >=
      |       CAST(g.j AS DOUBLE) * p.height
      |     ORDER BY o.bin LIMIT 1),
      |    CAST(p.maxbin AS DOUBLE) * 1000.0) AS v
      |  FROM generate_series(0, 63) AS g(j), p
      |  UNION ALL
      |  SELECT 64, CAST(p.maxbin + 1 AS DOUBLE) * 1000.0 FROM p),
      |zw AS (
      |  SELECT lo.v AS edge, COUNT(*) AS run
      |  FROM bounds lo, bounds hi
      |  WHERE hi.j = lo.j + 1 AND lo.v = hi.v
      |  GROUP BY lo.v),
      |mr AS (SELECT COALESCE(MAX(run), 1) AS max_run FROM zw)
      |SELECT (SELECT COUNT(*) FROM k) AS n_rows,
      |  CAST(CEIL(p.height * mr.max_run) AS BIGINT) AS max_n_est,
      |  TRUE AS ndv_ok, TRUE AS use_salting, TRUE AS agrees_scan
      |FROM p, mr""".stripMargin

  /** JOIN-FANOUT diagnostic — the pre-flight check before any fact ⋈
    * fact join at scale: per join key, the output multiplicity is
    * |left rows| × |right rows|, and the top few keys routinely decide
    * whether the join is feasible at all. One aggregation per side over
    * the key (both map-side partial), an inner join of the two count
    * tables (small — one row per shared key), TakeOrdered top-k by the
    * product. This is the evidence that picks between a plain join,
    * [[SkewJoin.saltedInnerJoin]], and AQE skew splitting. */
  def joinFanout(lhs: org.apache.spark.sql.DataFrame,
      rhs: org.apache.spark.sql.DataFrame, key: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val lc = lhs.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val rc = rhs.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    val prod = lc.join(rc, key)
      .select(col(key), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("fanout"))
    val top = prod.orderBy(col("fanout").desc, col(key).asc).limit(k)
    graft.operators.Similarity.rankBounded(top, "rnk",
        Seq(col("fanout").desc, col(key).asc))
      .select(col("rnk").cast("int").as("rnk"), col(key),
        col("n_left"), col("n_right"), col("fanout"))
  }

  // ---------------------------------------------------------------------
  // q197_join_fanout — the lineitem ⋈ orders-by-custkey hazard panel:
  // top-20 customer keys by would-be join multiplicity between the two
  // fact tables. Integer evidence only.
  // ---------------------------------------------------------------------
  def q197JoinFanout(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val liByCust = li.join(o.select(col("o_orderkey"), col("o_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"))
    joinFanout(liByCust, o.select(col("o_custkey").as("custkey")),
      "custkey", 20)
  }

  val q197JoinFanoutSql: String =
    """WITH lc AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_left
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey),
      |rc AS (SELECT o_custkey AS custkey, COUNT(*) AS n_right
      |       FROM orders GROUP BY o_custkey),
      |prod AS (
      |  SELECT lc.custkey, lc.n_left, rc.n_right,
      |    lc.n_left * rc.n_right AS fanout
      |  FROM lc JOIN rc ON lc.custkey = rc.custkey)
      |SELECT CAST(rnk AS INT) AS rnk, custkey, n_left, n_right, fanout
      |FROM (
      |  SELECT custkey, n_left, n_right, fanout,
      |    ROW_NUMBER() OVER (ORDER BY fanout DESC, custkey ASC) AS rnk
      |  FROM prod)
      |WHERE rnk <= 20""".stripMargin

  /** BUCKET-SKEW audit — before committing to a bucketed layout on a
    * key, how evenly does the bucket assignment spread the rows? Emits
    * the bucket-size distribution summary (max/mean ratio, non-empty
    * count) — a skewed bucketing key silently serializes every
    * co-bucketed join through its hot buckets. The caller supplies the
    * bucket expression (audit the SAME rule the layout uses); one
    * count aggregate over the bucket id. */
  def bucketSkew(df: org.apache.spark.sql.DataFrame,
      bucketExpr: org.apache.spark.sql.Column,
      nBuckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sizes = df.select(bucketExpr.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    sizes.agg(
      count(lit(1)).as("n_nonempty"),
      lit(nBuckets).as("n_buckets"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_bucket"),
      round(max(col("n")).cast("double") /
        (sum(col("n")).cast("double") / lit(nBuckets.toDouble)), 6)
        .as("skew_ratio"))
  }

  // ---------------------------------------------------------------------
  // q224_bucket_skew — would bucketing lineitem by l_orderkey at 64
  // buckets skew? The audited rule is the md5-prefix bucket (the q63
  // cross-engine identity), so the summary is hash-exact, not
  // rows-only.
  // ---------------------------------------------------------------------
  def q224BucketSkew(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    bucketSkew(t(s, dir, "lineitem"),
      pmod(conv(substring(md5(col("l_orderkey").cast("string")
        .cast("binary")), 1, 4), 16, 10).cast("long"), lit(64L)), 64)
  }

  val q224BucketSkewSql: String =
    """WITH b AS (
      |  SELECT CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
      |      1, 4) AS BIGINT) % 64 AS bucket
      |  FROM lineitem),
      |sizes AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket)
      |SELECT COUNT(*) AS n_nonempty, 64 AS n_buckets,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  CAST(MAX(n) AS BIGINT) AS max_bucket,
      |  ROUND(CAST(MAX(n) AS DOUBLE)
      |    / (CAST(SUM(n) AS DOUBLE) / 64.0), 6) AS skew_ratio
      |FROM sizes""".stripMargin

}
