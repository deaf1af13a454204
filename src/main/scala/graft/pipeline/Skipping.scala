package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping: a persisted per-file min/max stats table and
  * a range-predicate reader that scans only the files whose range can
  * match — the Delta/Iceberg "file skipping" idea (Armbrust et al., VLDB
  * 2020 §4.2) rebuilt on plain parquet directories.
  *
  * Parquet already prunes ROW GROUPS from footers, but the scan still
  * opens every footer — at 100 TB / ~1 M files that is a million S3
  * round-trips per query before a byte of data moves. A stats table is
  * one row per file (MBs at most); planning reads THAT instead, and a
  * selective range query on sorted/clustered data (Z-ordered via
  * [[Layout.zorderWrite]], range-partitioned syncs) touches only the
  * files it must.
  *
  * Contract:
  *  - stats rows describe the files they were built from; files that
  *    appeared SINCE (incremental appends) are unknown and always
  *    scanned — staleness degrades to correct-but-less-pruned, never to
  *    wrong answers (spec'd);
  *  - a file whose stats are NULL (all-null column) cannot satisfy a
  *    range predicate (SQL comparison with NULL is never true) and is
  *    skipped — correct for range reads, which is the only predicate
  *    shape this API offers (an IS NULL reader would need null counts);
  *  - the matched-file list is driver-side, like the file listing any
  *    scan already materializes — the point is it comes from one small
  *    parquet read instead of a million footer opens.
  */
object Skipping {

  private val StatsDir = "_skip_stats"

  private def fsFor(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def listDataFiles(spark: SparkSession, tableDir: String)
      : Seq[String] = {
    val fs = fsFor(spark, tableDir)
    def walk(p: Path): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toUri.toString)
      }
    walk(new Path(tableDir))
  }

  /** Build (or rebuild) the per-file min/max stats table for `cols`.
    * One scan of the table, grouped by `_metadata.file_path` — the
    * amortized analog of collecting stats at write-commit time, run on
    * the maintenance cadence (after a compaction, which invalidates
    * file identities anyway). Stats live under `<table>/_skip_stats`
    * (underscore-prefixed → invisible to every table reader). */
  def buildStats(spark: SparkSession, tableDir: String,
      cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "need at least one column to collect stats on")
    val df = spark.read.parquet(tableDir)
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val stats = df
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    SafeSwap.replace(s"$tableDir/$StatsDir") { tmp =>
      stats.coalesce(1).write.mode("overwrite").parquet(tmp)
    }
  }

  /** The files a range predicate `lo <= c <= hi` may need: stats-known
    * files whose [min,max] overlaps the range, plus every file unknown
    * to the stats (appended since the last build — scanned
    * unconditionally for correctness). */
  def candidateFiles(spark: SparkSession, tableDir: String, c: String,
      lo: Any, hi: Any): (Seq[String], Seq[String]) = {
    val stats = spark.read.parquet(s"$tableDir/$StatsDir")
    // NULL-stat files drop here too: NULL < lo is NULL → not kept
    val matched = stats
      .filter(!(col(s"max_$c") < lit(lo) || col(s"min_$c") > lit(hi)))
      .select(col("file")).collect().map(_.getString(0)).toSeq
    // canonicalize before comparing: `_metadata.file_path` renders
    // `file:///t/x` where the listing renders `file:/t/x` — a raw
    // string compare would call every known file unknown
    def canon(s: String) = new Path(s).toUri.getPath
    val known = stats.select(col("file")).collect()
      .map(r => canon(r.getString(0))).toSet
    val unknown = listDataFiles(spark, tableDir)
      .filterNot(f => known(canon(f)))
    (matched, unknown)
  }

  /** Range read through the stats table: scans matched + unknown files
    * only, then applies the exact predicate (file-level skipping is a
    * superset filter, same as row-group pruning). `basePath` keeps
    * Hive partition columns alive when reading leaf files directly. */
  def readRange(spark: SparkSession, tableDir: String, c: String,
      lo: Any, hi: Any): DataFrame = {
    val (matched, unknown) = candidateFiles(spark, tableDir, c, lo, hi)
    val files = matched ++ unknown
    val pred = col(c) >= lit(lo) && col(c) <= lit(hi)
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(pred).limit(0)
    else
      spark.read.option("basePath", tableDir).parquet(files: _*)
        .filter(pred)
  }

  // --- per-file bloom skipping (equality predicates) ---------------------
  // Min/max prunes RANGES on clustered columns; it is blind to EQUALITY
  // lookups on a column whose values scatter across each file's full
  // range (a hash-clustered user/doc id: every file's [min,max] spans
  // everything, zero pruning). A per-file bloom answers "might this file
  // contain value v" regardless of ordering — the Delta/Iceberg
  // bloom-skipping idea on plain parquet dirs, reusing Catalyst's OWN
  // sketch (`BloomFilterAggregate`, the runtime-join-filter aggregate,
  // exposed as `graft_bloom_agg`) so build-side hashing, sizing, and the
  // wire format are all Spark's. Probe side deserializes with the public
  // `org.apache.spark.util.sketch.BloomFilter.readFrom` — the same class
  // the aggregate serializes — and hashes the probe values with the same
  // `xxhash64` expression the build used, evaluated BY Spark on a
  // one-row plan so the two sides can never disagree.
  //
  // Contract mirrors [[candidateFiles]]: files unknown to the stats are
  // always scanned (stale ⇒ less pruning, never wrong answers); a bloom
  // "yes" is a maybe (the exact predicate re-filters after the read);
  // a bloom "no" is definite — no false negatives, so pruning is safe.
  // Scale: the stats table is one row + one ~(bits/8) sketch per file —
  // planning reads THAT, not a million parquet footers.

  private def bloomDir(c: String) = s"_skip_bloom_$c"

  /** Build (or rebuild) the per-file bloom stats for equality lookups on
    * `c`. `expectedItemsPerFile` sizes each sketch (Spark's default 8
    * bits/item ≈ 2% FPP at capacity; oversize it and the FPP collapses
    * toward zero — cheap insurance, sketches are per-FILE). */
  def buildBloom(spark: SparkSession, tableDir: String, c: String,
      expectedItemsPerFile: Long = 1000000L): Unit = {
    graft.functions.Bloom.register(spark)
    val df = spark.read.parquet(tableDir)
    val stats = df
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(expr(s"graft_bloom_agg(xxhash64($c), " +
        s"${expectedItemsPerFile}L)").as("bloom"),
        count(lit(1)).as("n_rows"))
    SafeSwap.replace(s"$tableDir/${bloomDir(c)}") { tmp =>
      stats.coalesce(1).write.mode("overwrite").parquet(tmp)
    }
  }

  /** The files an equality/IN predicate on `c` may need: bloom-matched
    * known files plus every file unknown to the stats. A file whose
    * sketch is NULL (no rows reached the aggregate — possible only for
    * an all-NULL column slice under a pre-filter) cannot match a
    * non-null probe and is skipped. */
  def candidateFilesEq(spark: SparkSession, tableDir: String, c: String,
      values: Seq[Any]): (Seq[String], Seq[String]) = {
    require(values.nonEmpty, "need at least one lookup value")
    val stats = spark.read.parquet(s"$tableDir/${bloomDir(c)}")
      .select(col("file"), col("bloom")).collect()
    // hash the probe values with Spark's own xxhash64 expression — the
    // exact function the build-side aggregate hashed with
    val hashRow = spark.range(1)
      .select(values.map(v => xxhash64(lit(v))): _*).head()
    val hashes = values.indices.map(hashRow.getLong)
    val matched = stats.toSeq.filter { r =>
      !r.isNullAt(1) && {
        val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        hashes.exists(bf.mightContainLong)
      }
    }.map(_.getString(0))
    def canon(s: String) = new Path(s).toUri.getPath
    val known = stats.map(r => canon(r.getString(0))).toSet
    val unknown = listDataFiles(spark, tableDir)
      .filterNot(f => known(canon(f)))
    (matched, unknown)
  }

  /** Point/IN lookup through the bloom stats: scans bloom-matched +
    * unknown files only, then applies the exact `IN` predicate (bloom
    * hits are a superset — FPs re-filter away). */
  def readPointLookup(spark: SparkSession, tableDir: String, c: String,
      values: Seq[Any]): DataFrame = {
    val (matched, unknown) = candidateFilesEq(spark, tableDir, c, values)
    val files = matched ++ unknown
    val pred = col(c).isin(values: _*)
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(pred).limit(0)
    else
      spark.read.option("basePath", tableDir).parquet(files: _*)
        .filter(pred)
  }

  /** Combined read: `lo <= rc <= hi AND ec IN (values)` pruned through
    * BOTH stats — a file survives only if its [min,max] of `rc` overlaps
    * the range AND its bloom on `ec` might contain a probe value (each
    * pruning is a safe superset, so their INTERSECTION is too). The
    * common warehouse predicate shape — "this customer, this month" —
    * where either index alone leaves 10× the files. Unknown files are
    * the UNION of both sides' unknowns: a file missing from either
    * stats table cannot be safely pruned by the other's verdict alone.
    */
  def readRangeAndPointLookup(spark: SparkSession, tableDir: String,
      rc: String, lo: Any, hi: Any,
      ec: String, values: Seq[Any]): DataFrame = {
    def canon(s: String) = new Path(s).toUri.getPath
    val (rm, ru) = candidateFiles(spark, tableDir, rc, lo, hi)
    val (em, eu) = candidateFilesEq(spark, tableDir, ec, values)
    val unknown = (ru.map(canon) ++ eu.map(canon)).toSet
    val rangeOk = rm.map(canon).toSet ++ ru.map(canon)
    val eqOk = em.map(canon).toSet ++ eu.map(canon)
    val keep = (rm ++ ru ++ em ++ eu)
      .groupBy(canon).map(_._2.head).toSeq
      .filter(f => rangeOk(canon(f)) && eqOk(canon(f)))
    val pred = col(rc) >= lit(lo) && col(rc) <= lit(hi) &&
      col(ec).isin(values: _*)
    if (keep.isEmpty)
      spark.read.parquet(tableDir).filter(pred).limit(0)
    else
      spark.read.option("basePath", tableDir).parquet(keep: _*)
        .filter(pred)
  }
}
