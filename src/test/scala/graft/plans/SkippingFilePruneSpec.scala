package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.pipeline.Skipping

class SkippingFilePruneSpec extends SparkSpec {

  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.inputFiles.toSeq
    }.flatten

  test("a plain DataFrame range filter scans only stats-matched files") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    SkippingFilePrune.register(spark)
    val path = Files.createTempDirectory("prune_rule").toString + "/t"
    (1L to 1000L).map(k => (k, k * 2)).toDF("k", "v")
      .repartitionByRange(10, col("k")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    val q = spark.read.parquet(path)
      .filter(col("k") >= 450L && col("k") <= 520L)
    val files = scannedFiles(q)
    assert(files.nonEmpty && files.size <= 2,
      s"10 disjoint range files, [450,520] spans ≤ 2 — scanned " +
        s"${files.size}")
    // and the answer is EXACTLY the unpruned one
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (450L to 520L).map(k => (k, k * 2)).toSet)
    // equality predicates prune too (lo = hi)
    val eq = spark.read.parquet(path).filter(col("k") === 7L)
    assert(scannedFiles(eq).size == 1)
    assert(eq.collect().map(_.getLong(0)).toSeq == Seq(7L))
  }

  test("stale stats: unknown files always scan; strict bounds widen safely") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    SkippingFilePrune.register(spark)
    val path = Files.createTempDirectory("prune_stale").toString + "/t"
    (1L to 100L).map(k => (k, "old")).toDF("k", "src")
      .coalesce(1).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    (200L to 210L).map(k => (k, "new")).toDF("k", "src")
      .coalesce(1).write.mode("append").parquet(path)
    // the appended file is stats-unknown: it MUST be scanned even
    // though [205,207] misses the known file entirely
    val q = spark.read.parquet(path)
      .filter(col("k") > 204L && col("k") < 208L) // strict bounds
    assert(q.collect().map(_.getLong(0)).toSet == Set(205L, 206L, 207L),
      "stale stats must degrade to scanning unknown files")
    assert(scannedFiles(q).size == 1,
      "the stats-known [1,100] file must still prune")
  }

  test("IN-list filters prune through the bloom stats engine-side") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    SkippingFilePrune.register(spark)
    val path = Files.createTempDirectory("prune_bloom").toString + "/t"
    // hash-clustered: min/max can't prune, bloom can
    (1L to 2000L).map(k => (k, k % 7)).toDF("k", "v")
      .repartition(8, col("k")).write.parquet(path)
    Skipping.buildBloom(spark, path, "k")
    val q = spark.read.parquet(path)
      .filter(col("k").isin(500L, 1500L))
    val files = scannedFiles(q)
    assert(files.nonEmpty && files.size < 8,
      s"bloom must prune below the 8-file full set, got ${files.size}")
    assert(q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((500L, 500L % 7), (1500L, 1500L % 7)))
    // composition: add min/max stats on the same table — a conjunctive
    // range+IN predicate prunes through BOTH (intersection of supersets)
    Skipping.buildStats(spark, path, Seq("v"))
    val q2 = spark.read.parquet(path)
      .filter(col("v") >= 0L && col("v") <= 6L && col("k").isin(500L))
    assert(scannedFiles(q2).size < 8)
    assert(q2.collect().map(_.getLong(0)).toSeq == Seq(500L))
  }

  test("string columns prune too: internal literal values convert to external") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    SkippingFilePrune.register(spark)
    val path = Files.createTempDirectory("prune_str").toString + "/t"
    (1 to 900).map(i => (f"k$i%04d", i.toLong)).toDF("s", "v")
      .repartitionByRange(9, col("s")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("s"))
    Skipping.buildBloom(spark, path, "s")
    // a string RANGE filter (UTF8String literals inside Catalyst)
    val q = spark.read.parquet(path)
      .filter(col("s") >= "k0300" && col("s") <= "k0350")
    assert(scannedFiles(q).size < 9, "string range must prune")
    assert(q.collect().map(_.getString(0)).toSet ==
      (300 to 350).map(i => f"k$i%04d").toSet)
    // and a string IN filter through the bloom
    val q2 = spark.read.parquet(path).filter(col("s").isin("k0042"))
    assert(q2.collect().map(_.getLong(1)).toSeq == Seq(42L))
  }

  test("partitioned tables prune within partitions, partition values intact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    SkippingFilePrune.register(spark)
    val path = Files.createTempDirectory("prune_part").toString + "/t"
    // 3 Hive partitions x 2 k-range-clustered files each
    (1L to 600L).map(k => (k, (k % 3).toString, k * 2))
      .toDF("k", "p", "v")
      .repartitionByRange(6, col("p"), col("k"))
      .write.partitionBy("p").parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    val total = spark.read.parquet(path).inputFiles.length
    assert(total >= 6)
    val q = spark.read.parquet(path)
      .filter(col("k") >= 500L && col("k") <= 580L)
    val scanned = scannedFiles(q)
    assert(scanned.nonEmpty && scanned.size < total,
      s"within-partition file skipping must engage: " +
        s"${scanned.size} of $total")
    // exactness INCLUDING the partition column (the spec-carry test: a
    // dropped or re-typed partition spec would break values here);
    // partition discovery types the dir values int — cast for a stable
    // comparison, the same as an unpruned read would give
    val got = q.select(col("k"), col("p").cast("long"), col("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == (500L to 580L).map(k => (k, k % 3, k * 2)).toSet)
    // and composition with Catalyst partition pruning: a partition
    // predicate narrows further without losing rows
    val q2 = spark.read.parquet(path)
      .filter(col("k") >= 500L && col("k") <= 580L && col("p") === 1)
    assert(scannedFiles(q2).size <= scanned.size)
    assert(q2.select("k").collect().map(_.getLong(0)).toSet ==
      (500L to 580L).filter(_ % 3 == 1).toSet)
  }

  test("tables without stats, partitioned tables, and non-range filters are untouched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    SkippingFilePrune.register(spark)
    val base = Files.createTempDirectory("prune_skip").toString
    // no stats dir → no rewrite, full answer
    val p1 = s"$base/nostats"
    (1L to 50L).map(k => (k, k)).toDF("k", "v")
      .repartitionByRange(5, col("k")).write.parquet(p1)
    val q1 = spark.read.parquet(p1).filter(col("k") between (10L, 20L))
    assert(q1.count() == 11L)
    assert(scannedFiles(q1).size == 5, "no stats → nothing pruned")
    // a filter matching EVERYTHING prunes nothing and changes nothing
    val p2 = s"$base/part"
    (1L to 50L).map(k => (k, k % 3, k)).toDF("k", "p", "v")
      .write.partitionBy("p").parquet(p2)
    Skipping.buildStats(spark, p2, Seq("k"))
    val q2 = spark.read.parquet(p2).filter(col("k") >= 1L && col("k") <= 50L)
    assert(q2.count() == 50L)
    // a filter with no two-sided range on a stats column → untouched
    val q3 = spark.read.parquet(p1).filter(col("v") =!= 3L)
    assert(q3.count() == 49L)
  }
}
