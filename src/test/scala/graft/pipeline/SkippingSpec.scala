package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class SkippingSpec extends SparkSpec {

  test("range read touches only overlapping files and matches the full scan") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip").toString + "/t"
    (1L to 1000L).map(k => (k, k * 2)).toDF("k", "v")
      .repartitionByRange(10, col("k")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    val (matched, unknown) = Skipping.candidateFiles(spark, path,
      "k", 450L, 520L)
    assert(unknown.isEmpty, "stats were just built — nothing unknown")
    // 1000 keys over 10 disjoint range files ≈ 100/file; [450,520]
    // spans at most 2 of them
    assert(matched.size <= 2 && matched.nonEmpty,
      s"expected ≤2 candidate files, got ${matched.size}")
    val pruned = Skipping.readRange(spark, path, "k", 450L, 520L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = spark.read.parquet(path)
      .filter(col("k") >= 450L && col("k") <= 520L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full)
    assert(pruned.size == 71)
  }

  test("files appended after the stats build are always scanned (stale-safe)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_stale").toString + "/t"
    (1L to 100L).map(k => (k, "old")).toDF("k", "src")
      .coalesce(1).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    // an incremental append the stats have never seen — IN the range
    (200L to 210L).map(k => (k, "new")).toDF("k", "src")
      .coalesce(1).write.mode("append").parquet(path)
    val (matched, unknown) = Skipping.candidateFiles(spark, path,
      "k", 205L, 207L)
    assert(matched.isEmpty, "the stats-known file [1,100] cannot match")
    assert(unknown.size == 1, "the appended file must be a candidate")
    val rows = Skipping.readRange(spark, path, "k", 205L, 207L)
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(205L, 206L, 207L),
      "stale stats must degrade to scanning unknown files, never to " +
        "missing their rows")
  }

  test("partition columns survive leaf-file reads; all-null stats files skip") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_part").toString + "/t"
    // Hive-partitioned table + one partition whose stats column is
    // entirely NULL (its min/max stats are NULL → never range-matched)
    (1L to 50L).map(k => (k, Some(k * 10), "a")).toDF("k", "m", "p")
      .unionByName(
        (51L to 60L).map(k => (k, Option.empty[Long], "b")).toDF("k", "m", "p"))
      .repartitionByRange(3, col("p"), col("k"))
      .write.partitionBy("p").parquet(path)
    Skipping.buildStats(spark, path, Seq("m"))
    val got = Skipping.readRange(spark, path, "m", 100L, 200L)
      .select("k", "m", "p").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == (10L to 20L).map(k => (k, k * 10, "a")).toSet,
      "basePath read must keep the partition column; NULL rows excluded")
    val (matched, unknown) = Skipping.candidateFiles(spark, path,
      "m", 100L, 200L)
    assert(unknown.isEmpty)
    assert(matched.forall(_.contains("p=a")),
      "the all-NULL partition's files must be skipped, not scanned")
  }

  test("bloom lookup prunes hash-clustered files min/max cannot, no false negatives") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_bloom").toString + "/t"
    // hash-clustered on k: every FILE's [min,max] of v spans everything,
    // but each k lives in exactly one file
    (1L to 2000L).map(k => (k, k % 7)).toDF("k", "v")
      .repartition(8, col("k")).write.parquet(path)
    Skipping.buildBloom(spark, path, "k", expectedItemsPerFile = 100000L)
    // min/max stats on the SAME layout prune nothing — the case bloom
    // exists for
    Skipping.buildStats(spark, path, Seq("k"))
    val (mmMatched, _) = Skipping.candidateFiles(spark, path, "k",
      500L, 500L)
    assert(mmMatched.size == 8,
      "hash clustering defeats min/max: every file's range matches")
    // bloom: each present key must match its own file (no false
    // negatives — guaranteed, not probabilistic), and the oversized
    // sketch makes false-positive pruning failures measure-zero on this
    // fixed data
    val (matched, unknown) = Skipping.candidateFilesEq(spark, path, "k",
      Seq(500L, 1500L))
    assert(unknown.isEmpty)
    assert(matched.nonEmpty && matched.size < 8,
      s"bloom must prune below the 8-file full set, got ${matched.size}")
    val got = Skipping.readPointLookup(spark, path, "k", Seq(500L, 1500L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((500L, 500L % 7), (1500L, 1500L % 7)),
      "pruned read must equal the full-scan IN filter")
    // a key that was never written: nothing matches, read is empty
    val (absent, _) = Skipping.candidateFilesEq(spark, path, "k",
      Seq(999999L))
    assert(absent.isEmpty, "absent key must prune every file")
    assert(Skipping.readPointLookup(spark, path, "k", Seq(999999L))
      .isEmpty)
  }

  test("bloom stats are stale-safe: appended files are always scanned") {
    import spark.implicits._
    val path = Files.createTempDirectory("skip_bloom_stale").toString + "/t"
    (1L to 100L).map(k => (k, "old")).toDF("k", "src")
      .coalesce(1).write.parquet(path)
    Skipping.buildBloom(spark, path, "k", expectedItemsPerFile = 100000L)
    (200L to 210L).map(k => (k, "new")).toDF("k", "src")
      .coalesce(1).write.mode("append").parquet(path)
    val (matched, unknown) = Skipping.candidateFilesEq(spark, path, "k",
      Seq(205L))
    assert(matched.isEmpty, "the known file holds only [1,100]")
    assert(unknown.size == 1, "the appended file must be a candidate")
    val rows = Skipping.readPointLookup(spark, path, "k", Seq(205L))
      .collect().map(_.getLong(0)).toSet
    assert(rows == Set(205L),
      "stale bloom stats must degrade to scanning unknown files")
  }

  test("combined range+bloom read intersects verdicts; a one-sided unknown is still prunable by the other side") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_comb").toString + "/t"
    // range-clustered on r, so each file holds one r-range and a
    // scattered-but-disjoint k population
    (1L to 1000L).map(i => (i, i % 250, i * 3)).toDF("r", "k", "v")
      .repartitionByRange(10, col("r")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("r"))
    Skipping.buildBloom(spark, path, "k", expectedItemsPerFile = 100000L)
    val got = Skipping.readRangeAndPointLookup(spark, path,
        "r", 100L, 400L, "k", Seq(150L))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = spark.read.parquet(path)
      .filter(col("r").between(100L, 400L) && col("k") === 150L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && got.nonEmpty)
    // append a file AFTER the range stats build but REBUILD the bloom:
    // the file is range-unknown (must-scan by range alone) yet bloom-
    // known — a definite bloom "no" must still prune it
    (5000L to 5010L).map(i => (i, 999L, i)).toDF("r", "k", "v")
      .coalesce(1).write.mode("append").parquet(path)
    Skipping.buildBloom(spark, path, "k", expectedItemsPerFile = 100000L)
    val (rm, ru) = Skipping.candidateFiles(spark, path, "r", 5000L, 5010L)
    assert(ru.size == 1, "appended file is range-unknown")
    val pruned = Skipping.readRangeAndPointLookup(spark, path,
      "r", 5000L, 5010L, "k", Seq(150L))
    assert(pruned.isEmpty,
      "bloom knows k=150 is absent from the appended file — the range-" +
        "unknown verdict must not force a scan")
    // and the inverse safety: k=999 IS in the appended file
    val found = Skipping.readRangeAndPointLookup(spark, path,
        "r", 5000L, 5010L, "k", Seq(999L))
      .collect().map(_.getLong(0)).toSet
    assert(found == (5000L to 5010L).toSet)
  }
}
