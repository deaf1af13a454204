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

  test("bloom probe is engine-side: plan carries graft_bloom_any, only file names project") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_engine").toString + "/t"
    (1L to 500L).map(k => (k, k % 3)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Skipping.buildBloom(spark, path, "k")
    val df = Skipping.bloomMatchedDf(spark, path, "k", Seq(123456789L))
    // the probe's OUTPUT is file names only — sketch bytes stay in the
    // executors; and the filter is the registered native expression
    assert(df.schema.fieldNames.toSeq == Seq("file"),
      "probe plan must project only the file name")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bloom_any"),
      s"probe must filter with the native expression, plan was:\n$plan")
    // and the real probe still has zero false negatives
    val (matched, unknown) = Skipping.candidateFilesEq(spark, path, "k",
      Seq(250L))
    assert(unknown.isEmpty && matched.nonEmpty && matched.size < 4)
  }

  test("appendStats is O(batch): untouched stats files keep their identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("skip_append")
    val path = dir.toString + "/t"
    (1L to 400L).map(k => (k, k * 2)).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    def statFiles(): Map[String, Long] = {
      val d = new java.io.File(path, "_skip_stats")
      d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
          && !f.getName.startsWith("."))
        .map(f => f.getName -> f.lastModified()).toMap
    }
    val before = statFiles()
    assert(before.nonEmpty)
    // new data files land; append their stats only
    (1000L to 1100L).map(k => (k, k * 2)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(path)
    val r = Skipping.refreshStats(spark, path, Seq("k"))
    assert(!r.rebuilt && r.appended == 1,
      s"append-only growth must append, not rebuild: $r")
    val after = statFiles()
    assert(before.forall { case (n, m) => after.get(n).contains(m) },
      "pre-existing stats files must keep name AND mtime across an append")
    assert(after.size > before.size, "the batch's stats must be new files")
    // the appended file is now stats-KNOWN and prunable
    val (matched, unknown) = Skipping.candidateFiles(spark, path, "k",
      1050L, 1060L)
    assert(unknown.isEmpty, "refresh must cover the appended file")
    assert(matched.size == 1, "only the appended file's range matches")
    // replaying the same refresh is a no-op
    val r2 = Skipping.refreshStats(spark, path, Seq("k"))
    assert(!r2.rebuilt && r2.appended == 0)
    assert(statFiles() == after)
  }

  test("refresh prunes dead files INCREMENTALLY on stale-delete (no " +
      "full rebuild): the dead row and its ledger cover leave, " +
      "survivors' stats keep physical identity, no dead file is ever " +
      "matched") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_del").toString + "/t"
    (1L to 300L).map(k => (k, k)).toDF("k", "v")
      .repartitionByRange(3, col("k")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    // delete the file holding [1,100] out from under the stats
    val victim = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).minBy(_.getName)
    assert(victim.delete())
    // BEFORE any refresh: the dead file must not be offered for scanning
    val (matched, _) = Skipping.candidateFiles(spark, path, "k", 1L, 300L)
    assert(!matched.exists(_.contains(victim.getName)),
      "a stats-known but deleted file must drop from the matched list")
    assert(Skipping.readRange(spark, path, "k", 1L, 300L).count() == 200L)
    // the refresh detects the deletion and PRUNES — per-file stats rows
    // are pure functions of one file, so dropping the dead row is
    // exact; a full O(data) rebuild would be waste
    val r = Skipping.refreshStats(spark, path, Seq("k"))
    assert(!r.rebuilt && r.appended == 0,
      s"stale-delete must prune incrementally, not rebuild: $r")
    val (m2, u2) = Skipping.candidateFiles(spark, path, "k", 1L, 300L)
    assert(u2.isEmpty && m2.size == 2)
    assert(!m2.exists(_.contains(victim.getName)))
    // the stats table itself no longer names the dead file, and the
    // ledger no longer covers it (else every later refresh re-prunes)
    val stats = spark.read.parquet(
      new java.io.File(s"$path/_skip_stats").listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map(_.getPath).toIndexedSeq: _*)
    assert(stats.count() == 2L)
    assert(!AppendCommit.appliedEntries(s"$path/_skip_stats")
      .flatMap(_._2.split("\n")).exists(_.contains(victim.getName)))
  }

  test("deleteByKey converges the skip trees in its own commit: no " +
      "stats row names a dead file, no bloom row covers a purged key's " +
      "file, the fresh del_ rewrites are stats-known (pruned, not " +
      "unknown-scanned), and a surviving-key point lookup still prunes") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_delkey").toString + "/t"
    (1L to 400L).map(k => (k, k % 7)).toDF("k", "v")
      .repartitionByRange(4, col("k")).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    Skipping.buildBloom(spark, path, "k")
    val liveBefore = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    // purge keys confined to one file's range → one rewrite, three
    // untouched files
    val sum = Maintain.deleteByKey(spark, path, "k", (1L to 50L))
    assert(sum.rewritten == 1 && sum.rowsDeleted == 50L, s"$sum")
    val live = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val dead = liveBefore -- live
    assert(dead.size == 1)
    def treeRows(d: String) = spark.read.parquet(
      new java.io.File(d).listFiles()
        .filter(f => f.getName.endsWith(".parquet"))
        .map(_.getPath).toIndexedSeq: _*)
    for (tree <- Seq(s"$path/_skip_stats", s"$path/_skip_bloom_k")) {
      // compare BASENAMES exactly: the del_ rewrite's name contains the
      // dead original's name as a substring
      val names = treeRows(tree).select("file").collect()
        .map(_.getString(0).split('/').last)
      assert(!names.exists(dead), s"$tree still names dead file(s): " +
        names.mkString(", "))
      assert(names.length == live.size && names.toSet == live,
        s"$tree must cover every live file (del_ rewrite included): " +
          names.mkString(", "))
    }
    // the purged keys' point lookup: their only true bloom cover left
    // with the dead file (the del_ rewrite's fresh sketch doesn't
    // contain them) — no unknown files remain, and any residual match
    // is a generic bloom false positive, not the dead file
    val (m0, u0) = Skipping.candidateFilesEq(spark, path, "k", Seq(25L))
    assert(u0.isEmpty && !m0.map(_.split('/').last).exists(dead),
      s"matched=$m0 unknown=$u0")
    // ...while a surviving key still prunes (its holder — the fresh
    // del_ rewrite — is bloom-known; at most FP noise beyond it) and
    // the read is exact
    val (m1, u1) = Skipping.candidateFilesEq(spark, path, "k", Seq(60L))
    assert(m1.exists(_.contains("del_")) && u1.isEmpty && m1.size < 4,
      s"matched=$m1 unknown=$u1")
    assert(Skipping.readPointLookup(spark, path, "k", Seq(60L))
      .count() == 1L)
    assert(Skipping.readPointLookup(spark, path, "k", Seq(25L))
      .count() == 0L)
  }

  test("auto-sized blooms are ~10x smaller than the fixed-1M default and prune identically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val base = Files.createTempDirectory("skip_size").toString
    def write(p: String): Unit =
      (1L to 4000L).map(k => (k, k % 5)).toDF("k", "v")
        .repartition(4, col("k")).write.parquet(p)
    def bloomBytes(p: String): Long = {
      val d = new java.io.File(p, "_skip_bloom_k")
      d.listFiles().filter(f => f.isFile && !f.getName.startsWith("_")
        && !f.getName.startsWith(".")).map(_.length()).sum
    }
    val pAuto = s"$base/auto"; val pFixed = s"$base/fixed"
    write(pAuto); write(pFixed)
    Skipping.buildBloom(spark, pAuto, "k") // observed-count sizing
    Skipping.buildBloom(spark, pFixed, "k",
      expectedItemsPerFile = 1000000L)
    assert(bloomBytes(pAuto) * 10 < bloomBytes(pFixed),
      s"auto=${bloomBytes(pAuto)}B fixed=${bloomBytes(pFixed)}B")
    // identical pruning semantics: present keys always found
    for (p <- Seq(pAuto, pFixed)) {
      val (m, u) = Skipping.candidateFilesEq(spark, p, "k",
        Seq(1000L, 3000L))
      assert(u.isEmpty && m.nonEmpty)
      val got = Skipping.readPointLookup(spark, p, "k", Seq(1000L, 3000L))
        .collect().map(_.getLong(0)).toSet
      assert(got == Set(1000L, 3000L))
    }
    // refreshBloom appends O(batch) too
    (9001L to 9050L).map(k => (k, k % 5)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(pAuto)
    val r = Skipping.refreshBloom(spark, pAuto, "k")
    assert(!r.rebuilt && r.appended == 1)
    val got = Skipping.readPointLookup(spark, pAuto, "k", Seq(9010L))
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(9010L))
  }

  test("property: random append/delete/refresh/compact lifecycles never " +
      "lose or invent rows in pruned reads") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val path = Files.createTempDirectory(s"skip_prop$trial").toString + "/t"
      var nextKey = 0L
      def appendBatch(): Unit = {
        val n = 20 + rnd.nextInt(60)
        val rows = (1 to n).map { _ => nextKey += 1; (nextKey, nextKey * 3) }
        rows.toDF("k", "v").coalesce(1 + rnd.nextInt(2))
          .write.mode("append").parquet(path)
      }
      appendBatch()
      Skipping.buildStats(spark, path, Seq("k"))
      def check(): Unit = {
        val hi = math.max(nextKey, 1L)
        val lo = 1L + (if (hi > 1) rnd.nextLong(hi) else 0L)
        val up = math.min(hi, lo + rnd.nextLong(hi) % math.max(hi / 2, 1L))
        val pruned = Skipping.readRange(spark, path, "k", lo, up)
          .select("k").collect().map(_.getLong(0)).toSet
        val full = spark.read.parquet(path)
          .filter(col("k") >= lo && col("k") <= up)
          .select("k").collect().map(_.getLong(0)).toSet
        assert(pruned == full,
          s"trial $trial [$lo,$up]: pruned ${pruned.size} != full " +
            s"${full.size}; missing ${full -- pruned}, extra ${pruned -- full}")
      }
      for (_ <- 1 to 6) {
        rnd.nextInt(4) match {
          case 0 => appendBatch()
          case 1 => // stale-delete a random data file
            val files = new java.io.File(path).listFiles()
              .filter(f => f.isFile && f.getName.endsWith(".parquet"))
            if (files.length > 1) files(rnd.nextInt(files.length)).delete()
          case 2 => Skipping.refreshStats(spark, path, Seq("k"))
          case 3 => Skipping.compactStats(spark, path)
        }
        check()
      }
    }
  }

  test("stats compaction folds per-batch files to one, carries the ledger") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("skip_cmp").toString + "/t"
    (1L to 100L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.parquet(path)
    Skipping.buildStats(spark, path, Seq("k"))
    // three incremental appends → three more small stats files
    for (base <- Seq(200L, 300L, 400L)) {
      (base to base + 50L).map(k => (k, k)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(path)
      val r = Skipping.refreshStats(spark, path, Seq("k"))
      assert(!r.rebuilt && r.appended == 1)
    }
    def statFiles(): Int = new java.io.File(path, "_skip_stats")
      .listFiles().count(f => f.isFile && f.getName.endsWith(".parquet"))
    assert(statFiles() >= 4, "each batch must have landed its own file")
    Skipping.compactStats(spark, path)
    assert(statFiles() == 1, "compaction must coalesce the stats rows")
    // verdicts unchanged; the carried ledger still suppresses replays
    val (m, u) = Skipping.candidateFiles(spark, path, "k", 310L, 320L)
    assert(u.isEmpty && m.size == 1)
    val r2 = Skipping.refreshStats(spark, path, Seq("k"))
    assert(!r2.rebuilt && r2.appended == 0,
      "the compacted tree must still know every covered file")
    // and a post-compaction append continues file-additively
    (500L to 510L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(path)
    val r3 = Skipping.refreshStats(spark, path, Seq("k"))
    assert(!r3.rebuilt && r3.appended == 1)
    assert(Skipping.readRange(spark, path, "k", 500L, 505L).count() == 6L)
  }

  test("bloom probe hashes with the COLUMN's type: an Int probe against a " +
      "BIGINT column still finds its file; an incompatible probe scans all") {
    import spark.implicits._
    val path = Files.createTempDirectory("skip_ptype").toString + "/t"
    // two hash-disjoint files over a BIGINT key
    (1L to 100L).map(k => (k, s"a$k")).toDF("k", "v")
      .coalesce(1).write.parquet(path)
    (1000L to 1100L).map(k => (k, s"b$k")).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(path)
    Skipping.buildBloom(spark, path, "k")
    // xxhash64(11: Int) != xxhash64(11L): an untyped probe would match
    // NOTHING and silently report "no file can hold key 11" — the typed
    // probe must land on exactly the file that does
    val (m, u) = Skipping.candidateFilesEq(spark, path, "k",
      Seq(11: java.lang.Integer))
    assert(u.isEmpty, "bloom was just built — nothing unknown")
    assert(m.size == 1, s"expected the one file holding k=11, got $m")
    assert(Skipping.readPointLookup(spark, path, "k",
      Seq(11: java.lang.Integer)).count() == 1L)
    // a probe that cannot cast to the column type cannot be hashed
    // faithfully → candidate = ALL files (unpruned, never zero-match)
    val (m2, u2) = Skipping.candidateFilesEq(spark, path, "k",
      Seq("not-a-number"))
    assert(m2.isEmpty && u2.size == 2,
      "incompatible probe types must degrade to scanning everything")
  }
}
