package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions.col

/** Reader-visible snapshot isolation ([[Manifest]]): a snapshot reader
  * resolving MID-maintenance sees either the complete old state or the
  * complete new state — never the rename-wide half state a listing
  * reader could catch — and every crash point converges. */
class ManifestSpec extends SparkSpec {
  import spark.implicits._

  private def fs(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def keys(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("k").collect().map(_.getLong(0)).toSet

  test("readSnapshot == plain read on a fresh table; appends are " +
      "visible before any manifest refresh (stale-safe)") {
    val path = Files.createTempDirectory("mani").toString + "/t"
    (1L to 100L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Manifest.enable(spark, path)
    assert(keys(Manifest.readSnapshot(spark, path)) == (1L to 100L).toSet)
    // an append the manifest has never seen must be readable NOW
    (101L to 110L).map(k => (k, k % 5)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(path)
    assert(keys(Manifest.readSnapshot(spark, path)) == (1L to 110L).toSet)
  }

  test("deleteByKey on a managed table: every intermediate state reads " +
      "complete — old snapshot before the commit, new after; final " +
      "content exact; untouched files keep identity") {
    val path = Files.createTempDirectory("mani_del").toString + "/t"
    (1L to 400L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Manifest.enable(spark, path)
    Skipping.buildBloom(spark, path, "k")
    val before = fs(path).listStatus(new Path(path))
      .filter(_.isFile).map(s => s.getPath.getName -> s.getLen).toMap
    val sum = Maintain.deleteByKey(spark, path, "k", Seq(7L, 250L))
    assert(sum.rowsDeleted == 2L, s"$sum")
    assert(keys(Manifest.readSnapshot(spark, path)) ==
      (1L to 400L).toSet -- Set(7L, 250L))
    assert(keys(spark.read.parquet(path)) ==
      (1L to 400L).toSet -- Set(7L, 250L),
      "listing readers agree once the run completes")
    // untouched data files keep name+length identity
    val after = fs(path).listStatus(new Path(path))
      .filter(_.isFile).map(s => s.getPath.getName -> s.getLen).toMap
    val untouched = before.keySet.intersect(after.keySet)
      .filterNot(_.startsWith("_"))
    assert(untouched.nonEmpty)
    untouched.foreach(n => assert(before(n) == after(n), n))
    // idempotent rerun: nothing changes, no new generation
    val genBefore = Manifest.current(path).get
    val again = Maintain.deleteByKey(spark, path, "k", Seq(7L, 250L))
    assert(again.rowsDeleted == 0L &&
      Manifest.current(path).get == genBefore)
  }

  test("MID-SWAP: with a replacement placed but the manifest not yet " +
      "committed, the snapshot reads the complete OLD state (a listing " +
      "read sees duplicates); after the commit with the original " +
      "lingering, the complete NEW state; recover() heals both crashes") {
    val path = Files.createTempDirectory("mani_mid").toString + "/t"
    (1L to 100L).map(k => (k, k)).toDF("k", "v")
      .repartition(2, col("k")).write.parquet(path)
    Manifest.enable(spark, path)
    val all = (1L to 100L).toSet
    val f = fs(path)
    val victim = f.listStatus(new Path(path)).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_")).head
    val victimKeys = keys(spark.read.parquet(victim.toString))
    // hand-construct the crashed state BETWEEN "replacement placed"
    // and "manifest committed": copy the victim minus one key to
    // del_<victim> (exactly what the protocol places first)
    val gone = victimKeys.head
    val tmp = new Path(victim.getParent, ".del_tmp_x").toString
    spark.read.parquet(victim.toString).filter(col("k") =!= gone)
      .coalesce(1).write.parquet(tmp)
    val part = f.listStatus(new Path(tmp)).map(_.getPath)
      .find(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .get
    val dest = new Path(victim.getParent, s"del_${victim.getName}")
    assert(f.rename(part, dest)); f.delete(new Path(tmp), true)
    // snapshot: complete OLD state (uncommitted dest invisible)
    assert(keys(Manifest.readSnapshot(spark, path)) == all)
    // a listing read in this window double-counts the victim's rows —
    // the half-state class the manifest exists to hide
    assert(spark.read.parquet(path).count() ==
      100L + victimKeys.size - 1)
    // recover() = the next maintenance run's entry: uncommitted dest
    // drops, old state intact
    Manifest.recover(path)
    assert(!f.exists(dest))
    assert(keys(Manifest.readSnapshot(spark, path)) == all)
    assert(keys(spark.read.parquet(path)) == all)
    // now the OTHER crash: dest placed AND manifest committed, but the
    // original's deletion crashed
    spark.read.parquet(victim.toString).filter(col("k") =!= gone)
      .coalesce(1).write.parquet(tmp)
    val part2 = f.listStatus(new Path(tmp)).map(_.getPath)
      .find(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .get
    assert(f.rename(part2, dest)); f.delete(new Path(tmp), true)
    val rel = Manifest.relativize(path, victim.toString)
    val cur = Manifest.resolve(path).get
      .map(p => Manifest.relativize(path, p))
    Manifest.commit(path, cur.filterNot(_ == rel) :+
      Manifest.relativize(path, dest.toString))
    // snapshot: complete NEW state; the lingering original (previous
    // generation) is invisible even though a listing still shows it
    assert(keys(Manifest.readSnapshot(spark, path)) == all - gone)
    assert(spark.read.parquet(path).count() == 100L + victimKeys.size - 1)
    Manifest.recover(path)
    assert(!f.exists(victim), "committed-away original must drop")
    assert(keys(Manifest.readSnapshot(spark, path)) == all - gone)
    assert(keys(spark.read.parquet(path)) == all - gone)
  }

  test("partitioned merge on a managed table: updates, inserts, a " +
      "brand-new partition, and an uncommitted ups_ leftover all " +
      "resolve; snapshot equals the merged truth") {
    val path = Files.createTempDirectory("mani_ups").toString + "/t"
    (1L to 100L).map(k => (k, k % 2, s"v$k")).toDF("k", "day", "p")
      .write.partitionBy("day").parquet(path)
    Manifest.enable(spark, path)
    val updates = Seq(
      (7L, 1L, "NEW7"), (8L, 0L, "NEW8"),     // update existing rows
      (101L, 1L, "INS101"),                   // insert into existing part
      (200L, 5L, "INS200"))                   // brand-new partition
      .toDF("k", "day", "p")
    val sum = Upsert.mergeIntoPartitioned(spark, path, updates,
      Seq("k", "day"), "day")
    assert(sum.updated == 2L && sum.inserted == 2L, s"$sum")
    val got = Manifest.readSnapshot(spark, path)
      .select("k", "p").collect().map(r => r.getLong(0) -> r.getString(1))
      .toMap
    assert(got.size == 102)
    assert(got(7L) == "NEW7" && got(8L) == "NEW8" &&
      got(101L) == "INS101" && got(200L) == "INS200" && got(9L) == "v9")
    assert(Manifest.readSnapshot(spark, path)
      .filter(col("day") === 5L).count() == 1L,
      "new partition's column value must resolve through the snapshot")
    // an uncommitted ups_ leftover (crash before commit) is invisible
    // to snapshots and swept by the next maintenance entry
    val f = fs(path)
    val stray = new Path(s"$path/day=0/ups_deadbeef_part-0.parquet")
    val os = f.create(stray, true); os.write(Array[Byte](1, 2)); os.close()
    assert(Manifest.readSnapshot(spark, path).count() == 102L)
    Manifest.recover(path)
    assert(!f.exists(stray))
  }

  test("ManifestResolve rule: a PLAIN read of a managed table resolves " +
      "through the manifest — uncommitted replacements invisible, " +
      "steady-state plans untouched, unmanaged tables untouched") {
    graft.plans.ManifestResolve.register(spark)
    val path = Files.createTempDirectory("mani_rule").toString + "/t"
    (1L to 100L).map(k => (k, k)).toDF("k", "v")
      .repartition(2, col("k")).write.parquet(path)
    Manifest.enable(spark, path)
    val f = fs(path)
    // steady state: the rule must leave the plan alone (no divergence)
    val atRest = spark.read.parquet(path)
    assert(!atRest.queryExecution.optimizedPlan.toString
      .contains("graft"), "no rewrite marker expected at rest")
    assert(keys(atRest) == (1L to 100L).toSet)
    // construct the mid-maintenance state: a complete but UNCOMMITTED
    // replacement next to its original (the window where a raw listing
    // double-counts)
    val victim = f.listStatus(new Path(path)).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_")).head
    val tmp = new Path(victim.getParent, ".del_tmp_x").toString
    val gone = keys(spark.read.parquet(victim.toString)).head
    spark.read.parquet(victim.toString).filter(col("k") =!= gone)
      .coalesce(1).write.parquet(tmp)
    val part = f.listStatus(new Path(tmp)).map(_.getPath)
      .find(p => !p.getName.startsWith("_") && !p.getName.startsWith("."))
      .get
    assert(f.rename(part,
      new Path(victim.getParent, s"del_${victim.getName}")))
    f.delete(new Path(tmp), true)
    spark.catalog.refreshByPath(path)
    // the PLAIN read now resolves through the manifest: complete OLD
    // state, no duplicates — without the rule it would double-count
    assert(keys(spark.read.parquet(path)) == (1L to 100L).toSet,
      "plain reads must get snapshot semantics on managed tables")
    assert(spark.read.parquet(path).count() == 100L)
    // an unmanaged sibling dir with the same mid-state keeps raw
    // listing semantics (the rule must not touch it)
    val um = Files.createTempDirectory("mani_rule_um").toString + "/t"
    (1L to 10L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.parquet(um)
    val uf = fs(um)
    val uvictim = uf.listStatus(new Path(um)).filter(_.isFile)
      .map(_.getPath).filterNot(_.getName.startsWith("_")).head
    uf.rename(uvictim,
      new Path(uvictim.getParent, s"del_copy_${uvictim.getName}"))
    assert(spark.read.parquet(um).count() == 10L,
      "unmanaged dirs keep plain listing semantics")
  }

  test("property: random append/delete/compact/refresh lifecycles keep " +
      "the snapshot exactly equal to a reference key set") {
    val path = Files.createTempDirectory("mani_prop").toString + "/t"
    var nextKey = 1L
    def appendBatch(n: Int): Set[Long] = {
      val ks = (nextKey until nextKey + n).toSet
      nextKey += n
      ks.toSeq.map(k => (k, k % 3)).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(path)
      ks
    }
    var expect = appendBatch(40)
    Manifest.enable(spark, path)
    Skipping.buildBloom(spark, path, "k")
    val rnd = new scala.util.Random(4242L)
    for (step <- 1 to 24) {
      rnd.nextInt(4) match {
        case 0 => expect ++= appendBatch(1 + rnd.nextInt(10))
        case 1 if expect.nonEmpty =>
          val victims = rnd.shuffle(expect.toSeq)
            .take(1 + rnd.nextInt(5))
          val sum = Maintain.deleteByKey(spark, path, "k", victims)
          assert(sum.rowsDeleted == victims.size.toLong,
            s"step $step: $sum for ${victims.size} keys")
          expect --= victims
        case 2 =>
          Maintain.compactPartitions(spark, path,
            targetBytes = 1L << 30, maxFiles = 2)
        case _ => Manifest.refresh(spark, path)
      }
      val got = keys(Manifest.readSnapshot(spark, path))
      assert(got == expect,
        s"step $step: snapshot diverged (${got.size} vs ${expect.size})")
      // at rest (no writer mid-protocol) the listing agrees too
      assert(keys(spark.read.parquet(path)) == expect, s"step $step")
    }
  }

  test("compaction on a managed table is reader-atomic and idempotent; " +
      "Hive partitions keep their column") {
    val path = Files.createTempDirectory("mani_cmp").toString + "/t"
    (1L to 200L).map(k => (k, k % 2)).toDF("k", "day")
      .repartition(5, col("k"))
      .write.partitionBy("day").parquet(path)
    Manifest.enable(spark, path)
    val sum = Maintain.compactPartitions(spark, path,
      targetBytes = 1L << 30, maxFiles = 1)
    assert(sum.partitionsCompacted == 2 && sum.filesAfter == 2, s"$sum")
    val got = Manifest.readSnapshot(spark, path)
    assert(keys(got) == (1L to 200L).toSet)
    assert(got.filter(col("day") === 1).count() == 100L,
      "partition column must survive the managed rewrite")
    assert(keys(spark.read.parquet(path)) == (1L to 200L).toSet)
    // idempotent: already in budget, no new generation
    val gen = Manifest.current(path).get
    val again = Maintain.compactPartitions(spark, path,
      targetBytes = 1L << 30, maxFiles = 1)
    assert(again.partitionsCompacted == 0 &&
      Manifest.current(path).get == gen)
  }

  test("retention: a file list resolved BEFORE a maintenance commit " +
      "still opens in full after it; the window ages out after two " +
      "more generations (bounded, not a leak)") {
    val path = Files.createTempDirectory("mani_ret").toString + "/t"
    (1L to 200L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Manifest.enable(spark, path) // gen 1
    val pinned = Manifest.resolve(path).get
    // content-changing managed maintenance commits gen 2 and defers the
    // originals' deletion
    Upsert.mergeInto(spark, path,
      (1L to 50L).map(k => (k, 99L)).toDF("k", "v"), Seq("k"))
    // the reader that resolved BEFORE the commit still opens every file
    assert(spark.read.parquet(pinned: _*).count() == 200L,
      "pre-commit resolution must stay openable for a full cycle")
    // while current snapshot readers see the merged truth
    val snap = Manifest.readSnapshot(spark, path)
    assert(snap.filter(col("k") <= 50 && col("v") === 99L).count() == 50L)
    // two more generations age the window out: the replaced originals'
    // bytes leave disk (retention is bounded)
    Upsert.mergeInto(spark, path, Seq((1L, 100L)).toDF("k", "v"),
      Seq("k")) // gen 3
    Upsert.mergeInto(spark, path, Seq((2L, 101L)).toDF("k", "v"),
      Seq("k")) // gen 4 — purges tomb g2
    assert(pinned.exists(f => !fs(path).exists(new Path(f))),
      "replaced originals must not leak past the retention window")
    assert(keys(Manifest.readSnapshot(spark, path)) == (1L to 200L).toSet)
  }

  test("time travel: readSnapshot(generation) reads the previous " +
      "generation exactly; unretained generations and RTBF-destroyed " +
      "snapshots fail loudly") {
    val path = Files.createTempDirectory("mani_tt").toString + "/t"
    (1L to 100L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Manifest.enable(spark, path) // gen 1
    Upsert.mergeInto(spark, path,
      (1L to 10L).map(k => (k, 77L)).toDF("k", "v"), Seq("k")) // gen 2
    assert(Manifest.generations(path) == Seq(1L, 2L))
    val old = Manifest.readSnapshot(spark, path, 1L)
    assert(old.filter(col("v") === 77L).count() == 0L &&
      keys(old) == (1L to 100L).toSet,
      "generation 1 must read as committed, before the merge")
    assert(Manifest.readSnapshot(spark, path, 2L)
      .filter(col("v") === 77L).count() == 10L)
    intercept[IllegalArgumentException] {
      Manifest.readSnapshot(spark, path, 99L)
    }
    // an RTBF key delete destroys bytes immediately — a generation that
    // referenced them must refuse to read, never silently resurrect a
    // partial snapshot
    Maintain.deleteByKey(spark, path, "k", Seq(5L)) // gen 3
    intercept[IllegalArgumentException] {
      Manifest.readSnapshot(spark, path, 2L).count()
    }
  }

  test("replaceFiles carries a concurrent append forward: a file " +
      "landing between the pinned resolve and the commit keeps its " +
      "rows (the mergeInto pin contract)") {
    val path = Files.createTempDirectory("mani_pin").toString + "/t"
    (1L to 100L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Manifest.enable(spark, path)
    val pinned = Manifest.resolve(path).get
    // a concurrent append lands AFTER the maintenance op pinned its set
    (101L to 105L).map(k => (k, 0L)).toDF("k", "v")
      .coalesce(1).write.mode("append").parquet(path)
    Manifest.replaceFiles(spark, path, path,
      spark.read.parquet(pinned: _*).filter(col("k") =!= 50L),
      "cmp_", pinned)
    assert(keys(Manifest.readSnapshot(spark, path)) ==
      ((1L to 105L).toSet - 50L),
      "the appended rows must survive a maintenance op that never saw them")
  }

  test("manifest reads are format-agnostic: a managed ORC table gets " +
      "snapshot isolation, stale-safe appends, and transparent " +
      "plain-read resolution") {
    graft.plans.ManifestResolve.register(spark)
    val path = Files.createTempDirectory("mani_orc").toString + "/t"
    (1L to 50L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(2, col("k")).write.orc(path)
    Manifest.enable(spark, path)
    (51L to 60L).map(k => (k, 0L)).toDF("k", "v")
      .coalesce(1).write.mode("append").orc(path)
    assert(keys(Manifest.readSnapshot(spark, path, "orc")) ==
      (1L to 60L).toSet, "appends visible before any refresh")
    Manifest.refresh(spark, path)
    // freeze the mid-maintenance window: a complete-but-UNCOMMITTED
    // cmp_ replacement next to its original
    val f = fs(path).listStatus(new Path(path)).filter(_.isFile)
      .map(_.getPath).filterNot(p => p.getName.startsWith("_") ||
        p.getName.startsWith(".")).head
    org.apache.hadoop.fs.FileUtil.copy(fs(path), f, fs(path),
      new Path(path, s"cmp_dup_${f.getName}"), false,
      spark.sparkContext.hadoopConfiguration)
    assert(keys(Manifest.readSnapshot(spark, path, "orc")) ==
      (1L to 60L).toSet, "uncommitted replacements invisible")
    spark.catalog.refreshByPath(path)
    assert(spark.read.orc(path).count() == 60L,
      "a PLAIN orc read must resolve through the manifest " +
        "(a raw listing would double-count the cmp_ copy)")
  }

  test("existence probe is one fixed-marker exists(): planning " +
      "unmanaged-table queries performs zero manifest root listings") {
    graft.plans.ManifestResolve.register(spark)
    val dir = Files.createTempDirectory("mani_probe").toString + "/t"
    (1L to 50L).map(k => (k, k % 5)).toDF("k", "v")
      .coalesce(2).write.parquet(dir)
    val before = Manifest.rootListings.get()
    assert(!Manifest.exists(dir))
    val plan = spark.read.parquet(dir).filter(col("k") > 5L)
      .queryExecution.optimizedPlan
    assert(plan != null)
    assert(Manifest.rootListings.get() == before,
      "unmanaged tables must cost one marker exists(), never a listing")
    // and a managed table's marker answers without a listing too
    Manifest.enable(spark, dir)
    val mid = Manifest.rootListings.get()
    assert(Manifest.exists(dir))
    assert(Manifest.rootListings.get() == mid)
  }

  test("a crash between a commit's generation write and its marker " +
      "write heals at the next refresh/recover — no permanent " +
      "exists()=false / resolve()=Some split brain") {
    val dir = Files.createTempDirectory("mani_marker").toString + "/t"
    (1L to 20L).map(k => (k, k % 3)).toDF("k", "v")
      .coalesce(2).write.parquet(dir)
    Manifest.enable(spark, dir)
    assert(Manifest.exists(dir))
    // simulate the crash: generation present, marker gone
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      new org.apache.hadoop.conf.Configuration())
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_manifest_CURRENT"),
      false)
    assert(!Manifest.exists(dir) && Manifest.resolve(dir).isDefined,
      "precondition: the split-brain state")
    // the UNCHANGED-listing refresh path must still heal the marker —
    // it commits no generation, so commit()'s marker rewrite never runs
    assert(!Manifest.refresh(spark, dir),
      "listing unchanged: no new generation")
    assert(Manifest.exists(dir),
      "refresh must converge the marker with the generation state")
    // and so must a bare maintenance-entry recover()
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_manifest_CURRENT"),
      false)
    Manifest.recover(dir)
    assert(Manifest.exists(dir))
  }
}
