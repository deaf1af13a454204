package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec

class MaintainSpec extends SparkSpec {

  /** (relative file path → (mtime, length)) for every data file. */
  private def snapshot(root: String): Map[String, (Long, Long)] = {
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(root),
      spark.sparkContext.hadoopConfiguration)
    def walk(p: org.apache.hadoop.fs.Path): Seq[(String, (Long, Long))] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Seq.empty
        else if (st.isDirectory) walk(st.getPath)
        else Seq(st.getPath.toString.stripPrefix(root) ->
          (st.getModificationTime, st.getLen))
      }
    walk(new org.apache.hadoop.fs.Path(root)).toMap
  }

  test("compaction rewrites only fragmented partitions and is idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("compact").toString + "/t"
    // partition a: 8 small files; partition b: already 1 file
    (1 to 80).map(i => (i.toLong, "a")).toDF("k", "p")
      .repartition(8).write.partitionBy("p").parquet(path)
    (81 to 90).map(i => (i.toLong, "b")).toDF("k", "p")
      .coalesce(1).write.mode("append").partitionBy("p").parquet(path)
    val before = snapshot(path)
    val beforeRows = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val sum = Maintain.compactPartitions(spark, path,
      targetBytes = 1L << 30, maxFiles = 1)
    assert(sum.partitionsSeen == 2 && sum.partitionsCompacted == 1)
    val after = snapshot(path)
    val aFiles = after.keys.filter(_.contains("p=a"))
    assert(aFiles.size == 1, s"partition a should compact to 1 file: $aFiles")
    // untouched partition keeps PHYSICAL file identity (mtime + length)
    val bBefore = before.filter(_._1.contains("p=b"))
    val bAfter = after.filter(_._1.contains("p=b"))
    assert(bBefore == bAfter, "partition b must keep file identity")
    // content identical through the rewrite
    val afterRows = spark.read.parquet(path)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(afterRows == beforeRows)

    // idempotent: a second run rewrites nothing anywhere
    val sum2 = Maintain.compactPartitions(spark, path,
      targetBytes = 1L << 30, maxFiles = 1)
    assert(sum2.partitionsCompacted == 0)
    assert(snapshot(path) == after, "second run must be a physical no-op")
  }

  test("targetBytes bounds output files; already-in-budget partitions pass") {
    import spark.implicits._
    val path = Files.createTempDirectory("compact_tb").toString + "/t"
    (1 to 4000).map(i => (i.toLong, s"pad_$i" * 20, "a"))
      .toDF("k", "v", "p")
      .repartition(16).write.partitionBy("p").parquet(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val pdir = new org.apache.hadoop.fs.Path(s"$path/p=a")
    val bytes = fs.listStatus(pdir)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
      .map(_.getLen).sum
    // target = ~1/3 of the partition → expect ceil(bytes/target) = 3 files
    val target = bytes / 3 + 1
    val sum = Maintain.compactPartitions(spark, path, target, maxFiles = 1)
    assert(sum.partitionsCompacted == 1)
    val n = fs.listStatus(pdir).count { st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".")
    }
    assert(n == 3, s"expected 3 output files, got $n")
    // a partition already within (maxFiles, want) budget is left alone
    val sum2 = Maintain.compactPartitions(spark, path, target, maxFiles = 3)
    assert(sum2.partitionsCompacted == 0)
  }

  test("unpartitioned table compacts at the root") {
    import spark.implicits._
    val path = Files.createTempDirectory("compact_flat").toString + "/t"
    (1 to 50).map(_.toLong).toDF("k").repartition(10).write.parquet(path)
    val sum = Maintain.compactPartitions(spark, path,
      targetBytes = 1L << 30, maxFiles = 1)
    assert(sum.partitionsSeen == 1 && sum.partitionsCompacted == 1)
    assert(spark.read.parquet(path).count() == 50)
    assert(snapshot(path).size == 1)
  }

  test("deleteByKey rewrites only bloom-candidate files; others keep identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("del_key").toString + "/t"
    // hash-clustered on k: each key lives in exactly one of 8 files
    (1L to 2000L).map(k => (k, k % 7)).toDF("k", "v")
      .repartition(8, col("k")).write.parquet(path)
    Skipping.buildBloom(spark, path, "k")
    val before = snapshot(path)
    val sum = Maintain.deleteByKey(spark, path, "k", Seq(500L, 1500L))
    assert(sum.rowsDeleted == 2L, s"got $sum")
    assert(sum.rewritten + sum.dropped <= sum.candidateFiles &&
      sum.candidateFiles < 8,
      s"bloom must confine the rewrite set: $sum")
    val after = snapshot(path)
    // untouched files keep name AND length (mtime granularity on local
    // fs is seconds — length+name is the identity the sync layer uses)
    val touched = before.keySet.diff(after.keySet)
    assert(touched.size == sum.rewritten + sum.dropped)
    before.filter { case (n, _) => after.contains(n) }.foreach {
      case (n, v) => assert(after(n) == v, s"untouched file $n changed")
    }
    // content = the exact anti-filter
    val got = spark.read.parquet(path).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 2000L).toSet -- Set(500L, 1500L))
    // idempotent: a re-run deletes nothing and rewrites nothing
    val again = Maintain.deleteByKey(spark, path, "k", Seq(500L, 1500L))
    assert(again.rowsDeleted == 0L && again.rewritten == 0 &&
      again.dropped == 0)
    assert(snapshot(path) == after)
    // a whole-class delete on a column with no bloom stats falls back
    // to all-files candidates, still exact (k=500 was already deleted
    // above, hence the filterNot)
    val allOfOne = (1L to 2000L)
      .filter(_ % 7 == 3).filterNot(Set(500L, 1500L))
    val sum2 = Maintain.deleteByKey(spark, path, "v", Seq(3L))
    assert(sum2.rowsDeleted == allOfOne.size.toLong)
    assert(spark.read.parquet(path).filter(col("v") === 3L).count() == 0L)
  }


  test("deleteByKeyFrame: a distributed key frame deletes exactly on a " +
      "plain tree AND through a manifest-managed table's reader-atomic " +
      "protocol; NULL frame keys drop, NULL-keyed rows survive, " +
      "uncastable frame keys refuse loudly") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // plain tree
    val path = Files.createTempDirectory("del_frame").toString + "/t"
    (1L to 5000L).map(k => (k, k % 7)).toDF("k", "v")
      .unionByName(Seq((Option.empty[Long], 99L)).toDF("k", "v"))
      .repartition(8, col("k")).write.parquet(path)
    val doomed = spark.range(1, 5001).filter(col("id") % 3 === 0)
      .select(col("id"))
      .unionByName(Seq(Option.empty[Long]).toDF("id")) // NULL key: no-op
    val sum = Maintain.deleteByKeyFrame(spark, path, "k", doomed)
    assert(sum.rowsDeleted == (1L to 5000L).count(_ % 3 == 0).toLong,
      s"$sum")
    val got = spark.read.parquet(path).select("k")
      .collect().map(r => if (r.isNullAt(0)) -1L else r.getLong(0)).toSet
    assert(got == ((1L to 5000L).filterNot(_ % 3 == 0).toSet + -1L),
      "non-matching and NULL-keyed rows must survive")
    // idempotent
    val again = Maintain.deleteByKeyFrame(spark, path, "k", doomed)
    assert(again.rowsDeleted == 0L && again.rewritten == 0 &&
      again.dropped == 0)
    // uncastable frame key → loud refusal, nothing deleted
    val before = spark.read.parquet(path).count()
    val ex = intercept[IllegalArgumentException] {
      Maintain.deleteByKeyFrame(spark, path, "k",
        Seq("7", "not-a-number").toDF("k"))
    }
    assert(ex.getMessage.contains("not-a-number"), ex.getMessage)
    assert(spark.read.parquet(path).count() == before)

    // manifest-managed: one generation swap, originals gone (RTBF),
    // snapshot readers never see a half state
    val mpath = Files.createTempDirectory("del_frame_m").toString + "/t"
    (1L to 2000L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(mpath)
    Manifest.enable(spark, mpath)
    val gen0 = Manifest.generations(mpath).max
    val mdoomed = spark.range(1, 2001).filter(col("id") % 10 === 7)
      .select(col("id"))
    val msum = Maintain.deleteByKeyFrame(spark, mpath, "k", mdoomed)
    assert(msum.rowsDeleted == 200L, s"$msum")
    assert(Manifest.generations(mpath).max > gen0,
      "the frame delete must commit a new manifest generation")
    val mGot = Manifest.readSnapshot(spark, mpath).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(mGot == (1L to 2000L).filterNot(_ % 10 == 7).toSet)
  }

  test("deleteByKey with Int-typed keys against a BIGINT column still " +
      "deletes (the probe hashes with the column's type)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("del_ptype").toString + "/t"
    (1L to 400L).map(k => (k, k % 5)).toDF("k", "v")
      .repartition(4, col("k")).write.parquet(path)
    Skipping.buildBloom(spark, path, "k")
    // Seq(11) carries Int literals; the bloom was built on BIGINT —
    // before the typed probe this silently deleted NOTHING
    val sum = Maintain.deleteByKey(spark, path, "k",
      Seq(11: java.lang.Integer, 222: java.lang.Integer))
    assert(sum.rowsDeleted == 2L, s"typed probe must find the rows: $sum")
    val got = spark.read.parquet(path).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 400L).toSet -- Set(11L, 222L))
  }

  test("deleteByKey with 50k keys: broadcast-frame path deletes exactly, " +
      "no literal-inflated plans, untouched files keep identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("del_large").toString + "/t"
    // keys 1..200000 hash-clustered over 8 files; purge 50k of them
    (1L to 200000L).map(k => (k, k % 3)).toDF("k", "v")
      .repartition(8, col("k")).write.parquet(path)
    Skipping.buildBloom(spark, path, "k")
    val purge: Seq[Any] = (1L to 50000L).map(k => k * 4): Seq[Any]
    assert(purge.size > Maintain.LargeKeyThreshold)
    val before = snapshot(path)
    val sum = Maintain.deleteByKey(spark, path, "k", purge)
    assert(sum.rowsDeleted == 50000L, s"$sum")
    val after = snapshot(path)
    before.filter { case (n, _) => after.contains(n) }.foreach {
      case (n, v) => assert(after(n) == v, s"untouched file $n changed")
    }
    val got = spark.read.parquet(path).select("k")
      .collect().map(_.getLong(0)).toSet
    assert(got == (1L to 200000L).toSet -- purge.map(_.asInstanceOf[Long]))
    // idempotent rerun through the same large-key path
    val again = Maintain.deleteByKey(spark, path, "k", purge)
    assert(again.rowsDeleted == 0L && again.rewritten == 0 &&
      again.dropped == 0)
  }

  test("deleteByKey crash recovery: aside-only restores, aside+dest drops") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("del_crash").toString + "/t"
    (1L to 100L).map(k => (k, k)).toDF("k", "v")
      .coalesce(1).write.parquet(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    val orig = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    // simulate a crash AFTER the aside rename, before the replacement
    // landed: the next deleteByKey must restore the original first
    val aside = new org.apache.hadoop.fs.Path(orig.getParent,
      s".del_aside_${orig.getName}")
    assert(fs.rename(orig, aside))
    val sum = Maintain.deleteByKey(spark, path, "k", Seq(50L))
    assert(sum.rowsDeleted == 1L)
    assert(spark.read.parquet(path).count() == 99L,
      "recovery must restore the aside copy before deleting")
    assert(!fs.exists(aside))
  }

  test("matchingKeys/droppingKeys: the broadcast-frame large-key path " +
      "agrees with the literal path exactly; nulls kept by dropping, " +
      "excluded by matching") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 5000L).map(k =>
      (if (k % 50 == 0) None else Some(k), k)).toDF("k", "v")
    val bigKeys: Seq[Any] = (1L to 4000L).filter(_ % 3 == 0)
    assert(bigKeys.size > Maintain.LargeKeyThreshold)
    val smallKeys: Seq[Any] = bigKeys.take(500)
    def vs(d: org.apache.spark.sql.DataFrame) =
      d.select("v").as[Long].collect().toSet
    // reference semantics from the literal path on a small set
    assert(vs(Maintain.matchingKeys(df, "k", smallKeys)) ==
      vs(df.filter(col("k").isInCollection(smallKeys))))
    // large path ≡ what the literal path WOULD produce
    val expMatch = (1L to 5000L).filter(k => k % 50 != 0 &&
      k <= 4000 && k % 3 == 0).toSet
    assert(vs(Maintain.matchingKeys(df, "k", bigKeys)) == expMatch)
    val dropped = Maintain.droppingKeys(df, "k", bigKeys)
    assert(vs(dropped) == (1L to 5000L).toSet -- expMatch)
    assert(dropped.filter(col("k").isNull).count() == 100L,
      "null-keyed rows must survive the large-key drop")
  }

  test("deleteByKey keeps NULL-keyed rows: three-valued !isin must not " +
      "silently drop rows whose key is unknown") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("del_null").toString + "/t"
    (1L to 100L).map(k =>
      (if (k % 10 == 0) None else Some(k), k)).toDF("k", "v")
      .coalesce(1).write.parquet(path)
    val sum = Maintain.deleteByKey(spark, path, "k", Seq(5L, 7L))
    assert(sum.rowsDeleted == 2L, s"$sum")
    val left = spark.read.parquet(path)
    assert(left.count() == 98L)
    assert(left.filter(col("k").isNull).count() == 10L,
      "null-keyed rows must survive a keyed delete")
  }

  test("deleteByKey refuses keys that cannot cast to the column's " +
      "type — loudly, naming them, before any rewrite (no silent " +
      "partial purge)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("del_badkey").toString + "/t"
    (1L to 100L).map(k => (k, k)).toDF("k", "v")
      .coalesce(2).write.parquet(path)
    val e = intercept[IllegalArgumentException] {
      Maintain.deleteByKey(spark, path, "k",
        Seq(5L, "not-a-number", 7L))
    }
    assert(e.getMessage.contains("not-a-number"),
      s"the offending key must be named: ${e.getMessage}")
    assert(spark.read.parquet(path).count() == 100L,
      "a refused purge must leave the table untouched")
    // the castable form still deletes (the loud check is about
    // uncastable keys, not about string round-trips)
    val ok = Maintain.deleteByKey(spark, path, "k", Seq("5", 7L))
    assert(ok.rowsDeleted == 2L)
  }

  test("retirePartitions: manifest-committed partition drop — O(meta), " +
      "time travel intact, NULL partition kept, unmanaged dir refused, " +
      "replay a no-op") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = Files.createTempDirectory("retire").toString + "/t"
    (1L to 40L).map(i => (i,
        if (i % 10 == 0) null
        else java.sql.Date.valueOf(s"2024-01-0${i % 4 + 1}"),
        i * 2))
      .toDF("k", "d", "v").write.partitionBy("d").parquet(path)
    // unmanaged: refused loudly (the drop would not be reader-atomic)
    val e = intercept[IllegalArgumentException] {
      Maintain.retirePartitions(spark, path, "d", _ < "2024-01-03")
    }
    assert(e.getMessage.contains("manifest-managed"), e.getMessage)
    Manifest.enable(spark, path)
    val before = Manifest.readSnapshot(spark, path).count()
    assert(before == 40L)
    val r = Maintain.retirePartitions(spark, path, "d",
      v => java.time.LocalDate.parse(v)
        .isBefore(java.time.LocalDate.parse("2024-01-03")))
    assert(r.partitionsRetired == 2L, r.toString)
    val now = Manifest.readSnapshot(spark, path)
    // kept: dates >= 01-03 and every NULL-dated row
    assert(now.count() ==
      (1L to 40L).count(i => i % 10 == 0 || i % 4 + 1 >= 3))
    assert(now.filter(col("d").isNull).count() == 4L,
      "the NULL partition was not asked to expire")
    // time travel: the pre-retire generation reads in full
    val gens = Manifest.generations(path)
    assert(Manifest.readSnapshot(spark, path, gens.head).count() == 40L)
    // replay: retired partitions are gone from the manifest — no-op
    assert(Maintain.retirePartitions(spark, path, "d",
      v => java.time.LocalDate.parse(v)
        .isBefore(java.time.LocalDate.parse("2024-01-03")))
      == Maintain.RetireSummary(0L, 0L))
  }
}
