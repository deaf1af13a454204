package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // the exact E–S score formula, host-side, for ground truth
  private def score(id: Long, w: Double): Double =
    math.log(((id * 2654435761L) % 1000003L + 1L).toDouble / 1000004.0) / w

  private val rows = (1L to 200L).map(i => (i, (i % 13 + 1).toDouble))
  private lazy val df = rows.toDF("id", "w")

  test("global sample == host-side top-k under the same score") {
    val got = Sampling.weightedSample(df, "id", col("w"), 20)
      .select("rnk", "id").as[(Int, Long)].collect().toList
    val want = rows.map { case (i, w) => (i, score(i, w)) }
      .sortBy { case (i, s) => (-s, i) }.take(20)
      .zipWithIndex.map { case ((i, _), r) => (r + 1, i) }.toList
    assert(got.sortBy(_._1) === want)
  }

  test("stratified sample matches per-stratum host-side top-k") {
    val sdf = rows.map { case (i, w) => (i, w, s"g${i % 3}") }
      .toDF("id", "w", "g")
    val got = Sampling
      .stratifiedWeightedSample(sdf, "id", "g", col("w"), 5)
      .select("stratum", "rnk", "id").as[(String, Int, Long)]
      .collect().toSet
    val want = rows.groupBy { case (i, _) => s"g${i % 3}" }.toSeq.flatMap {
      case (g, rs) =>
        rs.map { case (i, w) => (i, score(i, w)) }
          .sortBy { case (i, s) => (-s, i) }.take(5)
          .zipWithIndex.map { case ((i, _), r) => (g, r + 1, i) }
    }.toSet
    assert(got === want)
  }

  test("sampling is deterministic and partitioning-invariant") {
    val a = Sampling.weightedSample(df, "id", col("w"), 10)
      .collect().toSeq
    val b = Sampling.weightedSample(df.repartition(7), "id", col("w"), 10)
      .collect().toSeq
    assert(a === b)
  }

  test("deterministic shuffle: host-md5 order, partition-invariant, " +
      "seed-sensitive") {
    val ids = (1L to 300L).toDF("id")
    def hostKey(i: Long, seed: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$seed".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val got = Sampling.deterministicShuffle(ids, "id", 7L)
      .select("id").as[Long].collect().toList
    val want = (1L to 300L).sortBy(i => (hostKey(i, 7L), i)).toList
    assert(got === want)
    val repart = Sampling.deterministicShuffle(ids.repartition(11), "id", 7L)
      .select("id").as[Long].collect().toList
    assert(repart === want, "order must not depend on input partitioning")
    val other = Sampling.deterministicShuffle(ids, "id", 8L)
      .select("id").as[Long].collect().toList
    assert(other !== want, "a different seed must reorder")
  }

  test("group holdout split: whole groups, host-exact cutoffs, fractions") {
    val sdf = (1L to 2000L).map(i => (i, s"src${i % 97}"))
      .toDF("id", "g")
    val split = Sampling.groupHoldoutSplit(col("g"), 42L,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val tagged = sdf.select(col("g"), split.as("s"))
      .as[(String, String)].collect()
    // leakage-free: one split per group
    val byGroup = tagged.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(byGroup.values.forall(_.size == 1))
    // host-exact assignment from the same md5 prefix
    def hostSplit(g: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$g|42".getBytes("UTF-8"))
      val b4 = d.take(2).map("%02x".format(_)).mkString
      if (b4 < "cccc") "train" else if (b4 < "e666") "val" else "test"
    }
    byGroup.foreach { case (g, ss) => assert(ss.head == hostSplit(g)) }
    // all three splits populated at 97 groups (probabilistic bound:
    // P(empty val) = (1 - 0.1)^97 ≈ 4e-5 — deterministic given the seed)
    assert(tagged.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("group holdout split: a NULL group key hashes the __null__ " +
      "sentinel — identical to what a SQL auditor recomputes") {
    // without the sentinel, Spark's concat_ws SKIPS the null (bucket =
    // md5(seed) → a real split) while SQL's key || '|' || seed is NULL
    // and falls to the LAST label — the same row splits differently
    // depending on who computes. The sentinel makes NULL one ordinary
    // auditable group.
    val sdf = Seq((1L, Option("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "g")
    val split = Sampling.groupHoldoutSplit(col("g"), 42L,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val got = sdf.select(col("id"), split.as("s"))
      .as[(Long, String)].collect().toMap
    def hostSplit(g: String): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$g|42".getBytes("UTF-8"))
      val b4 = d.take(2).map("%02x".format(_)).mkString
      if (b4 < "cccc") "train" else if (b4 < "e666") "val" else "test"
    }
    assert(got(2L) == hostSplit("__null__"))
    assert(got(2L) == got(3L), "all NULL-group rows share one split")
    assert(got(1L) == hostSplit("a"),
      "non-null groups are unaffected by the sentinel")
  }

  test("epoch positions are the host-md5 global order, partition-" +
      "invariant; shards are the closed form") {
    val ids = (1L to 500L).toDF("id")
    def hostKey(i: Long, seed: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|$seed".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val wantOrder = (1L to 500L).sortBy(i => (hostKey(i, 7L), i)).toList
    val got = Sampling.epochPositions(ids, "id", 7L)
      .select("pos", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toList == (1L to 500L).toList,
      "positions must be exactly 1..N")
    assert(got.map(_._2).toList == wantOrder,
      "position order must equal the global (md5, id) order")
    val repart = Sampling.epochPositions(ids.repartition(13), "id", 7L)
      .select("pos", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(repart.toList == got.toList,
      "positions must not depend on input partitioning")
    val sh = Sampling.epochShards(ids, "id", 7L, 64L)
      .select("shard", "pos").as[(Int, Long)].collect()
    assert(sh.forall { case (s, p) => s == ((p - 1) / 64).toInt },
      "shard must be the closed form (pos-1) div L")
    // bucket width only parallelizes — positions are width-invariant
    // (the 100 TB knob: more buckets, same total order)
    val wide = Sampling.epochPositions(ids, "id", 7L, bucketHexChars = 3)
      .select("pos", "id").as[(Long, Long)].collect().sortBy(_._1)
    assert(wide.toList == got.toList,
      "a different bucket width must yield identical positions")
  }

  test("epoch id contract is ENFORCED: duplicates and NULLs refuse " +
      "loudly instead of silently skewing the written shards") {
    // the join-back would multiply duplicate-id rows and drop null-id
    // rows while the receipt path still counts them — a receipt
    // certifying a layout the writer never produced; both refuse at
    // the bucket-count pass (zero extra jobs)
    val dup = (Seq(1L, 2L, 2L, 3L)).toDF("id")
    val e1 = intercept[IllegalArgumentException] {
      Sampling.epochPositions(dup, "id", 7L).count()
    }
    assert(e1.getMessage.contains("duplicates"), e1.getMessage)
    val withNull = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e2 = intercept[IllegalArgumentException] {
      Sampling.epochShardReceipts(withNull, "id", 7L, 64L).count()
    }
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("writeEpochShards: shard directories hold the epoch order — " +
      "membership AND intra-shard row order replay from (id, seed, L)") {
    val ids = (1L to 300L).toDF("id")
    val out = java.nio.file.Files.createTempDirectory("epochsh").toString
    val nShards = Sampling.writeEpochShards(ids, "id", 7L, 64L, out)
    assert(nShards == 5L, s"300 rows / 64 per shard = 5 shards, $nShards")
    def hostKey(i: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i|7".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }
    val order = (1L to 300L).sortBy(i => (hostKey(i), i)).toList
    // re-export with FEWER rows must remove the stale higher-numbered
    // shard dirs even under a dynamic-overwrite session conf — a
    // loader listing the directory would otherwise train on the
    // previous epoch's leftovers
    val dyn = spark.conf.getOption(
      "spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val n2 = Sampling.writeEpochShards(
        (1L to 100L).toDF("id"), "id", 7L, 64L, out)
      assert(n2 == 2L, s"100 rows / 64 = 2 shards, got $n2")
      assert(!new java.io.File(s"$out/shard=2").exists(),
        "stale shard dirs from the larger previous export must be gone")
    } finally {
      dyn match {
        case Some(v) => spark.conf.set(
          "spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset(
          "spark.sql.sources.partitionOverwriteMode")
      }
    }
    // re-export the full set for the order assertions below
    assert(Sampling.writeEpochShards(ids, "id", 7L, 64L, out) == 5L)
    (0 until 5).foreach { s =>
      val dir = new java.io.File(s"$out/shard=$s")
      assert(dir.isDirectory, s"missing shard dir $s")
      val files = dir.listFiles().filter(f =>
        f.getName.endsWith(".parquet")).sortBy(_.getName)
      // each shard lands as ONE task's contiguous, sorted slice
      val rows = files.toSeq.flatMap { f =>
        spark.read.parquet(f.toString).select("pos", "id")
          .as[(Long, Long)].collect().toSeq
      }
      assert(rows.map(_._1) == rows.map(_._1).sorted,
        s"shard $s file rows must be in position order")
      val want = order.slice(s * 64, math.min((s + 1) * 64, 300))
      assert(rows.map(_._2).toList == want,
        s"shard $s must hold epoch positions ${s * 64 + 1}.." +
          s"${math.min((s + 1) * 64, 300)} in order")
    }
  }
}
