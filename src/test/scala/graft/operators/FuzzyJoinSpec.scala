package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The correctness risk of a prefix-filtered similarity join is a FALSE
  * NEGATIVE: a true match pruned before verification. Every test here
  * compares against the brute-force cross-join levenshtein ground truth,
  * so any pruning hole fails the equality, not just a spot check. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(l: DataFrame, r: DataFrame, k: Int): Set[(Long, Long, Int)] =
    l.crossJoin(r)
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .filter(col("dist") <= k)
      .select("left_id", "right_id", "dist")
      .as[(Long, Long, Int)].collect().toSet

  private def fuzzy(l: DataFrame, r: DataFrame, k: Int): Set[(Long, Long, Int)] =
    FuzzyJoin.editDistanceJoin(l, "left_id", "ls", r, "right_id", "rs", k)
      .as[(Long, Long, Int)].collect().toSet

  private def side(rows: Seq[(Long, String)], id: String, s: String): DataFrame =
    rows.toDF(id, s)

  test("matches brute force on a mixed corpus with planted typos (k=1,2)") {
    val base = Seq(
      "almond antique blue royal burnished",
      "almond antique burnished rose metallic",
      "blush thistle blue yellow saddle",
      "cornflower chocolate smoke green pink",
      "moccasin green thistle khaki floral")
    // planted: substitution, deletion, insertion, and unrelated noise
    val dirty = Seq(
      "almond antique blue royal burni#hed", // 1 sub of base(0)
      "almond antique burnished rose metallc", // 1 del of base(1)
      "blush thistle blue yellow saddles", // 1 ins of base(2)
      "cornflower chocolate smoke green pink extra words here", // far
      "zzzz totally unrelated string qqqq")
    val l = side(dirty.zipWithIndex.map { case (s, i) => (i.toLong, s) }, "left_id", "ls")
    val r = side(base.zipWithIndex.map { case (s, i) => (i.toLong, s) }, "right_id", "rs")
    for (k <- Seq(1, 2)) {
      val got = fuzzy(l, r, k)
      assert(got === brute(l, r, k), s"mismatch at k=$k")
    }
  }

  test("low-complexity pool: short and repetitive strings that share zero grams") {
    // len < q strings have no grams at all; "aaaa" vs "bbaa" at k=2 share
    // zero 3-gram types. Both must route through the length-band path.
    val l = side(Seq((1L, "ab"), (2L, "aaaa"), (3L, "xy")), "left_id", "ls")
    val r = side(Seq((10L, "ac"), (11L, "bbaa"), (12L, "xyz"), (13L, "q")), "right_id", "rs")
    val got = fuzzy(l, r, 2)
    assert(got === brute(l, r, 2))
    // the specific zero-gram-overlap pair is present
    assert(got.exists { case (a, b, _) => a == 2L && b == 11L })
  }

  test("k=0 degenerates to exact string equality") {
    val l = side(Seq((1L, "hello world"), (2L, "hello")), "left_id", "ls")
    val r = side(Seq((5L, "hello world"), (6L, "hello there")), "right_id", "rs")
    assert(fuzzy(l, r, 0) === Set((1L, 5L, 0)))
  }

  test("repetitive long strings within k edits (gram pruning invalid inside low pool)") {
    // 12-char strings built from one repeated gram type: k*q = 6 >= their
    // distinct-gram count (1..3), so they are low-complexity even though
    // long; 2 edits can destroy every shared type.
    val l = side(Seq((1L, "abababababab")), "left_id", "ls")
    val r = side(Seq((2L, "abababababba"), (3L, "abababababab")), "right_id", "rs")
    val got = fuzzy(l, r, 2)
    assert(got === brute(l, r, 2))
    assert(got.size == 2)
  }

  test("q117 gate shape: every dirty name resolves to its clean origin at dist <= 2") {
    val df = FuzzyJoin.q117EditdistJoin(spark, sfDir)
    val rows = df.as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // self-resolution: each dirty id must recover its own clean row
    val dirtyIds = t(spark, sfDir, "part")
      .filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey")).as[Long].collect().toSet
    val resolved = rows.collect { case (d, c, _) if d == c => d }.toSet
    assert(resolved === dirtyIds, "some planted typo failed to resolve to its origin")
    assert(rows.forall(_._3 <= 2))
  }

  test("q123 ER: every dirty record clusters with its origin; totals add up") {
    val comp = FuzzyJoin.q123EntityResolution(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect() // component, n, min_id, max_id
    val nParts = t(spark, sfDir, "part").count()
    val nDirty = t(spark, sfDir, "part")
      .filter(col("p_partkey") % 13 === 0).count()
    assert(comp.map(_._2).sum === nParts + nDirty)
    // a component holding a dirty id (>= 10M) must also hold a clean one
    comp.filter(_._4 >= 10000000L).foreach { case (c, n, minId, _) =>
      assert(n >= 2 && minId < 10000000L,
        s"dirty-only component $c (n=$n, min=$minId)")
    }
    assert(comp.count(_._4 >= 10000000L) > 0, "no dirty cluster formed")
  }

  test("snm: adjacent-in-sort-order typos match; window recall contract holds") {
    import spark.implicits._
    val rec = Seq(
      (1L, "apple pie"), (2L, "apple pis"),      // 1 edit, adjacent
      (3L, "azzzz 1"), (4L, "azzzz 2"),          // 1 edit, adjacent
      (5L, "banana"), (6L, "zebra"))
      .toDF("id", "name")
    val got = FuzzyJoin.snmPairs(rec, "id", "name", w = 5, maxDist = 2)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 2L)))
    assert(got.contains((3L, 4L)))
    // different first letters → different blocks, never candidates
    assert(!got.exists(p => Set(p._1, p._2) == Set(5L, 6L)))
  }

  test("snm: a pair more than w positions apart in its block is MISSED") {
    import spark.implicits._
    // all share block 'a'; 4 padding names sort between the near-dups
    val rec = Seq(
      (1L, "aa target"),
      (10L, "ab pad 1"), (11L, "ab pad 2"), (12L, "ab pad 3"),
      (13L, "ab pad 4"),
      (2L, "ac target")) // levenshtein("aa target","ac target")=1
      .toDF("id", "name")
    val w2 = FuzzyJoin.snmPairs(rec, "id", "name", w = 2, maxDist = 2)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(!w2.contains((1L, 2L)),
      "w=2 must miss a pair 5 positions apart — the documented contract")
    val w5 = FuzzyJoin.snmPairs(rec, "id", "name", w = 5, maxDist = 2)
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    assert(w5.contains((1L, 2L)), "w=5 covers the gap")
  }

  test("q142 gate: every planted adjacent typo within the window verifies") {
    val out = FuzzyJoin.q142SortedNeighborhood(spark, sfDir)
    assert(out.count() > 0)
    // symmetric sanity: left ranks strictly precede right ranks, so no
    // pair appears twice in either orientation
    val pairs = out.select("left_id", "right_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length)
    assert(!pairs.exists(p => pairs.contains((p._2, p._1))))
  }
}
