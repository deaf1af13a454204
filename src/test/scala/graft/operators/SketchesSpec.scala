package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // skewed planted stream: key i appears i times, keys 1..40
  private lazy val stream = (1L to 40L).flatMap(i => Seq.fill(i.toInt)(i))
    .toDF("k")
  private lazy val truth = (1L to 40L).map(i => i -> i).toMap

  test("CMS never under-estimates (the one-sided error contract)") {
    val cms = Sketches.cmsBuild(stream, col("k"), w = 16) // tiny: collide!
    val probes = (1L to 40L).toDF("k")
    val est = Sketches.cmsEstimate(cms, probes, "k", w = 16)
      .as[(Long, Long)].collect().toMap
    (1L to 40L).foreach(k =>
      assert(est(k) >= truth(k), s"under-estimate at $k"))
    // with w=16 over 40 keys, at least one estimate must exceed truth
    assert((1L to 40L).exists(k => est(k) > truth(k)))
  }

  test("CMS is exact when buckets are collision-free") {
    val cms = Sketches.cmsBuild(stream, col("k"), w = 65536)
    val probes = (1L to 40L).toDF("k")
    val est = Sketches.cmsEstimate(cms, probes, "k", w = 65536)
      .as[(Long, Long)].collect().toMap
    (1L to 40L).foreach(k => assert(est(k) === truth(k)))
  }

  test("CMS partials merge by addition (build(a++b) == build(a) + build(b))") {
    val a = stream.filter(col("k") % 2 === 0)
    val b = stream.filter(col("k") % 2 === 1)
    val whole = Sketches.cmsBuild(stream, col("k"), w = 64)
      .as[(Int, Long, Long)].collect().toSet
    val merged = Sketches.cmsBuild(a, col("k"), w = 64)
      .unionByName(Sketches.cmsBuild(b, col("k"), w = 64))
      .groupBy(col("j"), col("bucket")).agg(sum(col("cnt")).as("cnt"))
      .as[(Int, Long, Long)].collect().toSet
    assert(whole === merged)
  }

  test("absent keys estimate 0 when their buckets are empty") {
    val cms = Sketches.cmsBuild(stream, col("k"), w = 1 << 20)
    val probes = Seq(900001L, 900002L).toDF("k")
    val est = Sketches.cmsEstimate(cms, probes, "k", w = 1 << 20)
      .as[(Long, Long)].collect().toMap
    assert(est.values.forall(_ === 0L))
  }

  test("kmv: signatures cap at k sorted smallest hashes") {
    import spark.implicits._
    val rows = (1L to 500L).map(e => ("a", e))
    val sig = Sketches.kmvSignatures(rows.toDF("k", "e"), "k", "e", k = 16)
      .as[(String, Seq[Long])].collect().head._2
    assert(sig.length == 16)
    assert(sig == sig.sorted)
  }

  test("kmv: when k exceeds the sets, overlap IS the exact intersection") {
    import spark.implicits._
    // A = {1..20}, B = {11..30} → |A∩B| = 10; k=64 ≫ |A∪B| = 30
    val rows = (1L to 20L).map(("a", _)) ++ (11L to 30L).map(("b", _))
    val sigs = Sketches.kmvSignatures(rows.toDF("k", "e"), "k", "e", 64)
    val out = Sketches.kmvOverlap(sigs, "k", 64)
      .as[(String, String, Long, Long)].collect()
    assert(out.length == 1)
    val (_, _, overlap, kEff) = out(0)
    assert(overlap == 10L)
    assert(kEff == 30L)
  }

  test("kmv: disjoint and identical sets hit the estimator's endpoints") {
    import spark.implicits._
    val rows = (1L to 40L).map(("a", _)) ++ (101L to 140L).map(("b", _)) ++
      (1L to 40L).map(("c", _)) // c == a
    val sigs = Sketches.kmvSignatures(rows.toDF("k", "e"), "k", "e", 16)
    val out = Sketches.kmvOverlap(sigs, "k", 16)
      .as[(String, String, Long, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4))).toMap
    assert(out(("a", "b"))._1 == 0L)        // disjoint → no shared minima
    assert(out(("a", "c")) == ((16L, 16L))) // identical → full overlap
  }

  test("q145 gate: estimator and exact evidence are consistent") {
    val out = Sketches.q145KmvIntersection(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (ov, kEff, exact) = (r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ov <= kEff)
      // overlap can never exceed the true intersection when k covers it;
      // in general it is bounded by min(k_eff, exact + 0) only when the
      // sketch is exact — the universal invariant is ov <= exact when
      // k_eff saturates the union, else ov <= k_eff
      if (kEff < 64) assert(ov == exact,
        s"k covers the union → sketch must be exact: $r")
    }
  }
}
