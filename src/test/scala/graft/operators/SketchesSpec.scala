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
}
