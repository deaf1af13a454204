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
}
