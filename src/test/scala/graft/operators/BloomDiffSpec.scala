package graft.operators

import org.apache.spark.sql.catalyst.plans.logical.{Join, Union}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-pruned anti-join: exactness never depends on the sketch (false
  * positives are re-checked, false negatives are impossible), and the
  * fast path genuinely skips the join. */
class BloomDiffSpec extends SparkSpec {

  private def exactAnti(left: org.apache.spark.sql.DataFrame,
      right: org.apache.spark.sql.DataFrame) =
    left.join(right, col("k") === col("rk"), "left_anti")

  test("bloom-pruned anti-join equals the exact anti-join") {
    import spark.implicits._
    // overlapping ranges + duplicate left rows: anti-join semantics keep
    // every unmatched left ROW, not just distinct keys
    val left = ((0L until 3000L) ++ (100L until 110L)).toDF("k")
    val right = (1500L until 4000L).map(identity).toDF("rk")
    val got = Relational
      .bloomPrunedAntiJoin(spark, left, right, "k", "rk", 10000L)
      .collect().map(_.getLong(0)).sorted
    val want = exactAnti(left, right).collect().map(_.getLong(0)).sorted
    assert(got.toSeq === want.toSeq)
    assert(got.length === 1510) // 0..1499 plus the 10 duplicated rows
  }

  test("empty right side: everything is definitely new") {
    import spark.implicits._
    val left = (0L until 100L).toDF("k")
    val right = Seq.empty[Long].toDF("rk")
    val got = Relational
      .bloomPrunedAntiJoin(spark, left, right, "k", "rk", 100L)
      .count()
    assert(got === 100L)
  }

  test("the definite-new branch of the plan contains no join") {
    import spark.implicits._
    val left = (0L until 100L).toDF("k")
    val right = (50L until 150L).toDF("rk")
    val plan = Relational
      .bloomPrunedAntiJoin(spark, left, right, "k", "rk", 100L)
      .queryExecution.optimizedPlan
    val union = plan.collectFirst { case u: Union => u }
    assert(union.isDefined, "plan should be a union of fast + checked path")
    val fast = union.get.children.head
    assert(fast.collectFirst { case j: Join => j }.isEmpty,
      "NOT might_contain rows must bypass the anti-join entirely")
    val checked = union.get.children(1)
    assert(checked.collectFirst { case j: Join => j }.isDefined,
      "might_contain survivors must still be exactly re-checked")
  }

  test("false-positive rate of the probe stays near the 8-bits/item design") {
    import spark.implicits._
    graft.functions.Bloom.register(spark)
    val right = (0L until 20000L).toDF("rk")
    right.createOrReplaceTempView("__bloom_fp_right")
    // probe keys strictly disjoint from the sketch's contents — every
    // might_contain hit is a false positive
    val probes = (1000000L until 1020000L).toDF("k")
    probes.createOrReplaceTempView("__bloom_fp_probe")
    val fp = spark.sql(
      """SELECT COUNT(*) FROM __bloom_fp_probe
        |WHERE graft_might_contain(
        |  (SELECT graft_bloom_agg(xxhash64(rk), CAST(20000 AS BIGINT))
        |   FROM __bloom_fp_right),
        |  xxhash64(k))""".stripMargin).head().getLong(0)
    val rate = fp.toDouble / 20000
    assert(rate < 0.05, s"false-positive rate $rate should be ~2%, < 5%")
  }
}
