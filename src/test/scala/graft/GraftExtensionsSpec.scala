package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("extensions registrator applies cleanly") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // registers the function + rule set
  }

  test("EmptyVectorCosineFold removes the per-row loop, preserves results") {
    graft.functions.VectorFunctions.register(spark)
    val prev = spark.experimental.extraOptimizations
    try {
      spark.experimental.extraOptimizations = prev :+ EmptyVectorCosineFold
      val e = Tables.load(spark, sfDir, "embeddings").limit(10)
      val q = e.select(
        expr("cosine_sim(cast(array() as array<float>), embedding)").as("s"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosine_sim"),
        s"rule should have folded cosine_sim away:\n$optimized")
      // results identical to the unfolded evaluation: 0.0 for non-null rows
      q.collect().foreach(r => assert(r.getDouble(0) == 0.0))
      // null propagation preserved
      import spark.implicits._
      val withNull = Seq(Some(Array(1.0f)), None).toDF("v")
        .select(expr("cosine_sim(cast(array() as array<float>), v)").as("s"))
        .collect()
      assert(withNull(0).getDouble(0) == 0.0)
      assert(withNull(1).isNullAt(0))
    } finally {
      spark.experimental.extraOptimizations = prev
    }
  }
}
