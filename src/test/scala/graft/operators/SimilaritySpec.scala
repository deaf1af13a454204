package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {

  test("cosine_sim expression matches a reference implementation") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
  }

  test("cosine_sim agrees between codegen and interpreted paths") {
    VectorFunctions.register(spark)
    import spark.implicits._
    val df = graft.Tables.load(spark, sfDir, "embeddings").limit(50)
      .select(col("vec_id"), col("embedding"))
    val self = df.select(expr("cosine_sim(embedding, embedding)").as("s"))
      .as[Double].collect()
    // self-similarity is exactly 1 up to float/double rounding
    self.foreach(s => assert(math.abs(s - 1.0) < 1e-9))
    // zero-vector guard
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 2.0f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).as[Double].head()
    assert(z == 0.0)
  }

  test("brute-force top-k returns exactly k neighbors per query, self excluded") {
    val res = Similarity.q36CosineTopK(spark, sfDir).collect()
    val byQ = res.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.size == 20)
    byQ.foreach { case (q, rows) =>
      assert(rows.length == 5)
      assert(rows.map(_.getAs[Int]("rnk")).sorted.sameElements(1 to 5))
      rows.foreach(r => assert(r.getAs[Long]("vec_id") != q))
    }
  }

  test("IVF ANN reaches a sane recall floor vs brute force") {
    val bf = Similarity.q36CosineTopK(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val ann = Similarity.q37AnnIvf(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (ann & bf).size.toDouble / bf.size
    // clusterless random embeddings + nprobe 4/16 : ~0.5 expected
    assert(recall >= 0.3, s"recall $recall < 0.3")
  }
}
