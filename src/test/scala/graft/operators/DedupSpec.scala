package graft.operators

import graft.SparkSpec

/** Dedup semantics: the approximate operators (MinHash-LSH, SimHash) are
  * validated against the exact trigram-Jaccard pairs they approximate —
  * the planted near-duplicates in the synthetic corpus must surface. */
class DedupSpec extends SparkSpec {

  private lazy val exactPairs: Set[(Long, Long)] =
    Dedup.q33NgramJaccard(spark, sfDir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("exact trigram-Jaccard finds the planted near-dup pairs") {
    assert(exactPairs.nonEmpty, "corpus should contain planted near-dups")
    exactPairs.foreach { case (a, b) => assert(a < b) }
  }

  test("MinHash-LSH recalls every exact pair with no false positives") {
    val mh = Dedup.q32MinhashLsh(spark, sfDir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((exactPairs -- mh).isEmpty,
      s"missed pairs: ${exactPairs -- mh}")
    assert((mh -- exactPairs).isEmpty,
      s"false positives: ${mh -- exactPairs}")
  }

  test("SimHash banding recalls most exact pairs with no false positives") {
    val sh = Dedup.q34Simhash(spark, sfDir)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (sh & exactPairs).size.toDouble / exactPairs.size
    assert(recall >= 0.85, s"recall $recall < 0.85")
    assert((sh -- exactPairs).isEmpty, s"false positives: ${sh -- exactPairs}")
  }

  test("exact dedup removes exactly the planted duplicate rows") {
    val res = Dedup.q31DedupExact(spark, sfDir).collect()
    res.foreach { r =>
      val raw = r.getAs[Long]("n_raw")
      val ded = r.getAs[Long]("n_dedup")
      assert(ded <= raw)
    }
    val totalRaw = res.map(_.getAs[Long]("n_raw")).sum
    val totalDed = res.map(_.getAs[Long]("n_dedup")).sum
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val n = docs.count()
    val dupd = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 10 === 0).count()
    assert(totalRaw == n + dupd)
    assert(totalDed == n)
  }

  test("embedding near-dup LSH only reports pairs above threshold") {
    val rows = Dedup.q35EmbedNearDup(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Double]("sim") >= 0.3))
  }

  test("incremental dedup via the persisted index equals the one-shot pipeline") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val idx = java.nio.file.Files.createTempDirectory("mh_idx").toString +
      "/index"
    Dedup.buildMinhashIndex(spark, d, idx)
    val incoming = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
    val inc = Dedup.incrementalNearDups(spark, idx, incoming).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // one-shot truth: full-corpus MinHash-LSH over old ∪ new, restricted
    // to cross pairs — the persisted path must reproduce it exactly
    val sig = Dedup.minhashSignatures(d.unionByName(incoming)).cache()
    sig.count()
    val full = Dedup.minhashCandidates(sig)
    val sa = sig.select(col("doc_id").as("a"), col("sig").as("sig_a"))
    val sb = sig.select(col("doc_id").as("b"), col("sig").as("sig_b"))
    val oneShot = full.join(sa, "a").join(sb, "b")
      .withColumn("est",
        size(filter(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(0)), v => v === 1))
          .cast("double") / 64)
      .filter(col("est") >= 0.5)
      .filter(col("b") >= 5000000L && col("a") < 5000000L)
      .collect().map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(inc == oneShot,
      s"persisted-index probe diverged: ${inc.size} vs ${oneShot.size}")
    // every planted copy collides with its original at estimate 1.0
    val planted = d.filter(col("doc_id") % 10 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    planted.foreach(id =>
      assert(inc.contains((id, id + 5000000L)), s"copy of $id missed"))
  }
}
