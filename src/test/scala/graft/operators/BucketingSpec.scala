package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Co-located joins via bucketing — the scale pattern for repeated fact⋈fact
  * joins on the same key: pay the shuffle once at write time, then every
  * join on the bucket key is exchange-free. (The reference's layout has no
  * partitioning at all, `'PartitionKeys': []` — this is part of the
  * beyond-reference canonical layer story.) */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables runs without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("bucket_wh")
    spark.sql("CREATE DATABASE IF NOT EXISTS bkt")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      graft.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite")
        .option("path", s"$wh/li_b")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bkt.li_b")
      graft.Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite")
        .option("path", s"$wh/o_b")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bkt.o_b")

      val joined = spark.table("bkt.li_b")
        .join(spark.table("bkt.o_b"),
          col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a non-broadcast join:\n$plan")
      // correctness unchanged vs the plain (shuffling) join
      val plain = graft.Tables.load(spark, sfDir, "lineitem")
        .join(graft.Tables.load(spark, sfDir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(n == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }
  test("q78 probe path: DDL-redeclared bucketed tables equal the build path") {
    val first = Ingest.q78BucketedJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    // a fresh session forgets the in-memory catalog but keeps the files:
    // dropping the tables simulates it, forcing the CREATE TABLE ...
    // CLUSTERED BY ... LOCATION redeclaration branch
    val suffix = sfDir.hashCode.toHexString
    spark.sql(s"DROP TABLE IF EXISTS graft_bkt.li_$suffix")
    spark.sql(s"DROP TABLE IF EXISTS graft_bkt.o_$suffix")
    val second = Ingest.q78BucketedJoin(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(second == first)
  }

  test("shardFingerprint: partition-invariant content receipts; one doc moves one shard") {
    import spark.implicits._
    val docs = (1L to 60L).map(i => (i, s"doc $i body word$i"))
      .toDF("doc_id", "text")
    def fp(df: org.apache.spark.sql.DataFrame) =
      Ingest.shardFingerprint(df, nShards = 4).collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
          r.getString(3)))).toMap
    val a = fp(docs)
    val b = fp(docs.repartition(7))
    assert(a == b, "shard content fingerprints must be a pure function" +
      " of the data, not the partitioning")
    // editing one doc changes exactly its shard's fingerprint
    val edited = docs.withColumn("text",
      when(col("doc_id") === 17L, lit("edited")).otherwise(col("text")))
    val c = fp(edited)
    val changed = a.keySet.filter(s => a(s)._3 != c(s)._3)
    assert(changed.size == 1,
      s"exactly one shard must change, got $changed")
  }
}
