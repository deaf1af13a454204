package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental rollup maintenance: merging batches must equal a
  * from-scratch aggregate bit-for-bit, replays must not double-count,
  * and a crashed swap must heal. */
class RollupSpec extends SparkSpec {

  private def facts(lo: Long, n: Long) = {
    import spark.implicits._
    (lo until lo + n).map(i =>
      (s"g${i % 3}", i % 7 + 0.25, i)).toDF("grp", "x", "id")
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.select("grp", "n", "sum_x").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet

  test("init + merges equal the from-scratch aggregate exactly") {
    val store = Files.createTempDirectory("ru").toString + "/s"
    Rollup.init(spark, store, facts(0, 100), Seq("grp"), Seq("x"), "b0")
    assert(Rollup.merge(spark, store, facts(100, 50),
      Seq("grp"), Seq("x"), "b1"))
    assert(Rollup.merge(spark, store, facts(150, 7),
      Seq("grp"), Seq("x"), "b2"))
    val want = canon(facts(0, 157).groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), graft.operators.sumDec(col("x")).as("sum_x")))
    assert(canon(Rollup.read(spark, store, Seq("x"))) === want)
  }

  test("replaying an applied batch id is a no-op") {
    val store = Files.createTempDirectory("ru2").toString + "/s"
    Rollup.init(spark, store, facts(0, 30), Seq("grp"), Seq("x"), "b0")
    assert(Rollup.merge(spark, store, facts(30, 30),
      Seq("grp"), Seq("x"), "b1"))
    val once = canon(Rollup.read(spark, store, Seq("x")))
    assert(!Rollup.merge(spark, store, facts(30, 30),
      Seq("grp"), Seq("x"), "b1"), "replay must report no-op")
    assert(canon(Rollup.read(spark, store, Seq("x"))) === once,
      "replay must not change the store")
  }

  test("a crashed swap heals: aside tree restored, ledger intact") {
    val store = Files.createTempDirectory("ru3").toString + "/s"
    Rollup.init(spark, store, facts(0, 40), Seq("grp"), Seq("x"), "b0")
    val before = canon(Rollup.read(spark, store, Seq("x")))
    // simulate a crash between SafeSwap's renames: live tree gone, last
    // complete state under the hidden aside name
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(store), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(store)
    fs.rename(p, new org.apache.hadoop.fs.Path(
      p.getParent, s".${p.getName}.__old"))
    // both read and merge recover; the ledger still suppresses b0
    assert(canon(Rollup.read(spark, store, Seq("x"))) === before)
    assert(!Rollup.merge(spark, store, facts(0, 40),
      Seq("grp"), Seq("x"), "b0"))
  }
}
