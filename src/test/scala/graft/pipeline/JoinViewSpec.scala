package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinViewSpec extends SparkSpec {

  private def facts(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("id", "k", "x")
  }

  private def dim(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("k", "attr")
  }

  test("init + merge + replay equals the from-scratch join; replay no-ops") {
    val store = Files.createTempDirectory("jv").toString + "/s"
    val d = dim(Seq((1L, "a"), (2L, "b")))
    val f0 = facts(Seq((1L, 1L, 10.0), (2L, 2L, 20.0)))
    val f1 = facts(Seq((3L, 1L, 30.0), (4L, 2L, 40.0)))
    JoinView.init(spark, store, f0, d, Seq("k"), "b0")
    assert(JoinView.merge(spark, store, f1, d, Seq("k"), "b1"))
    assert(!JoinView.merge(spark, store, f1, d, Seq("k"), "b1"),
      "replayed batch id must no-op")
    val got = JoinView.read(spark, store)
      .select("id", "k", "x", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    val want = f0.unionByName(f1).join(d, "k")
      .select("id", "k", "x", "attr").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
      .toSet
    assert(got == want)
    assert(got.size == 4, "a double-applied batch would show here")
  }

  test("merge is file-additive: pre-existing view files keep physical identity") {
    val store = Files.createTempDirectory("jv_mtime").toString + "/s"
    val d = dim(Seq((1L, "a")))
    JoinView.init(spark, store, facts(Seq((1L, 1L, 1.0))), d, Seq("k"), "b0")
    val fs = new java.io.File(s"$store/view")
    def dataFiles() = fs.listFiles
      .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
      .map(f => f.getName -> f.lastModified).toMap
    val before = dataFiles()
    assert(before.nonEmpty)
    JoinView.merge(spark, store, facts(Seq((2L, 1L, 2.0))), d, Seq("k"),
      "b1")
    val after = dataFiles()
    before.foreach { case (name, mtime) =>
      assert(after.get(name).contains(mtime),
        s"pre-existing file $name must be untouched by a merge")
    }
    assert(after.size > before.size, "the batch must add its own files")
  }

  test("dimension is frozen at enrich time: old rows keep their join-time attrs") {
    val store = Files.createTempDirectory("jv_asof").toString + "/s"
    JoinView.init(spark, store, facts(Seq((1L, 1L, 1.0))),
      dim(Seq((1L, "v1"))), Seq("k"), "b0")
    // the dim row is restated between batches — the documented contract
    // is as-of-enrich: batch b1's rows see v2, b0's keep v1
    JoinView.merge(spark, store, facts(Seq((2L, 1L, 2.0))),
      dim(Seq((1L, "v2"))), Seq("k"), "b1")
    val got = JoinView.read(spark, store)
      .select("id", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "v1"), (2L, "v2")))
  }

  test("foreachBatch sink: N micro-batches equal one, redelivery no-ops") {
    val store1 = Files.createTempDirectory("jv_s1").toString + "/s"
    val store2 = Files.createTempDirectory("jv_s2").toString + "/s"
    val d = dim(Seq((1L, "a"), (2L, "b")))
    val all = facts(Seq((1L, 1L, 1.0), (2L, 2L, 2.0), (3L, 1L, 3.0)))
    val boot = facts(Seq((0L, 2L, 0.5)))
    JoinView.init(spark, store1, boot, d, Seq("k"), "boot")
    JoinView.init(spark, store2, boot, d, Seq("k"), "boot")
    val sink1 = JoinView.foreachBatchSink(store1, d, Seq("k"))
    val sink2 = JoinView.foreachBatchSink(store2, d, Seq("k"))
    // one big batch vs two smaller ones, plus a redelivery of batch 0
    sink1(all, 0L)
    sink2(all.filter(col("id") <= 1L), 0L)
    sink2(all.filter(col("id") > 1L), 1L)
    sink2(all.filter(col("id") <= 1L), 0L) // redelivered on recovery
    def content(store: String) = JoinView.read(spark, store)
      .select("id", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(content(store1) == content(store2))
    assert(content(store1).size == 4)
  }
}
