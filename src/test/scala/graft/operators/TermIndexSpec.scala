package graft.operators

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

class TermIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = t(spark, sfDir, "documents")
  private val terms = Seq("spark", "merge", "window")

  private def listFiles(dir: String): Map[String, (Long, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Map.empty
    else {
      val it = fs.listFiles(p, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val st = it.next()
        b += st.getPath.toString ->
          ((st.getLen, st.getModificationTime))
      }
      b.result()
    }
  }

  test("probe through build+append == from-scratch BM25 on the full corpus") {
    val idx = "/tmp/graft_termindex_spec_1"
    TermIndex.buildTermIndex(spark, docs.filter(col("doc_id") % 2 === 0), idx)
    TermIndex.appendToTermIndex(spark, docs.filter(col("doc_id") % 2 === 1), idx)
    val viaIndex = TermIndex.probeTermIndex(spark, idx, terms, k = 10)
      .as[(Int, Long)].collect().toSeq
    val scratch = TextAnalysis.bm25TopK(docs, terms, k = 10)
      .as[(Int, Long)].collect().toSeq
    assert(viaIndex === scratch)
  }

  test("append is file-additive: untouched index files keep physical identity") {
    val idx = "/tmp/graft_termindex_spec_2"
    TermIndex.buildTermIndex(spark, docs.filter(col("doc_id") % 2 === 0), idx)
    val before = listFiles(s"$idx/postings")
    assert(before.nonEmpty)
    TermIndex.appendToTermIndex(spark, docs.filter(col("doc_id") % 2 === 1), idx)
    val after = listFiles(s"$idx/postings")
    before.foreach { case (path, idn) =>
      assert(after.get(path).contains(idn),
        s"base file rewritten or removed by append: $path")
    }
    assert(after.size > before.size, "append placed no files")
  }

  test("replaying an applied batch is a physical no-op") {
    val idx = "/tmp/graft_termindex_spec_3"
    val odd = docs.filter(col("doc_id") % 2 === 1)
    TermIndex.buildTermIndex(spark, docs.filter(col("doc_id") % 2 === 0), idx)
    TermIndex.appendToTermIndex(spark, odd, idx)
    val once = listFiles(idx)
    TermIndex.appendToTermIndex(spark, odd, idx) // replay
    assert(listFiles(idx) === once, "replay changed the tree")
  }

  test("probe scan partition-prunes to the query terms' buckets") {
    val idx = "/tmp/graft_termindex_spec_1" // built above
    val plan = TermIndex.probeTermIndex(spark, idx, Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("FileScan") && l.contains("/postings"))
      .getOrElse(fail(s"no postings FileScan in plan:\n${plan.take(2000)}"))
    // one term -> the partition filter is a literal on one tb value
    val inList = raw"tb#\d+ IN \(([^)]*)\)".r.findFirstMatchIn(scanLine)
      .map(_.group(1).split(",").length)
    val eq = raw"tb#\d+ = \d+|\(tb#\d+ = \d+\)".r
      .findFirstIn(scanLine).isDefined
    assert(inList.exists(_ <= 1) || eq,
      s"postings scan must carry a literal tb partition filter:\n$scanLine")
  }
}
