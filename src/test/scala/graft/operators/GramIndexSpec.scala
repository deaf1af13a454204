package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GramIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("probe through build+append equals the from-scratch novelty; replay no-ops") {
    val idx = Files.createTempDirectory("gidx").toString + "/i"
    val base = docs(1L -> "a b c d e f g", 2L -> "h i j k l m n")
    val batch = docs(3L -> "o p q r s t u")
    val probe = docs(10L -> "a b c d e x y z w v", // first gram seen
      11L -> "o p q r s nn1 nn2 nn3 nn4 nn5")      // seen via the APPEND
    GramIndex.buildGramIndex(spark, base, 5, idx)
    assert(GramIndex.appendToGramIndex(spark, batch, 5, idx))
    assert(!GramIndex.appendToGramIndex(spark, batch, 5, idx),
      "replayed batch must no-op")
    val viaIndex = GramIndex.noveltyProbe(spark, probe, 5, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val direct = TextAnalysis.ngramNovelty(base.unionByName(batch),
        probe, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(viaIndex == direct)
    assert(viaIndex == Set((10L, 6L, 5L), (11L, 6L, 5L)))
  }

  test("probe is ANSI-proof on data-driven misses: all-unseen grams " +
      "count fully novel, gram-less docs vanish, neither throws") {
    // the q280 ANSI audit applied to the index probe surface: every
    // probe gram that misses the index is a data-driven absent key —
    // the probe must resolve misses relationally (left_semi +
    // coalesce), never through a throwing positional/map access
    val idx = Files.createTempDirectory("gidx_ansi").toString + "/i"
    GramIndex.buildGramIndex(spark, docs(1L -> "a b c d e f g"), 5, idx)
    val probe = docs(
      20L -> "zz yy xx ww vv uu tt",  // every gram unseen
      21L -> "a b",                   // too short for ANY 5-gram
      22L -> "")                      // empty text
    val got = GramIndex.noveltyProbe(spark, probe, 5, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    // 7 words → 3 grams, all novel; gram-less docs produce no rows
    // (absent, not an error — the caller's left join reinstates them)
    assert(got == Set((20L, 3L, 3L)), got.toString)
  }

  test("append is file-additive: untouched bucket files keep physical identity") {
    val idx = Files.createTempDirectory("gidx_mtime").toString + "/i"
    GramIndex.buildGramIndex(spark,
      docs(1L -> "a b c d e f g h i j"), 5, idx)
    def dataFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk)
        else if (f.getName.startsWith("_") || f.getName.startsWith("."))
          Seq.empty
        else Seq(f)
      walk(new java.io.File(s"$idx/grams"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val before = dataFiles()
    assert(before.nonEmpty)
    GramIndex.appendToGramIndex(spark,
      docs(2L -> "z y x w v u t s r q"), 5, idx)
    val after = dataFiles()
    before.foreach { case (p, m) =>
      assert(after.get(p).contains(m),
        s"pre-existing index file $p must be untouched by an append")
    }
    assert(after.size > before.size, "the batch must add its own files")
  }

  test("foreachBatch sink: N micro-batches equal one; content-id replay no-ops") {
    val idx1 = Files.createTempDirectory("gidx_s1").toString + "/i"
    val idx2 = Files.createTempDirectory("gidx_s2").toString + "/i"
    val boot = docs(0L -> "seed gram zero one two")
    GramIndex.buildGramIndex(spark, boot, 5, idx1)
    GramIndex.buildGramIndex(spark, boot, 5, idx2)
    val d1 = docs(1L -> "a b c d e f g")
    val d2 = docs(2L -> "h i j k l m n")
    val sink1 = GramIndex.foreachBatchSink(idx1, 5)
    val sink2 = GramIndex.foreachBatchSink(idx2, 5)
    sink1(d1.unionByName(d2), 0L)     // one big batch
    sink2(d1, 0L); sink2(d2, 1L)      // two micro-batches
    sink2(d1, 0L)                      // redelivery (same content)
    val probe = docs(9L -> "a b c d e qq ww ee rr tt",
      10L -> "h i j k l zz xx cc vv bb")
    def res(idx: String) = GramIndex.noveltyProbe(spark, probe, 5, idx)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(res(idx1) == res(idx2))
    assert(res(idx1) == Set((9L, 6L, 5L), (10L, 6L, 5L)))
  }

  test("purgeDocs: a forgotten doc's grams leave the index files; the " +
      "probe equals a from-scratch rebuild over the filtered corpus; " +
      "replay no-ops; shared grams survive via their surviving holder") {
    val idx = Files.createTempDirectory("gidx_purge").toString + "/i"
    val d1 = 1L -> "a b c d e f g"          // doomed
    val d2 = 2L -> "h i j k l m n"          // doomed (appended)
    val d3 = 3L -> "a b c d e zz ww"        // survivor SHARING d1's gram
    val d4 = 4L -> "o p q r s t u"          // survivor
    GramIndex.buildGramIndex(spark, docs(d1, d3), 5, idx)
    GramIndex.appendToGramIndex(spark, docs(d2, d4), 5, idx)
    val removed = GramIndex.purgeDocs(spark, idx, Seq(1L, 2L))
    assert(removed > 0L)
    assert(spark.read.parquet(s"$idx/grams")
      .filter(col("doc_id").isin(1L, 2L)).count() == 0L,
      "zero index rows may reference a deleted id")
    val fresh = Files.createTempDirectory("gidx_purge_f").toString + "/i"
    GramIndex.buildGramIndex(spark, docs(d3, d4), 5, fresh)
    // "a b c d e" is shared with the SURVIVING d3 — still seen; d1's
    // "b c d e f" etc. and all of d2's grams are novel again
    val probe = docs(10L -> "a b c d e f g", 11L -> "h i j k l m n",
      12L -> "o p q r s t u")
    def res(i: String) = GramIndex.noveltyProbe(spark, probe, 5, i)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(res(idx) == res(fresh),
      "the purged index must be indistinguishable from the filtered " +
        "rebuild")
    assert(res(idx) == Set((10L, 3L, 2L), (11L, 3L, 3L), (12L, 3L, 0L)))
    assert(GramIndex.purgeDocs(spark, idx, Seq(1L, 2L)) == 0L,
      "a replayed purge must be a ledger no-op")
  }

  test("cross-batch duplicate grams never multiply probe rows") {
    val idx = Files.createTempDirectory("gidx_dup").toString + "/i"
    val d = docs(1L -> "a b c d e f")
    GramIndex.buildGramIndex(spark, d, 5, idx)
    // a DIFFERENT batch containing the same grams (dup presence rows)
    GramIndex.appendToGramIndex(spark,
      docs(5L -> "a b c d e f"), 5, idx)
    val probe = docs(9L -> "a b c d e f")
    val got = GramIndex.noveltyProbe(spark, probe, 5, idx).collect()
    assert(got.length == 1 &&
      got.head.getLong(1) == 2L && got.head.getLong(2) == 0L)
  }
}
