package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.pipeline.AppendCommit

final case class AdmDoc(ts: Timestamp, doc_id: Long, text: String)

class AdmissionSpec extends SparkSpec {

  private val alpha = "the quick brown fox jumps over the lazy dog and " +
    "runs far away into the deep green forest tonight"
  private val alphaNear = "the quick brown fox jumps over the lazy cat " +
    "and runs far away into the deep green forest tonight"
  private val beta = "pack my box with five dozen liquor jugs while the " +
    "band played waltzes on the crowded pier all evening"
  private val gamma = "sphinx of black quartz judge my vow under the " +
    "bright morning sun beside the quiet harbor wall today"

  private val t0 = 1700000000000L
  private def doc(id: Long, text: String, offsetMs: Long = 0L) =
    AdmDoc(new Timestamp(t0 + offsetMs), id, text)

  test("streaming admission: exact dups drop in state, near-dups drop " +
      "at the index, novel docs land exactly once; redelivery converges") {
    import spark.implicits._
    val base = Files.createTempDirectory("admission").toString
    val idx = s"$base/index"
    val adm = s"$base/admitted"
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[AdmDoc]
    val q = Admission.admit(mem.toDF(), idx, adm,
        watermarkDelay = "1 hour")
      .option("checkpointLocation", s"$base/ckpt")
      .start()
    try {
      // batch 0: d3 is an exact dup of d1 WITHIN the batch
      mem.addData(Seq(doc(1, alpha), doc(2, beta), doc(3, alpha, 1000)))
      q.processAllAvailable()
      // batch 1: d4 exact dup (in-watermark → engine state drops it),
      // d5 near-dup of alpha (one word → index probe drops it),
      // d6 novel → admitted
      mem.addData(Seq(doc(4, alpha, 2000), doc(5, alphaNear, 3000),
        doc(6, gamma, 4000)))
      q.processAllAvailable()
    } finally q.stop()
    val admitted = Admission.admittedCorpus(spark, adm)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 2L, 6L),
      s"expected the batch-pipeline answer {1,2,6}, got $admitted")
    // the index holds exactly the admitted docs (probe-visible)
    val probe = graft.operators.Dedup.incrementalNearDups(spark, idx,
        Seq((100L, alpha)).toDF("doc_id", "text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe == Set((1L, 100L)),
      "the admitted corpus must be probe-visible through the index")

    // REDELIVERY of batch 1 (engine at-least-once): same rows, same id.
    // The index now contains d6 — a naive recompute would self-match
    // and shrink the corpus; the pinned commit must make this a no-op.
    def snapshot(dir: String): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles.toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.lastModified).toMap
    }
    val admBefore = snapshot(adm)
    val idxBefore = snapshot(idx)
    // the engine may interleave data-free watermark-commit batches, so
    // recover the REAL id of the last data batch from the ledger
    val lastId = AppendCommit.appliedEntries(adm).map(_._1)
      .filter(_.startsWith("stream"))
      .map(_.stripPrefix("stream").toLong).max
    Admission.admissionSink(idx, adm)(
      Seq(doc(4, alpha, 2000), doc(5, alphaNear, 3000),
        doc(6, gamma, 4000)).toDF(), lastId)
    assert(snapshot(adm) == admBefore,
      "redelivered batch must not rewrite the admitted corpus")
    assert(snapshot(idx) == idxBefore,
      "redelivered batch must not re-append to the index")
    assert(Admission.admittedCorpus(spark, adm)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 6L))
  }

  test("crash between corpus commit and index append: replay appends " +
      "the PINNED admitted set, not a recomputed one") {
    import spark.implicits._
    val base = Files.createTempDirectory("admission_crash").toString
    val idx = s"$base/index"
    val adm = s"$base/admitted"
    // batch 0 lands normally
    Admission.admissionSink(idx, adm)(
      Seq(doc(1, alpha), doc(2, beta)).toDF(), 0L)
    // simulate the crash window for batch 1: corpus committed, index
    // append never ran
    val batch1 = Seq(doc(6, gamma, 1000)).toDF()
    AppendCommit.appendBatch(spark, adm, "stream1") { tmp =>
      batch1.select("doc_id", "text").write.mode("overwrite").parquet(tmp)
    }
    // redelivery completes the index append from the pinned files
    Admission.admissionSink(idx, adm)(batch1, 1L)
    val probe = graft.operators.Dedup.incrementalNearDups(spark, idx,
        Seq((200L, gamma)).toDF("doc_id", "text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe == Set((6L, 200L)),
      "the pinned batch must reach the index on replay")
    assert(Admission.admittedCorpus(spark, adm)
      .select("doc_id").collect().map(_.getLong(0)).toSet ==
      Set(1L, 2L, 6L))
  }
}
