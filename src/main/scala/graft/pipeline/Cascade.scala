package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** RTBF (right-to-be-forgotten) CASCADE delete: a row-level key delete
  * on a corpus table must also leave every maintained DERIVED store the
  * pipeline built from it — the MinHash signature/band tables persist
  * the docs' ids and near-dup structure, the term index persists their
  * postings, the IVF cells persist their ORIGINAL embeddings (actual
  * content), PQ/IVFADC stores persist their codes, join views persist
  * enriched row copies, and rollup partials counted them. Purging the
  * table alone ([[Maintain.deleteByKey]]) leaves all of that behind —
  * the reference's file-sync model never faced this because its unit
  * of change was the whole file (`sync-canvas-data-files.py:58-67`);
  * record-grained deletion needs record-grained propagation.
  *
  * Ordering is the crash-safety argument:
  *
  *   1. CAPTURE the doomed rows' (id, embedding) from the still-intact
  *      corpus — the codes-only PQ stores cannot reproduce a deleted
  *      vector's fingerprint contribution from their own bytes;
  *   2. PURGE every index (each hook is idempotent and intent-staged —
  *      [[graft.pipeline.AppendCommit.runWithIntent]] — so a crash
  *      anywhere re-converges by re-running the cascade);
  *   3. delete the TABLE rows (idempotent);
  *   4. purge keyed views / invalidate non-subtractable rollup stores.
  *
  * A re-run after a crash at any step converges: applied purges no-op
  * via their content-keyed ledger entries, the table delete finds
  * nothing, invalidation is idempotent. Each store's purge is
  * O(files-holding-the-keys), never O(store) — the 100 TB contract.
  */
object Cascade {

  sealed trait Target
  object Target {
    /** MinHash near-dup index ([[graft.operators.Dedup]]): signatures,
      * bands, negative bucket-size deltas. Doc-id keyed. */
    final case class Minhash(dir: String) extends Target
    /** BM25 term index ([[graft.operators.TermIndex]]): postings +
      * negative corpus stats. Doc-id keyed. */
    final case class Term(dir: String) extends Target
    /** IVF ANN index ([[graft.operators.Similarity]]): cell rows (which
      * hold the original embeddings) + negative fingerprint. */
    final case class Ivf(dir: String) extends Target
    /** PQ-ADC codes store ([[graft.operators.Quantize]]). */
    final case class Pq(dir: String) extends Target
    /** IVFADC cell-partitioned codes store. */
    final case class IvfPq(dir: String) extends Target
    /** Maintained join view whose rows copy the fact key. */
    final case class View(store: String, keyCol: String) extends Target
    /** Rollup store: delta-SUBTRACTED in place when the spec's algebra
      * allows (counts/sums/nulls/histograms — [[Rollup.retract]] folds
      * the deleted rows' negated partials, no rebuild scan), otherwise
      * invalidated for rebuild (min/max/HLL cannot un-see a row). */
    final case class RollupStore(dir: String, spec: Rollup.Spec)
        extends Target
  }

  final case class Summary(
      tableRowsDeleted: Long,
      purged: Map[String, Long],
      invalidated: Seq[String])

  /** Cascade-delete `keys` of column `c` from the corpus at `tableDir`
    * and from every maintained store in `targets`. `embeddingCol` is
    * read from the corpus for the codes-only vector stores (ignored
    * when no Pq/IvfPq target is present). */
  def deleteByKey(spark: SparkSession, tableDir: String, c: String,
      keys: Seq[Any], targets: Seq[Target],
      embeddingCol: String = "embedding"): Summary = {
    import Target._
    require(keys.nonEmpty, "need at least one key to cascade-delete")
    val needEmb = targets.exists {
      case Pq(_) | IvfPq(_) => true
      case _ => false
    }
    // captured BEFORE any destruction; on a converging re-run after the
    // table delete this is legitimately empty — the purge hooks' staged
    // intents carry the first run's numbers
    val deletedRows =
      if (!needEmb) spark.emptyDataFrame
      else Maintain.matchingKeys(
          Manifest.readSnapshot(spark, tableDir), c, keys)
        .select(col(c).as("vec_id"), col(embeddingCol).as("embedding"))
    val needFull = targets.exists {
      case RollupStore(_, spec) => Rollup.subtractable(spec)
      case _ => false
    }
    val deletedFull =
      if (!needFull) spark.emptyDataFrame
      else Maintain.matchingKeys(
        Manifest.readSnapshot(spark, tableDir), c, keys)
    val retractId = "purge-" + AppendCommit.contentId(
      keys.map(String.valueOf).sorted.mkString("\n"))
    val purged = scala.collection.mutable.Map.empty[String, Long]
    val invalidated = scala.collection.mutable.ArrayBuffer.empty[String]
    targets.foreach {
      case Minhash(dir) =>
        purged(dir) = graft.operators.Dedup
          .purgeMinhashIndex(spark, dir, keys)
      case Term(dir) =>
        purged(dir) = graft.operators.TermIndex
          .purgeDocs(spark, dir, keys)
      case Ivf(dir) =>
        purged(dir) = graft.operators.Similarity
          .purgeIvfIndex(spark, dir, keys)
      case Pq(dir) =>
        purged(dir) = graft.operators.Quantize
          .purgePqIndex(spark, dir, keys, deletedRows)
      case IvfPq(dir) =>
        purged(dir) = graft.operators.Quantize
          .purgeIvfPqIndex(spark, dir, keys, deletedRows)
      case RollupStore(dir, spec) if Rollup.subtractable(spec) =>
        // BEFORE the table delete (the rows must still exist to stage);
        // the retraction's in-store stage makes the retry convergent
        Rollup.retract(spark, dir, deletedFull, spec, retractId)
      case View(_, _) | RollupStore(_, _) => () // after the table delete
    }
    val table = Maintain.deleteByKey(spark, tableDir, c, keys)
    targets.foreach {
      case View(store, keyCol) =>
        purged(store) = JoinView.purgeByKey(spark, store, keyCol, keys)
      case RollupStore(dir, spec) if !Rollup.subtractable(spec) =>
        Rollup.invalidate(spark, dir)
        invalidated += dir
      case _ => ()
    }
    Summary(table.rowsDeleted, purged.toMap, invalidated.toSeq)
  }

  // ---------------------------------------------------------------------
  // q257_cascade_delete — the RTBF cascade end-to-end: per-process
  // copies of the documents/embeddings corpora get a MinHash index, a
  // term index, and an IVF index built through BOTH write paths
  // (build on even ids, append odd ids), then every id ≡ 3 (mod 7)
  // cascade-deletes. The gate emits an integer evidence panel whose
  // oracle is the FILTERED corpus: zero rows referencing deleted ids
  // may remain in any index file, the term index's ledger-folded corpus
  // stats must equal the filtered corpus's (COUNT, Σ token counts), the
  // MinHash signature table must shrink to the kept count, the IVF
  // cells must hold exactly the kept vectors, and a probe armed with
  // the PURGED vectors' own embeddings must reach none of them.
  // ---------------------------------------------------------------------
  private lazy val gateBase: String =
    java.nio.file.Files.createTempDirectory("graft_casc_").toString

  private def fixtureRoot(dir: String) =
    s"$gateBase/c_${dir.hashCode.toHexString}"

  /** Build-once (per process+SF) cascade fixture; returns
    * (docsTable, mhIdx, termIdx, embTable, ivfIdx). */
  private def ensureFixture(s: SparkSession, dir: String)
      : (String, String, String, String, String) = {
    val root = fixtureRoot(dir)
    val docsT = s"$root/docs"; val mh = s"$root/mh"
    val term = s"$root/term"; val embT = s"$root/emb"
    val ivf = s"$root/ivf"
    if (!new java.io.File(s"$root.complete").exists()) {
      val d = graft.operators.t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
      val e = graft.operators.t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      d.write.mode("overwrite").parquet(docsT)
      e.write.mode("overwrite").parquet(embT)
      graft.operators.Dedup.buildMinhashIndex(s,
        d.filter(col("doc_id") % 2 === 0), mh)
      graft.operators.Dedup.appendToMinhashIndex(s,
        d.filter(col("doc_id") % 2 === 1), mh)
      graft.operators.TermIndex.buildTermIndex(s,
        d.filter(col("doc_id") % 2 === 0), term)
      graft.operators.TermIndex.appendToTermIndex(s,
        d.filter(col("doc_id") % 2 === 1), term)
      graft.operators.Similarity.buildIvfIndex(s,
        e.filter(col("vec_id") % 2 === 0), ivf)
      graft.operators.Similarity.appendToIvfIndex(s,
        e.filter(col("vec_id") % 2 === 1), ivf)
      val docKeys: Seq[Any] = d.filter(col("doc_id") % 7 === 3)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val vecKeys: Seq[Any] = e.filter(col("vec_id") % 7 === 3)
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      deleteByKey(s, docsT, "doc_id", docKeys,
        Seq(Target.Minhash(mh), Target.Term(term)))
      deleteByKey(s, embT, "vec_id", vecKeys, Seq(Target.Ivf(ivf)))
      new java.io.File(s"$root.complete").createNewFile()
    }
    (docsT, mh, term, embT, ivf)
  }

  def q257CascadeDelete(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val (docsT, mh, term, embT, ivf) = ensureFixture(s, dir)
    val delDoc = col("doc_id") % 7 === 3
    val delVec = col("vec_id") % 7 === 3
    def n(df: DataFrame): Long = df.count()
    val (statsN, statsDl) = AppendCommit.appliedEntries(term)
      .map(_._2.split(":") match { case Array(a, c) => (a.toLong, c.toLong) })
      .foldLeft((0L, 0L)) { case ((an, ad), (bn, bd)) => (an + bn, ad + bd) }
    // probe the IVF index with the PURGED vectors' own embeddings (from
    // the untouched source table — a purged vector's nearest neighbor
    // would be itself at cosine 1.0): any hit on a purged id is a leak
    val deletedQ = graft.operators.t(s, dir, "embeddings")
      .filter(delVec)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      .limit(20)
    val leaked = graft.operators.Similarity
      .probeIvfIndex(s, ivf, deletedQ, k = 5)
      .filter(delVec).count()
    val rows = Seq(
      ("ivf", "cell_rows_deleted_ids",
        n(s.read.parquet(s"$ivf/cells").filter(delVec))),
      ("ivf", "distinct_vecs",
        s.read.parquet(s"$ivf/cells").select("vec_id").distinct().count()),
      ("ivf", "probe_hits_deleted", leaked),
      ("minhash", "band_rows_deleted_ids",
        n(s.read.parquet(s"$mh/bands").filter(delDoc))),
      ("minhash", "sig_rows_deleted_ids",
        n(s.read.parquet(s"$mh/signatures").filter(delDoc))),
      ("minhash", "sig_rows_total",
        n(s.read.parquet(s"$mh/signatures"))),
      ("table", "docs_rows_deleted_ids",
        n(s.read.parquet(docsT).filter(delDoc))),
      ("table", "docs_rows_total", n(s.read.parquet(docsT))),
      ("table", "vecs_rows_total", n(s.read.parquet(embT))),
      ("term", "postings_deleted_ids",
        n(s.read.parquet(s"$term/postings").filter(delDoc))),
      ("term", "stats_n", statsN),
      ("term", "stats_sumdl", statsDl))
    val sqlCtx = s
    import sqlCtx.implicits._
    rows.toDF("store", "metric", "value")
  }

  val q257CascadeDeleteSql: String =
    """WITH kept AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 3),
      |keptv AS (SELECT vec_id FROM embeddings WHERE vec_id % 7 <> 3)
      |SELECT 'ivf' AS store, 'cell_rows_deleted_ids' AS metric,
      |  CAST(0 AS BIGINT) AS value
      |UNION ALL SELECT 'ivf', 'distinct_vecs',
      |  (SELECT COUNT(*) FROM keptv)
      |UNION ALL SELECT 'ivf', 'probe_hits_deleted', CAST(0 AS BIGINT)
      |UNION ALL SELECT 'minhash', 'band_rows_deleted_ids',
      |  CAST(0 AS BIGINT)
      |UNION ALL SELECT 'minhash', 'sig_rows_deleted_ids',
      |  CAST(0 AS BIGINT)
      |UNION ALL SELECT 'minhash', 'sig_rows_total',
      |  (SELECT COUNT(*) FROM kept)
      |UNION ALL SELECT 'table', 'docs_rows_deleted_ids',
      |  CAST(0 AS BIGINT)
      |UNION ALL SELECT 'table', 'docs_rows_total',
      |  (SELECT COUNT(*) FROM kept)
      |UNION ALL SELECT 'table', 'vecs_rows_total',
      |  (SELECT COUNT(*) FROM keptv)
      |UNION ALL SELECT 'term', 'postings_deleted_ids',
      |  CAST(0 AS BIGINT)
      |UNION ALL SELECT 'term', 'stats_n', (SELECT COUNT(*) FROM kept)
      |UNION ALL SELECT 'term', 'stats_sumdl',
      |  (SELECT CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |   FROM kept)""".stripMargin

  // ---------------------------------------------------------------------
  // q258_purged_probe — the strongest form of the cascade oracle: BM25
  // top-k THROUGH the purged term index must hash-match a from-scratch
  // DuckDB BM25 over the FILTERED corpus (q107's query, q129's
  // index-invisibility contract, now across a delete). Every purge
  // defect is visible here: a surviving posting re-ranks a deleted doc
  // in, a wrong stats subtraction moves idf/avgdl and every score.
  // ---------------------------------------------------------------------
  def q258PurgedProbe(s: SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val (_, _, term, _, _) = ensureFixture(s, dir)
    graft.operators.TermIndex.probeTermIndex(s, term,
      Seq("spark", "merge", "window"), k = 15)
  }

  /** q107's oracle with the corpus filtered to the kept docs — the
    * purged index must be indistinguishable from a rebuild. */
  val q258PurgedProbeSql: String = {
    val base = graft.operators.TextAnalysis.q107Bm25Sql
    require(base.contains("FROM documents)"),
      "q107 oracle shape moved; update the q258 filter rewrite")
    base.replace("FROM documents)",
      "FROM documents WHERE doc_id % 7 <> 3)")
  }
}
