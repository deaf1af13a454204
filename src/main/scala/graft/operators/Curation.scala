package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

import org.apache.spark.sql.functions._

/** [EXT] Corpus-curation operators for training-data pipelines:
  * benchmark decontamination, deterministic train/val splitting, and
  * intra-document repetition filtering — the standard curation passes
  * (exact-substring decontamination as in GPT-3 appendix C / Llama;
  * repetition filters as in Gopher) re-expressed relationally.
  *
  * Scale design: every operator is explode → shuffle-on-key → aggregate;
  * n-gram material is built with the window-lead pipeline (one hash/
  * concat per word, no nested array lambdas — NOTES.md invariant 5), and
  * the decontamination join is a semi-join against the (small) benchmark
  * gram set, which Spark broadcasts. Nothing is ever all-pairs and no
  * driver-side loops exist. All three are fully oracle-checked (string
  * n-grams and md5 are engine-neutral, unlike xxhash64).
  */
object Curation {

  /** One row per (doc, position): the word-`n`-gram starting there, as a
    * '_'-joined string (string grams — the oracle must reproduce them in
    * SQL, unlike Dedup's hashed shingles). Shares [[NGrams.nGramRows]]. */
  private def wordGrams(docs: DataFrame, n: Int): DataFrame =
    NGrams.nGramRows(docs, n)(ws => concat_ws("_", ws: _*))

  // ---------------------------------------------------------------------
  // q62_decontaminate — benchmark decontamination: a held-out set (docs
  // with doc_id % 97 = 0 standing in for an eval benchmark) must not leak
  // into training data. A training doc is contaminated if it shares any
  // word-4-gram with any benchmark doc — the exact-substring overlap rule.
  // Relational shape: benchmark grams (small, distinct) semi-join the
  // corpus gram stream; contaminated doc ids fall out of one distinct.
  // ---------------------------------------------------------------------
  def q62Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val grams = wordGrams(d, 4)
    val isBench = col("doc_id") % 97 === 0
    val benchGrams = grams.filter(isBench).select(col("s")).distinct()
    val contaminated = grams.filter(!isBench)
      .join(broadcast(benchGrams), Seq("s"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(1L))
    d.filter(!isBench)
      .join(contaminated, Seq("doc_id"), "left_outer")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_train_docs"),
        sum(coalesce(col("contaminated"), lit(0L))).as("n_contaminated"),
        (count(lit(1)) - sum(coalesce(col("contaminated"), lit(0L))))
          .as("n_clean"))
  }

  val q62DecontaminateSql: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
      |           FROM documents),
      |g AS (SELECT DISTINCT doc_id,
      |        list_aggregate(w[i:i+3], 'string_agg', '_') AS s
      |      FROM t, UNNEST(range(1, len(w) - 2)) AS gg(i)),
      |bench AS (SELECT DISTINCT s FROM g WHERE doc_id % 97 = 0),
      |contaminated AS (
      |  SELECT DISTINCT g.doc_id FROM g JOIN bench ON g.s = bench.s
      |  WHERE g.doc_id % 97 <> 0)
      |SELECT lang,
      |  COUNT(*) AS n_train_docs,
      |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
      |       AS BIGINT) AS n_contaminated,
      |  CAST(COUNT(*) - SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0
      |       END) AS BIGINT) AS n_clean
      |FROM t LEFT JOIN contaminated c ON t.doc_id = c.doc_id
      |WHERE t.doc_id % 97 <> 0
      |GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q63_hash_split — deterministic train/val split: bucket = first byte
  // of md5(doc_id), train if < 230 (≈90%). Hash-based splits are the
  // production standard because they are stable under corpus growth and
  // reshuffling (a doc's split never depends on what else is in the
  // corpus, unlike randomSplit). md5 is engine-neutral → fully
  // oracle-checked.
  // ---------------------------------------------------------------------
  def q63HashSplit(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val bucket = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 2), 16, 10).cast("int")
    d.withColumn("split",
        when(bucket < 230, lit("train")).otherwise(lit("val")))
      .groupBy(col("lang"), col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " ")).cast("long")).as("n_tokens"))
  }

  val q63HashSplitSql: String =
    """SELECT lang,
      |  CASE WHEN CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 2)
      |            AS INT) < 230
      |       THEN 'train' ELSE 'val' END AS split,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      |FROM documents
      |GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q64_repetition — intra-document repetition filter: a doc whose most
  // frequent word-trigram repeats is boilerplate-suspect (the Gopher-style
  // repetition heuristics). Integer-only output so the gate is immune to
  // float ratios: per lang, docs, docs with any repeated trigram, and the
  // highest single-trigram count.
  // ---------------------------------------------------------------------
  def q64Repetition(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val perGram = wordGrams(d, 3)
      .groupBy(col("doc_id"), col("s")).agg(count(lit(1)).as("n"))
    val perDoc = perGram.groupBy(col("doc_id"))
      .agg(max(col("n")).as("max_gram"), sum(col("n")).as("n_grams"))
    d.select(col("doc_id"), col("lang"))
      .join(perDoc, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("max_gram") >= 2, 1L).otherwise(0L))
          .as("n_with_repeat"),
        max(col("max_gram")).as("max_gram_count"))
  }

  val q64RepetitionSql: String =
    """WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS w
      |           FROM documents),
      |g AS (SELECT doc_id, list_aggregate(w[i:i+2], 'string_agg', '_') AS s
      |      FROM t, UNNEST(range(1, len(w) - 1)) AS gg(i)),
      |c AS (SELECT doc_id, s, COUNT(*) AS n FROM g GROUP BY 1, 2),
      |d AS (SELECT doc_id, MAX(n) AS max_gram, SUM(n) AS n_grams
      |      FROM c GROUP BY 1)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CASE WHEN max_gram >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_with_repeat,
      |  CAST(MAX(max_gram) AS BIGINT) AS max_gram_count
      |FROM t JOIN d USING (doc_id)
      |GROUP BY lang""".stripMargin

  // ---------------------------------------------------------------------
  // q65_stratified_sample — deterministic stratified sampling: the k docs
  // with the smallest md5-derived rank PER LANGUAGE. Hash-ranked sampling
  // is the production shape (stable under corpus growth; a doc's
  // membership never depends on the rest of the corpus), and the
  // bounded-heap Aggregator is the scale-correct plan: map-side partial
  // heaps shuffle partitions×k rows, and low-cardinality strata (5 langs)
  // never funnel the corpus through 5 window-sort tasks. The 32-bit hash
  // slice is exact in double (no 53-bit precision loss), ties break by
  // doc_id in both engines.
  // ---------------------------------------------------------------------
  def q65StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val k = 20
    val hash32 = conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 8), 16, 10).cast("long")
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKByScore(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredId]())
    d.select(col("lang"), negate(hash32.cast("double")).as("score"),
        col("doc_id").as("id"))
      .groupBy(col("lang"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).as("rnk"),
        col("col.id").as("doc_id"))
  }

  val q65StratifiedSampleSql: String =
    """SELECT lang, rnk, doc_id FROM (
      |  SELECT lang, doc_id,
      |    ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
      |                                      1, 8) AS BIGINT) ASC,
      |               doc_id ASC) AS rnk
      |  FROM documents)
      |WHERE rnk <= 20""".stripMargin
}
