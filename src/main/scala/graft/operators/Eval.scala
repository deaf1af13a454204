package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Ranking / model evaluation harness — the offline metrics a
  * retrieval or scoring pipeline reports before anything ships: NDCG
  * over a ranked list against graded relevance, and calibration
  * (reliability) curves for probabilistic scores. Both are
  * aggregate-only shapes: rankings are cut to top-k BEFORE any metric
  * math, float folds follow the ordered-fold discipline (q92) so the
  * metric doubles are engine-reproducible.
  */
object Eval {

  /** NDCG@k per query over (query, item, score, relevance) rows:
    * rank items by (score desc, item asc — total order), cut to k,
    * DCG = Σ rel_i/log2(i+1) as a LEFT-TO-RIGHT fold over the
    * rank-sorted terms; IDCG from the query's ideal ordering
    * (relevance desc) over the SAME fold; queries with no relevant
    * item surface NULL (0/0 is a verdict, not a number). */
  def ndcgAtK(df: DataFrame, query: String, item: String, score: String,
      rel: String, k: Int): DataFrame = {
    val byScore = Window.partitionBy(col(query))
      .orderBy(col(score).desc, col(item).asc)
    val byRel = Window.partitionBy(col(query))
      .orderBy(col(rel).desc, col(item).asc)
    val ranked = df
      .withColumn("__r", row_number().over(byScore))
      .withColumn("__ir", row_number().over(byRel))
    val terms = ranked.groupBy(col(query)).agg(
      count(lit(1)).as("n_items"),
      sum(col(rel)).as("n_rel_mass"),
      array_sort(collect_list(when(col("__r") <= k,
        struct(col("__r").as("i"),
          (col(rel).cast("double") /
            log2(col("__r").cast("double") + lit(1.0))).as("t")))))
        .as("__dcg_terms"),
      array_sort(collect_list(when(col("__ir") <= k,
        struct(col("__ir").as("i"),
          (col(rel).cast("double") /
            log2(col("__ir").cast("double") + lit(1.0))).as("t")))))
        .as("__idcg_terms"))
    def fold(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0d), (acc, x) => acc + x.getField("t"))
    val dcg = fold(col("__dcg_terms"))
    val idcg = fold(col("__idcg_terms"))
    terms.select(col(query), col("n_items"), col("n_rel_mass"),
      round(dcg, 6).as("dcg"), round(idcg, 6).as("idcg"),
      when(idcg =!= 0.0, round(dcg / idcg, 6)).as("ndcg"))
  }

  // ---------------------------------------------------------------------
  // q187_ndcg — NDCG@10 of a deterministic per-source quality ranking
  // (score = length(text) % 97, a planted pseudo-model) against binary
  // relevance rel = (doc_id % 3 = 0). The oracle replays rank cut,
  // ideal ordering, and BOTH ordered folds with list_reduce — a
  // regrouped float fold or an off-by-one rank cut moves the sixth
  // decimal and hash-fails.
  // ---------------------------------------------------------------------
  def q187Ndcg(s: SparkSession, dir: String): DataFrame =
    ndcgAtK(
      t(s, dir, "documents").select(col("source"), col("doc_id"),
        (length(col("text")) % 97).cast("long").as("score"),
        when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("rel")),
      "source", "doc_id", "score", "rel", k = 10)

  val q187NdcgSql: String =
    """WITH d AS (
      |  SELECT source, doc_id,
      |    CAST(length(text) % 97 AS BIGINT) AS score,
      |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS rel
      |  FROM documents),
      |ranked AS (
      |  SELECT source, doc_id, score, rel,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY score DESC, doc_id ASC) AS r,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY rel DESC, doc_id ASC) AS ir
      |  FROM d),
      |g AS (
      |  SELECT source, COUNT(*) AS n_items,
      |    CAST(SUM(rel) AS BIGINT) AS n_rel_mass,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list(CAST(rel AS DOUBLE) / log2(CAST(r AS DOUBLE) + 1.0)
      |        ORDER BY r) FILTER (WHERE r <= 10)),
      |      (a, b) -> a + b) AS dcg,
      |    list_reduce(list_prepend(0.0::DOUBLE,
      |      list(CAST(rel AS DOUBLE) / log2(CAST(ir AS DOUBLE) + 1.0)
      |        ORDER BY ir) FILTER (WHERE ir <= 10)),
      |      (a, b) -> a + b) AS idcg
      |  FROM ranked GROUP BY source)
      |SELECT source, n_items, n_rel_mass,
      |  ROUND(dcg, 6) AS dcg, ROUND(idcg, 6) AS idcg,
      |  CASE WHEN idcg <> 0.0 THEN ROUND(dcg / idcg, 6) END AS ndcg
      |FROM g""".stripMargin

  /** CALIBRATION (reliability) curve: bucket a [0,1] score into
    * `bins` equal-width bins, report per bin the observed positive
    * rate against the mean predicted score — the curve a probability
    * consumer (sampling temperature, accept thresholds) reads before
    * trusting the score. Integer evidence (n, n_pos) next to the two
    * rounded means; score 1.0 folds into the top bin. One shuffle to
    * a |bins|-row table. */
  def calibrationCurve(df: DataFrame, score: String, label: String,
      bins: Int): DataFrame = {
    val b = least(floor(col(score) * bins).cast("long"), lit(bins - 1L))
    df.select(b.as("bin"), col(score).as("__s"),
        col(label).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        round(sumDec(col("__s")) / count(lit(1)).cast("double"), 6)
          .as("mean_score"),
        round(sum(col("__y")).cast("double") /
          count(lit(1)).cast("double"), 6).as("frac_pos"))
  }

  // ---------------------------------------------------------------------
  // q189_calibration — reliability of a planted 2-dp pseudo-probability
  // over documents (decile bins). The label is arranged to correlate
  // with the score so the curve is non-trivial, but the gate checks the
  // machinery: bin edges (incl. the 1.0 → top-bin fold), exact decimal
  // score means, integer positive counts.
  // ---------------------------------------------------------------------
  def q189Calibration(s: SparkSession, dir: String): DataFrame =
    calibrationCurve(
      t(s, dir, "documents").select(
        ((length(col("text")) % 101).cast("double") / 100.0).as("p"),
        when((length(col("text")) + col("doc_id")) % 100 <
          (length(col("text")) % 101), 1L).otherwise(0L).as("y")),
      "p", "y", bins = 10)

  val q189CalibrationSql: String =
    """WITH d AS (
      |  SELECT CAST(length(text) % 101 AS DOUBLE) / 100.0 AS p,
      |    CASE WHEN (length(text) + doc_id) % 100 < length(text) % 101
      |         THEN 1 ELSE 0 END AS y
      |  FROM documents)
      |SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
      |  COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
      |  ROUND(CAST(SUM(CAST(p AS DECIMAL(30,4))) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE), 6) AS mean_score,
      |  ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
      |    AS frac_pos
      |FROM d
      |GROUP BY LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9)""".stripMargin

  /** Isotonic calibration (pool-adjacent-violators) per group over
    * binned scores, computed by PAV's MINIMAX characterization
    * (Barlow et al. 1972, ch. 1): fitted(i) = max_{j≤i} min_{k≥i}
    * mean(y over bins j..k). On binned data the bin count is MODEL
    * arity, so the bins² segment table is bounded regardless of corpus
    * rows — which turns the classically-sequential PAV stack into a
    * pure relational plan: prefix sums per group, a (j ≤ k) self-join,
    * one suffix-min window per (group, j), one max aggregate. The
    * monotone fit replaces q189's raw reliability curve when the score
    * needs CORRECTING, not just diagnosing.
    *
    * Determinism: every segment mean is one exact-integer division
    * (pos/n), and the min/max lattice compares identical doubles — no
    * float fold exists anywhere in the operator, so the fit is
    * bit-reproducible across engines and partitionings with no
    * ordering discipline needed at all. */
  def isotonicCalibration(df: DataFrame, group: String, score: String,
      label: String, bins: Int): DataFrame = {
    val b = least(floor(col(score) * bins).cast("long"), lit(bins - 1L))
    val binned = df
      .select(col(group), b.as("bin"), col(label).cast("long").as("__y"))
      .groupBy(col(group), col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("pos"))
    val wCum = Window.partitionBy(col(group)).orderBy(col("bin").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = binned
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("cp", sum(col("pos")).over(wCum))
    val lo = cum.select(col(group), col("bin").as("j"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("pos")).as("cp0"))
    val hi = cum.select(col(group), col("bin").as("k"),
      col("cn").as("cnk"), col("cp").as("cpk"))
    val seg = lo.join(hi, Seq(group)).filter(col("k") >= col("j"))
      .select(col(group), col("j"), col("k"),
        ((col("cpk") - col("cp0")).cast("double")
          / (col("cnk") - col("cn0")).cast("double")).as("mean"))
    val wSuf = Window.partitionBy(col(group), col("j"))
      .orderBy(col("k").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val m = seg.withColumn("mmin", min(col("mean")).over(wSuf))
    val fitted = m.groupBy(col(group), col("k").as("bin"))
      .agg(max(col("mmin")).as("fitted"))
    binned.join(fitted, Seq(group, "bin"))
      .select(col(group), col("bin"), col("n"), col("pos"),
        col("fitted"))
  }

  // ---------------------------------------------------------------------
  // q239_isotonic — per-source isotonic calibration of the q189-style
  // planted pseudo-probability (decile bins). The oracle replays the
  // minimax lattice — prefix sums, the (j ≤ k) segment join, the
  // suffix-min window, the closing max — and any pooling slip breaks
  // monotonicity and the hash in one move.
  // ---------------------------------------------------------------------
  def q239Isotonic(s: SparkSession, dir: String): DataFrame =
    isotonicCalibration(
      t(s, dir, "documents").select(col("source"),
        ((length(col("text")) % 101).cast("double") / 100.0).as("p"),
        when((length(col("text")) + col("doc_id")) % 100 <
          (length(col("text")) % 101), 1L).otherwise(0L).as("y")),
      "source", "p", "y", bins = 10)

  val q239IsotonicSql: String =
    """WITH d AS (
      |  SELECT source,
      |    CAST(length(text) % 101 AS DOUBLE) / 100.0 AS p,
      |    CASE WHEN (length(text) + doc_id) % 100 < length(text) % 101
      |         THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |binned AS (
      |  SELECT source, LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
      |    COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
      |  FROM d GROUP BY 1, 2),
      |cum AS (
      |  SELECT source, bin, n, pos,
      |    SUM(n) OVER (PARTITION BY source ORDER BY bin ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
      |    SUM(pos) OVER (PARTITION BY source ORDER BY bin ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
      |  FROM binned),
      |seg AS (
      |  SELECT l.source, l.j, h.bin AS k,
      |    CAST(h.cp - l.cp0 AS DOUBLE) / CAST(h.cn - l.cn0 AS DOUBLE)
      |      AS mean
      |  FROM (SELECT source, bin AS j, cn - n AS cn0, cp - pos AS cp0
      |        FROM cum) l
      |  JOIN cum h ON h.source = l.source AND h.bin >= l.j),
      |m AS (
      |  SELECT source, j, k,
      |    MIN(mean) OVER (PARTITION BY source, j ORDER BY k DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mmin
      |  FROM seg),
      |fitted AS (
      |  SELECT source, k AS bin, MAX(mmin) AS fitted
      |  FROM m GROUP BY source, k)
      |SELECT b.source, b.bin, b.n, b.pos, f.fitted
      |FROM binned b JOIN fitted f USING (source, bin)""".stripMargin

  /** ROC-AUC per group via the tie-corrected rank statistic: with
    * average ranks r_i over the pooled scores, AUC = (Σ_{i∈pos} r_i −
    * n⁺(n⁺+1)/2) / (n⁺·n⁻). The whole statistic stays in INTEGER
    * arithmetic until one final division — per distinct score s,
    * 2·Σ ranks of its positives = pos(s)·(2·below(s) + cnt(s) + 1),
    * so auc = (Σ_s pos(s)(2·below(s)+cnt(s)+1) − n⁺(n⁺+1)) / (2n⁺n⁻)
    * with every term a long. The double appears only in the last
    * correctly-rounded divide, so the value is bit-reproducible across
    * engines and partitionings with no ordered-fold machinery at all.
    * `label` must be 0/1 (it is summed as the positive count).
    *
    * Scale: one groupBy(group, score) with map-side combine, a window
    * over DISTINCT scores within each group (state = one running long),
    * one |groups|-row final aggregate. Degenerate groups (no positives
    * or no negatives) surface NULL — an undefined AUC is a verdict,
    * not a number. */
  def rocAuc(df: DataFrame, group: String, score: String,
      label: String): DataFrame = {
    val perScore = df.groupBy(col(group), col(score).as("__s"))
      .agg(count(lit(1)).as("cnt"),
        sum(col(label).cast("long")).as("pos"))
    val w = Window.partitionBy(col(group)).orderBy(col("__s").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = perScore.withColumn("below",
      coalesce(sum(col("cnt")).over(w), lit(0L)))
    val g = ranked.groupBy(col(group)).agg(
      sum(col("pos")).as("n_pos"),
      sum(col("cnt") - col("pos")).as("n_neg"),
      sum(col("pos") * (lit(2L) * col("below") + col("cnt") + lit(1L)))
        .as("s2"))
    g.select(col(group), col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        round((col("s2") - col("n_pos") * (col("n_pos") + lit(1L)))
          .cast("double")
          / (lit(2L) * col("n_pos") * col("n_neg")).cast("double"), 6))
        .as("auc"))
  }

  // ---------------------------------------------------------------------
  // q233_roc_auc — per-source AUC of the q187 planted pseudo-model
  // (integer score = length(text) % 97, label = doc_id % 3 = 0). The
  // oracle replays the rank algebra in SQL; any off-by-one in the
  // below-count window, a mishandled tie block, or a float fold anywhere
  // before the final divide moves the sixth decimal and hash-fails.
  // ---------------------------------------------------------------------
  def q233RocAuc(s: SparkSession, dir: String): DataFrame =
    rocAuc(
      t(s, dir, "documents").select(col("source"),
        (length(col("text")) % 97).cast("long").as("score"),
        when(col("doc_id") % 3 === 0, 1L).otherwise(0L).as("y")),
      "source", "score", "y")

  val q233RocAucSql: String =
    """WITH d AS (
      |  SELECT source, CAST(length(text) % 97 AS BIGINT) AS score,
      |    CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y
      |  FROM documents),
      |per_score AS (
      |  SELECT source, score, COUNT(*) AS cnt, CAST(SUM(y) AS BIGINT) AS pos
      |  FROM d GROUP BY source, score),
      |ranked AS (
      |  SELECT source, cnt, pos,
      |    COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY score ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      |  FROM per_score),
      |g AS (
      |  SELECT source, CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(cnt - pos) AS BIGINT) AS n_neg,
      |    CAST(SUM(pos * (2 * below + cnt + 1)) AS BIGINT) AS s2
      |  FROM ranked GROUP BY source)
      |SELECT source, n_pos, n_neg,
      |  CASE WHEN n_pos > 0 AND n_neg > 0 THEN
      |    ROUND(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
      |      / CAST(2 * n_pos * n_neg AS DOUBLE), 6)
      |  END AS auc
      |FROM g""".stripMargin
}
