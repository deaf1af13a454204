package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Deterministic weighted sampling without replacement
  * (Efraimidis–Spirakis exponential races, IPL 2006): each row draws a
  * key u^(1/w) from a uniform u, and the k largest keys ARE a weighted
  * sample without replacement. The training-data use is importance-
  * weighted corpus subsampling (quality-score-weighted document picks)
  * where the sample must be reproducible run-to-run and engine-to-engine
  * — so u comes from an integer hash of the row id, not an RNG.
  *
  * The reference's pipeline moves whole files decided by set membership
  * (`sync-canvas-data-files.py:62-67`); this is the record-grained
  * probabilistic analog a curation pipeline runs to hit a token budget.
  *
  * Determinism discipline: u = ((id*2654435761) mod 1000003 + 1)/1000004
  * is pure int64 arithmetic — bit-identical in any engine; ranking by the
  * monotone transform ln(u)/w avoids pow() while ordering exactly as
  * u^(1/w) (BM25/q107 precedent: ln on both engines agrees bit-exact).
  * Ties break by id.
  *
  * Scale shape:
  *  - global sample: one map-only scan + TakeOrderedAndProject — shuffled
  *    volume is partitions×k, never the corpus;
  *  - stratified sample: the bounded-heap TopKByScore Aggregator per
  *    stratum — map-side partials reduce each partition to k rows before
  *    the shuffle (the q36b shape), so a hot stratum costs k per map
  *    partition, not a corpus-sized window sort.
  */
object Sampling {

  /** ln(u)/w for u drawn from the id hash: monotone in the E–S key
    * u^(1/w). Larger is better (u < 1 so ln(u) < 0; big w pulls the
    * score toward 0). Requires w > 0. */
  private def esScore(id: Column, w: Column): Column = {
    val u = ((id * lit(2654435761L)) % lit(1000003L) + lit(1L))
      .cast("double") / lit(1000004.0)
    log(u) / w
  }

  /** Global weighted sample of k rows: (id, score), best first. */
  def weightedSample(df: DataFrame, id: String, w: Column, k: Int): DataFrame = {
    val scored = df.select(col(id).as("id"), esScore(col(id), w).as("score"))
      .orderBy(col("score").desc, col("id").asc).limit(k)
    Similarity.rankBounded(scored, "rnk",
        Seq(col("score").desc, col("id").asc))
      .select(col("rnk").cast("int").as("rnk"), col("id"), col("score"))
  }

  /** Per-stratum weighted sample of k rows each. */
  def stratifiedWeightedSample(df: DataFrame, id: String, stratum: String,
      w: Column, k: Int): DataFrame = {
    val topk = udaf(new graft.functions.TopKByScore(k),
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[graft.functions.ScoredId]())
    df.select(col(stratum).as("stratum"),
        esScore(col(id), w).as("score"), col(id).as("id"))
      .groupBy(col("stratum"))
      .agg(topk(col("score"), col("id")).as("top"))
      .select(col("stratum"), posexplode(col("top")))
      .select(col("stratum"), (col("pos") + 1).cast("int").as("rnk"),
        col("col.id").as("id"), col("col.score").as("score"))
  }

  // ---------------------------------------------------------------------
  // q118_weighted_sample — price-weighted order sample, global k=50 and
  // stratified k=5 per priority, unioned (kind distinguishes). Both the
  // TakeOrdered path and the Aggregator path face the same oracle.
  // ---------------------------------------------------------------------
  def q118WeightedSample(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val g = weightedSample(o, "o_orderkey", col("o_totalprice"), 50)
      .select(lit("global").as("kind"), lit("-").as("stratum"),
        col("rnk"), col("id"), col("score"))
    val st = stratifiedWeightedSample(o, "o_orderkey", "o_orderpriority",
        col("o_totalprice"), 5)
      .select(lit("stratified").as("kind"), col("stratum"),
        col("rnk"), col("id"), col("score"))
    g.unionByName(st)
  }

  val q118WeightedSampleSql: String =
    """WITH s AS (
      |  SELECT o_orderkey AS id, o_orderpriority AS stratum,
      |    ln(CAST((o_orderkey * 2654435761) % 1000003 + 1 AS DOUBLE)
      |       / 1000004.0) / o_totalprice AS score
      |  FROM orders),
      |g AS (
      |  SELECT 'global' AS kind, '-' AS stratum,
      |    CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS INT)
      |      AS rnk, id, score
      |  FROM s),
      |st AS (
      |  SELECT 'stratified' AS kind, stratum,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY stratum
      |      ORDER BY score DESC, id ASC) AS INT) AS rnk, id, score
      |  FROM s)
      |SELECT * FROM g WHERE rnk <= 50
      |UNION ALL SELECT * FROM st WHERE rnk <= 5""".stripMargin
}
