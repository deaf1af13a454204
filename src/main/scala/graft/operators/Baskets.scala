package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Market-basket co-occurrence mining: top-k item PAIRS by lift —
  * the 2-itemset association-rule core (Agrawal & Srikant, VLDB 1994
  * support/confidence framing; lift per Brin et al., SIGMOD 1997),
  * which is also the "products bought together" / "docs co-cited
  * together" signal a recommendation or curriculum pipeline extracts.
  *
  * lift(a,b) = P(a,b)/(P(a)·P(b)) = c12·N/(c_a·c_b) over baskets, with
  * c12 the pair's basket co-occurrence count, c_a/c_b the items'
  * basket counts, N total baskets.
  *
  * Determinism is q119's discipline: the lift double orders the rank but
  * never leaves the plan — output is rank + exact integer evidence
  * (c12, c_a, c_b), (a,b)-asc tie-broken; a rank flip would need two
  * distinct integer triples within 1 ulp, which ties them in both
  * engines anyway.
  *
  * Scale shape: baskets dedupe with one shuffle on (basket, item); the
  * pair expansion is a SELF-JOIN ON THE BASKET KEY, quadratic only in
  * per-basket size — k items → k(k−1)/2 pairs, never corpus² — with a
  * `maxBasket` cap dropping pathological mega-baskets before pairing
  * (the basket analog of the LSH hot-bucket cap: a crawl-error basket
  * holding half the catalog would otherwise dominate the join). The
  * min-support filter runs on the pair counts BEFORE the marginal
  * joins, cutting the long tail early; marginals are reaggregates of
  * the deduped basket-item table; N is a one-row broadcast; top-k is
  * TakeOrderedAndProject, never a global sort.
  */
object Baskets {

  def pairLift(df: DataFrame, basket: String, item: String,
      minCount: Int, k: Int, maxBasket: Int = 1000): DataFrame = {
    val items = df.select(col(basket).as("bk"), col(item).as("it"))
      .distinct()
    // localCheckpoint: four consumers (both pair-join sides, marginals,
    // basket total) would otherwise each re-run the scan + dedup + cap
    // window; the held state is the two-int-column deduped basket-item
    // projection — already far smaller than the corpus — and it stays
    // partitioned by bk, so the pair self-join needs no further exchange
    // (guide §2.4/§5)
    val sized = items
      .withColumn("bsz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bk"))))
      .filter(col("bsz") <= maxBasket)
      .drop("bsz")
      .localCheckpoint()
    val a = sized.select(col("bk"), col("it").as("pa"))
    val b = sized.select(col("bk"), col("it").as("pb"))
    val c12 = a.join(b, Seq("bk"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c12"))
    val marg = sized.groupBy(col("it")).agg(count(lit(1)).as("c"))
    val tot = sized.agg(countDistinct(col("bk")).cast("double").as("n"))
    val scored = c12.filter(col("c12") >= minCount)
      .join(marg.select(col("it").as("pa"), col("c").as("c_a")), "pa")
      .join(marg.select(col("it").as("pb"), col("c").as("c_b")), "pb")
      .crossJoin(broadcast(tot))
      .select(col("pa"), col("pb"), col("c12"), col("c_a"), col("c_b"),
        ((col("c12").cast("double") * col("n"))
          / (col("c_a").cast("double") * col("c_b").cast("double")))
          .as("lift"))
    val top = scored
      .orderBy(col("lift").desc, col("pa").asc, col("pb").asc).limit(k)
    Similarity.rankBounded(top, "rnk",
        Seq(col("lift").desc, col("pa").asc, col("pb").asc))
      .select(col("rnk").cast("int").as("rnk"), col("pa"), col("pb"),
        col("c12"), col("c_a"), col("c_b"))
  }

  // ---------------------------------------------------------------------
  // q153_basket_pairs — parts co-ordered within the same order: top-25
  // part pairs by lift at min co-occurrence 3. TPC-H baskets hold ≤7
  // items, so the cap never bites at the gate and the pair expansion is
  // ≤21 rows per order.
  // ---------------------------------------------------------------------
  def q153BasketPairs(s: SparkSession, dir: String): DataFrame =
    pairLift(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
      minCount = 3, k = 25)

  val q153BasketPairsSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      |pairs AS (
      |  SELECT a.it AS pa, b.it AS pb, COUNT(*) AS c12
      |  FROM items a JOIN items b
      |    ON a.bk = b.bk AND a.it < b.it
      |  GROUP BY 1, 2),
      |marg AS (SELECT it, COUNT(*) AS c FROM items GROUP BY it),
      |tot AS (SELECT CAST(COUNT(DISTINCT bk) AS DOUBLE) AS n FROM items),
      |scored AS (
      |  SELECT p.pa, p.pb, p.c12, ma.c AS c_a, mb.c AS c_b,
      |    (CAST(p.c12 AS DOUBLE) * tot.n)
      |      / (CAST(ma.c AS DOUBLE) * CAST(mb.c AS DOUBLE)) AS lift
      |  FROM pairs p
      |  JOIN marg ma ON p.pa = ma.it
      |  JOIN marg mb ON p.pb = mb.it
      |  CROSS JOIN tot
      |  WHERE p.c12 >= 3)
      |SELECT CAST(rnk AS INT) AS rnk, pa, pb, c12, c_a, c_b FROM (
      |  SELECT pa, pb, c12, c_a, c_b,
      |    ROW_NUMBER() OVER (ORDER BY lift DESC, pa ASC, pb ASC) AS rnk
      |  FROM scored)
      |WHERE rnk <= 25""".stripMargin

  /** Pairwise SET overlap between groups: for every pair of groups, the
    * exact intersection size of their element sets plus both set sizes —
    * Jaccard/containment/overlap-coefficient all follow by one division.
    * The corpus-level cousin of document near-dup: "how much does source
    * A's gram inventory overlap source B's" is the dataset-mixing /
    * cross-source-redundancy readout.
    *
    * Scale shape: the transposed basket problem — here the ELEMENT is
    * the join key and the GROUP is the item, so the self-join fan-out
    * per element is |groups that contain it|² ≤ |groups|² — bounded by
    * the (small) group count, not the (huge) element count; the output
    * is ≤ |groups|²/2 rows. Elements dedupe with one shuffle first.
    */
  def setOverlap(df: DataFrame, group: String, element: String)
      : DataFrame = {
    val sets = df.select(col(group).as("grp"), col(element).as("el"))
      .distinct()
    val a = sets.select(col("el"), col("grp").as("ga"))
    val b = sets.select(col("el"), col("grp").as("gb"))
    val inter = a.join(b, Seq("el"))
      .filter(col("ga") < col("gb"))
      .groupBy(col("ga"), col("gb")).agg(count(lit(1)).as("n_inter"))
    val sizes = sets.groupBy(col("grp")).agg(count(lit(1)).as("sz"))
    inter
      .join(sizes.select(col("grp").as("ga"), col("sz").as("n_a")), "ga")
      .join(sizes.select(col("grp").as("gb"), col("sz").as("n_b")), "gb")
      .select(col("ga"), col("gb"), col("n_inter"), col("n_a"),
        col("n_b"),
        round(col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
  }

  // ---------------------------------------------------------------------
  // q158_source_overlap — 5-gram inventory overlap between document
  // sources: the cross-source redundancy matrix (190 pairs for 20
  // sources) a mixing/dedup plan reads before weighting sources.
  // Integer evidence + the one-division Jaccard.
  // ---------------------------------------------------------------------
  def q158SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val grams = NGrams.nGramRows(d, 5)(ws => concat_ws("|", ws: _*))
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("s").as("g"))
    setOverlap(grams, "source", "g")
  }

  val q158SourceOverlapSql: String =
    """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws
      |           FROM documents),
      |wd AS (SELECT doc_id, source, CAST(i - 1 AS BIGINT) AS pos,
      |         ws[i] AS word
      |       FROM w, UNNEST(range(1, len(ws) + 1)) AS gg(i)),
      |gr AS (SELECT source,
      |         word || '|' || lead(word, 1) OVER dw || '|' ||
      |         lead(word, 2) OVER dw || '|' || lead(word, 3) OVER dw ||
      |         '|' || lead(word, 4) OVER dw AS g
      |       FROM wd
      |       WINDOW dw AS (PARTITION BY doc_id ORDER BY pos)),
      |sets AS (SELECT DISTINCT source, g FROM gr WHERE g IS NOT NULL),
      |inter AS (
      |  SELECT a.source AS ga, b.source AS gb, COUNT(*) AS n_inter
      |  FROM sets a JOIN sets b ON a.g = b.g AND a.source < b.source
      |  GROUP BY 1, 2),
      |sz AS (SELECT source, COUNT(*) AS sz FROM sets GROUP BY source)
      |SELECT i.ga, i.gb, i.n_inter,
      |  sa.sz AS n_a, sb.sz AS n_b,
      |  ROUND(CAST(i.n_inter AS DOUBLE)
      |    / CAST(sa.sz + sb.sz - i.n_inter AS DOUBLE), 6) AS jaccard
      |FROM inter i
      |JOIN sz sa ON i.ga = sa.source
      |JOIN sz sb ON i.gb = sb.source""".stripMargin

  /** Frequent TRIPLES with A-priori candidate pruning (Agrawal &
    * Srikant, VLDB 1994): a triple can only be frequent if all three of
    * its pairs are, so the third join runs AFTER a semi-join of the
    * (a,b) leg against the frequent-pair set — the candidate space
    * collapses from Σ k³ per basket to extensions of frequent pairs,
    * which is the entire reason A-priori scales. Pruning is an
    * OPTIMIZATION, not a semantics change: the result equals the naive
    * three-way count over capped baskets (the oracle runs the naive
    * form with the SAME maxBasket cap — equivalence is the gate). The
    * mega-basket cap is part of the operator's CONTRACT, as in
    * [[pairLift]]: a basket with more than maxBasket distinct items is
    * excluded from triple counting on both engines. */
  def tripleSupport(df: DataFrame, basket: String, item: String,
      minCount: Int, k: Int, maxBasket: Int = 1000): DataFrame = {
    val items = df.select(col(basket).as("bk"), col(item).as("it"))
      .distinct()
    // same five-consumer pin as pairLift (a, b, c legs + the f2 leg's
    // reuse of a/b)
    val sized = items
      .withColumn("bsz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bk"))))
      .filter(col("bsz") <= maxBasket)
      .drop("bsz")
      .localCheckpoint()
    val a = sized.select(col("bk"), col("it").as("pa"))
    val b = sized.select(col("bk"), col("it").as("pb"))
    val c = sized.select(col("bk"), col("it").as("pc"))
    val f2 = a.join(b, Seq("bk"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .select(col("pa"), col("pb"))
    // A-priori prune: only (a,b) legs that are themselves frequent
    // extend to a third item
    val ab = a.join(b, Seq("bk")).filter(col("pa") < col("pb"))
      .join(f2, Seq("pa", "pb"), "left_semi")
    val triples = ab.join(c, Seq("bk"))
      .filter(col("pb") < col("pc"))
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("c123"))
      .filter(col("c123") >= minCount)
    val top = triples
      .orderBy(col("c123").desc, col("pa").asc, col("pb").asc,
        col("pc").asc).limit(k)
    Similarity.rankBounded(top, "rnk",
        Seq(col("c123").desc, col("pa").asc, col("pb").asc,
          col("pc").asc))
      .select(col("rnk").cast("int").as("rnk"), col("pa"), col("pb"),
        col("pc"), col("c123"))
  }

  // ---------------------------------------------------------------------
  // q192_basket_triples — top-20 part triples co-ordered in the same
  // order at min support 2. The oracle counts the NAIVE three-way join;
  // equality proves the A-priori pruning pass dropped no frequent
  // triple (the pruned leg is a pure superset argument, machine-checked
  // here rather than trusted).
  // ---------------------------------------------------------------------
  def q192BasketTriples(s: SparkSession, dir: String): DataFrame =
    tripleSupport(t(s, dir, "lineitem"), "l_orderkey", "l_partkey",
      minCount = 2, k = 20)

  val q192BasketTriplesSql: String =
    """WITH items0 AS (
      |  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
      |items AS (
      |  SELECT bk, it FROM (
      |    SELECT bk, it, COUNT(*) OVER (PARTITION BY bk) AS bsz
      |    FROM items0)
      |  WHERE bsz <= 1000),
      |tri AS (
      |  SELECT a.it AS pa, b.it AS pb, c.it AS pc, COUNT(*) AS c123
      |  FROM items a
      |  JOIN items b ON a.bk = b.bk AND a.it < b.it
      |  JOIN items c ON b.bk = c.bk AND b.it < c.it
      |  GROUP BY 1, 2, 3
      |  HAVING COUNT(*) >= 2)
      |SELECT CAST(rnk AS INT) AS rnk, pa, pb, pc, c123 FROM (
      |  SELECT pa, pb, pc, c123,
      |    ROW_NUMBER() OVER (ORDER BY c123 DESC, pa ASC, pb ASC, pc ASC)
      |      AS rnk
      |  FROM tri)
      |WHERE rnk <= 20""".stripMargin
}
