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
    val sized = items
      .withColumn("bsz", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("bk"))))
      .filter(col("bsz") <= maxBasket)
      .drop("bsz")
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
}
