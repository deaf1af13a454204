package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Link-graph PageRank (Page et al. 1999) — the curation signal
  * web-scale corpora actually use for document quality (a la Common
  * Crawl's host-graph ranks feeding corpus filters). Fixed iteration
  * count, no RNG.
  *
  * Scale shape: each iteration is one equi-join (edges ⋈ ranks on src —
  * shuffle-on-key, never a cartesian) and one groupBy(dst) aggregate.
  * Rank state is one row per node; edges are re-used across iterations
  * from a materialized (localCheckpoint) edge list, so the shuffle plan
  * does not grow with iteration count — plan truncation per iteration is
  * the standard guard against Catalyst lineage blowup in iterative
  * algorithms (the Components loop uses the same discipline).
  *
  * Determinism discipline (the q92/q109 rule): the per-node contribution
  * sum is an ordered fold over src-sorted structs, so the rank doubles
  * are bit-reproducible across engines and partitionings — floats that
  * feed content-addressed curation decisions must not depend on Spark's
  * reduction order.
  */
object Graph {

  /** Ranks after `iters` iterations at damping `d`, over the directed
    * edge set (cols `src`, `dst`; parallel edges collapse). Nodes =
    * endpoint union; dangling nodes keep the teleport term only (mass
    * leaks, standard simplified PageRank — the gate graph is symmetric,
    * so nothing dangles there). */
  def pageRank(edges: DataFrame, iters: Int, d: Double): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint()
    val out = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct().localCheckpoint()
    val n = nodes.count()
    // all float arithmetic stays engine-side in one expression shape per
    // term, mirrored verbatim by the SQL oracle
    val teleport = (lit(1.0) - lit(d)) / lit(n.toDouble)
    var ranks = nodes.select(col("node"),
      (lit(1.0) / lit(n.toDouble)).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .join(out, "src")
        .select(col("dst"), struct(col("src"),
          (col("rank") / col("outdeg").cast("double")).as("w")).as("sw"))
      val folded = contrib.groupBy(col("dst"))
        .agg(array_sort(collect_list(col("sw"))).as("ws"))
        .select(col("dst").as("node"),
          (teleport + lit(d) * aggregate(col("ws"), lit(0.0d),
            (acc, x) => acc + x.getField("w"))).as("rank"))
      ranks = nodes.join(folded, Seq("node"), "left")
        .select(col("node"), coalesce(col("rank"), teleport).as("rank"))
        .localCheckpoint()
    }
    ranks
  }

  // ---------------------------------------------------------------------
  // q122_pagerank — customer↔supplier interaction graph from
  // lineitem⋈orders (both directions, so the graph is symmetric and no
  // mass dangles), 3 iterations, d = 0.85, top 20.
  // ---------------------------------------------------------------------
  def q122Pagerank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val cs = li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = cs.unionByName(
      cs.select(col("dst").as("src"), col("src").as("dst")))
    val r = pageRank(edges, iters = 3, d = 0.85)
    val top = r.orderBy(col("rank").desc, col("node").asc).limit(20)
    Similarity.rankBounded(top, "rnk",
        Seq(col("rank").desc, col("node").asc))
      .select(col("rnk").cast("int").as("rnk"), col("node"), col("rank"))
  }

  val q122PagerankSql: String =
    """WITH cs AS (
      |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
      |    's' || CAST(l_suppkey AS VARCHAR) AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT src, dst FROM cs UNION SELECT dst, src FROM cs),
      |outd AS (SELECT src, COUNT(*) AS outdeg FROM e GROUP BY src),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
      |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
      |r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn),
      |f1 AS (
      |  SELECT e.dst AS node,
      |    (1.0 - 0.85) / MIN(nn.n) + 0.85 * list_reduce(
      |      list_prepend(0.0::DOUBLE,
      |        list(r.rank / CAST(o.outdeg AS DOUBLE) ORDER BY e.src)),
      |      (a, b) -> a + b) AS rank
      |  FROM e JOIN r0 r ON e.src = r.node JOIN outd o ON e.src = o.src
      |    CROSS JOIN nn
      |  GROUP BY e.dst),
      |r1 AS (SELECT nodes.node,
      |    COALESCE(f1.rank, (1.0 - 0.85) / nn.n) AS rank
      |  FROM nodes CROSS JOIN nn LEFT JOIN f1 ON nodes.node = f1.node),
      |f2 AS (
      |  SELECT e.dst AS node,
      |    (1.0 - 0.85) / MIN(nn.n) + 0.85 * list_reduce(
      |      list_prepend(0.0::DOUBLE,
      |        list(r.rank / CAST(o.outdeg AS DOUBLE) ORDER BY e.src)),
      |      (a, b) -> a + b) AS rank
      |  FROM e JOIN r1 r ON e.src = r.node JOIN outd o ON e.src = o.src
      |    CROSS JOIN nn
      |  GROUP BY e.dst),
      |r2 AS (SELECT nodes.node,
      |    COALESCE(f2.rank, (1.0 - 0.85) / nn.n) AS rank
      |  FROM nodes CROSS JOIN nn LEFT JOIN f2 ON nodes.node = f2.node),
      |f3 AS (
      |  SELECT e.dst AS node,
      |    (1.0 - 0.85) / MIN(nn.n) + 0.85 * list_reduce(
      |      list_prepend(0.0::DOUBLE,
      |        list(r.rank / CAST(o.outdeg AS DOUBLE) ORDER BY e.src)),
      |      (a, b) -> a + b) AS rank
      |  FROM e JOIN r2 r ON e.src = r.node JOIN outd o ON e.src = o.src
      |    CROSS JOIN nn
      |  GROUP BY e.dst),
      |r3 AS (SELECT nodes.node,
      |    COALESCE(f3.rank, (1.0 - 0.85) / nn.n) AS rank
      |  FROM nodes CROSS JOIN nn LEFT JOIN f3 ON nodes.node = f3.node)
      |SELECT CAST(rnk AS INT) AS rnk, node, rank FROM (
      |  SELECT node, rank,
      |    ROW_NUMBER() OVER (ORDER BY rank DESC, node ASC) AS rnk
      |  FROM r3)
      |WHERE rnk <= 20""".stripMargin
}
