package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Edit-distance similarity join: all (left, right) pairs with
  * levenshtein(l, r) <= k, without ever comparing all pairs.
  *
  * The reference dedups at file granularity (key-in-S3 skip,
  * `sync-canvas-data-files.py:62-67`); a curation pipeline needs the
  * string-granularity analog for dirty keys / near-identical titles /
  * OCR'd text — records whose join keys differ by a typo.
  *
  * Scale shape (prefix filtering, Ed-Join Xiao et al. VLDB'08 /
  * Chaudhuri et al. ICDE'06):
  *  - each string contributes its DISTINCT character q-grams; one edit op
  *    destroys at most q gram *types*, so ed <= k implies the partner
  *    misses at most k*q of a string's gram types;
  *  - under ANY shared global gram order, if a match is possible the
  *    (k*q+1)-length prefixes of the two gram sets intersect (strings
  *    with <= k*q distinct grams keep their FULL set as prefix). The
  *    global order is document frequency ASCENDING, so prefixes hold each
  *    string's RAREST grams: the inverted-index join on prefix grams is a
  *    join on rare keys — a hot boilerplate gram sits at the end of the
  *    df order and drops out of every long string's prefix, so skew is
  *    removed by construction rather than salted after the fact;
  *  - candidates pass the length filter (| |l|-|r| | <= k) before the
  *    exact verify, which runs Spark's threshold'd levenshtein codegen
  *    (DP early-exits past k) on candidate pairs only;
  *  - LOW-COMPLEXITY strings (<= k*q distinct grams — short, or long but
  *    repetitive) can sit within ed <= k of each other while sharing ZERO
  *    grams (k edits can destroy every type), so gram pruning is invalid
  *    inside that pool: low x low pairs go through a length-BAND
  *    equi-join (bucket floor(len/(k+1)), partner in +-1 buckets — an
  *    equi-shuffle, never a cross join) and the same verify. Mixed
  *    low x high pairs ARE covered by the gram path: the low side keeps
  *    its full gram set, and a high side with |G| - k*q > |G_low| cannot
  *    match at all (overlap bound exceeds |G_low|).
  *
  * Candidate cost tracks Sigma_gram |L_g|*|R_g| over PREFIX occurrences
  * plus the low-pool band sizes; every shuffle keys on gram / id / band.
  * Nothing is quadratic in the corpus.
  */
object FuzzyJoin {

  /** All (left_id, right_id, dist) pairs with levenshtein <= k. */
  def editDistanceJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      k: Int, q: Int = 3): DataFrame = {
    require(k >= 0 && q >= 2, s"need k >= 0 and q >= 2, got k=$k q=$q")
    val l = left.select(col(leftId).as("left_id"), col(leftStr).as("ls"))
    val r = right.select(col(rightId).as("right_id"), col(rightStr).as("rs"))

    // distinct q-grams per string (len >= q rows only; sequence(1, n)
    // with n < 1 would run DESCENDING — the q80 gotcha)
    def grams(df: DataFrame, id: String, s: String): DataFrame =
      df.filter(length(col(s)) >= q)
        .select(col(id), col(s),
          explode(sequence(lit(1), length(col(s)) - (q - 1))).as("pos"))
        .select(col(id), length(col(s)).as("len"),
          col(s).substr(col("pos"), lit(q)).as("gram"))
        .distinct()

    val lg = grams(l, "left_id", "ls")
    val rg = grams(r, "right_id", "rs")

    // global gram order = df ascending over BOTH sides (any total order is
    // correct; rare-first makes prefixes selective and skew-free)
    val dfreq = lg.select(col("gram")).union(rg.select(col("gram")))
      .groupBy("gram").agg(count(lit(1)).as("df"))

    val pfxLen = k * q + 1
    def prefix(g: DataFrame, id: String): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(col("df"), col("gram"))
      g.join(dfreq, "gram")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= pfxLen)
        .select(col(id), col("len"), col("gram"))
    }

    val cand = prefix(lg, "left_id")
      .join(prefix(rg, "right_id").withColumnRenamed("len", "rlen"), "gram")
      .filter(abs(col("len") - col("rlen")) <= k)
      .select("left_id", "right_id").distinct()

    def verify(pairs: DataFrame): DataFrame = pairs
      .join(l, "left_id").join(r, "right_id")
      .withColumn("dist", levenshtein(col("ls"), col("rs"), k))
      .filter(col("dist") >= 0)
      .select("left_id", "right_id", "dist")

    // low-complexity pools: <= k*q distinct grams (includes len < q,
    // which have none). Band equi-join on floor(len/(k+1)): partners
    // within length diff <= k land in the same or adjacent bucket.
    def lowPool(df: DataFrame, id: String, s: String,
        g: DataFrame): DataFrame =
      df.join(g.groupBy(id).agg(count(lit(1)).as("__ng")), Seq(id), "left")
        .filter(coalesce(col("__ng"), lit(0L)) <= k * q)
        .drop("__ng")
    val width = k + 1
    val lLow = lowPool(l, "left_id", "ls", lg)
      .withColumn("b", floor(length(col("ls")) / width))
    val rLow = lowPool(r, "right_id", "rs", rg)
      .withColumn("b", explode(array(
        floor(length(col("rs")) / width) - 1,
        floor(length(col("rs")) / width),
        floor(length(col("rs")) / width) + 1)))
    val lowCand = lLow.join(rLow, "b")
      .filter(abs(length(col("ls")) - length(col("rs"))) <= k)
      .select("left_id", "right_id")

    verify(cand).union(verify(lowCand)).distinct()
  }

  // ---------------------------------------------------------------------
  // q117_editdist_join — fuzzy-join a typo'd subset of part names back to
  // the clean table at k=2. The planting (one '#' substitution / one
  // deletion) is pure SQL so the DuckDB oracle corrupts identically and
  // verifies by brute-force cross-join levenshtein — a false NEGATIVE
  // from the candidate pruning (the correctness risk of this operator
  // family) hash-fails the gate, not just a spec.
  // ---------------------------------------------------------------------
  def q117EditdistJoin(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val dirty = p.filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey").as("d_id"),
        when(col("p_partkey") % 14 === 0,
          concat(substring(col("p_name"), 1, 3), lit("#"),
            substring(col("p_name"), 5, 1000000)))
          .otherwise(concat(substring(col("p_name"), 1, 4),
            substring(col("p_name"), 6, 1000000)))
          .as("d_name"))
    val clean = p.select(col("p_partkey").as("c_id"), col("p_name"))
    editDistanceJoin(dirty, "d_id", "d_name", clean, "c_id", "p_name", k = 2)
      .select(col("left_id").as("d_id"), col("right_id").as("c_id"),
        col("dist").cast("long").as("dist"))
  }

  // ---------------------------------------------------------------------
  // q123_entity_resolution — the full ER composition a master-data
  // pipeline runs: fuzzy self-match (k=1) → undirected closure
  // (Components) → golden-record stats per entity cluster. Records =
  // clean part names ∪ a typo'd shadow (+10M ids, one substitution at
  // %13==0). Singletons (no fuzzy partner) keep their own id as
  // component — most of the table, so the gate checks the left-join
  // path, not just the clustered one. The oracle replays everything
  // brute-force: cross-join levenshtein + recursive-CTE closure.
  // Natural distance-1 name pairs in the clean data (e.g. "rose"/"rosy"
  // differing one word) cluster too — in BOTH engines, by the same rule.
  // ---------------------------------------------------------------------
  def q123EntityResolution(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val dirty = p.filter(col("p_partkey") % 13 === 0)
      .select((col("p_partkey") + 10000000L).as("id"),
        concat(substring(col("p_name"), 1, 3), lit("#"),
          substring(col("p_name"), 5, 1000000)).as("name"))
    val rec = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
      .unionByName(dirty)
    val pairs = editDistanceJoin(rec, "id", "name", rec, "id", "name", k = 1)
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id").as("a"), col("right_id").as("b"))
    val comp = Components.connectedComponents(pairs)
    val assigned = rec.join(comp.select(col("id"), col("comp")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("component"))
    assigned.groupBy(col("component"))
      .agg(count(lit(1)).as("n_members"), min(col("id")).as("min_id"),
        max(col("id")).as("max_id"))
  }

  val q123EntityResolutionSql: String =
    """WITH RECURSIVE rec AS (
      |  SELECT p_partkey AS id, p_name AS name FROM part
      |  UNION ALL
      |  SELECT p_partkey + 10000000,
      |    substr(p_name, 1, 3) || '#' || substr(p_name, 5)
      |  FROM part WHERE p_partkey % 13 = 0),
      |pairs AS (
      |  SELECT x.id AS a, y.id AS b
      |  FROM rec x JOIN rec y
      |    ON x.id < y.id AND levenshtein(x.name, y.name) <= 1),
      |edges AS (SELECT a, b FROM pairs UNION SELECT b, a FROM pairs),
      |reach(id, r) AS (
      |  SELECT DISTINCT a, a FROM edges
      |  UNION
      |  SELECT x.id, e.b FROM reach x JOIN edges e ON e.a = x.r),
      |comp AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id),
      |assigned AS (
      |  SELECT rec.id, COALESCE(comp.component, rec.id) AS component
      |  FROM rec LEFT JOIN comp ON rec.id = comp.id)
      |SELECT component, COUNT(*) AS n_members, MIN(id) AS min_id,
      |  MAX(id) AS max_id
      |FROM assigned GROUP BY component""".stripMargin

  // ---------------------------------------------------------------------
  // q138_jaro_rerank — the ER scoring stage: candidate pairs from the
  // exact edit-distance blocking (the q117 planting, k=2), re-scored by
  // the native jaro_winkler expression (functions/JaroWinkler.scala —
  // Spark has levenshtein but no Jaro–Winkler; this one runs inside
  // whole-stage codegen as a single static call). Candidate SELECTION
  // stays integer-exact (levenshtein ≤ k) — the float score is emitted
  // rounded to 6 dp, never used as a filter, so no cross-engine
  // last-ulp boundary can flip a row (the q119 discipline applied to a
  // scalar: round the evidence, don't threshold on it).
  //
  // Scale: scoring is map-only over the blocked candidate set — the
  // expensive part (candidate generation) is q117's prefix-filtered
  // shape; the rerank adds one codegen'd scalar per candidate row.
  // ---------------------------------------------------------------------
  def q138JaroRerank(s: SparkSession, dir: String): DataFrame = {
    graft.functions.JaroWinkler.register(s)
    val p = t(s, dir, "part")
    val dirty = p.filter(col("p_partkey") % 7 === 0)
      .select(col("p_partkey").as("d_id"),
        when(col("p_partkey") % 14 === 0,
          concat(substring(col("p_name"), 1, 3), lit("#"),
            substring(col("p_name"), 5, 1000000)))
          .otherwise(concat(substring(col("p_name"), 1, 4),
            substring(col("p_name"), 6, 1000000)))
          .as("d_name"))
    val clean = p.select(col("p_partkey").as("c_id"), col("p_name"))
    editDistanceJoin(dirty, "d_id", "d_name", clean, "c_id", "p_name", k = 2)
      .select(col("left_id").as("d_id"), col("right_id").as("c_id"))
      .join(dirty, "d_id").join(clean, "c_id")
      .select(col("d_id"), col("c_id"),
        round(expr("jaro_winkler(d_name, p_name)"), 6).as("jw_r"))
  }

  val q138JaroRerankSql: String =
    """WITH dirty AS (
      |  SELECT p_partkey AS d_id,
      |    CASE WHEN p_partkey % 14 = 0
      |      THEN substr(p_name, 1, 3) || '#' || substr(p_name, 5)
      |      ELSE substr(p_name, 1, 4) || substr(p_name, 6) END AS d_name
      |  FROM part WHERE p_partkey % 7 = 0)
      |SELECT d.d_id, c.p_partkey AS c_id,
      |  round(jaro_winkler_similarity(d.d_name, c.p_name), 6) AS jw_r
      |FROM dirty d, part c
      |WHERE levenshtein(d.d_name, c.p_name) <= 2""".stripMargin

  // ---------------------------------------------------------------------
  // q142_sorted_neighborhood — the OTHER classic ER blocking strategy
  // (Hernández & Stolfo SIGMOD'95): sort records on a key, compare each
  // record only to its w nearest neighbors in sort order. Complements
  // q117's gram-prefix blocking: SNM is gram-free (robust to short/
  // repetitive strings where gram pruning is invalid) at the price of a
  // DOCUMENTED recall contract — only pairs within w sort positions are
  // candidates. The scalable shape partitions the sort by a block key
  // (first character here): ranks and neighbor joins run per block
  // (window partitioned by block, never a global single-task sort), the
  // standard multi-pass mitigation for cross-block misses. Candidates =
  // rank equi-join on (block, rank+offset), offset ∈ 1..w — an
  // equi-shuffle, |blocks|·w·|rows| pairs max, never n².
  // ---------------------------------------------------------------------
  /** Sorted-neighborhood candidate pairs + threshold'd verify; the rank
    * table is computed once (localCheckpoint) and reused as both probe
    * and target side. */
  def snmPairs(records: DataFrame, id: String, str: String,
      w: Int, maxDist: Int): DataFrame = {
    val blocked = records.select(col(id).as("rid"), col(str).as("rs"),
      substring(col(str), 1, 1).as("blk"))
    val win = Window.partitionBy(col("blk"))
      .orderBy(col("rs").asc, col("rid").asc)
    val ranked = blocked.withColumn("rnk", row_number().over(win))
      .localCheckpoint() // rank once; probe and target reuse it
    val probes = ranked.select(col("blk"), col("rid"), col("rs"),
      explode(sequence(col("rnk") + lit(1), col("rnk") + lit(w)))
        .as("nbr"))
    val cand = probes.join(
      ranked.select(col("blk"), col("rnk").as("nbr"),
        col("rid").as("rid2"), col("rs").as("rs2")),
      Seq("blk", "nbr"))
    cand.withColumn("dist", levenshtein(col("rs"), col("rs2"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("rid").as("left_id"), col("rid2").as("right_id"),
        col("dist").cast("long").as("dist"))
  }

  // ---------------------------------------------------------------------
  // q142_sorted_neighborhood gate — same typo planting as q117, records
  // = clean ∪ dirty in ONE pool, window w=5, verify at k=2. The oracle
  // replays the identical rank construction in SQL, so the recall
  // contract (neighbors-only) is part of the compared semantics, and a
  // rank/tie bug on either side hash-fails.
  // ---------------------------------------------------------------------
  def q142SortedNeighborhood(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val dirty = p.filter(col("p_partkey") % 7 === 0)
      .select((col("p_partkey") + 10000000L).as("id"),
        when(col("p_partkey") % 14 === 0,
          concat(substring(col("p_name"), 1, 3), lit("#"),
            substring(col("p_name"), 5, 1000000)))
          .otherwise(concat(substring(col("p_name"), 1, 4),
            substring(col("p_name"), 6, 1000000)))
          .as("name"))
    val rec = p.select(col("p_partkey").as("id"), col("p_name").as("name"))
      .unionByName(dirty)
    snmPairs(rec, "id", "name", w = 5, maxDist = 2)
  }

  val q142SortedNeighborhoodSql: String =
    """WITH rec AS (
      |  SELECT p_partkey AS id, p_name AS name FROM part
      |  UNION ALL
      |  SELECT p_partkey + 10000000,
      |    CASE WHEN p_partkey % 14 = 0
      |      THEN substr(p_name, 1, 3) || '#' || substr(p_name, 5)
      |      ELSE substr(p_name, 1, 4) || substr(p_name, 6) END
      |  FROM part WHERE p_partkey % 7 = 0),
      |ranked AS (
      |  SELECT id, name, substr(name, 1, 1) AS blk,
      |    ROW_NUMBER() OVER (PARTITION BY substr(name, 1, 1)
      |      ORDER BY name, id) AS rnk
      |  FROM rec),
      |cand AS (
      |  SELECT a.id AS left_id, b.id AS right_id, a.name AS ls,
      |    b.name AS rs
      |  FROM ranked a JOIN ranked b
      |    ON a.blk = b.blk
      |   AND b.rnk BETWEEN a.rnk + 1 AND a.rnk + 5)
      |SELECT left_id, right_id,
      |  CAST(levenshtein(ls, rs) AS BIGINT) AS dist
      |FROM cand
      |WHERE levenshtein(ls, rs) <= 2""".stripMargin

  val q117EditdistJoinSql: String =
    """WITH dirty AS (
      |  SELECT p_partkey AS d_id,
      |    CASE WHEN p_partkey % 14 = 0
      |      THEN substr(p_name, 1, 3) || '#' || substr(p_name, 5)
      |      ELSE substr(p_name, 1, 4) || substr(p_name, 6) END AS d_name
      |  FROM part WHERE p_partkey % 7 = 0)
      |SELECT d.d_id, c.p_partkey AS c_id,
      |  CAST(levenshtein(d.d_name, c.p_name) AS BIGINT) AS dist
      |FROM dirty d, part c
      |WHERE levenshtein(d.d_name, c.p_name) <= 2""".stripMargin
}
