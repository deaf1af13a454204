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
  * Scale shape — SEGMENT blocking (PassJoin, Li/Deng/Feng VLDB'11):
  *  - each RIGHT string of length m partitions into k+1 disjoint
  *    segments (fixed scheme per (m, i)); k edits can disturb at most k
  *    segments, so ed <= k implies the left string contains at least
  *    one segment VERBATIM, starting within +-k of its home position;
  *  - the LEFT side therefore probes only (2k+1)·(k+1)·(2k+1) specific
  *    substrings per row — one per (candidate length m in ls+-k,
  *    segment index, position shift) — joined by EXACT equality on the
  *    (segment, index, m) key. A segment is ~m/(k+1) characters: on
  *    repetitive corpora (names drawn from a small vocabulary) exact
  *    multi-word substrings stay selective where the earlier q-gram
  *    prefix filter drowned — grams from a small vocab all have huge
  *    document frequency, and its candidate cost degraded toward n²/|V|
  *    (measured: the r6 ER gate spent 84 s at sf0.1; segment blocking
  *    cuts the same gate ~10x);
  *  - candidates pass |len diff| <= k by construction of the m range,
  *    then the exact verify runs Spark's threshold'd levenshtein
  *    codegen (DP early-exits past k) on candidate pairs only;
  *  - strings too short to carve k+1 non-degenerate segments
  *    (m < 2(k+1) — an empty segment would match everywhere) pair via a
  *    length-BAND equi-join (bucket floor(len/(k+1)), partner in +-1
  *    buckets): a bounded pool, an equi-shuffle, never a cross join.
  *    Coverage: every right is segmented or short; a left matching a
  *    short right has ls <= m+k, so the left short-pool bound is
  *    2(k+1)+k.
  *
  * Candidate cost tracks Sigma_segkey |L_key|*|R_key| over exact
  * segment keys plus the short-pool band sizes; every shuffle keys on
  * segment / id / band. Nothing is quadratic in the corpus.
  */
object FuzzyJoin {

  /** All (left_id, right_id, dist) pairs with levenshtein <= k. */
  def editDistanceJoin(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      k: Int): DataFrame = {
    require(k >= 0, s"need k >= 0, got k=$k")
    val l = left.select(col(leftId).as("left_id"), col(leftStr).as("ls"))
    val r = right.select(col(rightId).as("right_id"), col(rightStr).as("rs"))
    val kk = k + 1          // number of segments
    val minLen = 2 * kk     // below this a segment could be empty

    // fixed segment scheme for length m, 0-based index i in 0..k:
    //   base = m div (k+1), rem = m mod (k+1)
    //   len_i = base + (i >= k+1-rem ? 1 : 0)   (longer segments last)
    //   start0_i = i*base + max(0, i - (k+1-rem))
    // (int/int `/` is double in Spark SQL; cast truncates = floor for
    // the non-negative lengths here)
    def segLen(m: Column, i: Column): Column =
      (m / kk).cast("int") + when(i >= lit(kk) - m % kk, 1).otherwise(0)
    def segStart0(m: Column, i: Column): Column =
      i * (m / kk).cast("int") + greatest(lit(0), i - (lit(kk) - m % kk))

    // right side: one row per (right_id, m, i, segment string)
    val rSegs = r.filter(length(col("rs")) >= minLen)
      .withColumn("m", length(col("rs")))
      .withColumn("i", explode(sequence(lit(0), lit(k))))
      .select(col("right_id"), col("m"), col("i"),
        col("rs").substr(segStart0(col("m"), col("i")) + 1,
          segLen(col("m"), col("i"))).as("seg"))

    // left side: probe substrings for every candidate (m, i, shift).
    // Guard ls + k >= minLen BEFORE the explode (sequence with hi < lo
    // runs DESCENDING — the q80 gotcha — and would fabricate m values).
    val probeRows = l
      .withColumn("__ls", length(col("ls")))
      .filter(col("__ls") + k >= minLen)
      .withColumn("m", explode(sequence(
        greatest(col("__ls") - k, lit(minLen)), col("__ls") + k)))
      .filter(col("m") <= col("__ls") + k)
      .withColumn("i", explode(sequence(lit(0), lit(k))))
      .withColumn("d", explode(sequence(lit(-k), lit(k))))
      .withColumn("__pos0", segStart0(col("m"), col("i")) + col("d"))
      .withColumn("__len", segLen(col("m"), col("i")))
      .filter(col("__pos0") >= 0 &&
        col("__pos0") + col("__len") <= col("__ls"))
      .select(col("left_id"), col("m"), col("i"),
        col("ls").substr(col("__pos0") + 1, col("__len")).as("seg"))

    val cand = probeRows
      .join(rSegs, Seq("seg", "i", "m"))
      .select("left_id", "right_id").distinct()

    def verify(pairs: DataFrame): DataFrame = pairs
      .join(l, "left_id").join(r, "right_id")
      .withColumn("dist", levenshtein(col("ls"), col("rs"), k))
      .filter(col("dist") >= 0)
      .select("left_id", "right_id", "dist")

    // short pool: rights below minLen aren't segmented; their partners
    // have ls <= m + k. Band equi-join on floor(len/(k+1)), +-1 buckets.
    val width = kk
    val lShort = l.filter(length(col("ls")) < minLen + k)
      .withColumn("b", floor(length(col("ls")) / width))
    val rShort = r.filter(length(col("rs")) < minLen)
      .withColumn("b", explode(array(
        floor(length(col("rs")) / width) - 1,
        floor(length(col("rs")) / width),
        floor(length(col("rs")) / width) + 1)))
    val lowCand = lShort.join(rShort, "b")
      .filter(abs(length(col("ls")) - length(col("rs"))) <= k)
      .select("left_id", "right_id")

    verify(cand).union(verify(lowCand)).distinct()
  }

  /** Value-collapsed edit-distance join: dedupe both sides to DISTINCT
    * strings, match the values, then expand value pairs back to id
    * pairs. Output-identical to [[editDistanceJoin]]; cost becomes
    * O(distinct-value matching + output) instead of O(id-pair
    * matching) — the decisive shape when strings repeat (real key
    * corpora: product names, normalized titles, user agents). A value
    * appearing c₁/c₂ times on the two sides contributes c₁·c₂ OUTPUT
    * rows but only ONE verify — multiplicity never enters the pair
    * matcher (measured on the r6 gates: the 20k-part corpus has 64
    * distinct names; value collapse cut q117 13.4→<1 s at sf0.1). */
  def editDistanceJoinByValue(
      left: DataFrame, leftId: String, leftStr: String,
      right: DataFrame, rightId: String, rightStr: String,
      k: Int): DataFrame = {
    val lv = left.select(col(leftStr).as("lv")).distinct()
    val rv = right.select(col(rightStr).as("rv")).distinct()
    val valuePairs = editDistanceJoin(lv, "lv", "lv", rv, "rv", "rv", k)
      .select(col("left_id").as("lv"), col("right_id").as("rv"),
        col("dist"))
    valuePairs
      .join(left.select(col(leftId).as("left_id"),
        col(leftStr).as("lv")), "lv")
      .join(right.select(col(rightId).as("right_id"),
        col(rightStr).as("rv")), "rv")
      .select(col("left_id"), col("right_id"), col("dist"))
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
    editDistanceJoinByValue(dirty, "d_id", "d_name", clean, "c_id",
        "p_name", k = 2)
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
    // VALUE-FIRST ER: collapse exact-duplicate names to one group row
    // (rep = min member id) BEFORE any pairwise work. A value of
    // multiplicity c otherwise contributes c² dist-0 edges — the
    // pairwise edge set here is 8.8M pairs over 21.5k records (64
    // distinct names) while the value graph has ≤128 nodes. Components
    // over value reps + group-stat rollup reproduce the pairwise answer
    // EXACTLY: every same-name record is dist-0-connected, so a name
    // group is always wholly inside one cluster, and the cluster's min
    // id is the min over its groups' reps.
    val groups = rec.groupBy(col("name"))
      .agg(min(col("id")).as("rep"), count(lit(1)).as("c"),
        min(col("id")).as("g_min"), max(col("id")).as("g_max"))
    val vals = groups.select(col("rep"), col("name"))
    val pairs = editDistanceJoin(vals, "rep", "name", vals, "rep",
        "name", k = 1)
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id").as("a"), col("right_id").as("b"))
    val comp = Components.connectedComponents(pairs)
    groups.join(comp.select(col("id"), col("comp")),
        groups("rep") === col("id"), "left")
      .select(coalesce(col("comp"), col("rep")).as("component"),
        col("c"), col("g_min"), col("g_max"))
      .groupBy(col("component"))
      .agg(sum(col("c")).as("n_members"), min(col("g_min")).as("min_id"),
        max(col("g_max")).as("max_id"))
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
    // score once per DISTINCT value pair, then expand — the jw scalar
    // runs O(value pairs) times, not O(output) times
    val lv = dirty.select(col("d_name").as("lv")).distinct()
    val rv = clean.select(col("p_name").as("rv")).distinct()
    val scored = editDistanceJoin(lv, "lv", "lv", rv, "rv", "rv", k = 2)
      .select(col("left_id").as("lv"), col("right_id").as("rv"))
      .select(col("lv"), col("rv"),
        round(expr("jaro_winkler(lv, rv)"), 6).as("jw_r"))
    scored
      .join(dirty.select(col("d_id"), col("d_name").as("lv")), "lv")
      .join(clean.select(col("c_id"), col("p_name").as("rv")), "rv")
      .select(col("d_id"), col("c_id"), col("jw_r"))
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
