package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005)
  * in TABLE form: d×w counters as (j, bucket, cnt) rows — the mergeable
  * frequency summary for "how often did key X appear in 100 TB" without
  * a |keys|-sized exact table. Joins the existing sketch family
  * (Misra–Gries exact heavy hitters, HLL distinct, histogram partials).
  *
  * Everything is INTEGER arithmetic — h_j(x) = ((a_j·x + b_j) mod p)
  * mod w over fixed constants — so a SQL engine replays the sketch
  * bit-exactly: the gate's oracle rebuilds the same counters and the
  * same estimates from scratch in DuckDB.
  *
  * Scale shapes:
  *  - build: one explode(d=4) + one shuffle-on-(j,bucket) count — 4·|rows|
  *    map-side rows partial-aggregated down to ≤ d·w = 4·w counter rows
  *    total, a fixed-size table REGARDLESS of corpus size (that is the
  *    sketch's point). Partials merge by addition, so per-batch sketches
  *    fold into a maintained store the Rollup way;
  *  - estimate: probes hash to their d buckets, equi-join the counter
  *    table (broadcast — it's ≤ 4·w rows), min per key. Never scans the
  *    corpus.
  */
object Sketches {

  val Depth = 4
  private val P = 2147483647L // 2^31 − 1 (Mersenne prime)
  private val A = Seq(1103515245L, 69069L, 1664525L, 22695477L)
  private val B = Seq(12345L, 362437L, 1013904223L, 1L)

  /** h_j(key) for a non-negative long key column. */
  private def bucket(j: Int, key: Column, w: Int): Column =
    ((key * lit(A(j)) + lit(B(j))) % lit(P)) % lit(w.toLong)

  /** Build the (j, bucket, cnt) counter table over a long key column. */
  def cmsBuild(df: DataFrame, key: Column, w: Int): DataFrame = {
    val rows = (0 until Depth).map(j =>
      struct(lit(j).as("j"), bucket(j, key, w).as("bucket")))
    df.select(explode(array(rows: _*)).as("jb"))
      .groupBy(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  // ---------------------------------------------------------------------
  // Persisted, sync-maintained CM sketch store — built ON the Rollup
  // partial-store machinery rather than new code: the counter table IS a
  // grouped count partial over the exploded (j, bucket) rows, so
  // [[graft.pipeline.Rollup.init]]/[[graft.pipeline.Rollup.merge]] give
  // O(batch) appends with replay suppression for free, and — the RTBF
  // point — CM is a LINEAR sketch, so [[graft.pipeline.Rollup.retract]]
  // delta-subtracts a deleted row set exactly (stage-carried against
  // crash-retries), leaving the store bit-equal to a rebuild over the
  // filtered corpus. Contrast KMV/HLL/min-max evidence, which cannot
  // un-see a row: those maintained stores purge by INVALIDATION
  // ([[graft.pipeline.Rollup.invalidate]] → next sync re-inits), the
  // [[graft.pipeline.Cascade.Target.RollupStore]] path.
  // ---------------------------------------------------------------------

  /** One (j, bucket) row per input row per hash — the exploded form
    * whose grouped count IS the CM counter table. */
  def cmsRows(df: DataFrame, key: Column, w: Int): DataFrame = {
    val rows = (0 until Depth).map(j =>
      struct(lit(j).as("j"), bucket(j, key, w).as("bucket")))
    df.select(explode(array(rows: _*)).as("jb"))
      .select(col("jb.j").as("j"), col("jb.bucket").as("bucket"))
  }

  /** The CM counter table as a Rollup spec: group by (j, bucket), count. */
  val cmsStoreSpec: graft.pipeline.Rollup.Spec =
    graft.pipeline.Rollup.Spec(groupCols = Seq("j", "bucket"))

  def initCmsStore(spark: SparkSession, storeDir: String, df: DataFrame,
      key: Column, w: Int, batchId: String): Unit =
    graft.pipeline.Rollup.init(spark, storeDir, cmsRows(df, key, w),
      cmsStoreSpec, batchId)

  /** O(batch) append; a replayed batch id no-ops on the ledger. */
  def mergeCmsStore(spark: SparkSession, storeDir: String,
      batch: DataFrame, key: Column, w: Int, batchId: String): Boolean =
    graft.pipeline.Rollup.merge(spark, storeDir, cmsRows(batch, key, w),
      cmsStoreSpec, batchId)

  /** The live (j, bucket, cnt) counter table, [[cmsEstimate]]-ready. */
  def readCmsStore(spark: SparkSession, storeDir: String): DataFrame =
    graft.pipeline.Rollup.read(spark, storeDir, cmsStoreSpec)
      .select(col("j"), col("bucket"), col("n").as("cnt"))

  /** RTBF cascade hook: subtract the deleted rows' counter
    * contributions (linear-sketch retraction — exact, no rebuild).
    * `deleted` must be captured from the corpus BEFORE its own purge;
    * on a crash-retry the staged intent wins and `deleted` may be
    * empty. Returns the fact rows retracted (0 on replay). */
  def purgeCmsStore(spark: SparkSession, storeDir: String,
      deleted: DataFrame, key: Column, w: Int, purgeId: String): Long =
    // retract counts the exploded (j, bucket) rows — Depth per fact row
    graft.pipeline.Rollup.retract(spark, storeDir,
      cmsRows(deleted, key, w), cmsStoreSpec, purgeId) / Depth

  /** SQL twin of [[cmsRows]]' hash arms for a DuckDB oracle: one UNION
    * ALL arm per depth, emitting (j, bucket) from `fromSql` rows keyed
    * by the SQL expression `keySql`. Integer arithmetic only — the
    * oracle replays the counters bit-exactly. */
  def cmsBuildArmsSql(fromSql: String, keySql: String, w: Int): String =
    (0 until Depth).map { j =>
      s"SELECT $j AS j, ((($keySql) * ${A(j)} + ${B(j)}) % $P) % $w " +
        s"AS bucket FROM $fromSql"
    }.mkString("\n  UNION ALL ")

  /** SQL twin of [[cmsEstimate]]'s probe-side hash arms: (key, j,
    * bucket) rows from relation `probesRel` whose key column is
    * `keyCol`. */
  def cmsProbeArmsSql(probesRel: String, keyCol: String, w: Int): String =
    (0 until Depth).map { j =>
      s"SELECT $keyCol, $j AS j, (($keyCol * ${A(j)} + ${B(j)}) % $P) " +
        s"% $w AS bucket FROM $probesRel"
    }.mkString("\n  UNION ALL ")

  /** Point-estimate counts for probe keys: min over the d counters.
    * Guaranteed ≥ the true count; = for keys whose d buckets are all
    * collision-free. Probe keys absent from every stream row estimate
    * whatever their buckets hold (classic CMS behavior). */
  def cmsEstimate(cms: DataFrame, probes: DataFrame, key: String,
      w: Int): DataFrame = {
    val rows = (0 until Depth).map(j =>
      struct(lit(j).as("j"), bucket(j, col(key), w).as("bucket")))
    probes.select(col(key), explode(array(rows: _*)).as("jb"))
      .select(col(key), col("jb.j").as("j"), col("jb.bucket").as("bucket"))
      .join(broadcast(cms), Seq("j", "bucket"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  // ---------------------------------------------------------------------
  // q125_count_min — sketch the o_custkey stream at w=256 (narrow enough
  // that collisions actually occur, so the over-estimate path is
  // exercised), estimate the first 50 customers, and carry the exact
  // count alongside: the oracle recomputes both, and the est ≥ true
  // invariant is visible in the output itself.
  // ---------------------------------------------------------------------
  def q125CountMin(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val w = 256
    val cms = cmsBuild(o, col("o_custkey"), w)
    val probes = t(s, dir, "customer").filter(col("c_custkey") <= 50)
      .select(col("c_custkey").as("key"))
    val truth = o.groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("true_cnt"))
    cmsEstimate(cms, probes, "key", w)
      .join(truth, Seq("key"), "left")
      .select(col("key"), col("est"),
        coalesce(col("true_cnt"), lit(0L)).as("true_cnt"))
  }

  val q125CountMinSql: String = {
    val hashes = (0 until Depth).map { j =>
      s"((k * ${A(j)} + ${B(j)}) % $P) % 256"
    }
    val buildArms = hashes.zipWithIndex.map { case (h, j) =>
      s"SELECT $j AS j, ${h.replace("k", "o_custkey")} AS bucket FROM orders"
    }.mkString("\n      UNION ALL ")
    val probeArms = hashes.zipWithIndex.map { case (h, j) =>
      s"SELECT key, $j AS j, ${h.replace("k * ", "key * ")} AS bucket FROM probes"
    }.mkString("\n      UNION ALL ")
    s"""WITH cms AS (
       |  SELECT j, bucket, COUNT(*) AS cnt FROM (
       |      $buildArms)
       |  GROUP BY j, bucket),
       |probes AS (
       |  SELECT c_custkey AS key FROM customer WHERE c_custkey <= 50),
       |pb AS (
       |      $probeArms),
       |est AS (
       |  SELECT pb.key, MIN(COALESCE(cms.cnt, 0)) AS est
       |  FROM pb LEFT JOIN cms ON pb.j = cms.j AND pb.bucket = cms.bucket
       |  GROUP BY pb.key),
       |truth AS (
       |  SELECT o_custkey AS key, COUNT(*) AS true_cnt
       |  FROM orders GROUP BY o_custkey)
       |SELECT est.key, est.est,
       |  COALESCE(truth.true_cnt, 0) AS true_cnt
       |FROM est LEFT JOIN truth ON est.key = truth.key""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q145_kmv_intersection — KMV (k minimum values) set sketches and the
  // pairwise-overlap estimate (Beyer et al. SIGMOD'07): each key's
  // element set reduces to its k smallest hash values; for a pair,
  // overlap = |KMV_k(A ∪ B) ∩ A_sig ∩ B_sig| estimates k·Jaccard. The
  // set-INTERSECTION cardinality sketch the family was missing: HLL
  // answers |distinct|, Bloom answers membership, CM answers frequency —
  // KMV answers "how much do these two huge sets overlap" from k values
  // each, without ever joining the sets themselves.
  //
  // Everything is integer arithmetic: h(x) = (x·2654435761) mod 1000003
  // (the q118 mixer — bit-identical in any engine), signatures are
  // sorted int arrays, the gate's overlap output is an integer count per
  // pair, with the EXACT |A ∩ B| alongside as oracle-checked evidence.
  //
  // Scale shapes: signature build is one shuffle on the set key with the
  // per-key state capped at k values (the aggregation state is the
  // slice, and distinct-before-collect bounds it at |distinct elements|;
  // a production build swaps in a bounded-heap Aggregator — the q36b
  // TopK — to hold k per partition); the pair stage joins |keys|²-bounded
  // SIGNATURES (k ints each), never element sets — at 10^9-element sets
  // and k=64, a pair costs 128 ints.
  // ---------------------------------------------------------------------
  private def kmvHash(c: Column): Column =
    pmod(c * lit(2654435761L), lit(1000003L))

  /** One row per key: sorted array of the k smallest element hashes
    * (ties impossible modulo collisions; collisions collapse via
    * collect_set — identically in the SQL twin). */
  def kmvSignatures(df: DataFrame, key: String, elem: String,
      k: Int): DataFrame =
    df.select(col(key), kmvHash(col(elem)).as("h")).distinct()
      .groupBy(col(key))
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("sig"))

  /** Pairwise KMV overlap for all (a < b) key pairs within `scope`:
    * (key_a, key_b, kmv_overlap, k_eff). kmv_overlap/k_eff estimates
    * Jaccard; k_eff = min(k, |union sig|) handles small sets exactly. */
  def kmvOverlap(sigs: DataFrame, key: String, k: Int): DataFrame = {
    val a = sigs.select(col(key).as("ka"), col("sig").as("sa"))
    val b = sigs.select(col(key).as("kb"), col("sig").as("sb"))
    a.join(b, col("ka") < col("kb"))
      .select(col("ka"), col("kb"),
        slice(array_sort(array_union(col("sa"), col("sb"))), 1, k)
          .as("mu"), col("sa"), col("sb"))
      .select(col("ka"), col("kb"),
        size(array_intersect(array_intersect(col("mu"), col("sa")),
          col("sb"))).cast("long").as("kmv_overlap"),
        size(col("mu")).cast("long").as("k_eff"))
  }

  // ---------------------------------------------------------------------
  // q145 gate — part-set overlap between the first 30 suppliers (a
  // bounded pair count at EVERY scale factor — a nation-scoped filter is
  // empty at sf0.001's 10 single-nation suppliers), k=64, with the exact
  // intersection joined alongside: the estimator and its ground truth in
  // one hash-checked result.
  // ---------------------------------------------------------------------
  def q145KmvIntersection(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val sup = t(s, dir, "supplier")
      .filter(col("s_suppkey") <= 30)
      .select(col("s_suppkey"))
    val sets = li.join(broadcast(sup),
        li("l_suppkey") === sup("s_suppkey"))
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
    val sigs = kmvSignatures(sets, "sk", "pk", k = 64)
    val est = kmvOverlap(sigs, "sk", k = 64)
    val exact = sets.distinct().as("x")
      .join(sets.distinct().as("y"), col("x.pk") === col("y.pk")
        && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("ka"), col("y.sk").as("kb"))
      .agg(count(lit(1)).as("exact_inter"))
    est.join(exact, Seq("ka", "kb"), "left")
      .select(col("ka"), col("kb"), col("kmv_overlap"), col("k_eff"),
        coalesce(col("exact_inter"), lit(0L)).as("exact_inter"))
  }

  val q145KmvIntersectionSql: String =
    """WITH sup AS (
      |  SELECT s_suppkey FROM supplier WHERE s_suppkey <= 30),
      |sets AS (
      |  SELECT DISTINCT l.l_suppkey AS sk, l.l_partkey AS pk
      |  FROM lineitem l JOIN sup ON l.l_suppkey = sup.s_suppkey),
      |hashes AS (
      |  SELECT DISTINCT sk, (pk * 2654435761) % 1000003 AS h FROM sets),
      |sigs AS (
      |  SELECT sk, (list_sort(list(h)))[1:64] AS sig
      |  FROM hashes GROUP BY sk),
      |pairs AS (
      |  SELECT a.sk AS ka, b.sk AS kb, a.sig AS sa, b.sig AS sb,
      |    (list_sort(list_distinct(a.sig || b.sig)))[1:64] AS mu
      |  FROM sigs a JOIN sigs b ON a.sk < b.sk),
      |est AS (
      |  SELECT ka, kb,
      |    CAST(len(list_intersect(list_intersect(mu, sa), sb)) AS BIGINT)
      |      AS kmv_overlap,
      |    CAST(len(mu) AS BIGINT) AS k_eff
      |  FROM pairs),
      |exact AS (
      |  SELECT x.sk AS ka, y.sk AS kb, COUNT(*) AS exact_inter
      |  FROM sets x JOIN sets y ON x.pk = y.pk AND x.sk < y.sk
      |  GROUP BY x.sk, y.sk)
      |SELECT est.ka, est.kb, est.kmv_overlap, est.k_eff,
      |  COALESCE(exact.exact_inter, 0) AS exact_inter
      |FROM est LEFT JOIN exact ON est.ka = exact.ka AND est.kb = exact.kb
      |""".stripMargin
}
