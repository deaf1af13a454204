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
}
