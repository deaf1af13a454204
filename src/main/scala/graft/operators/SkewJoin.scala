package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utility: salted equi-join (SURVEY.md §7 "[EXT] at
  * 100 TB" risk list). When one join key carries a disproportionate share
  * of rows, a plain shuffle join lands that key's entire volume on one
  * task. Salting splits the hot key's left rows across `saltFactor`
  * sub-keys and replicates the matching right rows to every sub-key, so
  * the hot key's work spreads over `saltFactor` tasks.
  *
  * AQE's skew-join handles sort-merge skew at runtime, but only for
  * detected-at-shuffle skew; explicit salting is the deterministic tool
  * when skew is known (e.g. null-ish sentinel keys, power-law user ids).
  * Correctness is invariant: spec-tested equal to the unsalted join.
  */
object SkewJoin {

  /** Inner equi-join of `left` and `right` on `key`, with `left`'s rows
    * salted across `saltFactor` partitions per key. `right` must be the
    * smaller (replicated) side. */
  def saltedInnerJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      saltFactor: Int): DataFrame = {
    require(saltFactor > 0)
    val l = left.withColumn("__salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }

  /** JOIN-FANOUT diagnostic — the pre-flight check before any fact ⋈
    * fact join at scale: per join key, the output multiplicity is
    * |left rows| × |right rows|, and the top few keys routinely decide
    * whether the join is feasible at all. One aggregation per side over
    * the key (both map-side partial), an inner join of the two count
    * tables (small — one row per shared key), TakeOrdered top-k by the
    * product. This is the evidence that picks between a plain join,
    * [[SkewJoin.saltedInnerJoin]], and AQE skew splitting. */
  def joinFanout(lhs: org.apache.spark.sql.DataFrame,
      rhs: org.apache.spark.sql.DataFrame, key: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val lc = lhs.groupBy(col(key)).agg(count(lit(1)).as("n_left"))
    val rc = rhs.groupBy(col(key)).agg(count(lit(1)).as("n_right"))
    val prod = lc.join(rc, key)
      .select(col(key), col("n_left"), col("n_right"),
        (col("n_left") * col("n_right")).as("fanout"))
    val top = prod.orderBy(col("fanout").desc, col(key).asc).limit(k)
    graft.operators.Similarity.rankBounded(top, "rnk",
        Seq(col("fanout").desc, col(key).asc))
      .select(col("rnk").cast("int").as("rnk"), col(key),
        col("n_left"), col("n_right"), col("fanout"))
  }

  // ---------------------------------------------------------------------
  // q197_join_fanout — the lineitem ⋈ orders-by-custkey hazard panel:
  // top-20 customer keys by would-be join multiplicity between the two
  // fact tables. Integer evidence only.
  // ---------------------------------------------------------------------
  def q197JoinFanout(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val li = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val liByCust = li.join(o.select(col("o_orderkey"), col("o_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("custkey"))
    joinFanout(liByCust, o.select(col("o_custkey").as("custkey")),
      "custkey", 20)
  }

  val q197JoinFanoutSql: String =
    """WITH lc AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_left
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY o_custkey),
      |rc AS (SELECT o_custkey AS custkey, COUNT(*) AS n_right
      |       FROM orders GROUP BY o_custkey),
      |prod AS (
      |  SELECT lc.custkey, lc.n_left, rc.n_right,
      |    lc.n_left * rc.n_right AS fanout
      |  FROM lc JOIN rc ON lc.custkey = rc.custkey)
      |SELECT CAST(rnk AS INT) AS rnk, custkey, n_left, n_right, fanout
      |FROM (
      |  SELECT custkey, n_left, n_right, fanout,
      |    ROW_NUMBER() OVER (ORDER BY fanout DESC, custkey ASC) AS rnk
      |  FROM prod)
      |WHERE rnk <= 20""".stripMargin

  /** BUCKET-SKEW audit — before committing to a bucketed layout on a
    * key, how evenly does the bucket assignment spread the rows? Emits
    * the bucket-size distribution summary (max/mean ratio, non-empty
    * count) — a skewed bucketing key silently serializes every
    * co-bucketed join through its hot buckets. The caller supplies the
    * bucket expression (audit the SAME rule the layout uses); one
    * count aggregate over the bucket id. */
  def bucketSkew(df: org.apache.spark.sql.DataFrame,
      bucketExpr: org.apache.spark.sql.Column,
      nBuckets: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val sizes = df.select(bucketExpr.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    sizes.agg(
      count(lit(1)).as("n_nonempty"),
      lit(nBuckets).as("n_buckets"),
      sum(col("n")).as("n_rows"),
      max(col("n")).as("max_bucket"),
      round(max(col("n")).cast("double") /
        (sum(col("n")).cast("double") / lit(nBuckets.toDouble)), 6)
        .as("skew_ratio"))
  }

  // ---------------------------------------------------------------------
  // q224_bucket_skew — would bucketing lineitem by l_orderkey at 64
  // buckets skew? The audited rule is the md5-prefix bucket (the q63
  // cross-engine identity), so the summary is hash-exact, not
  // rows-only.
  // ---------------------------------------------------------------------
  def q224BucketSkew(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    bucketSkew(t(s, dir, "lineitem"),
      pmod(conv(substring(md5(col("l_orderkey").cast("string")
        .cast("binary")), 1, 4), 16, 10).cast("long"), lit(64L)), 64)
  }

  val q224BucketSkewSql: String =
    """WITH b AS (
      |  SELECT CAST('0x' || substring(md5(CAST(l_orderkey AS VARCHAR)),
      |      1, 4) AS BIGINT) % 64 AS bucket
      |  FROM lineitem),
      |sizes AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket)
      |SELECT COUNT(*) AS n_nonempty, 64 AS n_buckets,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  CAST(MAX(n) AS BIGINT) AS max_bucket,
      |  ROUND(CAST(MAX(n) AS DOUBLE)
      |    / (CAST(SUM(n) AS DOUBLE) / 64.0), 6) AS skew_ratio
      |FROM sizes""".stripMargin

}
