package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Embedding covariance / PCA — the n ≫ d decomposition pattern:
  * the d×d covariance is a ONE-PASS distributed aggregation (map-side
  * partial combine collapses every task's contribution to ≤ d(d+1)/2
  * rows, so the shuffle is constant-size regardless of corpus rows),
  * and the eigen-decomposition runs on the driver over the d×d result —
  * a bounded d² collect of the same class as the IVF centroid loads
  * (`Similarity.scala`), never a corpus collect. Downstream projection /
  * whitening is map-only against the broadcast-literal component.
  *
  * This is what an embedding-curation pipeline runs before SemDeDup-style
  * clustering: anisotropic embedding spaces (a handful of dominant
  * directions) make cosine thresholds incomparable across regions;
  * projecting out or whitening the top components fixes the geometry.
  *
  * Determinism: every per-row product of two float32 components is
  * EXACT in double (24-bit × 24-bit = 48 < 53 mantissa bits); each
  * product is then quantized onto a fixed decimal grid (scale 8) so the
  * corpus sums are exact decimal folds — associative, order-independent,
  * engine-reproducible (the `sumDec` discipline, scale chosen so the
  * quantization step is deep inside the double's reliable digits and
  * the unscaled sum stays under 2^53 for the final exact cast).
  */
object Pca {

  private val ProdDec = DecimalType(38, 8)

  /** Upper-triangle covariance of the leading `d` dims of `vecCol`:
    * one row per (i ≤ j) with n, the raw product sum Σxᵢxⱼ, and the
    * population covariance (Σxᵢxⱼ − ΣxᵢΣxⱼ/n)/n. Pair expansion happens
    * INSIDE a per-row higher-order transform (map-only, codegen'd;
    * nothing is joined row-to-row), and the groupBy's partial
    * aggregation bounds per-task state at d(d+1)/2 decimal cells —
    * the knob that caps d is executor memory for d² cells, not corpus
    * size. */
  def covariance(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val pairs = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        struct(i.as("i"), j.as("j"),
          (element_at(col(vecCol), i + 1).cast("double")
            * element_at(col(vecCol), j + 1).cast("double"))
            .cast(ProdDec).as("p")))))
    val sxy = df.select(explode(pairs).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(sum(col("pr.p")).as("sxy_dec"))
    val dims = df.select(posexplode(slice(col(vecCol), 1, d))
        .as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(col("x").cast("double").cast(ProdDec)).as("sx_dec"))
    val n = df.agg(count(lit(1)).as("n"))
    val joined = sxy
      .join(broadcast(dims.select(col("i"), col("sx_dec").as("si"))),
        Seq("i"))
      .join(broadcast(dims.select(col("i").as("j"),
        col("sx_dec").as("sj"))), Seq("j"))
      .crossJoin(broadcast(n))
    val nD = col("n").cast("double")
    val sxyD = col("sxy_dec").cast("double")
    val siD = col("si").cast("double")
    val sjD = col("sj").cast("double")
    joined.select(col("i"), col("j"), col("n"),
      round(sxyD, 6).as("sxy"),
      round((sxyD - siD * sjD / nD) / nD, 6).as("cov"))
  }

  /** Driver-side dense symmetric matrix from [[covariance]] output —
    * a d² bounded collect (the centroid-load class, cited above). */
  def covMatrix(cov: DataFrame, d: Int): Array[Array[Double]] = {
    val m = Array.fill(d, d)(0.0)
    cov.select(col("i"), col("j"), col("cov")).collect().foreach { r =>
      val (i, j, v) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i)(j) = v; m(j)(i) = v
    }
    m
  }

  /** Top eigenpair by power iteration over the d×d driver-side matrix.
    * Deterministic start (a fixed ramp, so it is never exactly
    * orthogonal to the top component the way a constant vector can be
    * on sign-balanced data); fixed iteration count — no data-dependent
    * convergence test, so reruns are bit-identical. Returns
    * (eigenvector, eigenvalue = Rayleigh quotient). */
  def topEigen(m: Array[Array[Double]], iters: Int = 100)
      : (Array[Double], Double) = {
    val d = m.length
    var v = Array.tabulate(d)(i => 1.0 + i.toDouble / d)
    var norm = math.sqrt(v.map(x => x * x).sum)
    v = v.map(_ / norm)
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i =>
        (0 until d).foldLeft(0.0)((a, j) => a + m(i)(j) * v(j)))
      norm = math.sqrt(w.map(x => x * x).sum)
      v = if (norm == 0.0) v else w.map(_ / norm)
      it += 1
    }
    val mv = Array.tabulate(d)(i =>
      (0 until d).foldLeft(0.0)((a, j) => a + m(i)(j) * v(j)))
    val lambda = v.zip(mv).map { case (a, b) => a * b }.sum
    (v, lambda)
  }

  /** Top-k eigenpairs by power iteration + Hotelling deflation
    * (m ← m − λ·vvᵀ after each extraction) — still O(k·d²) driver work
    * on the bounded matrix; components come out eigenvalue-descending
    * and mutually orthogonal (each lives in the deflated complement of
    * its predecessors). */
  def topKEigen(m: Array[Array[Double]], k: Int, iters: Int = 100)
      : Seq[(Array[Double], Double)] = {
    val d = m.length
    val work = m.map(_.clone())
    (0 until k).map { _ =>
      val (v, lambda) = topEigen(work, iters)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) {
          work(i)(j) -= lambda * v(i) * v(j); j += 1
        }
        i += 1
      }
      (v, lambda)
    }
  }

  /** Map-only k-component projection: one array column of the k
    * principal coordinates; `whiten = true` scales each by 1/√λ so the
    * output space is isotropic (unit variance per component) — the
    * geometry fix SemDeDup-style cosine thresholds need on anisotropic
    * embeddings. Components with λ ≤ 0 pass through unscaled rather
    * than dividing by a degenerate √λ. */
  def projectK(df: DataFrame, vecCol: String,
      comps: Seq[(Array[Double], Double)], as: String,
      whiten: Boolean = false): DataFrame = {
    val cols = comps.map { case (v, lambda) =>
      val dir = array(v.toIndexedSeq.map(x => lit(x)): _*)
      val raw = aggregate(zip_with(slice(col(vecCol), 1, v.length), dir,
          (x, w) => x.cast("double") * w),
        lit(0.0d), (acc, x) => acc + x)
      if (whiten && lambda > 0.0) raw / math.sqrt(lambda) else raw
    }
    df.withColumn(as, array(cols: _*))
  }

  /** Map-only projection of the leading `d` dims onto a fixed direction
    * (broadcast as a literal array — no join, no shuffle): the scalar
    * coordinate each row has along a principal component. The fold runs
    * in element order, the q36/q81-established reproducible shape. */
  def project(df: DataFrame, vecCol: String, direction: Array[Double],
      as: String): DataFrame = {
    val dir = array(direction.toIndexedSeq.map(x => lit(x)): _*)
    df.withColumn(as,
      aggregate(zip_with(slice(col(vecCol), 1, direction.length), dir,
          (x, w) => x.cast("double") * w),
        lit(0.0d), (acc, x) => acc + x))
  }

  // ---------------------------------------------------------------------
  // q234_covariance — the upper-triangle covariance gate over the
  // leading 16 embedding dims (136 cells). The oracle replays the pair
  // expansion, the per-product decimal quantization, the exact decimal
  // sums, and the final double arithmetic cell for cell — a regrouped
  // float fold, a 0/1-based indexing slip, or a dropped tie in the
  // triangle enumeration all hash-fail.
  // ---------------------------------------------------------------------
  def q234Covariance(s: SparkSession, dir: String): DataFrame =
    covariance(t(s, dir, "embeddings"), "embedding", d = 16)

  val q234CovarianceSql: String =
    """WITH pr AS (
      |  SELECT i.i AS i, j.j AS j,
      |    CAST(CAST(e.embedding[i.i + 1] AS DOUBLE)
      |       * CAST(e.embedding[j.j + 1] AS DOUBLE) AS DECIMAL(38,8)) AS p
      |  FROM embeddings e, range(16) i(i), range(16) j(j)
      |  WHERE j.j >= i.i),
      |sxy AS (SELECT i, j, SUM(p) AS sxy_dec FROM pr GROUP BY i, j),
      |sx AS (
      |  SELECT i.i AS i,
      |    SUM(CAST(CAST(e.embedding[i.i + 1] AS DOUBLE)
      |        AS DECIMAL(38,8))) AS sx_dec
      |  FROM embeddings e, range(16) i(i) GROUP BY i.i),
      |nn AS (SELECT COUNT(*) AS n FROM embeddings)
      |SELECT CAST(s.i AS INT) AS i, CAST(s.j AS INT) AS j, nn.n,
      |  ROUND(CAST(s.sxy_dec AS DOUBLE), 6) AS sxy,
      |  ROUND((CAST(s.sxy_dec AS DOUBLE)
      |    - CAST(a.sx_dec AS DOUBLE) * CAST(b.sx_dec AS DOUBLE)
      |      / CAST(nn.n AS DOUBLE)) / CAST(nn.n AS DOUBLE), 6) AS cov
      |FROM sxy s
      |JOIN sx a ON a.i = s.i
      |JOIN sx b ON b.i = s.j
      |CROSS JOIN nn""".stripMargin
}
