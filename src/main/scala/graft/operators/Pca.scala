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
  * product is then quantized onto a fixed 1e-8 grid by a FIXED IEEE
  * TREE — `floor(p * 1e8)` into int64 (the double multiply and floor
  * are correctly rounded identically in every IEEE-754 engine; |p·1e8|
  * stays far under 2^53) — and the corpus sums run over exact integers
  * (decimal(38,0) accumulators), so they are associative,
  * order-independent, and engine-reproducible. The gate emits the
  * INTEGER evidence (n, Σq(xᵢxⱼ), Σq(xᵢ), Σq(xⱼ)) rather than any
  * derived double: round 7 proved that `CAST(double AS DECIMAL)` of a
  * COMPUTED product is an engines'-choice rounding boundary (DuckDB and
  * Spark disagreed on ~1 cast in 1e10 — and with ~1.4M casts/run the
  * driver host eventually hit one). The rule is now stated in NOTES:
  * never cast a computed double to decimal in a gate; quantize with
  * floor/int64 instead.
  */
object Pca {

  /** The 1e-8 quantization grid (exactly representable in double). */
  private val Grid = 1e8
  private val SumDec = DecimalType(38, 0)

  /** Upper-triangle covariance EVIDENCE for the leading `d` dims of
    * `vecCol`: one row per (i ≤ j) with integer columns only —
    * n, sxy_q = Σ floor(xᵢxⱼ·1e8), si_q = Σ floor(xᵢ·1e8),
    * sj_q = Σ floor(xⱼ·1e8). The population covariance is the fixed
    * double tree (sxy_q/1e8 − (si_q/1e8)(sj_q/1e8)/n)/n, materialized
    * driver-side by [[covMatrix]] — the gate itself carries no doubles
    * at all, so no engine rounding choice can ever move it. Pair
    * expansion happens INSIDE a per-row higher-order transform
    * (map-only, codegen'd; nothing is joined row-to-row), and the
    * groupBy's partial aggregation bounds per-task state at d(d+1)/2
    * cells — the knob that caps d is executor memory for d² cells, not
    * corpus size. Accumulation runs in decimal(38,0) (exact, overflow-
    * proof at any corpus size); the emitted evidence casts to int64,
    * which holds to ~9e18 — ANSI mode makes a cast past that fail
    * loudly rather than wrap. Contract: d ≤ the vector length — an
    * index past the end yields NULL products that aggregate sums
    * silently skip (identically in both engines, but understated), so
    * the bound is the caller's. */
  def covariance(df: DataFrame, vecCol: String, d: Int): DataFrame = {
    val pairs = flatten(transform(sequence(lit(0), lit(d - 1)), i =>
      transform(sequence(i, lit(d - 1)), j =>
        struct(i.as("i"), j.as("j"),
          floor((element_at(col(vecCol), i + 1).cast("double")
            * element_at(col(vecCol), j + 1).cast("double")) * lit(Grid))
            .as("q")))))
    val sxy = df.select(explode(pairs).as("pr"))
      .groupBy(col("pr.i").as("i"), col("pr.j").as("j"))
      .agg(sum(col("pr.q").cast(SumDec)).as("sxy_dec"))
    val dims = df.select(posexplode(slice(col(vecCol), 1, d))
        .as(Seq("i", "x")))
      .groupBy(col("i"))
      .agg(sum(floor(col("x").cast("double") * lit(Grid)).cast(SumDec))
        .as("sx_dec"))
    val n = df.agg(count(lit(1)).as("n"))
    sxy
      .join(broadcast(dims.select(col("i"), col("sx_dec").as("si"))),
        Seq("i"))
      .join(broadcast(dims.select(col("i").as("j"),
        col("sx_dec").as("sj"))), Seq("j"))
      .crossJoin(broadcast(n))
      .select(col("i"), col("j"), col("n"),
        col("sxy_dec").cast("long").as("sxy_q"),
        col("si").cast("long").as("si_q"),
        col("sj").cast("long").as("sj_q"))
  }

  /** Driver-side dense symmetric matrix from [[covariance]] evidence —
    * a d² bounded collect (the centroid-load class, cited above). Each
    * cell is the fixed IEEE tree over the integer evidence: int64 →
    * double conversion is exact below 2^53 and correctly rounded above,
    * identically everywhere, so the doubles here are bit-reproducible
    * (the q249 oracle replays this exact tree in DuckDB). */
  def covMatrix(cov: DataFrame, d: Int): Array[Array[Double]] = {
    val m = Array.fill(d, d)(0.0)
    cov.select(col("i"), col("j"), col("n"), col("sxy_q"), col("si_q"),
        col("sj_q")).collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val nD = r.getLong(2).toDouble
      val sxy = r.getLong(3).toDouble / Grid
      val si = r.getLong(4).toDouble / Grid
      val sj = r.getLong(5).toDouble / Grid
      val v = (sxy - si * sj / nD) / nD
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

  /** Linear-time MMD² drift (Gretton et al., JMLR 2012 §6): compare
    * each group's embedding distribution against `refValue`'s using the
    * streaming estimator — pair consecutive samples (by id order)
    * within each group, align pair i of the group with pair i of the
    * reference, and average
    *   h_i = k(x₀,x₁) + k(y₀,y₁) − k(x₀,y₁) − k(x₁,y₀).
    * The kernel is the QUADRATIC polynomial k(u,v) = (1 + ⟨u,v⟩/d)² —
    * chosen over the usual RBF deliberately: no transcendental, so
    * every kernel value is a fixed tree of correctly-rounded IEEE ops
    * over element-order dot folds (the q81 parity) and the statistic is
    * bit-reproducible across engines. h values quantize onto the 1e-8
    * grid as int64 via [[mmdHq]] (the covariance floor discipline —
    * never a double→decimal cast), so the corpus sum is an exact
    * associative integer fold.
    *
    * Scale: pairing is one row_number window per group + one equi-join
    * on (i); each h is map-side. The window partitions by GROUP — a
    * low-cardinality key, so at corpus scale run the estimator over a
    * bounded per-group sample first (the statistic converges at ~10⁴
    * pairs; `Sampling`'s stratified samplers compose upstream) rather
    * than sorting a billion-row group. The estimator is O(n), which is
    * the whole point vs the quadratic full MMD. */
  /** Element-order dot product of two float vectors — the q81-parity
    * reproducible fold, shared by the batch and streaming MMD paths. */
  def mmdDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (u, v) => u.cast("double") * v.cast("double")),
      lit(0.0d), (acc, x) => acc + x)

  /** The linear-MMD h term over the four dot columns (dxx, dyy, dxy,
    * dyx): quadratic-kernel arithmetic in a FIXED IEEE tree. */
  def mmdH(d: Int): Column = {
    val dD = lit(d.toDouble)
    def kern(dc: Column): Column = {
      val tA = lit(1.0) + dc / dD
      tA * tA
    }
    (kern(col("dxx")) + kern(col("dyy"))) -
      (kern(col("dxy")) + kern(col("dyx")))
  }

  /** The h term quantized onto the 1e-8 grid as int64 — the same
    * fixed-IEEE-tree discipline as [[covariance]] (floor of a correctly
    * rounded double is identical in every engine; a double→decimal CAST
    * is not — the round-7 q234 lesson). Shared by the batch and
    * streaming MMD paths so their evidence stays bit-compatible. */
  def mmdHq(d: Int): Column = floor(mmdH(d) * lit(Grid))

  /** Exact integer accumulator type shared by the covariance and MMD
    * evidence sums (overflow-proof decimal(38,0) over int64 cells). */
  val QSumDec: DecimalType = SumDec

  /** The quantization grid shared with consumers that fold the integer
    * evidence back to a double statistic (mean = (Σq/1e8)/n). */
  val GridScale: Double = Grid

  def mmdDrift(emb: DataFrame, group: String, id: String, vec: String,
      refValue: Any, d: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(group)).orderBy(col(id).asc)
    val idx = emb.select(col(group), col(id), col(vec))
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .withColumn("i", (col("rn") / 2).cast("long"))
    val ev = idx.filter(col("rn") % 2 === 0)
      .select(col(group), col("i"), col(vec).as("p0"))
    val od = idx.filter(col("rn") % 2 === 1)
      .select(col(group), col("i"), col(vec).as("p1"))
    val pairs = ev.join(od, Seq(group, "i"))
    val ref = pairs.filter(col(group) === lit(refValue))
      .select(col("i"), col("p0").as("y0"), col("p1").as("y1"))
    val oth = pairs.filter(col(group) =!= lit(refValue))
      .select(col(group), col("i"), col("p0").as("x0"),
        col("p1").as("x1"))
    val joined = oth.join(ref, Seq("i"))
      .select(col(group), col("i"),
        mmdDot(col("x0"), col("x1")).as("dxx"),
        mmdDot(col("y0"), col("y1")).as("dyy"),
        mmdDot(col("x0"), col("y1")).as("dxy"),
        mmdDot(col("x1"), col("y0")).as("dyx"))
    joined.select(col(group), mmdHq(d).as("hq"))
      .groupBy(col(group))
      .agg(count(lit(1)).as("n_pairs"),
        round((sum(col("hq").cast(SumDec)).cast("double") / lit(Grid))
          / count(lit(1)).cast("double"), 6).as("mmd2"))
  }

  // ---------------------------------------------------------------------
  // q241_mmd_drift — per-label embedding drift vs label 0 (9 rows).
  // The oracle replays the pairing window, the i-aligned join, all four
  // element-order dot folds, the kernel arithmetic tree, and the
  // decimal-grid mean — a misaligned pair or a regrouped float fold
  // moves the sixth decimal and hash-fails.
  // ---------------------------------------------------------------------
  def q241MmdDrift(s: SparkSession, dir: String): DataFrame =
    mmdDrift(t(s, dir, "embeddings"), "label", "vec_id", "embedding",
      refValue = 0, d = 64)

  val q241MmdDriftSql: String = {
    def dotSql(a: String, b: String): String =
      s"""list_reduce(list_prepend(0.0::DOUBLE,
         |      [CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)
         |       FOR i IN range(1, len($a) + 1)]),
         |      (a, x) -> a + x)""".stripMargin
    def kernSql(dc: String): String =
      s"((1.0 + $dc / 64.0) * (1.0 + $dc / 64.0))"
    s"""WITH idx AS (
       |  SELECT label, embedding,
       |    ROW_NUMBER() OVER (PARTITION BY label ORDER BY vec_id ASC) - 1
       |      AS rn
       |  FROM embeddings),
       |pairs AS (
       |  SELECT e.label, e.i, e.embedding AS p0, o.embedding AS p1
       |  FROM (SELECT label, rn // 2 AS i, embedding FROM idx
       |        WHERE rn % 2 = 0) e
       |  JOIN (SELECT label, rn // 2 AS i, embedding FROM idx
       |        WHERE rn % 2 = 1) o
       |    ON o.label = e.label AND o.i = e.i),
       |dots AS (
       |  SELECT x.label, x.i,
       |    ${dotSql("x.p0", "x.p1")} AS dxx,
       |    ${dotSql("y.p0", "y.p1")} AS dyy,
       |    ${dotSql("x.p0", "y.p1")} AS dxy,
       |    ${dotSql("x.p1", "y.p0")} AS dyx
       |  FROM (SELECT * FROM pairs WHERE label <> 0) x
       |  JOIN (SELECT * FROM pairs WHERE label = 0) y ON y.i = x.i),
       |hs AS (
       |  SELECT label,
       |    CAST(FLOOR(((${kernSql("dxx")} + ${kernSql("dyy")})
       |       - (${kernSql("dxy")} + ${kernSql("dyx")}))
       |      * 100000000.0) AS BIGINT) AS hq
       |  FROM dots)
       |SELECT label, COUNT(*) AS n_pairs,
       |  ROUND(CAST(SUM(CAST(hq AS DECIMAL(38,0))) AS DOUBLE)
       |      / 100000000.0 / CAST(COUNT(*) AS DOUBLE), 6)
       |    AS mmd2
       |FROM hs GROUP BY label""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q234_covariance — the upper-triangle covariance gate over the
  // leading 16 embedding dims (136 cells), INTEGER EVIDENCE ONLY: the
  // oracle replays the pair expansion, the floor(p·1e8) quantization
  // tree, and the exact integer sums cell for cell — a regrouped fold,
  // a 0/1-based indexing slip, or a dropped tie in the triangle
  // enumeration all hash-fail, and no engine rounding choice exists
  // anywhere in the output (the round-7 hash-fail was a
  // CAST(double AS DECIMAL) boundary; floor/int64 has no boundary).
  // ---------------------------------------------------------------------
  def q234Covariance(s: SparkSession, dir: String): DataFrame =
    covariance(t(s, dir, "embeddings"), "embedding", d = 16)

  val q234CovarianceSql: String =
    """WITH pr AS (
      |  SELECT i.i AS i, j.j AS j,
      |    CAST(FLOOR((CAST(e.embedding[i.i + 1] AS DOUBLE)
      |       * CAST(e.embedding[j.j + 1] AS DOUBLE))
      |       * 100000000.0) AS BIGINT) AS q
      |  FROM embeddings e, range(16) i(i), range(16) j(j)
      |  WHERE j.j >= i.i),
      |sxy AS (SELECT i, j, SUM(CAST(q AS DECIMAL(38,0))) AS sxy_dec
      |        FROM pr GROUP BY i, j),
      |sx AS (
      |  SELECT i.i AS i,
      |    SUM(CAST(CAST(FLOOR(CAST(e.embedding[i.i + 1] AS DOUBLE)
      |        * 100000000.0) AS BIGINT) AS DECIMAL(38,0))) AS sx_dec
      |  FROM embeddings e, range(16) i(i) GROUP BY i.i),
      |nn AS (SELECT COUNT(*) AS n FROM embeddings)
      |SELECT CAST(s.i AS INT) AS i, CAST(s.j AS INT) AS j, nn.n,
      |  CAST(s.sxy_dec AS BIGINT) AS sxy_q,
      |  CAST(a.sx_dec AS BIGINT) AS si_q,
      |  CAST(b.sx_dec AS BIGINT) AS sj_q
      |FROM sxy s
      |JOIN sx a ON a.i = s.i
      |JOIN sx b ON b.i = s.j
      |CROSS JOIN nn""".stripMargin

  // ---------------------------------------------------------------------
  // q249_eigen — the top eigenpair of the q234 covariance matrix,
  // oracle-pinned: the DuckDB twin replays the integer covariance
  // evidence, the fixed (Σq/1e8 − …)/n double tree, the deterministic
  // ramp start, and ALL 100 power iterations as unrolled MATERIALIZED
  // CTE stages (the q238 Markov precedent) with j-ordered list folds —
  // every step is correctly-rounded IEEE arithmetic over identical
  // inputs, so the emitted loadings and eigenvalue match BIT-FOR-BIT.
  // This externally pins the driver-side solve projectK/whitening (and
  // SemDeDup-style thresholds) depend on.
  // ---------------------------------------------------------------------
  def q249Eigen(s: SparkSession, dir: String): DataFrame = {
    val d = 16
    val m = covMatrix(covariance(t(s, dir, "embeddings"), "embedding", d), d)
    val (v, lambda) = topEigen(m)
    import s.implicits._
    v.toIndexedSeq.zipWithIndex
      .map { case (x, i) => (i, x, lambda) }
      .toDF("i", "loading", "eigenvalue")
  }

  // ordered fold with an explicit 0.0 seed — the Array.sum /
  // foldLeft(0.0) twin (q241's list_reduce discipline)
  private def fold(expr: String, ord: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list($expr ORDER BY $ord)), (a, x) -> a + x)""".stripMargin

  /** The shared q249 CTE chain: integer covariance evidence →
    * covMatrix's double tree → 100 unrolled power iterations → `v100`
    * (the top eigenvector, bit-identical to the driver's). Reused as
    * the prefix of every oracle that consumes the eigen solve. */
  private val eigenCteChain: String = {
    val d = 16
    val header =
      s"""WITH pr AS (
         |  SELECT i.i AS i, j.j AS j,
         |    CAST(FLOOR((CAST(e.embedding[i.i + 1] AS DOUBLE)
         |       * CAST(e.embedding[j.j + 1] AS DOUBLE))
         |       * 100000000.0) AS BIGINT) AS q
         |  FROM embeddings e, range($d) i(i), range($d) j(j)
         |  WHERE j.j >= i.i),
         |sxy AS (SELECT i, j, SUM(CAST(q AS DECIMAL(38,0))) AS sxy_dec
         |        FROM pr GROUP BY i, j),
         |sx AS (
         |  SELECT i.i AS i,
         |    SUM(CAST(CAST(FLOOR(CAST(e.embedding[i.i + 1] AS DOUBLE)
         |        * 100000000.0) AS BIGINT) AS DECIMAL(38,0))) AS sx_dec
         |  FROM embeddings e, range($d) i(i) GROUP BY i.i),
         |nn AS (SELECT COUNT(*) AS n FROM embeddings),
         |mtri AS (
         |  -- covMatrix's exact double tree over the integer evidence
         |  SELECT CAST(s.i AS INT) AS i, CAST(s.j AS INT) AS j,
         |    (CAST(CAST(s.sxy_dec AS BIGINT) AS DOUBLE) / 100000000.0
         |     - (CAST(CAST(a.sx_dec AS BIGINT) AS DOUBLE) / 100000000.0)
         |       * (CAST(CAST(b.sx_dec AS BIGINT) AS DOUBLE) / 100000000.0)
         |       / CAST(nn.n AS DOUBLE)) / CAST(nn.n AS DOUBLE) AS val
         |  FROM sxy s
         |  JOIN sx a ON a.i = s.i
         |  JOIN sx b ON b.i = s.j
         |  CROSS JOIN nn),
         |m AS MATERIALIZED (
         |  SELECT i, j, val FROM mtri
         |  UNION ALL
         |  SELECT j AS i, i AS j, val FROM mtri WHERE i <> j),
         |v0r AS (
         |  SELECT CAST(t.i AS INT) AS i,
         |    1.0 + CAST(t.i AS DOUBLE) / $d.0 AS val
         |  FROM range($d) t(i)),
         |v0 AS MATERIALIZED (
         |  SELECT i, val / (SELECT SQRT(${fold("val * val", "i")})
         |                   FROM v0r) AS val
         |  FROM v0r)""".stripMargin
    s"$header,\n${iterChain("m", "v", "v0")}"
  }

  /** 100 unrolled power iterations over matrix CTE `mat`, vectors named
    * `<vp>1..<vp>100`, starting from CTE `v0name` — the driver loop's
    * exact fold shapes. Shared by the top-1 (q249) and deflated top-2
    * (q253) oracles. */
  private def iterChain(mat: String, vp: String, v0name: String): String =
    (1 to 100).map { k =>
      val prev = if (k == 1) v0name else s"$vp${k - 1}"
      s"""${vp}w$k AS MATERIALIZED (
         |  SELECT m.i AS i, ${fold("m.val * v.val", "m.j")} AS val
         |  FROM $mat m JOIN $prev v ON v.i = m.j GROUP BY m.i),
         |$vp$k AS MATERIALIZED (
         |  SELECT i, val / (SELECT SQRT(${fold("val * val", "i")})
         |                   FROM ${vp}w$k) AS val
         |  FROM ${vp}w$k)""".stripMargin
    }.mkString(",\n")

  /** Rayleigh-quotient CTEs for `<vp>100` over `mat`: `<vp>mv` (the
    * matrix-vector product) and `<vp>lam` (the eigenvalue). */
  private def rayleigh(mat: String, vp: String): String =
    s"""${vp}mv AS MATERIALIZED (
       |  SELECT m.i AS i, ${fold("m.val * v.val", "m.j")} AS val
       |  FROM $mat m JOIN ${vp}100 v ON v.i = m.j GROUP BY m.i),
       |${vp}lam AS (
       |  SELECT ${fold("v.val * mv.val", "v.i")} AS eigenvalue
       |  FROM ${vp}100 v JOIN ${vp}mv mv ON mv.i = v.i)""".stripMargin

  val q249EigenSql: String =
    s"""$eigenCteChain,
       |${rayleigh("m", "v")}
       |SELECT v.i, v.val AS loading, vlam.eigenvalue
       |FROM v100 v CROSS JOIN vlam""".stripMargin

  // ---------------------------------------------------------------------
  // q252_pca_projection — the whole decomposition pipeline END-TO-END:
  // covariance evidence → driver eigen solve → map-only projection of
  // every embedding onto the top component → per-label quantized mean
  // coordinate. The oracle replays the ENTIRE chain (the q249 CTEs,
  // then per-row element-order projection folds against the replayed
  // eigenvector, then the floor/int64 mean) — this is the external
  // pin on Pca.project (and thereby the projectK/whitening machinery)
  // the r7 verdict asked to exist beyond planted-direction specs.
  // ---------------------------------------------------------------------
  def q252PcaProjection(s: SparkSession, dir: String): DataFrame = {
    val d = 16
    val e = t(s, dir, "embeddings")
    val m = covMatrix(covariance(e, "embedding", d), d)
    val (v, _) = topEigen(m)
    project(e, "embedding", v, "t")
      .select(col("label"), floor(col("t") * lit(Grid)).as("tq"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round((sum(col("tq").cast(SumDec)).cast("double") / lit(Grid))
          / count(lit(1)).cast("double"), 6).as("mean_proj"))
  }

  // ---------------------------------------------------------------------
  // q253_eigen2 — topKEigen's HOTELLING DEFLATION oracle-pinned: the
  // DuckDB twin replays the full top-1 solve (the q249 chain + Rayleigh
  // quotient), deflates m ← m − λ·v·vᵀ with the driver's exact
  // (λ·vᵢ)·vⱼ tree, and runs 100 MORE unrolled iterations from the same
  // ramp start — both eigenpairs match bit-for-bit, so the whole
  // multi-component machinery projectK/whitening composes from is
  // externally verified, not just planted-direction spec'd.
  // ---------------------------------------------------------------------
  def q253Eigen2(s: SparkSession, dir: String): DataFrame = {
    val d = 16
    val m = covMatrix(covariance(t(s, dir, "embeddings"), "embedding", d), d)
    val comps = topKEigen(m, 2)
    import s.implicits._
    comps.zipWithIndex.flatMap { case ((v, lam), c) =>
      v.toIndexedSeq.zipWithIndex.map { case (x, i) => (c, i, x, lam) }
    }.toDF("comp", "i", "loading", "eigenvalue")
  }

  val q253Eigen2Sql: String =
    s"""$eigenCteChain,
       |${rayleigh("m", "v")},
       |m2 AS MATERIALIZED (
       |  -- Hotelling deflation, the driver's exact tree:
       |  -- work(i)(j) -= (lambda * v(i)) * v(j)
       |  SELECT m.i AS i, m.j AS j,
       |    m.val - vlam.eigenvalue * va.val * vb.val AS val
       |  FROM m CROSS JOIN vlam
       |  JOIN v100 va ON va.i = m.i
       |  JOIN v100 vb ON vb.i = m.j),
       |${iterChain("m2", "u", "v0")},
       |${rayleigh("m2", "u")}
       |SELECT 0 AS comp, v.i, v.val AS loading, vlam.eigenvalue
       |FROM v100 v CROSS JOIN vlam
       |UNION ALL
       |SELECT 1 AS comp, u.i, u.val AS loading, ulam.eigenvalue
       |FROM u100 u CROSS JOIN ulam""".stripMargin

  // ---------------------------------------------------------------------
  // q256_whitened_projection — projectK(whiten = true) END-TO-END: both
  // pinned eigenpairs (the q253 chain), per-row 2-component projection,
  // each coordinate scaled by 1/√λ, per-label quantized means. The
  // oracle replays the full chain, the element-order folds against BOTH
  // replayed eigenvectors, the engine-side √λ division (λ doubles are
  // bit-identical per q253; SQRT and division are correctly rounded, so
  // the quotients are too), and the floor/int64 means — the whitening
  // path SemDeDup-style cosine thresholds rely on, externally verified.
  // ---------------------------------------------------------------------
  def q256WhitenedProjection(s: SparkSession, dir: String): DataFrame = {
    val d = 16
    val e = t(s, dir, "embeddings")
    val m = covMatrix(covariance(e, "embedding", d), d)
    val comps = topKEigen(m, 2)
    projectK(e, "embedding", comps, "pc", whiten = true)
      .select(col("label"),
        floor(element_at(col("pc"), 1) * lit(Grid)).as("q0"),
        floor(element_at(col("pc"), 2) * lit(Grid)).as("q1"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round((sum(col("q0").cast(SumDec)).cast("double") / lit(Grid))
          / count(lit(1)).cast("double"), 6).as("mean_pc0"),
        round((sum(col("q1").cast(SumDec)).cast("double") / lit(Grid))
          / count(lit(1)).cast("double"), 6).as("mean_pc1"))
  }

  val q256WhitenedProjectionSql: String = {
    def projQ(vl: String, lam: String): String =
      s"""CAST(FLOOR((CASE WHEN $lam.eigenvalue > 0.0
         |    THEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        [CAST(e.embedding[i] AS DOUBLE) * $vl.v[i]
         |         FOR i IN range(1, 17)]),
         |        (a, x) -> a + x) / SQRT($lam.eigenvalue)
         |    ELSE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        [CAST(e.embedding[i] AS DOUBLE) * $vl.v[i]
         |         FOR i IN range(1, 17)]),
         |        (a, x) -> a + x) END)
         |  * 100000000.0) AS BIGINT)""".stripMargin
    val tail =
      s"""vl0 AS (SELECT list(val ORDER BY i) AS v FROM v100),
         |vl1 AS (SELECT list(val ORDER BY i) AS v FROM u100),
         |proj AS (
         |  SELECT e.label,
         |    ${projQ("vl0", "vlam")} AS q0,
         |    ${projQ("vl1", "ulam")} AS q1
         |  FROM embeddings e
         |  CROSS JOIN vl0 CROSS JOIN vl1
         |  CROSS JOIN vlam CROSS JOIN ulam)
         |SELECT label, COUNT(*) AS n,
         |  ROUND(CAST(SUM(CAST(q0 AS DECIMAL(38,0))) AS DOUBLE)
         |      / 100000000.0 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_pc0,
         |  ROUND(CAST(SUM(CAST(q1 AS DECIMAL(38,0))) AS DOUBLE)
         |      / 100000000.0 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_pc1
         |FROM proj GROUP BY label""".stripMargin
    s"""$eigenCteChain,
       |${rayleigh("m", "v")},
       |m2 AS MATERIALIZED (
       |  SELECT m.i AS i, m.j AS j,
       |    m.val - vlam.eigenvalue * va.val * vb.val AS val
       |  FROM m CROSS JOIN vlam
       |  JOIN v100 va ON va.i = m.i
       |  JOIN v100 vb ON vb.i = m.j),
       |${iterChain("m2", "u", "v0")},
       |${rayleigh("m2", "u")},
       |$tail""".stripMargin
  }

  val q252PcaProjectionSql: String = {
    val tail =
      s"""vlist AS (SELECT list(val ORDER BY i) AS v FROM v100),
         |proj AS (
         |  SELECT e.label,
         |    CAST(FLOOR(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |        [CAST(e.embedding[i] AS DOUBLE) * vl.v[i]
         |         FOR i IN range(1, 17)]),
         |        (a, x) -> a + x) * 100000000.0) AS BIGINT) AS tq
         |  FROM embeddings e CROSS JOIN vlist vl)
         |SELECT label, COUNT(*) AS n,
         |  ROUND(CAST(SUM(CAST(tq AS DECIMAL(38,0))) AS DOUBLE)
         |      / 100000000.0 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_proj
         |FROM proj GROUP BY label""".stripMargin
    s"$eigenCteChain,\n$tail"
  }
}
