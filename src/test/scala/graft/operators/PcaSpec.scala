package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic LCG in [-0.5, 0.5) — no library RNG, reruns identical. */
  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  /** n vectors = s·u + small noise: top principal component ≈ u. */
  private def planted(n: Int, d: Int): (Seq[(Long, Seq[Float])], Array[Double]) = {
    val u0 = Array.tabulate(d)(i => math.sin(i + 1.0))
    val un = math.sqrt(u0.map(x => x * x).sum)
    val u = u0.map(_ / un)
    val r = lcg(42L)
    val rows = (0 until n).map { k =>
      val s = r.next() * 4.0 // spread along u dominates the noise
      (k.toLong, (0 until d).map(i => (s * u(i) + 0.05 * r.next()).toFloat))
    }
    (rows, u)
  }

  test("covariance evidence: bit-equal to a local floor-quantized replay; " +
      "covMatrix matches brute-force covariance") {
    val (rows, _) = planted(200, 5)
    val df = rows.toDF("vec_id", "embedding")
    val cov = Pca.covariance(df, "embedding", 5)
    val got = cov.collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == 15) // upper triangle of 5x5
    val xs = rows.map(_._2.map(_.toDouble).toArray)
    def q(p: Double): Long = math.floor(p * 1e8).toLong
    for (((i, j), (cnt, sxy, si, sj)) <- got) {
      assert(cnt == 200L)
      // the evidence is EXACT integers — equality, not tolerance
      assert(sxy == xs.map(x => q(x(i) * x(j))).sum, s"sxy_q ($i,$j)")
      assert(si == xs.map(x => q(x(i))).sum, s"si_q ($i,$j)")
      assert(sj == xs.map(x => q(x(j))).sum, s"sj_q ($i,$j)")
    }
    val m = Pca.covMatrix(cov, 5)
    val n = xs.length.toDouble
    for (i <- 0 until 5; j <- 0 until 5) {
      val sxy = xs.map(x => x(i) * x(j)).sum
      val expect = (sxy - xs.map(_(i)).sum * xs.map(_(j)).sum / n) / n
      assert(math.abs(m(i)(j) - expect) < 1e-5, s"cell ($i,$j)")
    }
  }

  test("covariance: exact integer sums are partitioning-invariant") {
    val (rows, _) = planted(300, 4)
    def run(parts: Int) =
      Pca.covariance(rows.toDF("vec_id", "embedding").repartition(parts),
          "embedding", 4)
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          ((r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    val a = run(1)
    val b = run(7)
    assert(a.size == 10 && a.forall { case (k, v) => b(k) == v })
  }

  test("topEigen recovers the planted direction; eigenvalue = projected variance") {
    val d = 8
    val (rows, u) = planted(500, d)
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.covMatrix(Pca.covariance(df, "embedding", d), d)
    val (v, lambda) = Pca.topEigen(m)
    val cosine = math.abs(v.zip(u).map { case (a, b) => a * b }.sum)
    assert(cosine > 0.99, s"|cos(v, planted)| = $cosine")
    // population variance of the projections equals the eigenvalue
    val proj = Pca.project(df, "embedding", v, "t")
      .select(col("t")).collect().map(_.getDouble(0))
    val mean = proj.sum / proj.length
    val varP = proj.map(x => (x - mean) * (x - mean)).sum / proj.length
    assert(math.abs(varP - lambda) / lambda < 0.02,
      s"var=$varP lambda=$lambda")
    // and it dominates any single coordinate's variance
    assert(lambda >= (0 until d).map(i => m(i)(i)).max - 1e-9)
  }

  test("topKEigen: deflation yields orthogonal, eigenvalue-descending pairs") {
    // two planted orthogonal directions with different spreads
    val d = 6
    val u1 = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 else 0.0)
    val u2 = Array.tabulate(d)(i => if (i % 2 == 1) 1.0 else 0.0)
    val n1 = math.sqrt(u1.map(x => x * x).sum)
    val n2 = math.sqrt(u2.map(x => x * x).sum)
    val r = lcg(7L)
    val rows = (0 until 400).map { k =>
      val s1 = r.next() * 6.0
      val s2 = r.next() * 2.0
      (k.toLong, (0 until d).map(i =>
        (s1 * u1(i) / n1 + s2 * u2(i) / n2 + 0.02 * r.next()).toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val m = Pca.covMatrix(Pca.covariance(df, "embedding", d), d)
    val comps = Pca.topKEigen(m, 2)
    val (v1, l1) = comps(0)
    val (v2, l2) = comps(1)
    assert(l1 > l2 && l2 > 0.0, s"eigenvalues not descending: $l1, $l2")
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-6, s"components not orthogonal: $dot")
    def align(v: Array[Double], u: Array[Double]) = {
      val un = math.sqrt(u.map(x => x * x).sum)
      math.abs(v.zip(u).map { case (a, b) => a * b / un }.sum)
    }
    assert(align(v1, u1) > 0.99 && align(v2, u2) > 0.99)
    // whitened projections have ~unit variance along BOTH components
    val proj = Pca.projectK(df, "embedding", comps, "pc", whiten = true)
      .select(col("pc")).collect().map(_.getSeq[Double](0))
    for (c <- 0 to 1) {
      val xs = proj.map(_(c))
      val mean = xs.sum / xs.length
      val v = xs.map(x => (x - mean) * (x - mean)).sum / xs.length
      assert(math.abs(v - 1.0) < 0.05, s"component $c whitened var = $v")
    }
  }

  test("mmdDrift: near zero for identical distributions, large under shift") {
    val d = 8
    val r = lcg(11L)
    def vec() = (0 until d).map(_ => (r.next() * 2.0).toFloat)
    // groups 0 (ref) and 1 from the SAME distribution; group 2 shifted
    val rows =
      (0 until 400).map(i => (i.toLong, 0, vec())) ++
      (0 until 400).map(i => (i.toLong + 1000, 1, vec())) ++
      (0 until 400).map(i => (i.toLong + 2000, 2,
        vec().map(x => x + 0.8f)))
    val df = rows.toDF("vec_id", "label", "embedding")
    val got = Pca.mmdDrift(df, "label", "vec_id", "embedding",
        refValue = 0, d = d)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1, 2))
    assert(got(1)._1 == 200L && got(2)._1 == 200L)
    assert(math.abs(got(1)._2) < 0.1, s"same-dist mmd2 = ${got(1)._2}")
    assert(got(2)._2 > 10 * math.abs(got(1)._2) && got(2)._2 > 0.3,
      s"shifted mmd2 = ${got(2)._2}")
  }

  test("mmdDrift: bit-exact vs a local reference on the same pairing") {
    // the statistic is a fixed IEEE tree (no transcendental, no
    // unordered fold) — a plain local replay must match EXACTLY
    val d = 4
    val r = lcg(17L)
    val rows = (0 until 100).map(i => (i.toLong, i % 2,
      (0 until d).map(_ => (r.next() * 2.0).toFloat)))
    val got = Pca.mmdDrift(rows.toDF("vec_id", "label", "embedding"),
        "label", "vec_id", "embedding", refValue = 0, d = d)
      .head()
    def dot(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).foldLeft(0.0) { case (acc, (u, v)) =>
        acc + u.toDouble * v.toDouble }
    def kern(s: Double) = { val t = 1.0 + s / d.toDouble; t * t }
    val byLbl = rows.groupBy(_._2).view
      .mapValues(_.sortBy(_._1).map(_._3)).toMap
    val ys = byLbl(0).grouped(2).filter(_.size == 2).toList
    val xs = byLbl(1).grouped(2).filter(_.size == 2).toList
    val hs = xs.zip(ys).map { case (x, y) =>
      val h = (kern(dot(x(0), x(1))) + kern(dot(y(0), y(1)))) -
        (kern(dot(x(0), y(1))) + kern(dot(x(1), y(0))))
      math.floor(h * 1e8).toLong // the mmdHq fixed IEEE tree
    }
    val mean = (hs.sum.toDouble / 1e8) / hs.size.toDouble
    val expect = new java.math.BigDecimal(java.lang.Double.toString(mean))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(got.getLong(1) == hs.size.toLong)
    assert(got.getDouble(2) == expect,
      s"got ${got.getDouble(2)} expect $expect")
  }

  test("mmdDrift: decimal-grid mean is partitioning-invariant") {
    val r = lcg(13L)
    val rows = (0 until 300).map(i => (i.toLong, i % 3,
      (0 until 6).map(_ => (r.next() * 2.0).toFloat)))
    def run(parts: Int) = Pca.mmdDrift(
        rows.toDF("vec_id", "label", "embedding").repartition(parts),
        "label", "vec_id", "embedding", refValue = 0, d = 6)
      .collect().map(r => r.getInt(0) -> r.getDouble(2)).toMap
    assert(run(1) == run(7))
  }

  test("project is map-only: no exchange in the physical plan") {
    val (rows, _) = planted(50, 4)
    val plan = Pca.project(rows.toDF("vec_id", "embedding"), "embedding",
        Array(0.5, 0.5, 0.5, 0.5), "t")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
