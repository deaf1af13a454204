package graft.streaming

import graft.SparkSpec
import graft.operators.Pca
import org.apache.spark.sql.functions._

class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._

  private def lcg(seed: Long): Iterator[Double] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
      .drop(1).map(s => ((s >>> 11).toDouble / (1L << 53).toDouble) - 0.5)

  private val d = 6

  /** labels: 0 = reference (nRef rows), 1 and 2 = monitored groups. */
  private def fixture(nRef: Int, nGrp: Int, shift2: Float = 0.5f) = {
    val r = lcg(23L)
    def vec(off: Float) = (0 until d).map(_ => (r.next() * 2.0).toFloat + off)
    val rows =
      (0 until nRef).map(i => (i.toLong, 0, vec(0f))) ++
      (0 until nGrp).map(i => (1000L + i, 1, vec(0f))) ++
      (0 until nGrp).map(i => (2000L + i, 2, vec(shift2)))
    rows.toDF("vec_id", "label", "embedding")
  }

  private def newStore(): String =
    java.nio.file.Files.createTempDirectory("dmspec_").toString + "/s"

  private def fold(store: String, df: org.apache.spark.sql.DataFrame,
      chunks: Seq[org.apache.spark.sql.DataFrame]): Unit = {
    DriftMonitor.buildReference(df.filter(col("label") === 0),
      "vec_id", "embedding", store)
    val sink = DriftMonitor.foreachBatchSink(store, "label", "vec_id",
      "embedding", d)
    chunks.zipWithIndex.foreach { case (c, i) => sink(c, i.toLong) }
  }

  private def readMap(store: String): Map[Int, (Long, Double)] =
    DriftMonitor.read(spark, store).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2)))).toMap

  test("one batch equals the batch operator when the reference is wide enough") {
    val df = fixture(nRef = 60, nGrp = 30) // 15 pairs < m = 30: no rotation
    val stream = df.filter(col("label") =!= 0)
    val store = newStore()
    fold(store, df, Seq(stream))
    val batch = Pca.mmdDrift(df, "label", "vec_id", "embedding",
        refValue = 0, d = d)
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(readMap(store) == batch)
  }

  test("odd-boundary chopping is invisible: 1-batch ≡ 3-batch (carry rows)") {
    val df = fixture(nRef = 60, nGrp = 31) // odd group sizes force carries
    val stream = df.filter(col("label") =!= 0)
    val one = newStore()
    fold(one, df, Seq(stream))
    val three = newStore()
    // boundaries at odd per-group offsets: 7 and 20 rows into each group
    fold(three, df, Seq(
      stream.filter(col("vec_id") % 1000 < 7),
      stream.filter(col("vec_id") % 1000 >= 7 && col("vec_id") % 1000 < 20),
      stream.filter(col("vec_id") % 1000 >= 20)))
    assert(readMap(one) == readMap(three))
    // 31 rows → 15 complete pairs, one carried row never scores
    assert(readMap(one)(1)._1 == 15L)
  }

  test("reference rotation: more pairs than m still scores every pair") {
    val df = fixture(nRef = 10, nGrp = 24) // m = 5, group pairs = 12
    val stream = df.filter(col("label") =!= 0)
    val one = newStore()
    fold(one, df, Seq(stream))
    val two = newStore()
    fold(two, df, Seq(
      stream.filter(col("vec_id") % 1000 < 9),
      stream.filter(col("vec_id") % 1000 >= 9)))
    assert(readMap(one) == readMap(two))
    assert(readMap(one)(1)._1 == 12L)
  }

  test("replaying a micro-batch id is a no-op (ledger exactly-once)") {
    val df = fixture(nRef = 40, nGrp = 20)
    val stream = df.filter(col("label") =!= 0)
    val store = newStore()
    DriftMonitor.buildReference(df.filter(col("label") === 0),
      "vec_id", "embedding", store)
    val sink = DriftMonitor.foreachBatchSink(store, "label", "vec_id",
      "embedding", d)
    val c1 = stream.filter(col("vec_id") % 1000 < 10)
    val c2 = stream.filter(col("vec_id") % 1000 >= 10)
    sink(c1, 0L)
    sink(c2, 1L)
    val before = readMap(store)
    sink(c1, 0L) // redelivery
    sink(c2, 1L)
    assert(readMap(store) == before)
  }

  test("crash between placement and ledger mark converges on redelivery") {
    val df = fixture(nRef = 40, nGrp = 21)
    val stream = df.filter(col("label") =!= 0)
    val c1 = stream.filter(col("vec_id") % 1000 < 11) // odd: leaves a carry
    val c2 = stream.filter(col("vec_id") % 1000 >= 11)
    val clean = newStore()
    fold(clean, df, Seq(c1, c2))
    val crashed = newStore()
    DriftMonitor.buildReference(df.filter(col("label") === 0),
      "vec_id", "embedding", crashed)
    val sink = DriftMonitor.foreachBatchSink(crashed, "label", "vec_id",
      "embedding", d)
    sink(c1, 0L)
    sink(c2, 1L)
    // simulate a crash AFTER batch 1's files landed but BEFORE its
    // ledger mark: delete the marker, leaving orphaned tagged evidence
    val marker = new java.io.File(s"$crashed/evidence/_applied/stream1")
    assert(marker.exists(), "ledger marker expected")
    assert(marker.delete())
    // redelivery must clear the orphaned placement BEFORE deriving
    // offsets (else batch 1's own evidence double-counts into them)
    sink(c2, 1L)
    assert(readMap(crashed) == readMap(clean))
  }

  test("pre-quantization evidence format (column sum_h) is refused, " +
      "never silently folded at the wrong scale") {
    val store = newStore()
    val df = fixture(nRef = 20, nGrp = 10)
    DriftMonitor.buildReference(df.filter(col("label") === 0),
      "vec_id", "embedding", store)
    // an old-format store: raw-double-era sums under the superseded name
    Seq((1, 0L, 10L, 5L, 0.123d))
      .toDF("g", "seq", "n_rows", "n_pairs", "sum_h")
      .coalesce(1).write.parquet(s"$store/evidence")
    val e = intercept[IllegalArgumentException] {
      DriftMonitor.read(spark, store).collect()
    }
    assert(e.getMessage.contains("sum_h"), e.getMessage)
    // the resume path refuses too (a batch folding onto mixed scales)
    val sink = DriftMonitor.foreachBatchSink(store, "label", "vec_id",
      "embedding", d)
    intercept[IllegalArgumentException] {
      sink(df.filter(col("label") =!= 0), 7L)
    }
  }

  test("the shifted group drifts; the same-distribution group does not") {
    val df = fixture(nRef = 200, nGrp = 100, shift2 = 0.8f)
    val store = newStore()
    fold(store, df, Seq(df.filter(col("label") =!= 0)))
    val got = readMap(store)
    assert(math.abs(got(1)._2) < 0.2, s"same-dist drift ${got(1)._2}")
    assert(got(2)._2 > 0.5, s"shifted drift ${got(2)._2}")
  }
}
