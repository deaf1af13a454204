package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order layout: losslessness, Morton-code mechanics, and the pruning
  * property the layout exists for — per-file min/max ranges tight in
  * BOTH clustered dimensions, vs a single-column sort that is tight in
  * one and spans the full domain in the other. */
class LayoutSpec extends SparkSpec {

  private def events = graft.Tables.load(spark, sfDir, "events")

  test("zValue interleaves bits (Morton curve basics)") {
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L))
      .toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y"), 8).as("z"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // z(x,y): x on even bits, y on odd — z(1,0)=1, z(0,1)=2, z(1,1)=3,
    // z(2,3)=0b1110=14
    assert(got.toSet == Set((0L, 0L, 0L), (1L, 0L, 1L), (0L, 1L, 2L),
      (1L, 1L, 3L), (2L, 3L, 14L)))
  }

  test("z-order rewrite is lossless") {
    val dir = Files.createTempDirectory("layout_rt").toString + "/events"
    Layout.zorderWrite(events, "user_id", "ts", dir, numFiles = 8)
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    assert(back.exceptAll(events).isEmpty && events.exceptAll(back).isEmpty)
  }

  test("z-order files are range-tight in both dimensions; ts-sort is not") {
    val n = 8
    val zDir = Files.createTempDirectory("layout_z").toString + "/events"
    Layout.zorderWrite(events, "user_id", "ts", zDir, numFiles = n)
    // the single-column alternative: perfectly clustered on ts only
    val tDir = Files.createTempDirectory("layout_t").toString + "/events"
    events.repartitionByRange(n, col("ts")).sortWithinPartitions("ts")
      .write.mode("overwrite").parquet(tDir)

    // avg per-file (max-min) width of each dimension, normalized by the
    // full domain width — the min/max pruning proxy
    def widths(dir: String): (Double, Double) = {
      val perFile = spark.read.parquet(dir)
        .select(input_file_name().as("f"), col("user_id"),
          col("ts").cast("timestamp").cast("double").as("tsd"))
        .groupBy("f")
        .agg((max("user_id") - min("user_id")).cast("double").as("uw"),
          (max("tsd") - min("tsd")).as("tw"))
        .agg(avg("uw"), avg("tw")).head()
      val dom = spark.read.parquet(dir)
        .agg((max("user_id") - min("user_id")).cast("double"),
          (max(col("ts").cast("timestamp").cast("double")) - min(col("ts").cast("timestamp").cast("double"))))
        .head()
      (perFile.getDouble(0) / dom.getDouble(0),
        perFile.getDouble(1) / dom.getDouble(1))
    }
    val (zU, zT) = widths(zDir)
    val (sU, sT) = widths(tDir)
    // ts-sorted: near-zero ts width, but each file spans ~the whole user
    // domain (users recur constantly through time)
    assert(sU > 0.9, s"ts-sorted user width $sU — fixture assumption broke")
    // z-order: BOTH dimensions clustered — user width far below the
    // single-sort layout, ts width well below the full domain
    assert(zU < 0.6 * sU, s"z user width $zU vs ts-sorted $sU")
    assert(zT < 0.75, s"z ts width $zT")
    assert(zT > sT, "sanity: z-order trades some ts tightness")
  }
}
