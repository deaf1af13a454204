package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Source/sink format coverage beyond parquet + TSV: JSON lines and ORC
  * round-trips with schema preservation (SURVEY.md §2B "Sinks" row). */
class FormatsSpec extends SparkSpec {

  private def orders = graft.Tables.load(spark, sfDir, "orders")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))

  test("JSON lines sink/source round-trip") {
    val dir = Files.createTempDirectory("fmt_json").toString + "/o"
    orders.write.mode("overwrite").json(dir)
    val back = spark.read
      .schema("o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE")
      .json(dir)
    assert(back.count() == orders.count())
    val a = orders.orderBy("o_orderkey").collect()
    val b = back.orderBy("o_orderkey").collect()
    assert(a.sameElements(b))
  }

  test("ORC sink/source round-trip") {
    val dir = Files.createTempDirectory("fmt_orc").toString + "/o"
    orders.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == orders.schema)
    assert(back.orderBy("o_orderkey").collect()
      .sameElements(orders.orderBy("o_orderkey").collect()))
  }

  test("percentile_approx tracks exact percentile within 2%") {
    val exact = orders.agg(
      expr("percentile(o_totalprice, 0.5)")).head().getDouble(0)
    val approx = orders.agg(
      expr("percentile_approx(o_totalprice, 0.5, 1000)")).head().getDouble(0)
    assert(math.abs(approx - exact) / exact <= 0.02,
      s"approx $approx vs exact $exact")
  }
}
