package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.{CDColumn, CDTable}
import graft.sources.TsvSource

/** The canonical Parquet layer must enable what the reference's layout
  * cannot: partition pruning (reference has `'PartitionKeys': []`) and
  * column pruning. */
class CanonicalizeSpec extends SparkSpec {

  test("partitioned canonical layer prunes partitions and columns") {
    val wh = Files.createTempDirectory("canon_wh").toString
    val orders = graft.Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_year").cast("string").as("o_year"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
          .as("o_orderdate"))
    TsvSource.write(orders.drop("o_year"), s"$wh/raw_files/orders_p")
    // canonicalize with a derived partition column
    val cd = CDTable("orders_p", None, Seq(
      CDColumn("o_orderkey", "bigint"),
      CDColumn("o_totalprice", "double precision"),
      CDColumn("o_orderdate", "datetime")))
    val raw = TsvSource.read(spark,
      graft.model.TypeLattice.toStructType(cd), s"$wh/raw_files/orders_p")
      .withColumn("o_year", year(col("o_orderdate")))
    raw.write.mode("overwrite").partitionBy("o_year")
      .parquet(s"$wh/canonical/orders_p")

    val q = spark.read.parquet(s"$wh/canonical/orders_p")
      .filter(col("o_year") === 1996)
      .select(col("o_orderkey"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition pruning in:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint>"),
      s"expected column-pruned read schema in:\n$plan")
    // pruned read returns exactly the 1996 orders
    val expected = graft.Tables.load(spark, sfDir, "orders")
      .filter(year(col("o_orderdate")) === 1996).count()
    assert(q.count() == expected)
  }
}
