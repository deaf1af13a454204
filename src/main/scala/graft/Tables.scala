package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Mirrors the reference's catalog-resolved table access
  * (`sync-canvas-data-files.py:223-235` resolves tables by name via Glue);
  * here the "catalog" is a directory of parquet files keyed by table name.
  * Schemas are known (FIXTURES.md) and parquet carries them — never inferred
  * from data sampling, matching the reference's pushed-schema model
  * (`sync-canvas-data-files.py:116-118`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so `spark.sql` works against the
    * same names DuckDB sees in the oracle. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
