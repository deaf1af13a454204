package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{CDTable, TypeLattice}
import graft.sources.TsvSource

/** Beyond-reference canonicalization layer (SURVEY.md §7 step 7): the
  * reference stores gzip TSV only — non-splittable (one scan task per file,
  * `sync-canvas-data-files.py:179,189-193`) and unpartitioned
  * (`'PartitionKeys': []`, `:184`), so every Athena query re-parses whole
  * files of text. This pass rewrites a raw table to Parquet once, making
  * all later scans columnar, splittable, and prunable.
  *
  * Scale rationale: at 100 TB, text re-parse dominates query time and gzip
  * forces task granularity = file granularity (stragglers). Parquet gives
  * row-group splits, column pruning, predicate pushdown, and dictionary/RLE
  * compression — the single highest-leverage change over the reference's
  * layout. Optional `partitionBy` a low-cardinality column adds Catalyst
  * partition pruning.
  */
object Canonicalize {

  val CanonicalPrefix = "canonical"

  def canonicalize(
      spark: SparkSession,
      warehouseDir: String,
      table: CDTable,
      partitionBy: Seq[String] = Nil): String = {
    val raw = TsvSource.read(spark, TypeLattice.toStructType(table),
      s"$warehouseDir/${Sync.RawPrefix}/${table.tableName}")
    val out = s"$warehouseDir/$CanonicalPrefix/${table.tableName}"
    val writer = raw.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(out)
    out
  }

  def readCanonical(spark: SparkSession, warehouseDir: String,
      table: String): DataFrame =
    spark.read.parquet(s"$warehouseDir/$CanonicalPrefix/$table")

  /** Schema-drift detection (SURVEY.md §7 hard parts): the reference's
    * `update_table` is a full-replace — files landed under an older schema
    * silently mis-parse once the column list changes. This scans a raw
    * table and reports, per source file, how many lines don't have exactly
    * the expected field count, so a sync can quarantine stale files
    * instead of serving silently-shifted columns. */
  def validateRaw(spark: SparkSession, warehouseDir: String,
      table: CDTable): DataFrame = {
    import org.apache.spark.sql.functions._
    val expected = table.columns.size
    spark.read.text(s"$warehouseDir/${Sync.RawPrefix}/${table.tableName}")
      .select(input_file_name().as("file"),
        size(split(col("value"), "\t", -1)).as("n_fields"))
      .groupBy(col("file"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("n_fields") =!= expected, 1).otherwise(0))
          .as("n_malformed"))
  }
}
