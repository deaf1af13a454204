package graft.pipeline

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Record-level upsert (MERGE INTO semantics) over an immutable parquet
  * dataset — the record-grained extension of the reference's file-grained
  * change model ("change = new file appears + old file disappears",
  * `sync-canvas-data-files.py:58-67`):
  *
  *   matched-by-key target rows are replaced by the update rows; unmatched
  *   update rows are inserted; everything else is carried over.
  *
  * Implementation is copy-on-write: `target LEFT ANTI updates ∪ updates`
  * rewritten to a temp dir, then swapped in. One shuffle on the key. The
  * swap (delete + rename) is not crash-atomic across both steps — a real
  * deployment layers a table format (Iceberg/Delta) or a manifest pointer
  * over it; the dataflow (anti-join + union + rewrite) is identical there.
  *
  * At scale, partition the dataset and rewrite only partitions containing
  * update keys (partition pruning on the anti-join side).
  */
object Upsert {

  final case class MergeSummary(updated: Long, inserted: Long, total: Long)

  def mergeInto(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keys: Seq[String]): MergeSummary = {
    val target = spark.read.parquet(path)
    require(target.columns.sameElements(updates.columns),
      s"schema mismatch: ${target.columns.toSeq} vs ${updates.columns.toSeq}")

    val updated = target.join(
      updates.selectExpr(keys: _*).distinct(), keys, "left_semi").count()
    val inserted = updates.join(target, keys, "left_anti").count()
    val merged = target.join(updates, keys, "left_anti")
      .unionByName(updates)

    val tmp = s"$path.__merge_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = FileSystem.get(new URI(path), new Configuration())
    val dst = new Path(path)
    fs.delete(dst, true)
    if (!fs.rename(new Path(tmp), dst))
      throw new java.io.IOException(s"merge swap failed for $path")

    MergeSummary(updated, inserted, spark.read.parquet(path).count())
  }
}
