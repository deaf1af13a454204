package graft.pipeline

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit}

/** Record-level upsert (MERGE INTO semantics) over an immutable parquet
  * dataset — the record-grained extension of the reference's file-grained
  * change model ("change = new file appears + old file disappears",
  * `sync-canvas-data-files.py:58-67`):
  *
  *   matched-by-key target rows are replaced by the update rows; unmatched
  *   update rows are inserted; everything else is carried over.
  *
  * Implementation is copy-on-write: `target LEFT ANTI updates ∪ updates`
  * rewritten to a temp dir, then swapped in. One shuffle on the key.
  *
  * Swap ordering minimizes the data-loss window: the live dataset is
  * renamed ASIDE first (`path → path.__old`), the rewrite renamed in, and
  * only then is the old dir deleted — at every step at least one complete
  * copy exists, and a failed swap-in restores the old dir. A crash can at
  * worst leave the data under `path.__old` (recovered by [[recoverSwap]],
  * which runs automatically at the start of every merge). Single-statement
  * atomicity needs a manifest pointer or a table format (Iceberg/Delta) —
  * the dataflow (anti-join + union + rewrite) is identical there.
  *
  * Like SQL MERGE, update rows must be key-distinct — a multi-matching
  * source is rejected rather than silently inserting duplicates.
  *
  * At scale, partition the dataset and rewrite only partitions containing
  * update keys (partition pruning on the anti-join side).
  */
object Upsert {

  final case class MergeSummary(updated: Long, inserted: Long, total: Long)

  /** See [[SafeSwap.recover]] — kept as the public API surface. */
  def recoverSwap(spark: SparkSession, path: String): Boolean =
    SafeSwap.recover(path)

  def mergeInto(
      spark: SparkSession,
      path: String,
      updates: DataFrame,
      keys: Seq[String]): MergeSummary = {
    SafeSwap.recover(path)
    val target = spark.read.parquet(path)
    require(target.columns.toSet == updates.columns.toSet,
      s"schema mismatch (by name): ${target.columns.sorted.toSeq} vs " +
        s"${updates.columns.sorted.toSeq}")
    // MERGE semantics: a source row may match at most one way — duplicate
    // update keys would silently multiply rows, so reject them up front.
    val dupKeys = updates.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).limit(1).count()
    require(dupKeys == 0L,
      s"updates contain duplicate merge keys on (${keys.mkString(", ")})")

    val updated = target.join(
      updates.selectExpr(keys: _*).distinct(), keys, "left_semi").count()
    val inserted = updates.join(target, keys, "left_anti").count()
    // total rows observed during the rewrite itself — no post-swap rescan
    val obs = new Observation("merge_total")
    val merged = target.join(updates, keys, "left_anti")
      .unionByName(updates)
      .observe(obs, count(lit(1)).as("total"))

    SafeSwap.replace(path) { tmp =>
      merged.write.mode("overwrite").parquet(tmp)
    }
    MergeSummary(updated, inserted, obs.get("total").asInstanceOf[Long])
  }
}
