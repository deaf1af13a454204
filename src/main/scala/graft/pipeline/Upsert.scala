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

  /** SCD2 (slowly-changing-dimension type 2) history merge: fold a new
    * FULL snapshot into a validity-interval history table.
    *
    * `history` carries the snapshot's columns plus (`valid_from: Long`,
    * `valid_to: Long`, NULL = open); `snapshot` is the complete current
    * state tagged `version`. Semantics per key:
    *  - open row, key present, tracked values unchanged → carried open;
    *  - open row, values changed → closed at `version` + new open row;
    *  - open row, key absent from snapshot → closed (upstream delete);
    *  - new key → inserted open;
    *  - already-closed rows are immutable and carried verbatim.
    *
    * This is the record-grained evolution of the reference's full-replace
    * model (`update_table` keeps no history): the input is still a full
    * snapshot, but the warehouse keeps every version queryable by
    * validity interval (AS-OF reads = `valid_from <= v < valid_to`).
    *
    * Scale: ONE full-outer shuffle join of open-rows vs snapshot on the
    * key plus column-compare projections — no window, no driver state;
    * closed history is concatenated untouched (at 100 TB: a partition-
    * pruned carry-over, since closed partitions never rewrite). */
  def scd2Merge(history: DataFrame, snapshot: DataFrame,
      keys: Seq[String], version: Long): DataFrame = {
    val tracked = snapshot.columns.filterNot(keys.contains).toSeq
    require(tracked.nonEmpty, "snapshot must carry non-key columns")
    val open = history.filter(col("valid_to").isNull)
    val closedRows = history.filter(col("valid_to").isNotNull)

    val o = open.select(
      keys.map(col) ++
        tracked.map(c => col(c).as(s"o_$c")) :+
        col("valid_from").as("o_vf") :+ lit(1).as("in_o"): _*)
    val s = snapshot.withColumn("in_s", lit(1))
    val m = o.join(s, keys, "full_outer")
    val changed = tracked.map(c => !(col(s"o_$c") <=> col(c)))
      .reduce(_ || _)

    def shape(cols: Seq[org.apache.spark.sql.Column]) =
      keys.map(col) ++ cols

    val carried = m.filter(col("in_o") === 1 && col("in_s") === 1 && !changed)
      .select(shape(tracked.map(c => col(s"o_$c").as(c)) :+
        col("o_vf").as("valid_from") :+
        lit(null).cast("long").as("valid_to")): _*)
    val closedNow = m.filter(col("in_o") === 1 &&
        (col("in_s").isNull || changed))
      .select(shape(tracked.map(c => col(s"o_$c").as(c)) :+
        col("o_vf").as("valid_from") :+
        lit(version).as("valid_to")): _*)
    val opened = m.filter(col("in_s") === 1 &&
        (col("in_o").isNull || changed))
      .select(shape(tracked.map(col) :+
        lit(version).as("valid_from") :+
        lit(null).cast("long").as("valid_to")): _*)

    closedRows.select(carried.columns.map(col): _*)
      .unionByName(carried).unionByName(closedNow).unionByName(opened)
  }
}
