package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incrementally-maintained rollup (a materialized aggregate kept fresh
  * per sync batch) — the aggregate-level analog of the reference's
  * incremental file sync (`sync-canvas-data-files.py:58-67`: only what
  * changed moves): instead of re-aggregating the full fact table after
  * every batch, the store holds MERGEABLE PARTIALS (count + exact
  * decimal sums per group) and each batch folds in with one
  * batch-sized aggregation + a |groups|-sized merge. Re-aggregating
  * 100 TB per day becomes touching O(|batch| + |groups|).
  *
  * Exactness: sums are decimal(30,4) partials (the [[graft.operators.sumDec]]
  * convention), so the merged result is bit-identical to a from-scratch
  * aggregate under any batch arrival order — decimal addition is
  * associative/commutative.
  *
  * Idempotent replay: every batch carries a caller-supplied `batchId`;
  * applied ids are recorded in the store and a replayed id is a no-op —
  * the at-least-once delivery contract of the sync layer cannot
  * double-count. The partial store swaps behind [[SafeSwap]], and the
  * applied-id list lives INSIDE the swapped tree, so partials and the
  * replay ledger move atomically together.
  *
  * SINGLE-WRITER contract: replay-safety assumes one maintenance
  * writer at a time (the sync layer's own model — one daily driver).
  * Two CONCURRENT [[merge]] calls with different batch ids would both
  * pass the ledger check and the later SafeSwap would silently discard
  * the earlier fold; plain rename gives no cross-process compare-and-
  * swap to detect it. Serialize maintenance externally (the scheduler
  * already does); replays of the SAME batch id at any later time are
  * what the ledger protects against, and that protection is exact.
  *
  * Limitations (documented, not hidden): only algebraic aggregates
  * (count/sum — and anything derivable: mean, ratios) are mergeable
  * this way; holistic aggregates (exact median, distinct count) need
  * sketches with their own merge (see q54/q76 for the sketch gates).
  */
object Rollup {

  private def partials(df: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"),
        sumCols.map(c =>
          sum(col(c).cast(DecimalType(30, 4))).as(s"__sum_$c")): _*)

  private def mergePartials(a: DataFrame, groupCols: Seq[String],
      sumCols: Seq[String]): DataFrame =
    a.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__cnt")).as("__cnt"),
        sumCols.map(c =>
          sum(col(s"__sum_$c")).as(s"__sum_$c")): _*)

  /** Create the store from the initial fact snapshot. */
  def init(spark: SparkSession, storeDir: String, df: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String],
      batchId: String): Unit = {
    val p = partials(df, groupCols, sumCols)
    SafeSwap.replace(storeDir) { tmp =>
      p.write.parquet(s"$tmp/partials")
      writeApplied(spark, tmp, Seq(batchId))
    }
  }

  /** Fold one batch into the store. Replaying an applied `batchId` is a
    * no-op (returns false). NOT safe under concurrent writers — see the
    * single-writer contract in the object doc. */
  def merge(spark: SparkSession, storeDir: String, batch: DataFrame,
      groupCols: Seq[String], sumCols: Seq[String],
      batchId: String): Boolean = {
    SafeSwap.recover(storeDir)
    val applied = readApplied(spark, storeDir)
    if (applied.contains(batchId)) return false
    val merged = mergePartials(
      spark.read.parquet(s"$storeDir/partials")
        .unionByName(partials(batch, groupCols, sumCols)),
      groupCols, sumCols)
    SafeSwap.replace(storeDir) { tmp =>
      // the lazy read of the live partials executes inside this write,
      // strictly before SafeSwap renames the old tree aside
      merged.write.parquet(s"$tmp/partials")
      writeApplied(spark, tmp, applied :+ batchId)
    }
    true
  }

  /** Final aggregate view: count + double sums per group (decimal→double
    * cast last, the sumDec convention). */
  def read(spark: SparkSession, storeDir: String,
      sumCols: Seq[String]): DataFrame = {
    SafeSwap.recover(storeDir)
    val p = spark.read.parquet(s"$storeDir/partials")
    val keep = p.columns.filterNot(_.startsWith("__")).toSeq
    p.select(
      keep.map(col) ++ Seq(col("__cnt").as("n")) ++
        sumCols.map(c =>
          col(s"__sum_$c").cast(DoubleType).as(s"sum_$c")): _*)
  }

  private def writeApplied(spark: SparkSession, dir: String,
      ids: Seq[String]): Unit = {
    import spark.implicits._
    ids.toDF("batch_id").coalesce(1).write.parquet(s"$dir/applied")
  }

  private def readApplied(spark: SparkSession, dir: String): Seq[String] =
    spark.read.parquet(s"$dir/applied")
      .collect().map(_.getString(0)).toSeq

  // ---------------------------------------------------------------------
  // q96_rollup_incremental — DERIVED ORACLE for the whole maintenance
  // machinery: init on orders with doc-even keys, merge the odd half as a
  // batch, replay the same batch (must no-op), read the rollup. DuckDB
  // computes the same aggregate over the full table — equality holds iff
  // partial creation, the merge fold, exact decimal carry, AND replay
  // suppression are all correct (a double-applied batch inflates counts
  // and hash-fails).
  // ---------------------------------------------------------------------
  private lazy val gateBase: String =
    java.nio.file.Files.createTempDirectory("graft_rollup_").toString

  def q96RollupIncremental(s: SparkSession, dir: String): DataFrame = {
    val orders = graft.Tables.load(s, dir, "orders")
    val store = s"$gateBase/ru_${dir.hashCode.toHexString}"
    val groupCols = Seq("o_orderstatus")
    val sumCols = Seq("o_totalprice")
    if (!new java.io.File(s"$store.complete").exists()) {
      init(s, store, orders.filter(col("o_orderkey") % 2 === 0),
        groupCols, sumCols, "b0")
      merge(s, store, orders.filter(col("o_orderkey") % 2 === 1),
        groupCols, sumCols, "b1")
      // at-least-once replay: the same batch id must not double-count
      merge(s, store, orders.filter(col("o_orderkey") % 2 === 1),
        groupCols, sumCols, "b1")
      new java.io.File(s"$store.complete").createNewFile()
    }
    read(s, store, sumCols)
  }

  val q96RollupIncrementalSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_o_totalprice
      |FROM orders GROUP BY o_orderstatus""".stripMargin
}
