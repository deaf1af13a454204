package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Snapshot diff — classify the churn between two versions of a
  * table. The validation primitive a daily-sync warehouse runs after
  * every load (the reference's sync reports only file-level adds/skips,
  * `lambda/sync-canvas-data-files.py:60-76`; this is the row-level
  * generalization): which keys appeared, which vanished, which rows
  * changed in place.
  *
  * Scale design: ONE full-outer shuffle join on the key — at warehouse
  * scale both snapshot versions live bucketed on the same key
  * (`Layout.bucketize`), so the exchange collapses to a zero-shuffle
  * sort-merge; the output is O(churn), never O(table). The change
  * predicate is a null-safe column comparison evaluated inside the
  * join's codegen stage — no second pass, no row hashing that would
  * false-positive on logically-equal-but-differently-encoded values.
  */
object Snapshot {

  /** Rows of `cur` vs `prev` keyed on `keys`, classified as `added`
    * (key only in cur), `removed` (key only in prev) or `changed`
    * (key in both, some compare column differs null-safely). Unchanged
    * rows are dropped. Returns the key columns + `change`, plus each
    * compare column's previous/current value as `p_<col>` / `c_<col>`
    * (NULL on the absent side) so a caller can audit the actual delta.
    * Keys must be non-null (standard PK contract). */
  def snapshotDiff(prev: DataFrame, cur: DataFrame, keys: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "snapshotDiff needs at least one key column")
    val p = prev.select(
      keys.map(col) ++ cols.map(c => col(c).as(s"p_$c"))
        :+ lit(1).as("p_present"): _*)
    val c2 = cur.select(
      keys.map(col) ++ cols.map(c => col(c).as(s"c_$c"))
        :+ lit(1).as("c_present"): _*)
    val differs: Column = cols
      .map(c => !(col(s"p_$c") <=> col(s"c_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    p.join(c2, keys, "full_outer")
      .withColumn("change",
        when(col("p_present").isNull, lit("added"))
          .when(col("c_present").isNull, lit("removed"))
          .when(differs, lit("changed")))
      .filter(col("change").isNotNull)
      .select(keys.map(col) ++ Seq(col("change"))
        ++ cols.map(c => col(s"p_$c")) ++ cols.map(c => col(s"c_$c")): _*)
  }

  // ---------------------------------------------------------------------
  // q108_snapshot_diff — the gate derives two deterministic versions of
  // `orders` (drop every 11th key from prev → those read as added; drop
  // every 7th from cur → removed; bump every 5th's total price in cur →
  // changed) and folds the classified churn to per-class counts and an
  // exact key checksum. Integer/decimal-exact end to end.
  // ---------------------------------------------------------------------
  def q108SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val prev = o.filter(col("o_orderkey") % 11 =!= 0)
    val cur = o.filter(col("o_orderkey") % 7 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 5 === 0, col("o_totalprice") + lit(1.0d))
          .otherwise(col("o_totalprice")))
    snapshotDiff(prev, cur, Seq("o_orderkey"),
        Seq("o_totalprice", "o_orderstatus"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("key_sum"))
  }

  val q108SnapshotDiffSql: String =
    """WITH prev AS (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 11 <> 0),
      |cur AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |diff AS (
      |  SELECT COALESCE(p.o_orderkey, c.o_orderkey) AS o_orderkey,
      |    CASE WHEN p.o_orderkey IS NULL THEN 'added'
      |         WHEN c.o_orderkey IS NULL THEN 'removed'
      |         WHEN p.o_totalprice IS DISTINCT FROM c.o_totalprice
      |           OR p.o_orderstatus IS DISTINCT FROM c.o_orderstatus
      |           THEN 'changed' END AS change
      |  FROM prev p FULL OUTER JOIN cur c USING (o_orderkey))
      |SELECT change, COUNT(*) AS n,
      |  CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
      |FROM diff WHERE change IS NOT NULL
      |GROUP BY change""".stripMargin
}
