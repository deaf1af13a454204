package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.catalyst.catalog.{CatalogColumnStat, CatalogStatistics}
import org.apache.spark.sql.types._

/** Feed MAINTAINED statistics into the session catalog so Catalyst's
  * size-based join selection and the cost-based optimizer plan from
  * real numbers instead of defaults — finishing the catalog the
  * reference's sync half-builds: `sync-canvas-data-files.py:170-235`
  * registers schema+location in Glue but never statistics, so every
  * engine reading that catalog falls back to heuristics. Here the
  * numbers already exist: the incremental profile store
  * ([[graft.operators.Stats.profileSpec]], q97b) maintains rowCount,
  * per-column NDV sketches, null counts, and min/max per sync batch
  * WITHOUT table rescans — this object's job is only to copy them into
  * [[CatalogStatistics]].
  *
  * Why it matters at 100 TB: the raw-layer tables resolve through a
  * custom DataSource ([[graft.sources.lazytsv]]) whose relation reports
  * the conservative default size (`spark.sql.defaultSizeInBytes` =
  * Long.Max), so WITHOUT catalog stats a join against even a 10-row
  * raw dimension plans as a shuffle join — and on multi-table star
  * queries the initial join order is guesswork AQE can only repair
  * after a full wasted pass. With stats, `LogicalRelation.computeStats`
  * prefers the catalog numbers and the initial plan is right.
  *
  * min/max attach only to types whose external-string form Spark can
  * parse back ([[CatalogColumnStat.fromExternalString]]); strings and
  * binaries keep NDV/null/len stats only (the ANALYZE convention).
  */
object CatalogStats {

  final case class ColStat(
      nDistinct: Long,
      nNull: Long,
      min: Option[String] = None,
      max: Option[String] = None,
      avgLen: Option[Long] = None,
      maxLen: Option[Long] = None)

  private def minMaxParseable(dt: DataType): Boolean = dt match {
    case _: NumericType | DateType | TimestampType | TimestampNTZType |
        BooleanType => true
    case _ => false
  }

  /** Default length estimate per type (the ANALYZE fallback shape). */
  private def defaultLen(dt: DataType): Long = dt match {
    case t: NumericType => math.max(1, t.defaultSize).toLong
    case DateType => 4L
    case TimestampType | TimestampNTZType => 8L
    case BooleanType => 1L
    case _ => 20L
  }

  /** Write `rowCount`/`sizeInBytes` (+ per-column stats) for a
    * registered table. One metadata write; no data touched. */
  def push(spark: SparkSession, db: String, table: String,
      rowCount: Long, sizeInBytes: Long,
      cols: Map[String, ColStat] = Map.empty): Unit = {
    val ident = TableIdentifier(table, Some(db))
    val schema = spark.sessionState.catalog.getTableMetadata(ident).schema
    val colStats = cols.flatMap { case (name, cs) =>
      schema.find(_.name == name).map { f =>
        val mmOk = minMaxParseable(f.dataType)
        name -> CatalogColumnStat(
          distinctCount = Some(BigInt(cs.nDistinct)),
          min = if (mmOk) cs.min else None,
          max = if (mmOk) cs.max else None,
          nullCount = Some(BigInt(cs.nNull)),
          avgLen = cs.avgLen.orElse(Some(defaultLen(f.dataType))),
          maxLen = cs.maxLen.orElse(Some(defaultLen(f.dataType))))
      }
    }
    spark.sessionState.catalog.alterTableStats(ident,
      Some(CatalogStatistics(BigInt(sizeInBytes), Some(BigInt(rowCount)),
        colStats)))
    // a cached relation keeps its old Statistics — drop it so the next
    // plan resolves against the fresh numbers
    spark.sessionState.catalog.invalidateCachedTable(ident)
  }

  /** Copy a maintained profile store's numbers into the catalog — the
    * per-sync refresh path ([[graft.Warehouse]] wires it after each
    * profile merge). `sizeInBytes` comes from the caller's file listing
    * (the sync already holds it); everything else reads from the
    * store's ONE partial row, never from the table. */
  def pushFromProfileStore(spark: SparkSession, db: String, table: String,
      storeDir: String, cols: Seq[String], sizeInBytes: Long): Unit = {
    val rows = graft.operators.Stats
      .readProfileStore(spark, storeDir, cols).collect()
    if (rows.isEmpty) return
    val rowCount = rows.head.getAs[Long]("n_rows")
    val colStats = rows.map { r =>
      r.getAs[String]("col_name") -> ColStat(
        nDistinct = r.getAs[Long]("n_distinct"),
        nNull = r.getAs[Long]("n_null"),
        min = Option(r.getAs[String]("min_val")),
        max = Option(r.getAs[String]("max_val")))
    }.toMap
    push(spark, db, table, rowCount, sizeInBytes, colStats)
  }
}
