package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.CDTable
import graft.pipeline.{Canonicalize, Sync}

/** The user-facing facade: what a reference deployment migrates to.
  *
  * The reference gives its users two things: a daily sync that lands Canvas
  * extracts + keeps the catalog current (`sync-canvas-data-files.py`), and
  * a SQL-queryable warehouse (Athena over the Glue catalog). This class is
  * both, in-process:
  *
  * {{{
  *   val wh = new Warehouse(spark, Warehouse.Config("/data/warehouse"))
  *   val summary = wh.sync(manifest, schema)        // cron this daily
  *   wh.sql("SELECT ... FROM canvasdata.course_dim JOIN ...")
  * }}}
  */
object Warehouse {
  final case class Config(
      warehouseDir: String,
      db: String = "canvasdata",
      dryRun: Boolean = false,
      parallelism: Int = 32,
      /** also rewrite synced tables to the splittable Parquet canonical
        * layer (beyond-reference; recommended for analytic workloads) */
      canonicalize: Boolean = false,
      /** Summary notification hook — the reference publishes every sync
        * summary to an SNS email topic (`sync-canvas-data-files.py:141-145`,
        * topic `cloud_formation/canvas_data_aws.yaml:68-78`); plug a mailer/
        * webhook here. Default logs at INFO. */
      onSummary: Sync.SyncSummary => Unit = logSummary)

  /** Default notification sink: structured log line (the SNS analog when no
    * transport is configured). */
  def logSummary(s: Sync.SyncSummary): Unit =
    org.slf4j.LoggerFactory.getLogger(classOf[Warehouse]).info(
      s"sync summary: total=${s.totalFiles} fetched=${s.fetched} " +
        s"skipped=${s.skipped} removed=${s.removed} failed=${s.failed} " +
        s"tablesCreated=${s.tablesCreated} tablesUpdated=${s.tablesUpdated} " +
        s"dryRun=${s.dryRun}" +
        (if (s.failedKeys.nonEmpty)
           s" failedKeys=${s.failedKeys.mkString(",")}" else ""))
}

final class Warehouse(spark: SparkSession, cfg: Warehouse.Config) {

  /** One sync run: diff → fetch → stale-delete → catalog upsert (+ optional
    * canonicalize) → summary notification. Idempotent; re-running
    * converges. */
  def sync(manifest: Seq[Sync.ManifestEntry],
      schema: Seq[CDTable]): Sync.SyncSummary = {
    val summary = Sync.run(spark, cfg.warehouseDir, manifest, schema,
      cfg.db, cfg.dryRun, cfg.parallelism)
    // the summary describes the sync — notify unconditionally (the
    // reference publishes to SNS before anything else can fail), even if
    // the optional canonical refresh below throws
    try {
      if (cfg.canonicalize && !cfg.dryRun)
        // incremental: unchanged tables cost one file listing, no rewrite
        schema.foreach(t =>
          Canonicalize.canonicalizeIncremental(spark, cfg.warehouseDir, t))
    } finally cfg.onSummary(summary)
    summary
  }

  /** Analyst SQL over the synced catalog — the Athena replacement. */
  def sql(query: String): DataFrame = spark.sql(query)

  /** Catalog-resolved table access (raw TSV layer). */
  def table(name: String): DataFrame = spark.table(s"${cfg.db}.`$name`")

  /** Canonical (Parquet) layer access, if enabled. */
  def canonicalTable(name: String): DataFrame =
    Canonicalize.readCanonical(spark, cfg.warehouseDir, name)
}
