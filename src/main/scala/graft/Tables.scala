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

  /** Fact/corpus tables whose downstream compute is heavy enough to need
    * all cores. The driver's test parquet is one row group per file, so a
    * bare scan is a single task no matter the core count — on a real
    * cluster the input would arrive in many splits, and this repartition
    * restores that shape locally. Dim tables stay unspread: they should
    * remain cheap single-partition broadcast candidates. Catalyst pushes
    * filters and column pruning through the repartition to the scan. */
  private val spreadTables =
    Set("lineitem", "orders", "events", "documents", "embeddings")

  /** Gate for the local-harness repartition above. At production scale the
    * scan already arrives in many splits and a blanket repartition is an
    * extra full-network pass of every surviving row — so the default is
    * OFF; the local bench/verify harness opts in. */
  val SpreadScansKey = "spark.graft.spreadScans"

  private def spreadScans(spark: SparkSession): Boolean =
    spark.conf.getOption(SpreadScansKey).exists(_.toBoolean)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df =
      if (name == "events") loadEvents(spark, dir)
      else spark.read.parquet(s"$dir/$name.parquet")
    if (spreadScans(spark) && spreadTables(name))
      df.repartition(spark.sparkContext.defaultParallelism)
    else df
  }

  /** events.ts has shipped as both parquet TIMESTAMP(NANOS) (which Spark's
    * vectorized reader rejects outright — read as raw int64 nanos via the
    * legacy conf) and plain TIMESTAMP(MICROS); adapt to the schema actually
    * on disk. The nanos branch converts with *integer* division —
    * epoch-nanos (~1.7e18) overflows double's 53-bit mantissa, so a float
    * divide there would silently corrupt timestamps. Truncation matches how
    * DuckDB narrows ns → µs. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz")
      case _ => col("ts").cast("timestamp_ntz")
    }
    raw.withColumn("ts", ts)
  }

  /** Last directory registered per session, so repeated SQL-surface calls
    * don't re-list and re-read 10 tables' footers per query. */
  private val registeredDir =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every table as a temp view so `spark.sql` works against the
    * same names DuckDB sees in the oracle. Idempotent per (session, dir):
    * re-registration only happens when the directory changes. The cache
    * entry is written AFTER all views register, so a failure mid-loop
    * (missing file, transient FS error) leaves the session marked
    * unregistered and the next call retries instead of serving missing
    * views. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registeredDir.get(spark) != dir) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registeredDir.put(spark, dir)
    }
}
