package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.CatalogSync
import graft.model.{CDColumn, CDTable}
import graft.pipeline.Canonicalize
import graft.sources.TsvSource

/** Ingestion-path queries for the correctness gate: run real data through
  * the reference's storage contract (gzip TSV + pushed schema + catalog)
  * and prove the round-trip is lossless by aggregating the result against
  * an oracle that reads the original parquet.
  */
object Ingest {

  private val customerCd = CDTable("customer_rt", Some("round-trip customer"),
    Seq(
      CDColumn("c_custkey", "bigint", None, Some("pk")),
      CDColumn("c_name", "varchar", Some(64)),
      CDColumn("c_nationkey", "integer"),
      CDColumn("c_acctbal", "double precision"),
      CDColumn("c_mktsegment", "enum")))

  // ---------------------------------------------------------------------
  // q50_tsv_roundtrip — customer → gzip TSV (LazySimpleSerDe layout) →
  // catalog external table → aggregate. Exercises TsvSource.write, the
  // CREATE TABLE ... USING graft.sources.lazytsv descriptor, catalog
  // resolution, and the type lattice; values must survive text round-trip
  // bit-exactly (Double.toString/parse is an identity round-trip).
  // ---------------------------------------------------------------------
  def q50TsvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val wh = Files.createTempDirectory("graft_rt").toString
    val customer = t(s, dir, "customer")
    TsvSource.write(customer, s"$wh/raw_files/customer_rt")
    CatalogSync.createOrUpdateTable(s, "graft_rt", customerCd,
      s"$wh/raw_files/customer_rt")
    s.table("graft_rt.customer_rt")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n_customers"),
        sumDec(col("c_acctbal")).as("sum_bal"),
        min(col("c_custkey")).as("min_key"),
        max(col("c_custkey")).as("max_key"))
  }

  val q50TsvRoundtripSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal,
      |  MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------------
  // q51_canonicalize — orders → gzip TSV raw layer → Canonicalize (Parquet
  // rewrite) → aggregate from the canonical layer. Proves the
  // beyond-reference columnar layer is lossless, including timestamp text
  // round-trip.
  // ---------------------------------------------------------------------
  /** Shared q51/q83 fixture: orders → gzip TSV raw layer → canonical
    * parquet. Returns (warehouseDir, canonical path). */
  private def canonicalOrdersFixture(s: SparkSession,
      dir: String): (String, String) = {
    val wh = Files.createTempDirectory("graft_canon").toString
    val orders = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        // timestamp → text in an engine-neutral format
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss")
          .as("o_orderdate"),
        col("o_orderpriority"))
    TsvSource.write(orders, s"$wh/raw_files/orders_rt")
    val cd = CDTable("orders_rt", None, Seq(
      CDColumn("o_orderkey", "bigint"),
      CDColumn("o_custkey", "bigint"),
      CDColumn("o_orderstatus", "text"),
      CDColumn("o_totalprice", "double precision"),
      CDColumn("o_orderdate", "datetime"),
      CDColumn("o_orderpriority", "text")))
    (wh, Canonicalize.canonicalize(s, wh, cd))
  }

  private def ordersYearAgg(df: DataFrame): DataFrame =
    df.groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice")).as("spend"))

  def q51Canonicalize(s: SparkSession, dir: String): DataFrame = {
    val (wh, _) = canonicalOrdersFixture(s, dir)
    ordersYearAgg(Canonicalize.readCanonical(s, wh, "orders_rt"))
  }

  val q51CanonicalizeSql: String =
    """SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
      |  o_orderstatus,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE) AS spend
      |FROM orders GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------------
  // q83_canonical_catalog — the canonical layer resolved BY NAME through
  // the session catalog (Warehouse.sync's registerCanonicalView path):
  // same data as q51 but read via spark.table("<db>.orders_rt_canonical")
  // instead of the parquet path, so the view registration, name
  // resolution, and view→path indirection are inside the oracle check.
  // ---------------------------------------------------------------------
  def q83CanonicalCatalog(s: SparkSession, dir: String): DataFrame = {
    val (_, path) = canonicalOrdersFixture(s, dir)
    CatalogSync.registerCanonicalView(s, "graft_gate", "orders_rt", path)
    ordersYearAgg(s.table("graft_gate.orders_rt_canonical"))
  }

  val q83CanonicalCatalogSql: String = q51CanonicalizeSql

  // ---------------------------------------------------------------------
  // q75_jsonl_roundtrip — JSON-lines interchange: documents → JSONL sink →
  // schema'd JSONL source → aggregate; the oracle reads the original
  // parquet, so any escaping/encoding loss in either direction fails the
  // hash. The read side declares its schema explicitly — schema-on-read
  // inference is a full extra pass over the data at scale (and
  // nondeterministic under sampling), so production JSONL readers always
  // pin the schema. Both sides are splittable line-oriented text, so the
  // round-trip parallelizes per-file/per-split like the TSV path (q50).
  // ---------------------------------------------------------------------
  def q75JsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val wh = Files.createTempDirectory("graft_jsonl").toString
    t(s, dir, "documents").write.mode("overwrite")
      .json(s"$wh/documents_jsonl")
    val back = s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .json(s"$wh/documents_jsonl")
    back.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("text")).cast("long")).as("sum_len"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))
  }

  val q75JsonlRoundtripSql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(SUM(len(text)) AS BIGINT) AS sum_len,
      |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
      |FROM documents GROUP BY source""".stripMargin

  // ---------------------------------------------------------------------
  // q93_orc_roundtrip — ORC sink/source: the third columnar-adjacent
  // format of the storage surface (gzip-TSV q50, JSONL q75, parquet
  // everywhere). Written with zstd + bloom filters on the key column —
  // the knobs an ORC-based warehouse actually sets (predicate pushdown
  // consumes the blooms the same way parquet consumes min/max). The gate
  // aggregates the read-back against the original parquet table, so any
  // type mangling (timestamps, longs) or row loss in either direction
  // hash-fails. Both sides splittable stripes — per-split parallel scans
  // at any scale.
  // ---------------------------------------------------------------------
  def q93OrcRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val wh = Files.createTempDirectory("graft_orc").toString
    t(s, dir, "orders").write.mode("overwrite")
      .option("compression", "zstd")
      .option("orc.bloom.filter.columns", "o_orderkey")
      .orc(s"$wh/orders_orc")
    s.read.orc(s"$wh/orders_orc")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        sumDec(col("o_totalprice")).as("sum_price"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        countDistinct(col("o_custkey")).as("n_custs"))
  }

  val q93OrcRoundtripSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
      |FROM orders GROUP BY o_orderstatus""".stripMargin

  // ---------------------------------------------------------------------
  // q77_zorder_roundtrip — Z-order layout rewrite is lossless: events →
  // Morton-clustered parquet on (user_id, ts) → aggregate; the oracle
  // reads the original parquet. The layout's pruning value (per-file
  // min/max ranges tight in BOTH dimensions) is asserted in LayoutSpec;
  // the gate proves the rewrite changes bytes-on-disk order only, never
  // row content — the invariant that makes layout rewrites safe to run
  // against a live canonical table behind SafeSwap.
  // ---------------------------------------------------------------------
  def q77ZorderRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val out = Files.createTempDirectory("graft_zorder").toString + "/events"
    graft.pipeline.Layout.zorderWrite(
      t(s, dir, "events"), "user_id", "ts", out, numFiles = 16)
    s.read.parquet(out)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sumDec(col("value")).as("sum_value"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"),
        countDistinct(col("user_id")).as("n_users"))
  }

  val q77ZorderRoundtripSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(30,4))) AS DOUBLE) AS sum_value,
      |  MIN(event_id) AS min_event, MAX(event_id) AS max_event,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type""".stripMargin

  /** Per-process base for the bucketed-layout gate (the q70/IVF
    * build-once pattern: cross-JVM tmp sharing would race writers). */
  private lazy val bktBase: String =
    Files.createTempDirectory("graft_bkt_").toString

  // ---------------------------------------------------------------------
  // q78_bucketed_join — bucketed storage through the catalog: both fact
  // sides are written bucketBy(16) on the join key, re-read via
  // spark.table, joined, aggregated. Bucketing is the PAY-THE-SHUFFLE-
  // ONCE layout for repeated fact⋈fact joins, so the operator is split
  // like the other persisted-index gates (q70, q37): the bucketed write
  // runs once per process+corpus; re-invocations (including a fresh
  // SparkSession, whose in-memory catalog forgot the tables) re-declare
  // the external bucketed tables by DDL over the existing files and pay
  // only the join — the true steady-state cost the layout buys.
  // BucketingSpec asserts the zero-Exchange plan; this gate proves the
  // write→catalog-read→join path lossless against an oracle joining the
  // original parquet.
  // ---------------------------------------------------------------------
  def q78BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    val base = s"$bktBase/bkt_${dir.hashCode.toHexString}"
    s.sql("CREATE DATABASE IF NOT EXISTS graft_bkt")
    val li = s"graft_bkt.li_${dir.hashCode.toHexString}"
    val o = s"graft_bkt.o_${dir.hashCode.toHexString}"
    // completion marker, not a directory probe: a failure between the two
    // writes must not leave a half-built layout that later invocations
    // treat as complete (li_b present, o_b missing → silently empty join)
    val done = new java.io.File(s"$base/_layout_complete")
    if (!done.exists()) {
      t(s, dir, "lineitem").select(col("l_orderkey"), col("l_quantity"))
        .write.mode("overwrite").option("path", s"$base/li_b")
        .bucketBy(16, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(li)
      t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").option("path", s"$base/o_b")
        .bucketBy(16, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(o)
      done.getParentFile.mkdirs()
      java.nio.file.Files.write(done.toPath, Array.emptyByteArray)
    } else {
      s.sql(s"""CREATE TABLE IF NOT EXISTS $li
        (l_orderkey BIGINT, l_quantity DOUBLE) USING PARQUET
        CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey) INTO 16 BUCKETS
        LOCATION '$base/li_b'""")
      s.sql(s"""CREATE TABLE IF NOT EXISTS $o
        (o_orderkey BIGINT, o_orderpriority STRING) USING PARQUET
        CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey) INTO 16 BUCKETS
        LOCATION '$base/o_b'""")
    }
    s.table(li)
      .join(s.table(o), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sumDec(col("l_quantity")).as("sum_qty"))
  }

  val q78BucketedJoinSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------------
  // q82_scd2_merge — SCD2 history fold (pipeline.Upsert.scd2Merge): v1 =
  // customer balances as the open history; v2 = a deterministic mutation
  // of the same snapshot (+100.0 for custkey % 7 = 0, keys % 13 = 0
  // deleted, copies of keys % 11 = 0 inserted at custkey + 10⁶). The
  // merged history is aggregated by validity interval; the oracle
  // replays the identical set algebra in SQL. Exercises change
  // detection (null-safe compare), upstream-delete closing, insert
  // opening, and carried-open rows — the full SCD2 branch matrix.
  // ---------------------------------------------------------------------
  def q82Scd2Merge(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
    val history = c
      .withColumn("valid_from", lit(1L))
      .withColumn("valid_to", lit(null).cast("long"))
    val snapshot = c.filter(col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey"),
        (col("c_acctbal") + when(col("c_custkey") % 7 === 0, 100.0d)
          .otherwise(0.0d)).as("c_acctbal"))
      .unionByName(c.filter(col("c_custkey") % 11 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          col("c_acctbal")))
    graft.pipeline.Upsert
      .scd2Merge(history, snapshot, Seq("c_custkey"), version = 2L)
      .groupBy(col("valid_from"), coalesce(col("valid_to"), lit(-1L))
        .as("valid_to"))
      .agg(
        count(lit(1)).as("n_rows"),
        sumDec(col("c_acctbal")).as("sum_bal"))
  }

  // ---------------------------------------------------------------------
  // q99_scd2_rollup — COMPOSITION gate: the change-capture →
  // aggregate-refresh path a warehouse runs daily. Three snapshot
  // versions fold through the real [[graft.pipeline.Upsert.scd2Merge]]
  // (v1 init, v2 = q82's mutation, v3 = a further mutation of v2), and
  // after each fold the rows OPENED at that version — the merge's change
  // capture, the one append-only product of SCD2 (a row's `valid_from`
  // is immutable; only `valid_to` flips once) — feed a
  // [[graft.pipeline.Rollup]] keyed by `valid_from`, with v3 replayed
  // (must no-op). The oracle exploits the snapshot identity (after
  // folding a full snapshot, the open state EQUALS the snapshot, so
  // opened@v = rows of snapshot v that are new-or-changed vs snapshot
  // v−1) to replay the whole pipeline in SQL. Any divergence in the
  // SCD2 branch matrix ACROSS TWO CHAINED FOLDS, in the opened-row
  // capture, or in the rollup's fold/replay machinery moves a count or
  // a decimal sum and hash-fails.
  // ---------------------------------------------------------------------
  private lazy val scd2RuBase: String =
    Files.createTempDirectory("graft_scd2ru_").toString

  def q99Scd2Rollup(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{Rollup, Upsert}
    val store = s"$scd2RuBase/ru_${dir.hashCode.toHexString}"
    val spec = Rollup.Spec(Seq("valid_from"), sumCols = Seq("c_acctbal"))
    if (!new java.io.File(s"$store.complete").exists()) {
      val c = t(s, dir, "customer").select(col("c_custkey"), col("c_acctbal"))
      val h1 = c
        .withColumn("valid_from", lit(1L))
        .withColumn("valid_to", lit(null).cast("long"))
      val s2 = c.filter(col("c_custkey") % 13 =!= 0)
        .select(col("c_custkey"),
          (col("c_acctbal") + when(col("c_custkey") % 7 === 0, 100.0d)
            .otherwise(0.0d)).as("c_acctbal"))
        .unionByName(c.filter(col("c_custkey") % 11 === 0)
          .select((col("c_custkey") + 1000000L).as("c_custkey"),
            col("c_acctbal")))
      val h2 = Upsert.scd2Merge(h1, s2, Seq("c_custkey"), version = 2L)
      val s3 = s2.filter(col("c_custkey") % 17 =!= 0)
        .select(col("c_custkey"),
          (col("c_acctbal") + when(col("c_custkey") % 5 === 0, 50.0d)
            .otherwise(0.0d)).as("c_acctbal"))
        .unionByName(s2.filter(col("c_custkey") % 19 === 0)
          .select((col("c_custkey") + 2000000L).as("c_custkey"),
            col("c_acctbal")))
      val h3 = Upsert.scd2Merge(h2, s3, Seq("c_custkey"), version = 3L)
      Rollup.init(s, store, h1, spec, "v1")
      Rollup.merge(s, store, h2.filter(col("valid_from") === 2L), spec, "v2")
      Rollup.merge(s, store, h3.filter(col("valid_from") === 3L), spec, "v3")
      // at-least-once: the replayed version must not double-count
      Rollup.merge(s, store, h3.filter(col("valid_from") === 3L), spec, "v3")
      new java.io.File(s"$store.complete").createNewFile()
    }
    Rollup.read(s, store, spec)
      .select(col("valid_from"), col("n"), col("sum_c_acctbal"))
  }

  // ---------------------------------------------------------------------
  // q113_compaction — small-file compaction roundtrip: orders is written
  // Hive-partitioned by o_orderpriority with every partition deliberately
  // fragmented into 12 files (the state a year of incremental syncs
  // leaves behind), [[graft.pipeline.Maintain.compactPartitions]]
  // rewrites each to one file behind per-partition SafeSwaps, and the
  // gate aggregates the compacted table — any row lost, duplicated, or
  // value-damaged by the rewrite moves a count or a decimal sum against
  // the oracle computed straight from the source. The file-count /
  // untouched-partition-identity halves of the contract are
  // MaintainSpec's (the oracle can't see the filesystem).
  // ---------------------------------------------------------------------
  private lazy val compactBase: String =
    Files.createTempDirectory("graft_compact_").toString

  def q113Compaction(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Maintain
    val tbl = s"$compactBase/orders_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          col("o_orderpriority"))
        .repartition(12)
        .write.partitionBy("o_orderpriority").parquet(tbl)
      val sum = Maintain.compactPartitions(s, tbl,
        targetBytes = 1L << 30, maxFiles = 1)
      require(sum.partitionsCompacted == sum.partitionsSeen,
        s"expected every fragmented partition compacted, got $sum")
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    s.read.parquet(tbl)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_orderkey")).as("n_keys"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q113CompactionSql: String =
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  COUNT(DISTINCT o_orderkey) AS n_keys,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------------
  // q114_skipping — file-level min/max data skipping roundtrip: orders is
  // written range-partitioned on o_orderkey (8 files, disjoint ranges —
  // the layout [[graft.pipeline.Layout.zorderWrite]] and range syncs
  // produce), [[graft.pipeline.Skipping.buildStats]] collects the
  // per-file stats table, and the gate reads a middle key range through
  // [[graft.pipeline.Skipping.readRange]] — which must touch a strict
  // subset of files (require'd here; plan-level file accounting is
  // SkippingSpec's) and return exactly what a full-scan filter returns
  // (the oracle). Any file wrongly skipped loses rows and hash-fails.
  // ---------------------------------------------------------------------
  private lazy val skipBase: String =
    Files.createTempDirectory("graft_skip_").toString

  def q114Skipping(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Skipping
    val tbl = s"$skipBase/orders_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartitionByRange(8, col("o_orderkey"))
        .write.parquet(tbl)
      Skipping.buildStats(s, tbl, Seq("o_orderkey"))
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    val (matched, unknown) =
      Skipping.candidateFiles(s, tbl, "o_orderkey", 20000L, 24000L)
    require(unknown.isEmpty && matched.size < 8,
      s"stats must be fresh and the range must prune: " +
        s"${matched.size} matched, ${unknown.size} unknown")
    Skipping.readRange(s, tbl, "o_orderkey", 20000L, 24000L)
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q114SkippingSql: String =
    """SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
      |  MAX(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders WHERE o_orderkey BETWEEN 20000 AND 24000""".stripMargin

  // ---------------------------------------------------------------------
  // q146_bloom_skipping — per-file BLOOM skipping for the predicate shape
  // min/max is blind to: equality lookups on a hash-clustered column.
  // Orders is written hash-partitioned on o_custkey (8 files — every
  // file's o_orderkey range spans everything, but each CUSTOMER lands in
  // exactly one file), [[graft.pipeline.Skipping.buildBloom]] collects a
  // per-file sketch via Catalyst's own BloomFilterAggregate, and the gate
  // point-looks-up three customers through
  // [[graft.pipeline.Skipping.readPointLookup]] — which must touch a
  // strict subset of files (require'd; fresh stats required too) and
  // return exactly what a full-scan IN filter returns (the oracle). A
  // false NEGATIVE (wrongly pruned file) loses rows and hash-fails; the
  // sketches are AUTO-SIZED from observed per-file row counts (the
  // default — next-pow2 capacity at 8 bits/item keeps per-probe FPP
  // under ~2%, and with 3 probes × ≤8 files the subset require is
  // deterministic on this fixed data). The probe itself runs
  // engine-side (`graft_bloom_any`) — only file names reach the driver.
  // ---------------------------------------------------------------------
  def q146BloomSkipping(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Skipping
    val tbl = s"$skipBase/orders_bloom_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.parquet(tbl)
      Skipping.buildBloom(s, tbl, "o_custkey")
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    val keys = Seq(11L, 42L, 107L)
    val (matched, unknown) =
      Skipping.candidateFilesEq(s, tbl, "o_custkey", keys)
    require(unknown.isEmpty && matched.size < 8,
      s"bloom stats must be fresh and the lookup must prune: " +
        s"${matched.size} matched, ${unknown.size} unknown")
    Skipping.readPointLookup(s, tbl, "o_custkey", keys)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderkey")).as("min_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q146BloomSkippingSql: String =
    """SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust,
      |  MIN(o_orderkey) AS min_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders WHERE o_custkey IN (11, 42, 107)""".stripMargin

  // ---------------------------------------------------------------------
  // q167_combined_skipping — BOTH skipping indexes over ONE Z-ordered
  // layout: orders rewritten on the Morton curve of (o_orderkey,
  // o_custkey) so a range on one column AND an equality on the other
  // each prune files ([[graft.pipeline.Layout.zorderWrite]] is what
  // makes a single layout serve both predicates); the combined reader
  // ([[graft.pipeline.Skipping.readRangeAndPointLookup]]) intersects
  // the two verdicts. The gate require's fresh stats and pruning on
  // both axes; the oracle is the plain full-scan conjunction.
  // ---------------------------------------------------------------------
  def q167CombinedSkipping(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{Layout, Skipping}
    val tbl = s"$skipBase/orders_zc_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$tbl.complete").exists()) {
      Layout.zorderWrite(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
        "o_orderkey", "o_custkey", tbl, numFiles = 16)
      Skipping.buildStats(s, tbl, Seq("o_orderkey"))
      Skipping.buildBloom(s, tbl, "o_custkey",
        expectedItemsPerFile = 100000L)
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    val (rm, ru) = Skipping.candidateFiles(s, tbl, "o_orderkey",
      300L, 900L)
    val (em, eu) = Skipping.candidateFilesEq(s, tbl, "o_custkey",
      Seq(11L, 42L))
    require(ru.isEmpty && eu.isEmpty && rm.size < 16 && em.size < 16,
      s"both axes must prune on the Z-ordered layout: range ${rm.size}," +
        s" bloom ${em.size} of 16")
    Skipping.readRangeAndPointLookup(s, tbl, "o_orderkey", 300L, 900L,
        "o_custkey", Seq(11L, 42L))
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q167CombinedSkippingSql: String =
    """SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders
      |WHERE o_orderkey BETWEEN 300 AND 900
      |  AND o_custkey IN (11, 42)""".stripMargin

  // ---------------------------------------------------------------------
  // q227_incremental_skipping — the MAINTAINED skip-stats path through
  // the gate: stats are built over the table's first half, the second
  // half lands as an incremental append, and refreshStats converges
  // with an O(batch) append (require'd: no rebuild, untouched stats) —
  // then a range read over the APPENDED half must prune through the
  // appended stats rows and return exactly the full-scan answer (the
  // oracle). This is the cadence a synced warehouse actually runs:
  // stats follow the data file-additively, never by re-scan.
  // ---------------------------------------------------------------------
  def q227IncrementalSkipping(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Skipping
    val tbl = s"$skipBase/orders_incr_${dir.hashCode.toHexString}"
    // SF-independent split/probe points: half the key range lands
    // first, the rest appends; the probe range [60%, 70%] of max sits
    // strictly inside the appended half (the oracle derives the same
    // bounds with integer arithmetic in a scalar subquery)
    val maxKey = t(s, dir, "orders").agg(max(col("o_orderkey")))
      .head().getLong(0)
    val (lo, hi) = (maxKey * 6 / 10, maxKey * 7 / 10)
    if (!new java.io.File(s"$tbl.complete").exists()) {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      o.filter(col("o_orderkey") < maxKey / 2)
        .repartitionByRange(4, col("o_orderkey")).write.parquet(tbl)
      Skipping.buildStats(s, tbl, Seq("o_orderkey"))
      o.filter(col("o_orderkey") >= maxKey / 2)
        .repartitionByRange(4, col("o_orderkey"))
        .write.mode("append").parquet(tbl)
      val r = Skipping.refreshStats(s, tbl, Seq("o_orderkey"))
      require(!r.rebuilt && r.appended == 4,
        s"append-only growth must refresh O(batch): $r")
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    val (matched, unknown) =
      Skipping.candidateFiles(s, tbl, "o_orderkey", lo, hi)
    require(unknown.isEmpty && matched.nonEmpty && matched.size < 8,
      s"appended-half range must prune through the refreshed stats: " +
        s"${matched.size} matched, ${unknown.size} unknown")
    Skipping.readRange(s, tbl, "o_orderkey", lo, hi)
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q227IncrementalSkippingSql: String =
    """SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
      |  MAX(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders
      |WHERE o_orderkey
      |    BETWEEN (SELECT MAX(o_orderkey) * 6 // 10 FROM orders)
      |    AND (SELECT MAX(o_orderkey) * 7 // 10 FROM orders)""".stripMargin

  // ---------------------------------------------------------------------
  // q228_skipping_compaction — the compaction leg of the maintained
  // skip-stats lifecycle: two incremental appends leave per-batch stats
  // files; compactStats folds them to one (require'd) CARRYING the
  // ledger, after which (a) pruned reads return exactly the full-scan
  // answer (the oracle), (b) the refresh still knows every covered file
  // (require'd no-op), and (c) a post-compaction append lands
  // file-additively (require'd O(batch)). The maintenance op is in the
  // gate because a compaction that dropped ledger state would silently
  // re-fold history — the failure class this round's protocol work
  // exists to kill.
  // ---------------------------------------------------------------------
  def q228SkippingCompaction(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Skipping
    val tbl = s"$skipBase/orders_cmp_${dir.hashCode.toHexString}"
    val maxKey = t(s, dir, "orders").agg(max(col("o_orderkey")))
      .head().getLong(0)
    val (lo, hi) = (maxKey * 3 / 10, maxKey * 4 / 10)
    if (!new java.io.File(s"$tbl.complete").exists()) {
      val o = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      def slice(lo: Long, hi: Long) =
        o.filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
      slice(0L, maxKey / 2)
        .repartitionByRange(2, col("o_orderkey")).write.parquet(tbl)
      Skipping.buildStats(s, tbl, Seq("o_orderkey"))
      slice(maxKey / 2, 3 * maxKey / 4)
        .coalesce(1).write.mode("append").parquet(tbl)
      Skipping.refreshStats(s, tbl, Seq("o_orderkey"))
      slice(3 * maxKey / 4, maxKey + 1)
        .coalesce(1).write.mode("append").parquet(tbl)
      Skipping.refreshStats(s, tbl, Seq("o_orderkey"))
      Skipping.compactStats(s, tbl)
      val statFiles = new java.io.File(tbl, "_skip_stats").listFiles()
        .count(f => f.isFile && f.getName.endsWith(".parquet"))
      require(statFiles == 1,
        s"compaction must fold the per-batch stats files, got $statFiles")
      val r = Skipping.refreshStats(s, tbl, Seq("o_orderkey"))
      require(!r.rebuilt && r.appended == 0,
        s"the carried ledger must still cover every file: $r")
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    val (matched, unknown) =
      Skipping.candidateFiles(s, tbl, "o_orderkey", lo, hi)
    require(unknown.isEmpty && matched.nonEmpty && matched.size < 4,
      s"compacted stats must still prune: ${matched.size} matched, " +
        s"${unknown.size} unknown")
    Skipping.readRange(s, tbl, "o_orderkey", lo, hi)
      .agg(count(lit(1)).as("n"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q228SkippingCompactionSql: String =
    """SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
      |  MAX(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders
      |WHERE o_orderkey >= (SELECT MAX(o_orderkey) * 3 // 10 FROM orders)
      |  AND o_orderkey <= (SELECT MAX(o_orderkey) * 4 // 10 FROM orders)""".stripMargin

  // ---------------------------------------------------------------------
  // q229_delete_by_key — right-to-be-forgotten through the bloom index:
  // orders is hash-clustered on o_custkey (8 files), three customers
  // are hard-deleted via [[graft.pipeline.Maintain.deleteByKey]], which
  // must rewrite ONLY the bloom-candidate files (require'd: candidates
  // < 8, untouched files keep byte-identity), and the surviving table
  // must equal the oracle's NOT IN filter exactly — any file wrongly
  // rewritten or row wrongly surviving hash-fails. A second delete of
  // the same keys must be a physical no-op (require'd).
  // ---------------------------------------------------------------------
  def q229DeleteByKey(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{Maintain, Skipping}
    val tbl = s"$skipBase/orders_del_${dir.hashCode.toHexString}"
    val keys = Seq(11L, 42L, 107L)
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.parquet(tbl)
      Skipping.buildBloom(s, tbl, "o_custkey")
      def files() = new java.io.File(tbl).listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length()).toMap
      val before = files()
      val sum = Maintain.deleteByKey(s, tbl, "o_custkey", keys)
      require(sum.rowsDeleted > 0 && sum.candidateFiles < 8,
        s"bloom must confine the delete to candidate files: $sum")
      val after = files()
      val untouched = before.keySet.intersect(after.keySet)
      require(untouched.forall(n => before(n) == after(n)) &&
        untouched.size >= 8 - sum.candidateFiles,
        "non-candidate files must keep byte identity")
      val again = Maintain.deleteByKey(s, tbl, "o_custkey", keys)
      require(again.rowsDeleted == 0 && again.rewritten == 0 &&
        again.dropped == 0, s"re-delete must be a no-op: $again")
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    s.read.parquet(tbl)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderkey")).as("min_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q229DeleteByKeySql: String =
    """SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust,
      |  MIN(o_orderkey) AS min_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders WHERE o_custkey NOT IN (11, 42, 107)""".stripMargin

  // ---------------------------------------------------------------------
  // q251_manifest_table — the manifest-managed maintenance lifecycle
  // end-to-end: a managed (Manifest.enable) hash-clustered table takes
  // a bloom-pruned hard delete AND a compaction, each committing a new
  // manifest generation (replacements placed BEFORE originals drop —
  // the reader-atomic order, require'd mid-run by snapshot reads), and
  // the final snapshot read must equal the oracle's NOT IN filter
  // exactly. The compaction proves snapshot reads survive full file-set
  // turnover; re-runs of both ops are physical no-ops (require'd).
  // ---------------------------------------------------------------------
  def q251ManifestTable(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.{Maintain, Manifest, Skipping}
    val tbl = s"$skipBase/orders_mani_${dir.hashCode.toHexString}"
    val keys = Seq(11L, 42L, 107L)
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(8, col("o_custkey"))
        .write.parquet(tbl)
      Manifest.enable(s, tbl)
      Skipping.buildBloom(s, tbl, "o_custkey")
      val sum = Maintain.deleteByKey(s, tbl, "o_custkey", keys)
      require(sum.rowsDeleted > 0 && sum.candidateFiles < 8,
        s"bloom must confine the managed delete: $sum")
      val nAfterDelete = Manifest.readSnapshot(s, tbl).count()
      // compaction turns the whole file set over under the manifest
      Maintain.compactPartitions(s, tbl, targetBytes = 1L << 30)
      require(Manifest.readSnapshot(s, tbl).count() == nAfterDelete,
        "compaction must not move a row under the manifest")
      val again = Maintain.deleteByKey(s, tbl, "o_custkey", keys)
      require(again.rowsDeleted == 0 && again.rewritten == 0 &&
        again.dropped == 0, s"re-delete must be a no-op: $again")
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    graft.pipeline.Manifest.readSnapshot(s, tbl)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderkey")).as("min_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q251ManifestTableSql: String = q229DeleteByKeySql

  // ---------------------------------------------------------------------
  // q259_time_travel — manifest generations as snapshots: a managed
  // orders table takes a record-level MERGE (every custkey ≡ 0 mod 10
  // re-keyed +1,000,000), committing generation 2; the gate reads BOTH
  // retained generations through readSnapshot(dir, gen) and emits their
  // aggregates side by side. The oracle computes the pre-merge state
  // from the source table and the post-merge state declaratively — a
  // time-travel read that leaks merged rows into the old snapshot (or
  // vice versa) moves a count/sum and hash-fails. The previous
  // generation costs nothing extra to keep: its replaced files ARE the
  // deferred-delete retention window's contents.
  // ---------------------------------------------------------------------
  /** Shared q259/q263 fixture: a managed orders copy with two retained
    * generations (enable → merge). */
  private def ensureTimeTravelTable(s: SparkSession, dir: String)
      : String = {
    import graft.pipeline.{Manifest, Upsert}
    val tbl = s"$skipBase/orders_tt2_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .repartition(4, col("o_custkey"))
        .write.parquet(tbl)
      Manifest.enable(s, tbl) // generation 1
      val updates = Manifest.readSnapshot(s, tbl)
        .filter(col("o_custkey") % 10 === 0)
        .select(col("o_orderkey"),
          (col("o_custkey") + 1000000L).as("o_custkey"))
      Upsert.mergeInto(s, tbl, updates, Seq("o_orderkey")) // generation 2
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    tbl
  }

  def q259TimeTravel(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Manifest
    val tbl = ensureTimeTravelTable(s, dir)
    val gens = Manifest.generations(tbl)
    require(gens.size == 2, s"expected two retained generations: $gens")
    def agg(df: DataFrame, tag: String) = df.agg(
      count(lit(1)).as("n"),
      countDistinct(col("o_custkey")).as("n_cust"),
      sum(col("o_custkey")).as("sum_cust"),
      min(col("o_orderkey")).as("min_key"),
      max(col("o_orderkey")).as("max_key"))
      .select(lit(tag).as("gen"), col("n"), col("n_cust"),
        col("sum_cust"), col("min_key"), col("max_key"))
    agg(Manifest.readSnapshot(s, tbl, gens.head), "previous")
      .unionByName(agg(Manifest.readSnapshot(s, tbl, gens.last),
        "current"))
  }

  val q259TimeTravelSql: String =
    """WITH cur AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_custkey % 10 = 0 THEN o_custkey + 1000000
      |         ELSE o_custkey END AS o_custkey
      |  FROM orders)
      |SELECT 'previous' AS gen, COUNT(*) AS n,
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
      |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
      |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
      |FROM orders
      |UNION ALL
      |SELECT 'current', COUNT(*),
      |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
      |  CAST(SUM(o_custkey) AS BIGINT),
      |  MIN(o_orderkey), MAX(o_orderkey)
      |FROM cur""".stripMargin

  // ---------------------------------------------------------------------
  // q263_sql_time_travel — q259's semantics through SQL TEXT: the
  // per-sync-registered `<table>__at_g<N>` snapshot views
  // ([[graft.catalog.CatalogSync.registerSnapshotViews]]) must let an
  // analyst read the PREVIOUS generation mid-maintenance with
  // spark.sql alone — same aggregates, same oracle. Registration is
  // session-scoped and re-runs per session (the q261 lesson); only the
  // table fixture sits behind the sentinel.
  // ---------------------------------------------------------------------
  def q263SqlTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val tbl = ensureTimeTravelTable(s, dir)
    val vt = s"ott3_${dir.hashCode.toHexString}"
    val gens = graft.catalog.CatalogSync.registerSnapshotViews(s, vt, tbl)
    require(gens.size == 2, s"expected two retained generations: $gens")
    def arm(tag: String, g: Long) =
      s"""SELECT '$tag' AS gen, COUNT(*) AS n,
         |  CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
         |  CAST(SUM(o_custkey) AS BIGINT) AS sum_cust,
         |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
         |FROM ${vt}__at_g$g""".stripMargin
    s.sql(arm("previous", gens.head) + "\nUNION ALL\n" +
      arm("current", gens.last))
  }

  val q263SqlTimeTravelSql: String = q259TimeTravelSql

  // ---------------------------------------------------------------------
  // q255_transparent_manifest — the ManifestResolve optimizer rule
  // through the gate: a PLAIN spark.read of a managed table frozen in
  // the mid-maintenance state (a complete-but-UNCOMMITTED del_
  // replacement sitting next to its original) must resolve through the
  // manifest and aggregate the committed state exactly — the oracle is
  // the full untouched table, so a raw-listing read (which would
  // double-count the replacement's rows) hash-fails.
  // ---------------------------------------------------------------------
  def q255TransparentManifest(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Manifest
    import org.apache.hadoop.fs.Path
    val tbl = s"$skipBase/orders_tm_${dir.hashCode.toHexString}"
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(4, col("o_custkey"))
        .write.parquet(tbl)
      Manifest.enable(s, tbl)
      // freeze the window BETWEEN "replacement placed" and "manifest
      // committed": a filtered copy of one file under its del_ name
      val fs = new Path(tbl).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val victim = fs.listStatus(new Path(tbl)).filter(_.isFile)
        .map(_.getPath).filterNot(_.getName.startsWith("_")).head
      val tmp = new Path(tbl, ".del_tmp_gate").toString
      s.read.parquet(victim.toString)
        .filter(col("o_custkey") =!= 11L)
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(p => !p.getName.startsWith("_") &&
          !p.getName.startsWith(".")).get
      require(fs.rename(part,
        new Path(tbl, s"del_${victim.getName}")),
        "cannot stage the uncommitted replacement")
      fs.delete(new Path(tmp), true)
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    graft.plans.ManifestResolve.register(s)
    s.catalog.refreshByPath(tbl)
    s.read.parquet(tbl)
      .agg(count(lit(1)).as("n"),
        countDistinct(col("o_custkey")).as("n_cust"),
        min(col("o_orderkey")).as("min_key"),
        sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q255TransparentManifestSql: String =
    """SELECT COUNT(*) AS n, COUNT(DISTINCT o_custkey) AS n_cust,
      |  MIN(o_orderkey) AS min_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------------
  // q230_transparent_skipping — the optimizer-rule path through the
  // gate: a PLAIN DataFrame range filter (no Skipping reader API) over
  // a stats-carrying table must file-prune via
  // [[graft.plans.SkippingFilePrune]] (require'd: the executed plan's
  // scan holds a strict subset of the files) and still return exactly
  // the full-scan answer (the oracle). This is the q114 semantics with
  // the pruning moved from an explicit reader into the planner — the
  // ergonomics a warehouse analyst actually gets.
  // ---------------------------------------------------------------------
  def q230TransparentSkipping(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Skipping
    graft.plans.SkippingFilePrune.register(s)
    val tbl = s"$skipBase/orders_rule_${dir.hashCode.toHexString}"
    val maxKey = t(s, dir, "orders").agg(max(col("o_orderkey")))
      .head().getLong(0)
    val (lo, hi) = (maxKey * 2 / 10, maxKey * 3 / 10)
    if (!new java.io.File(s"$tbl.complete").exists()) {
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartitionByRange(8, col("o_orderkey"))
        .write.parquet(tbl)
      Skipping.buildStats(s, tbl, Seq("o_orderkey"))
      new java.io.File(s"$tbl.complete").createNewFile()
    }
    val q = s.read.parquet(tbl)
      .filter(col("o_orderkey") >= lo && col("o_orderkey") <= hi)
    val scanned = q.queryExecution.executedPlan.collect {
      case sc: org.apache.spark.sql.execution.FileSourceScanExec =>
        sc.relation.location.inputFiles.length
    }.sum
    require(scanned > 0 && scanned < 8,
      s"the rule must prune the plain filter's scan: $scanned of 8 files")
    q.agg(count(lit(1)).as("n"),
      min(col("o_orderkey")).as("min_key"),
      max(col("o_orderkey")).as("max_key"),
      sumDec(col("o_totalprice")).as("sum_price"))
  }

  val q230TransparentSkippingSql: String =
    """SELECT COUNT(*) AS n, MIN(o_orderkey) AS min_key,
      |  MAX(o_orderkey) AS max_key,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_price
      |FROM orders
      |WHERE o_orderkey
      |    BETWEEN (SELECT MAX(o_orderkey) * 2 // 10 FROM orders)
      |    AND (SELECT MAX(o_orderkey) * 3 // 10 FROM orders)""".stripMargin

  // ---------------------------------------------------------------------
  // q170_shard_fingerprint — deterministic training-data sharding with
  // content fingerprints: every doc lands in a shard by a stable hash of
  // its id (md5 — engine-neutral, growth-stable like q63's split), and
  // each shard reports (n_docs, n_tokens, md5 of its doc_id-ordered
  // concatenated text). The fingerprint is the EXPORT INTEGRITY check —
  // two export runs (or two engines) must produce byte-identical shard
  // content or training is silently non-reproducible. The actual export
  // at scale is `repartition(shard) + sortWithinPartitions(doc_id)` into
  // files; this operator is its content-addressed receipt (same role as
  // the AppendCommit fingerprints, at shard granularity).
  //
  // Scale shape: one shuffle on the shard key; per-shard concatenation
  // is the shard's own text (the same bytes the export writes) — the
  // fingerprint pass costs what the export itself costs, nothing
  // quadratic. The gate keeps 8 shards over the gate corpus.
  // ---------------------------------------------------------------------
  def shardFingerprint(docs: DataFrame, nShards: Int): DataFrame = {
    val shard = (conv(substring(md5(col("doc_id").cast("string")
      .cast("binary")), 1, 6), 16, 10).cast("long") % nShards)
      .cast("int")
    docs.withColumn("shard", shard)
      .withColumn("__nw", size(split(col("text"), " ")).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nw")).as("n_tokens"),
        sort_array(collect_list(struct(col("doc_id"), col("text"))))
          .as("xs"))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        md5(array_join(expr("transform(xs, x -> x.text)"), "\n")
          .cast("binary")).as("content_md5"))
  }

  def q170ShardFingerprint(s: SparkSession, dir: String): DataFrame =
    shardFingerprint(
      t(s, dir, "documents").select(col("doc_id"), col("text")),
      nShards = 8)

  val q170ShardFingerprintSql: String =
    """SELECT
      |  CAST(CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6)
      |    AS BIGINT) % 8 AS INT) AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
      |  md5(string_agg(text, chr(10) ORDER BY doc_id)) AS content_md5
      |FROM documents
      |GROUP BY 1""".stripMargin

  val q99Scd2RollupSql: String =
    """WITH s1 AS (SELECT c_custkey, c_acctbal FROM customer),
      |s2 AS (
      |  SELECT c_custkey,
      |    c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END
      |      AS c_acctbal
      |  FROM customer WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_acctbal
      |  FROM customer WHERE c_custkey % 11 = 0),
      |s3 AS (
      |  SELECT c_custkey,
      |    c_acctbal + CASE WHEN c_custkey % 5 = 0 THEN 50.0 ELSE 0.0 END
      |      AS c_acctbal
      |  FROM s2 WHERE c_custkey % 17 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 2000000, c_acctbal
      |  FROM s2 WHERE c_custkey % 19 = 0),
      |o2 AS (SELECT b.c_custkey, b.c_acctbal
      |       FROM s2 b LEFT JOIN s1 a ON a.c_custkey = b.c_custkey
      |       WHERE a.c_custkey IS NULL
      |          OR a.c_acctbal IS DISTINCT FROM b.c_acctbal),
      |o3 AS (SELECT b.c_custkey, b.c_acctbal
      |       FROM s3 b LEFT JOIN s2 a ON a.c_custkey = b.c_custkey
      |       WHERE a.c_custkey IS NULL
      |          OR a.c_acctbal IS DISTINCT FROM b.c_acctbal),
      |r AS (SELECT CAST(1 AS BIGINT) AS valid_from, c_acctbal FROM s1
      |      UNION ALL SELECT 2, c_acctbal FROM o2
      |      UNION ALL SELECT 3, c_acctbal FROM o3)
      |SELECT valid_from, COUNT(*) AS n,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(30,4))) AS DOUBLE)
      |    AS sum_c_acctbal
      |FROM r GROUP BY valid_from""".stripMargin

  val q82Scd2MergeSql: String =
    """WITH s1 AS (SELECT c_custkey, c_acctbal FROM customer),
      |s2 AS (
      |  SELECT c_custkey,
      |    c_acctbal + CASE WHEN c_custkey % 7 = 0 THEN 100.0 ELSE 0.0 END
      |      AS c_acctbal
      |  FROM customer WHERE c_custkey % 13 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_acctbal
      |  FROM customer WHERE c_custkey % 11 = 0),
      |m AS (SELECT COALESCE(a.c_custkey, b.c_custkey) AS k,
      |        a.c_acctbal AS o_bal, b.c_acctbal AS n_bal,
      |        a.c_custkey IS NOT NULL AS in_o,
      |        b.c_custkey IS NOT NULL AS in_s,
      |        a.c_acctbal IS DISTINCT FROM b.c_acctbal AS chg
      |      FROM s1 a FULL OUTER JOIN s2 b ON a.c_custkey = b.c_custkey),
      |rows_ AS (
      |  SELECT k, o_bal AS bal, 1 AS valid_from, CAST(NULL AS BIGINT)
      |    AS valid_to FROM m WHERE in_o AND in_s AND NOT chg
      |  UNION ALL
      |  SELECT k, o_bal, 1, 2 FROM m WHERE in_o AND (NOT in_s OR chg)
      |  UNION ALL
      |  SELECT k, n_bal, 2, CAST(NULL AS BIGINT) FROM m
      |  WHERE in_s AND (NOT in_o OR chg))
      |SELECT CAST(valid_from AS BIGINT) AS valid_from,
      |  COALESCE(valid_to, -1) AS valid_to,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(bal AS DECIMAL(30,4))) AS DOUBLE) AS sum_bal
      |FROM rows_ GROUP BY 1, 2""".stripMargin
}
