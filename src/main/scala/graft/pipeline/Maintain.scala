package graft.pipeline


import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Table maintenance: small-file compaction.
  *
  * Incremental pipelines are small-file factories — every sync batch,
  * streaming micro-batch, and partition-scoped merge appends a few files,
  * and a year of daily syncs turns a partition into thousands of
  * kilobyte-sized parquet files whose per-file open/footer cost comes to
  * dominate scans (the classic HDFS/S3 small-file problem; the reference
  * accumulates one gzip file per dump forever,
  * `sync-canvas-data-files.py:75-79`, and delegates the consequences to
  * Athena). [[compactPartitions]] is the maintenance operator that pays
  * the rewrite cost ONCE, partition-by-partition, to keep scans
  * O(bytes) instead of O(files).
  *
  * Scale design:
  *  - per-partition decision from the file LISTING only (count + bytes)
  *    — no data is read for partitions already in shape, so a run over a
  *    100 TB table with one fragmented day touches one day;
  *  - each rewrite is `read → coalesce(ceil(bytes/target))` — coalesce,
  *    not repartition: compaction is IO-bound by design and must not pay
  *    a shuffle (the rows are already where they belong);
  *  - each partition rewrites behind its own [[SafeSwap]], so a crash is
  *    confined to one partition, heals on the next run, and untouched
  *    partitions keep physical file identity (mtime-stable — cheap
  *    object-store sync/backup tools keep skipping them);
  *  - idempotent: a second run finds every partition within budget and
  *    rewrites nothing.
  */
object Maintain {

  final case class CompactSummary(partitionsSeen: Int,
      partitionsCompacted: Int, filesBefore: Long, filesAfter: Long)

  // Path#getFileSystem, not FileSystem.get(new URI(…)): partition values
  // may hold URI-illegal characters (spaces) that the strict parser
  // rejects — Path's constructor quotes them (same fix as SafeSwap)
  private def fsFor(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def dataFiles(fs: FileSystem, dir: Path)
      : Array[org.apache.hadoop.fs.FileStatus] =
    fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith("_") && !n.startsWith(".")
    }

  /** Compact every Hive partition directory (or the table root itself if
    * the table is unpartitioned) holding more than `maxFiles` data files
    * down to max(1, ceil(bytes / targetBytes)) files. Returns what was
    * seen and done. Single-writer like every maintenance op. */
  def compactPartitions(spark: SparkSession, path: String,
      targetBytes: Long, maxFiles: Int = 1): CompactSummary = {
    require(targetBytes > 0 && maxFiles >= 1,
      "targetBytes must be positive and maxFiles at least 1")
    val fs = fsFor(spark, path)
    val root = new Path(path)
    val partDirs = fs.listStatus(root).filter { st =>
      val n = st.getPath.getName
      st.isDirectory && n.contains("=") && !n.startsWith(".") &&
        !n.startsWith("_")
    }.map(_.getPath)
    // unpartitioned table → the root is the one "partition"
    val targets = if (partDirs.nonEmpty) partDirs.toSeq else Seq(root)
    var compacted = 0; var before = 0L; var after = 0L
    targets.foreach { pdir =>
      SafeSwap.recover(pdir.toString)
      val files = dataFiles(fs, pdir)
      val bytes = files.map(_.getLen).sum
      val want = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      before += files.length
      if (files.length > maxFiles && files.length > want) {
        // the lazy read executes inside the SafeSwap write action,
        // strictly before the live dir renames aside
        val df = spark.read.parquet(pdir.toString).coalesce(want)
        SafeSwap.replace(pdir.toString) { tmp =>
          df.write.mode("overwrite").parquet(tmp)
        }
        compacted += 1
        after += dataFiles(fs, pdir).length
      } else after += files.length
    }
    // rewritten partitions invalidated any cached file listing for the
    // tree (same hazard as Upsert.mergeIntoPartitioned)
    if (compacted > 0) spark.catalog.refreshByPath(path)
    CompactSummary(targets.size, compacted, before, after)
  }
}
