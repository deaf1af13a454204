package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reader-visible SNAPSHOT ISOLATION for plain parquet table dirs — the
  * one-file step toward an Iceberg/Delta-style manifest pointer
  * (Armbrust et al., VLDB 2020 §3.1) that this warehouse's maintenance
  * ops were previously missing: [[SafeSwap]], [[Maintain.deleteByKey]]'s
  * aside/rename protocol, and compaction are all crash-safe for the
  * WRITER, but a concurrent listing-based reader could catch the
  * rename-wide gap and see neither the old file nor its replacement.
  *
  * The fix: a per-table generation-numbered manifest (`_manifest_g<N>`)
  * naming the table's current data files (paths relative to the table
  * root). Each generation appears ATOMICALLY (written to a hidden temp,
  * renamed to its final — new — name, so no reader can observe a partial
  * manifest), and maintenance ops order their work around it:
  *
  *   1. new content lands under NEW names (replacements are complete and
  *      visible before anything is removed);
  *   2. the manifest swaps — ONE atomic rename, the commit point;
  *   3. replaced originals are deleted.
  *
  * A reader that resolves its file list through [[readSnapshot]]
  * therefore sees the complete OLD state before the swap and the
  * complete NEW state after it — never a half state. Two generations
  * are retained so recovery and readers can distinguish three kinds of
  * not-in-current-manifest files:
  *
  *   - in the PREVIOUS generation → a replaced/dropped original whose
  *     post-commit deletion crashed: invisible to snapshot readers,
  *     deleted by [[recover]];
  *   - carries a maintenance-output prefix (`del_`/`cmp_`) but is in no
  *     generation → an UNCOMMITTED replacement from a crashed run:
  *     invisible, deleted by [[recover]] (the rerun redoes the work);
  *   - anything else → a fresh APPEND the manifest hasn't caught up
  *     with: always read (staleness degrades to "appends visible
  *     immediately", never to missing or duplicated rows — the same
  *     stale-safety contract as [[Skipping]]).
  *
  * Opt-in per table ([[enable]]); tables without a manifest keep the
  * existing listing semantics and code paths untouched. Single
  * maintenance writer, like every protocol in this package; readers are
  * unlimited and lock-free.
  *
  * CONTRACT for whole-dir rewriters: an op that intentionally REBUILDS
  * a table wholesale through [[SafeSwap]] (a batch canonical rewrite,
  * an SCD2 history fold) replaces the directory — manifest included —
  * and must re-commit afterwards ([[refresh]]; the Warehouse does this
  * per sync for its `manifestTables`). The manifest-aware ops here
  * (deleteByKey, compactPartitions, mergeInto, mergeIntoPartitioned)
  * never whole-dir swap a managed table.
  */
object Manifest {

  private val GenPrefix = "_manifest_g"

  /** Name prefixes that mark MAINTENANCE OUTPUT files (delete rewrites,
    * compaction outputs, partition merges). An uncommitted file with
    * one of these prefixes is a crashed run's leftover; anything else
    * unknown to the manifest is treated as a fresh append. */
  private[pipeline] val MaintPrefixes = Seq("del_", "cmp_", "ups_")

  private def fsFor(path: String): FileSystem =
    new Path(path).getFileSystem(new Configuration())

  private def genOf(name: String): Option[Long] =
    if (!name.startsWith(GenPrefix)) None
    else name.stripPrefix(GenPrefix).toLongOption

  private def genFiles(fs: FileSystem, dir: Path): Seq[(Long, Path)] =
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      genOf(st.getPath.getName).map(g => (g, st.getPath))
    }.sortBy(_._1)

  def exists(tableDir: String): Boolean =
    genFiles(fsFor(tableDir), new Path(tableDir)).nonEmpty

  private def readGen(fs: FileSystem, p: Path): Seq[String] = {
    val in = fs.open(p)
    val txt = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    txt.split("\n").toSeq.filter(_.nonEmpty)
  }

  /** Lock-free readers race the writer's generation prune: between a
    * reader's gen LISTING and its OPEN, a commit can delete the older
    * generation file — re-list and retry (bounded; each retry observes
    * a strictly newer, complete state, so two suffice in practice). */
  private def retryingGenRead[T](body: => Option[T]): Option[T] = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case _: java.io.FileNotFoundException if attempt < 3 =>
          attempt += 1
      }
    }
    None // unreachable
  }

  /** The current generation's relative file list, if a manifest exists. */
  def current(tableDir: String): Option[Seq[String]] =
    retryingGenRead {
      val fs = fsFor(tableDir)
      genFiles(fs, new Path(tableDir)).lastOption
        .map { case (_, p) => readGen(fs, p) }
    }

  /** Current and previous generations' names (previous empty when only
    * one generation exists). */
  private def lastTwo(tableDir: String)
      : Option[(Seq[String], Seq[String])] =
    retryingGenRead {
      val fs = fsFor(tableDir)
      val gens = genFiles(fs, new Path(tableDir))
      gens.lastOption.map { case (_, cur) =>
        (readGen(fs, cur),
          if (gens.size >= 2) readGen(fs, gens(gens.size - 2)._2)
          else Seq.empty)
      }
    }

  private def listDataFiles(fs: FileSystem, root: Path): Seq[String] = {
    def walk(p: Path, rel: String): Seq[String] =
      fs.listStatus(p).toSeq.flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith(".") || n.startsWith("_")) Seq.empty
        else if (st.isDirectory)
          walk(st.getPath, if (rel.isEmpty) n else s"$rel/$n")
        else Seq(if (rel.isEmpty) n else s"$rel/$n")
      }
    if (fs.exists(root)) walk(root, "") else Seq.empty
  }

  /** Swap in a new generation naming exactly `relFiles`. The write is
    * hidden-temp + rename-to-a-NEW-name, so the generation appears
    * atomically; generations older than the previous one are pruned
    * (readers hold at most one resolve's worth of staleness). */
  def commit(tableDir: String, relFiles: Seq[String]): Unit = {
    val fs = fsFor(tableDir)
    val root = new Path(tableDir)
    fs.mkdirs(root)
    val gens = genFiles(fs, root)
    val next = gens.lastOption.map(_._1 + 1).getOrElse(1L)
    val tmp = new Path(root, s".$GenPrefix$next.tmp")
    val os = fs.create(tmp, true)
    try os.write(relFiles.sorted.mkString("\n").getBytes("UTF-8"))
    finally os.close()
    if (!fs.rename(tmp, new Path(root, s"$GenPrefix$next")))
      throw new java.io.IOException(
        s"cannot commit manifest generation $next for $tableDir")
    // prune: keep current + previous (recovery and stale readers need
    // exactly one generation of history)
    gens.dropRight(1).foreach { case (_, p) => fs.delete(p, false) }
  }

  /** Make `tableDir` manifest-managed: commit generation 1 from the
    * current listing. */
  def enable(spark: SparkSession, tableDir: String): Unit = {
    val fs = fsFor(tableDir)
    commit(tableDir, listDataFiles(fs, new Path(tableDir)))
  }

  /** Converge the manifest with the live listing: heal crashed
    * maintenance ([[recover]]), then commit a new generation ONLY if
    * the listing moved (appends since the last commit, or a wholesale
    * canonical rewrite that replaced the dir — and with it any previous
    * manifest). An unchanged table costs one listing + one manifest
    * read. The maintenance-cadence entry point ([[graft.Warehouse]]
    * wires it per sync). Returns whether a generation was committed. */
  def refresh(spark: SparkSession, tableDir: String): Boolean = {
    val fs = fsFor(tableDir)
    if (exists(tableDir)) recover(tableDir)
    val listing = listDataFiles(fs, new Path(tableDir)).sorted
    if (current(tableDir).map(_.sorted).contains(listing)) false
    else { commit(tableDir, listing); true }
  }

  /** Entry healing for maintenance ops (single writer): delete
    * previous-generation files whose post-commit removal crashed, and
    * uncommitted maintenance-output files from a crashed run. Fresh
    * appends (unknown, unprefixed) are untouched. No-op without a
    * manifest. */
  def recover(tableDir: String): Unit = {
    val fs = fsFor(tableDir)
    lastTwo(tableDir).foreach { case (cur, prev) =>
      val curSet = cur.toSet
      val prevSet = prev.toSet
      listDataFiles(fs, new Path(tableDir)).foreach { f =>
        val base = f.split('/').last
        if (!curSet(f)) {
          if (prevSet(f) || MaintPrefixes.exists(base.startsWith))
            fs.delete(new Path(tableDir, f), false)
        }
      }
    }
  }

  /** Snapshot-resolved file list: the current generation's files plus
    * fresh appends (files in the listing unknown to BOTH retained
    * generations and not maintenance-prefixed). Returned as absolute
    * child paths of `tableDir`. */
  def resolve(tableDir: String): Option[Seq[String]] =
    lastTwo(tableDir).map { case (cur, prev) =>
      val fs = fsFor(tableDir)
      val known = cur.toSet ++ prev.toSet
      val appends = listDataFiles(fs, new Path(tableDir)).filter { f =>
        val base = f.split('/').last
        !known(f) && !MaintPrefixes.exists(base.startsWith)
      }
      (cur ++ appends).map(f => new Path(tableDir, f).toString)
    }

  /** Reader-atomic replacement of `olds` (absolute paths under
    * `tableDir`) by `df`'s rows, materialized under `destDir` with
    * `prefix`-tagged names: write hidden → move in (complete files,
    * uncommitted — snapshot readers ignore them) → ONE manifest commit
    * (the atomicity point) → delete `olds`. The shared building block
    * of manifest-managed compaction and partition merges; a crash at
    * any step heals at the next run's [[recover]]. */
  private[pipeline] def replaceFiles(spark: SparkSession,
      tableDir: String, destDir: String, df: DataFrame, prefix: String,
      olds: Seq[String]): Unit = {
    require(MaintPrefixes.contains(prefix),
      s"unregistered maintenance prefix $prefix")
    val fs = fsFor(tableDir)
    val tmpDir = new Path(destDir, s".${prefix}tmp").toString
    fs.delete(new Path(tmpDir), true)
    df.write.mode("overwrite").parquet(tmpDir)
    val runId = java.util.UUID.randomUUID().toString.take(8)
    val placed = fs.listStatus(new Path(tmpDir)).toSeq.map(_.getPath)
      .filter(p => !p.getName.startsWith("_") &&
        !p.getName.startsWith("."))
      .map { p =>
        val dest = new Path(destDir, s"$prefix${runId}_${p.getName}")
        if (!fs.rename(p, dest))
          throw new java.io.IOException(s"manifest: cannot place $dest")
        dest
      }
    val oldRels = olds.map(p => relativize(tableDir, p)).toSet
    val cur = resolve(tableDir).getOrElse(Seq.empty)
      .map(p => relativize(tableDir, p))
    commit(tableDir, cur.filterNot(oldRels) ++
      placed.map(p => relativize(tableDir, p.toString)))
    olds.foreach(p => fs.delete(new Path(p), false))
    fs.delete(new Path(tmpDir), true)
  }

  /** Table-relative form of an absolute child path (URI-scheme and
    * slash-form differences canonicalized) — the representation
    * manifest generations store. */
  private[pipeline] def relativize(tableDir: String, abs: String): String = {
    val root = new Path(tableDir).toUri.getPath.stripSuffix("/")
    val p = new Path(abs).toUri.getPath
    require(p.startsWith(root + "/"),
      s"$abs is not under table dir $tableDir")
    p.stripPrefix(root + "/")
  }

  /** Read through the manifest when one exists (snapshot isolation for
    * this resolve: maintenance commits concurrent with the read cannot
    * make files vanish mid-plan — originals outlive the commit until
    * the writer's deferred delete, and [[Maintain]]'s manifest-aware
    * protocols place replacements before removing anything). Falls back
    * to a plain directory read when the table is not manifest-managed.
    * `basePath` keeps Hive partition columns alive on leaf-file
    * reads. */
  def readSnapshot(spark: SparkSession, tableDir: String): DataFrame =
    resolve(tableDir) match {
      case None => spark.read.parquet(tableDir)
      case Some(files) =>
        if (files.isEmpty)
          spark.read.parquet(tableDir).limit(0)
        else
          spark.read.option("basePath", tableDir).parquet(files: _*)
    }
}
