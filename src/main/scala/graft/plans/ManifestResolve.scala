package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitioningAwareFileIndex}

/** Optimizer rule making [[graft.pipeline.Manifest]] snapshots
  * TRANSPARENT: a plain `spark.read.parquet(dir)` / `spark.sql` scan of
  * a manifest-managed table resolves its file list through the current
  * manifest generation — so EVERY reader (not just callers of the
  * explicit `Manifest.readSnapshot` API) sees the complete old or
  * complete new state during concurrent maintenance, never the
  * uncommitted replacements or half-swapped file sets a raw listing can
  * catch. This is the same ergonomic step [[SkippingFilePrune]] takes
  * for file skipping: the analyst writes nothing, the planner does the
  * resolution.
  *
  * Mechanics: for a single-root relation whose root carries a
  * `_manifest_g<N>` generation, the scan's listing is replaced (same
  * [[InMemoryFileIndex]] swap as SkippingFilePrune, partition spec
  * carried, never re-inferred) by `Manifest.resolve` — the current
  * generation's files plus fresh appends. The rewrite fires only when
  * the resolved set actually differs from the scan's listing (at rest
  * they are identical, so steady-state plans are untouched), and it
  * marks the relation so it composes with SkippingFilePrune instead of
  * fighting it: this rule is registered FIRST, so stats pruning then
  * operates on the snapshot-resolved listing.
  *
  * Planning cost: ONE `fs.exists` on the fixed-name
  * `_manifest_CURRENT` marker per scanned relation (never a root
  * listStatus — [[graft.pipeline.Manifest.exists]]'s contract, spec'd
  * by counting root listings during planning of unmanaged queries),
  * plus one tiny manifest read when present. */
case class ManifestResolve(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import ManifestResolve.AppliedKey

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case lr: LogicalRelation
        if lr.relation.isInstanceOf[HadoopFsRelation] && {
          val o = lr.relation.asInstanceOf[HadoopFsRelation].options
          // never touch a relation this rule or the pruning rule
          // already rewrote (the pruned listing is a deliberate subset)
          !o.contains(AppliedKey) &&
            !o.contains(SkippingFilePrune.AppliedKey)
        } =>
      val hfs = lr.relation.asInstanceOf[HadoopFsRelation]
      val rewritten =
        for {
          root <- hfs.location.rootPaths match {
            case Seq(p) => Some(p.toString)
            case _ => None
          }
          if graft.pipeline.Manifest.exists(root)
          spec <- hfs.location match {
            case p: PartitioningAwareFileIndex
                if hfs.partitionSchema.nonEmpty =>
              Some(Some(p.partitionSpec()))
            case _ if hfs.partitionSchema.isEmpty => Some(None)
            case _ => None
          }
          resolved <- graft.pipeline.Manifest.resolve(root)
          // the carried partitionSpec is authoritative for the rewritten
          // index (never re-inferred) — so a resolved file in a BRAND-NEW
          // partition directory (a fresh append that created the dir
          // after this scan's listing) would be silently dropped from
          // the rewritten listing. Skip the rewrite instead: the scan's
          // own listing predates the append (a listing that caught the
          // new files would have caught the new directory in its spec),
          // so the fallback is the complete pre-append state — stale,
          // never row-losing. The one theoretical exception (listing
          // taken between a maintenance placement and a same-window
          // new-partition append shows uncommitted duplicates for one
          // plan) trades against the old behavior's silent row DROP,
          // and heals at the next planning pass, whose spec includes
          // the directory.
          if spec.forall { ps =>
            val dirs = ps.partitions.map(p => canon(p.path.toString))
            resolved.forall { f =>
              val cf = canon(f)
              dirs.exists(d => cf.startsWith(d + "/"))
            }
          }
          listing = hfs.location.inputFiles.toSeq
          // rewrite only when maintenance state diverges the two views
          if resolved.map(canon).toSet != listing.map(canon).toSet
        } yield {
          val index = new InMemoryFileIndex(spark,
            resolved.map(new Path(_)),
            Map("basePath" -> root),
            Some(hfs.dataSchema),
            FileStatusCache.getOrCreate(spark),
            spec, None)
          lr.copy(relation = HadoopFsRelation(index, hfs.partitionSchema,
            hfs.dataSchema, hfs.bucketSpec, hfs.fileFormat,
            hfs.options + (AppliedKey -> "true"))(spark))
        }
      rewritten.getOrElse(lr)
  }

  private def canon(s: String): String = new Path(s).toUri.getPath
}

object ManifestResolve {

  /** Marker option on rewritten relations — idempotence across
    * optimizer iterations. */
  val AppliedKey = "graft.manifest.resolved"

  /** Activate for this session's future queries. PREPENDED so the
    * snapshot resolution runs before [[SkippingFilePrune]] within the
    * user-rule batch — stats pruning then prunes the resolved
    * listing. */
  def register(spark: SparkSession): Unit = {
    val rule = ManifestResolve(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[ManifestResolve]))
      spark.experimental.extraOptimizations =
        rule +: spark.experimental.extraOptimizations
  }
}
