package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{FileStatusCache, HadoopFsRelation, InMemoryFileIndex, LogicalRelation, PartitioningAwareFileIndex}

/** Optimizer rule making [[graft.pipeline.Skipping]]'s file-level
  * min/max pruning TRANSPARENT: a plain `spark.read.parquet(dir)` /
  * `spark.sql` range query over a table that carries a `_skip_stats`
  * index scans only the files whose [min, max] can match — the analyst
  * writes the filter, the planner does the skipping, exactly the
  * Delta/Iceberg ergonomics on plain parquet directories. Without the
  * rule, only callers of the explicit `Skipping.readRange` API got the
  * benefit; the warehouse's SQL surface (`Warehouse.sql`) did not.
  *
  * What it rewrites: `Filter(cond, scan of a single-root, unpartitioned
  * parquet dir with skip stats)` where `cond` contains range/equality
  * conjuncts (`>=`, `>`, `<=`, `<`, `=`) on a `_skip_stats` column, or
  * an `=`/`IN (literals)` conjunct on a `_skip_bloom_<c>` column (the
  * bloom sketches are probed ENGINE-side through `graft_bloom_any` —
  * only names reach the planner). When both indexes apply, pruning
  * composes: each is a safe superset, so their intersection is too.
  * The scan's [[InMemoryFileIndex]] is replaced by one over the pruned
  * listing (stats-matched + stats-unknown files — the exact
  * [[graft.pipeline.Skipping.candidateFiles]] contract, computed from
  * the relation's OWN listing, no re-list); the Filter stays on top, so
  * semantics cannot change — pruning only ever drops files whose stats
  * PROVE no row can pass. Strict bounds are widened to inclusive
  * (superset-safe). Partitioned relations prune too — the original
  * partition-value spec is carried onto the pruned index (never
  * re-inferred from a file subset), so within-partition file skipping
  * COMPOSES with Catalyst's partition pruning; multi-root relations
  * are left alone.
  *
  * Scale: the rewrite costs one small parquet read of the stats table
  * at PLANNING time — the entire point: a 100 TB table's pruning
  * decision reads a one-row-per-file table instead of opening a million
  * footers. Idempotent per plan via an options marker.
  *
  * Register per session (`SkippingFilePrune.register(spark)`) or for
  * every session via `GraftExtensions`.
  */
case class SkippingFilePrune(spark: SparkSession)
    extends Rule[LogicalPlan] {

  import SkippingFilePrune.AppliedKey

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, lr: LogicalRelation)
        if lr.relation.isInstanceOf[HadoopFsRelation] &&
          !lr.relation.asInstanceOf[HadoopFsRelation].options
            .contains(AppliedKey) =>
      val hfs = lr.relation.asInstanceOf[HadoopFsRelation]
      val rewritten =
        for {
          root <- singleRoot(hfs)
          // PARTITIONED tables need the original partition-value spec
          // carried over (re-inference from a leaf-file subset could
          // drop or re-type values); non-partitioning-aware indexes
          // (catalog file indexes) are left alone
          spec <- hfs.location match {
            case p: PartitioningAwareFileIndex
                if hfs.partitionSchema.nonEmpty =>
              Some(Some(p.partitionSpec()))
            case _ if hfs.partitionSchema.isEmpty => Some(None)
            case _ => None
          }
          listing = hfs.location.inputFiles.toSeq
          pruned <- prunedListing(root, cond, lr, listing)
          if pruned.size < listing.size
        } yield {
          val index = new InMemoryFileIndex(spark,
            pruned.map(new Path(_)),
            Map("basePath" -> root),
            Some(hfs.dataSchema),
            FileStatusCache.getOrCreate(spark),
            spec, None)
          val rel = HadoopFsRelation(index, hfs.partitionSchema,
            hfs.dataSchema, hfs.bucketSpec, hfs.fileFormat,
            hfs.options + (AppliedKey -> "true"))(spark)
          Filter(cond, lr.copy(relation = rel))
        }
      rewritten.getOrElse(f)
  }

  /** Compose min/max range pruning and bloom equality pruning — each a
    * safe superset of the needed files, so the intersection (applying
    * the second prune to the first's survivors) is as well. */
  private def prunedListing(root: String, cond: Expression,
      lr: LogicalRelation, listing: Seq[String]): Option[Seq[String]] = {
    val afterRange =
      if (!statsExist(root)) None
      else rangeConjunct(cond, lr).flatMap { case (c, lo, hi) =>
        graft.pipeline.Skipping.pruneListing(spark, root, c, lo, hi,
          listing)
      }
    val base = afterRange.getOrElse(listing)
    val afterBloom = inConjunct(cond, lr).flatMap { case (c, vs) =>
      graft.pipeline.Skipping.pruneListingEq(spark, root, c, vs, base)
    }
    afterBloom.orElse(afterRange)
  }

  /** Catalyst literals carry INTERNAL values (UTF8String, Decimal, day
    * counts); the pruning helpers re-enter the public API via `lit`,
    * which takes EXTERNAL Scala values — convert, or string/date/decimal
    * columns would throw inside the optimizer. */
  private def ext(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  /** The first `c = v` / `c IN (v…)` conjunct with all-literal,
    * non-null values (any non-literal element defeats static pruning). */
  private def inConjunct(cond: Expression,
      lr: LogicalRelation): Option[(String, Seq[Any])] = {
    def splitAnd(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitAnd(l) ++ splitAnd(r)
      case other => Seq(other)
    }
    def nameOf(a: Attribute): Option[String] =
      lr.output.find(_.exprId == a.exprId).map(_.name)
    splitAnd(cond).iterator.flatMap {
      case In(a: Attribute, list)
          if list.nonEmpty && list.forall {
            case Literal(v, _) => v != null
            case _ => false
          } =>
        nameOf(a).map(n => (n, list.map {
          case l: Literal => ext(l)
        }))
      case EqualTo(a: Attribute, l @ Literal(v, _)) if v != null =>
        nameOf(a).map(n => (n, Seq(ext(l))))
      case EqualTo(l @ Literal(v, _), a: Attribute) if v != null =>
        nameOf(a).map(n => (n, Seq(ext(l))))
      case _ => None
    }.nextOption()
  }

  private def singleRoot(hfs: HadoopFsRelation): Option[String] =
    hfs.location.rootPaths match {
      case Seq(p) => Some(p.toString)
      case _ => None
    }

  private def statsExist(root: String): Boolean = {
    val p = new Path(root, "_skip_stats")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The first column with BOTH bounds derivable from top-level
    * conjuncts: `c >= lo`/`c > lo` and `c <= hi`/`c < hi`, or `c = v`
    * (both bounds at once). Literal-on-either-side forms accepted. */
  private def rangeConjunct(cond: Expression,
      lr: LogicalRelation): Option[(String, Any, Any)] = {
    def splitAnd(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitAnd(l) ++ splitAnd(r)
      case other => Seq(other)
    }
    val los = scala.collection.mutable.HashMap.empty[String, Any]
    val his = scala.collection.mutable.HashMap.empty[String, Any]
    def nameOf(a: Attribute): Option[String] =
      lr.output.find(_.exprId == a.exprId).map(_.name)
    splitAnd(cond).foreach {
      case GreaterThanOrEqual(a: Attribute, l: Literal) =>
        nameOf(a).foreach(los.getOrElseUpdate(_, ext(l)))
      case GreaterThan(a: Attribute, l: Literal) =>
        nameOf(a).foreach(los.getOrElseUpdate(_, ext(l)))
      case LessThanOrEqual(a: Attribute, l: Literal) =>
        nameOf(a).foreach(his.getOrElseUpdate(_, ext(l)))
      case LessThan(a: Attribute, l: Literal) =>
        nameOf(a).foreach(his.getOrElseUpdate(_, ext(l)))
      case LessThanOrEqual(l: Literal, a: Attribute) =>
        nameOf(a).foreach(los.getOrElseUpdate(_, ext(l)))
      case LessThan(l: Literal, a: Attribute) =>
        nameOf(a).foreach(los.getOrElseUpdate(_, ext(l)))
      case GreaterThanOrEqual(l: Literal, a: Attribute) =>
        nameOf(a).foreach(his.getOrElseUpdate(_, ext(l)))
      case GreaterThan(l: Literal, a: Attribute) =>
        nameOf(a).foreach(his.getOrElseUpdate(_, ext(l)))
      case EqualTo(a: Attribute, l: Literal) =>
        nameOf(a).foreach { n =>
          los.getOrElseUpdate(n, ext(l)); his.getOrElseUpdate(n, ext(l))
        }
      case EqualTo(l: Literal, a: Attribute) =>
        nameOf(a).foreach { n =>
          los.getOrElseUpdate(n, ext(l)); his.getOrElseUpdate(n, ext(l))
        }
      case _ => ()
    }
    // literal nulls can't bound a range (and lit(null) comparisons are
    // never true anyway — leave those plans alone)
    los.keys.toSeq.sorted.collectFirst {
      case c if his.contains(c) &&
          los(c) != null && his(c) != null =>
        (c, los(c), his(c))
    }
  }
}

object SkippingFilePrune {

  /** Marker option on rewritten relations — keeps the rule idempotent
    * across optimizer iterations. */
  val AppliedKey = "graft.skipping.pruned"

  /** Activate for this session's future queries (runtime alternative to
    * the `GraftExtensions` session-builder path). */
  def register(spark: SparkSession): Unit = {
    val rule = SkippingFilePrune(spark)
    if (!spark.experimental.extraOptimizations.exists(
        _.isInstanceOf[SkippingFilePrune]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ rule
  }
}
