package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

import graft.functions.{CompressionRatio, CosineSimilarity, JaroWinklerSimilarity, RollingHashWindows, WinnowMin}

/** Production entry point for the engine's custom Catalyst surface:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers the native expressions (`cosine_sim`, `rolling_hash`,
  * `jaro_winkler`, `winnow_min`) in every session and installs the
  * optimizer rules. The
  * per-session `register(spark)` helpers on each function object remain for
  * programmatic use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashWindows].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHashWindows(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinklerSimilarity].getName,
        "jaro_winkler"),
      (exprs: Seq[Expression]) => JaroWinklerSimilarity(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("winnow_min"),
      new ExpressionInfo(classOf[WinnowMin].getName, "winnow_min"),
      (exprs: Seq[Expression]) => WinnowMin(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName,
        "compression_ratio"),
      (exprs: Seq[Expression]) => CompressionRatio(exprs.head)))
    // bloom sketch pair (Catalyst's own expressions; see functions/Bloom)
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      graft.functions.Bloom.bloomAggBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      graft.functions.Bloom.mightContainBuilder))
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_any"),
      new ExpressionInfo(
        classOf[graft.functions.BloomMightContainAny].getName,
        "graft_bloom_any"),
      graft.functions.Bloom.bloomAnyBuilder))
    ext.injectOptimizerRule(_ => EmptyVectorCosineFold)
    // manifest resolution BEFORE stats pruning: pruning then operates
    // on the snapshot-resolved listing (plans/ManifestResolve)
    ext.injectOptimizerRule(s => graft.plans.ManifestResolve(s))
    ext.injectOptimizerRule(s => graft.plans.SkippingFilePrune(s))
  }
}

/** Optimizer rule: if either side of `cosine_sim` is a foldable EMPTY
  * array, the whole per-row loop is dead code — the expression's contract
  * makes the result 0.0 for any non-null other side (n = min(|a|,|b|) = 0
  * ⇒ zero norms), and null when the other side is null. Built-in
  * ConstantFolding only fires when BOTH children are foldable; this rule
  * eliminates the O(corpus × dim) work when one side is a degenerate
  * literal (e.g. a mis-configured query vector), keeping only the null
  * check per row. Demonstrates the `injectOptimizerRule` surface with a
  * sound, behavior-preserving rewrite (spec-tested for both the rewrite
  * and result equality).
  */
object EmptyVectorCosineFold extends Rule[LogicalPlan] {
  private def isEmptyArrayLit(e: Expression): Boolean = e.foldable && {
    val v = e.eval(null)
    v != null &&
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .numElements() == 0
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case CosineSimilarity(l, r) if isEmptyArrayLit(l) =>
        org.apache.spark.sql.catalyst.expressions.If(
          org.apache.spark.sql.catalyst.expressions.IsNull(r),
          Literal(null, DoubleType), Literal(0.0, DoubleType))
      case CosineSimilarity(l, r) if isEmptyArrayLit(r) =>
        org.apache.spark.sql.catalyst.expressions.If(
          org.apache.spark.sql.catalyst.expressions.IsNull(l),
          Literal(null, DoubleType), Literal(0.0, DoubleType))
    }
}
