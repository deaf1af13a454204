package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.types.LongType

/** SQL surface over Catalyst's OWN bloom-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the exact pair
  * the optimizer injects for runtime join filters
  * (`InjectRuntimeFilter`), exposed as callable functions so an operator
  * can build the same shape DECLARATIVELY where the optimizer's
  * heuristics wouldn't fire (our case: the anti-join diff, which
  * InjectRuntimeFilter skips — it only prunes probe sides of equi-joins
  * it can prove selective).
  *
  * Nothing is reimplemented: sketch building, merge, serialization, and
  * the `might_contain` codegen all come from Spark. We add only the
  * registry entries (with a convenience cast of the item-count argument
  * to the LONG the aggregate requires).
  *
  * `graft_bloom_agg(xxhash64(k), n)` aggregates to one BINARY sketch
  * sized for n items at 8 bits/item (~2% FPP — Spark's own default
  * ratio); `graft_might_contain(bloom, xxhash64(k))` is the probe.
  * `might_contain` requires its sketch argument constant-foldable or a
  * scalar subquery — pass the aggregate THROUGH a scalar subquery, which
  * Spark plans as a one-row broadcast to every probe task (the runtime
  * filter's distribution model: the sketch ships once per executor, the
  * probe is map-side, zero shuffle on the probed table).
  */
object Bloom {
  /** Builder shared by the per-session registry and `GraftExtensions`. */
  val bloomAggBuilder: Seq[Expression] => Expression = {
    case Seq(child) => new BloomFilterAggregate(child)
    case Seq(child, n) =>
      new BloomFilterAggregate(child, Cast(n, LongType))
    case Seq(child, n, bits) =>
      new BloomFilterAggregate(child, Cast(n, LongType),
        Cast(bits, LongType))
    case exprs => throw new IllegalArgumentException(
      s"graft_bloom_agg expects 1-3 args, got ${exprs.size}")
  }

  val mightContainBuilder: Seq[Expression] => Expression =
    exprs => BloomFilterMightContain(exprs(0), exprs(1))

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      bloomAggBuilder)
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName,
        "graft_might_contain"),
      mightContainBuilder)
  }
}
