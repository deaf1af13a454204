package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, BooleanType, DataType, LongType}

/** `graft_bloom_any(bloom BINARY, hashes ARRAY<BIGINT>)` — true when the
  * sketch might contain ANY of the hashes. Spark's own
  * `BloomFilterMightContain` requires its sketch argument foldable or a
  * scalar subquery (one sketch broadcast to many probe rows — the
  * runtime-filter shape); this is the TRANSPOSED shape: MANY sketches,
  * one row each, probed against a small literal hash set — the
  * file-skipping planning scan ([[graft.pipeline.Skipping]]), where
  * collecting the sketches to the driver would be the scale-killer
  * (per-file MB-scale sketches × the corpus file count). Executors
  * deserialize each row's sketch once and probe the hash array; only
  * boolean verdicts (and, upstream, matched file names) leave the plan.
  *
  * Deserialization per row is inherent (every row IS a distinct
  * sketch); the input is the one-row-per-file stats table, so the cost
  * is the planning path's, not the data path's. Hash elements must be
  * non-null (callers pass `xxhash64` of literals — never null). */
case class BloomMightContainAny(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_any expects (binary, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(bloom: Any, hashes: Any): Any =
    Bloom.mightContainAny(bloom.asInstanceOf[Array[Byte]],
      hashes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, h) => {
      val helper = Bloom.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"$helper.mightContainAny($b, $h)"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_bloom_any"
}

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
  * the `might_contain` codegen all come from Spark. We add the registry
  * entries (with a convenience cast of the item-count argument to the
  * LONG the aggregate requires) plus ONE custom expression —
  * [[BloomMightContainAny]] — for the per-row-sketch shape Spark's
  * probe cannot express.
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

  /** Called from generated code — keep the signature stable. */
  def mightContainAny(bloom: Array[Byte], hashes: ArrayData): Boolean = {
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloom))
    var i = 0
    while (i < hashes.numElements()) {
      if (bf.mightContainLong(hashes.getLong(i))) return true
      i += 1
    }
    false
  }

  val bloomAnyBuilder: Seq[Expression] => Expression =
    exprs => BloomMightContainAny(exprs(0), exprs(1))

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
    // idempotent: skip when already present (avoids re-register WARNs)
    if (spark.sessionState.functionRegistry
        .functionExists(FunctionIdentifier("graft_bloom_any"))) return
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
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_bloom_any"),
      new ExpressionInfo(classOf[BloomMightContainAny].getName,
        "graft_bloom_any"),
      bloomAnyBuilder)
  }
}
