package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expression: DEFLATE compression ratio of a string —
  * compressed bytes / raw bytes. The classic cheap redundancy signal
  * for corpus curation (Gopher-style rules drop documents that
  * compress "too well": boilerplate, keyword stuffing, generated
  * spam — and documents that compress "too poorly": binary noise,
  * base64 blobs). Deterministic for a fixed input (zlib level 6,
  * raw-deflate framing), but NOT SQL-expressible — the operator is
  * spec-pinned (monotonicity fixtures, determinism across calls)
  * rather than oracle-hashed.
  *
  * Empty strings surface ratio 1.0 (nothing to compress is not
  * "perfectly redundant"). Hot path: one thread-local Deflater reused
  * across rows (allocation per row would dominate); output buffer
  * grows geometrically for incompressible inputs. Runs inside
  * whole-stage codegen via a static helper call.
  */
case class CompressionRatio(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"compression_ratio expects string, got ${t.simpleString}")
    }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(input: Any): Any =
    CompressionRatio.ratio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val helper = CompressionRatio.getClass.getName.stripSuffix("$") +
        "$.MODULE$"
      s"$helper.ratio($c)"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)

  override def prettyName: String = "compression_ratio"
}

object CompressionRatio {

  private val deflaters = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater =
      new Deflater(Deflater.DEFAULT_COMPRESSION, /* nowrap = */ true)
  }

  /** Called from generated code — keep the signature stable. */
  def ratio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = deflaters.get()
    d.reset()
    d.setInput(raw)
    d.finish()
    var buf = new Array[Byte](math.max(64, raw.length / 2))
    var total = 0
    while (!d.finished()) {
      if (total == buf.length)
        buf = java.util.Arrays.copyOf(buf, buf.length * 2)
      total += d.deflate(buf, total, buf.length - total)
    }
    total.toDouble / raw.length.toDouble
  }

  /** Register `compression_ratio(str)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("compression_ratio"),
      new ExpressionInfo(classOf[CompressionRatio].getName,
        "compression_ratio"),
      (exprs: Seq[Expression]) => CompressionRatio(exprs.head))
}
