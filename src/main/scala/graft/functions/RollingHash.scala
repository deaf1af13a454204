package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: polynomial rolling hashes of every k-length
  * character window of a string ([EXT] document fingerprinting — the
  * winnowing/Rabin-Karp primitive). Returns `array<long>` of n-k+1 window
  * hashes computed in O(n) via the rolling update
  * `h' = (h - s[i]·B^(k-1))·B + s[i+k]` over 64-bit modular arithmetic
  * (wrapping multiply/add — exact, deterministic, platform-independent).
  *
  * A UDF would box every string and allocate per call; this runs inside
  * whole-stage codegen against UTF8String bytes. Downstream winnowing
  * (min-per-window selection) composes with built-in higher-order
  * functions — see TextAnalysis.q53Winnowing.
  */
case class RollingHashWindows(left: Expression, right: Expression)
    extends BinaryExpression {

  private val B = 1000003L // polynomial base

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash expects (string, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(str: Any, kAny: Any): Any = {
    val bytes = str.asInstanceOf[UTF8String].getBytes
    val k = kAny.asInstanceOf[Int]
    if (k <= 0 || bytes.length < k) return new GenericArrayData(Array.empty[Long])
    val n = bytes.length
    val out = new Array[Long](n - k + 1)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    out(0) = h
    i = 1
    while (i <= n - k) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * B + (bytes(i + k - 1) & 0xFF)
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, k) => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val pow = ctx.freshName("pow")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val arrCls = classOf[GenericArrayData].getName
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $n = $bytes.length;
         |if ($k <= 0 || $n < $k) {
         |  ${ev.value} = new $arrCls(new long[0]);
         |} else {
         |  long[] $out = new long[$n - $k + 1];
         |  long $pow = 1L;
         |  for (int $i = 1; $i < $k; $i++) $pow *= ${B}L;
         |  long $h = 0L;
         |  for (int $i = 0; $i < $k; $i++) $h = $h * ${B}L + ($bytes[$i] & 0xFF);
         |  $out[0] = $h;
         |  for (int $i = 1; $i <= $n - $k; $i++) {
         |    $h = ($h - ($bytes[$i - 1] & 0xFF) * $pow) * ${B}L
         |      + ($bytes[$i + $k - 1] & 0xFF);
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new $arrCls($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "rolling_hash"
}

object RollingHash {
  /** Register `rolling_hash(str, k)` in the session function registry. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHashWindows].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHashWindows(exprs(0), exprs(1)))
}
