package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expression: distinct sliding-window minima of a long
  * array — the winnowing selection step (`winnow_min(hashes, w)`).
  *
  * The naive formulation `transform(seq, i -> array_min(slice(arr,i,w)))`
  * is O(n·w) with a fresh array copy per window; this is the classic
  * monotonic-deque sliding minimum: O(n) total, zero allocation beyond the
  * output. At 100 TB of documents the fingerprint stage is a full-corpus
  * scan, so the asymptotic difference is the difference between "cheap
  * map pass" and "dominant cost".
  */
case class WinnowMin(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"winnow_min expects (array<long>, int), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(arrAny: Any, wAny: Any): Any = {
    val arr = arrAny.asInstanceOf[ArrayData]
    val w = wAny.asInstanceOf[Int]
    val n = arr.numElements()
    if (w <= 0 || n == 0) return new GenericArrayData(Array.empty[Long])
    val win = math.min(w, n)
    val deque = new Array[Int](n) // indices, front..back monotone increasing values
    var head = 0; var tail = -1
    val out = new Array[Long](n - win + 1)
    var outN = 0
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail >= head && arr.getLong(deque(tail)) >= v) tail -= 1
      tail += 1; deque(tail) = i
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) {
        val m = arr.getLong(deque(head))
        // distinct consecutive: winnowing keeps each selected hash once
        if (outN == 0 || out(outN - 1) != m) { out(outN) = m; outN += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, outN))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, w) => {
      val n = ctx.freshName("n")
      val win = ctx.freshName("win")
      val deque = ctx.freshName("deque")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val out = ctx.freshName("out")
      val outN = ctx.freshName("outN")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val m = ctx.freshName("m")
      val arrCls = classOf[GenericArrayData].getName
      s"""
         |int $n = $arr.numElements();
         |if ($w <= 0 || $n == 0) {
         |  ${ev.value} = new $arrCls(new long[0]);
         |} else {
         |  int $win = Math.min($w, $n);
         |  int[] $deque = new int[$n];
         |  int $head = 0; int $tail = -1;
         |  long[] $out = new long[$n - $win + 1];
         |  int $outN = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = $arr.getLong($i);
         |    while ($tail >= $head && $arr.getLong($deque[$tail]) >= $v) $tail--;
         |    $deque[++$tail] = $i;
         |    if ($deque[$head] <= $i - $win) $head++;
         |    if ($i >= $win - 1) {
         |      long $m = $arr.getLong($deque[$head]);
         |      if ($outN == 0 || $out[$outN - 1] != $m) $out[$outN++] = $m;
         |    }
         |  }
         |  ${ev.value} = new $arrCls(java.util.Arrays.copyOf($out, $outN));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "winnow_min"
}

object WinnowMinFn {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_min"),
      new ExpressionInfo(classOf[WinnowMin].getName, "winnow_min"),
      (exprs: Seq[Expression]) => WinnowMin(exprs(0), exprs(1)))
}
