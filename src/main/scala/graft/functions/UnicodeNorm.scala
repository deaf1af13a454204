package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (`NFC`/`NFD`/
  * `NFKC`/`NFKD`) of a string — the curation primitive that must run
  * BEFORE any text dedup or fingerprinting, because visually identical
  * text with different codepoint sequences ("é" composed vs "e"+U+0301)
  * otherwise hashes to different shingles/signatures and near-dups slip
  * through ([EXT] text analysis; Spark has no built-in for this —
  * `lower`/`trim` etc. all operate on raw codepoints).
  *
  * Fast path: pure-ASCII inputs (the overwhelming majority of most
  * corpora) are already normalized under every form — detected with one
  * byte scan over the UTF8String, no decode, no allocation. Only
  * non-ASCII strings pay the JDK normalizer (`java.text.Normalizer`,
  * itself skipping work via `isNormalized`). Runs inside whole-stage
  * codegen; a UDF would box every row.
  */
case class UnicodeNormalize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"unicode_norm expects (string, form string), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(str: Any, formAny: Any): Any = {
    val s = str.asInstanceOf[UTF8String]
    if (UnicodeNormalize.isAscii(s)) s
    else {
      val form = java.text.Normalizer.Form.valueOf(
        formAny.asInstanceOf[UTF8String].toString.toUpperCase)
      UTF8String.fromString(
        java.text.Normalizer.normalize(s.toString, form))
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (str, form) => {
      val helper = UnicodeNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"""
         |if ($helper.isAscii($str)) {
         |  ${ev.value} = $str;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str.toString(),
         |      java.text.Normalizer.Form.valueOf(
         |        $form.toString().toUpperCase())));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "unicode_norm"
}

object UnicodeNormalize {
  /** One byte scan, no decode: UTF-8 is ASCII iff no byte has the high
    * bit set. Called from generated code — keep the signature stable. */
  def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }

  /** Register `unicode_norm(str, 'NFC'|'NFD'|'NFKC'|'NFKD')`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("unicode_norm"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "unicode_norm"),
      (exprs: Seq[Expression]) => UnicodeNormalize(exprs(0), exprs(1)))
}
