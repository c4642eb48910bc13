package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row rolling-fingerprint kernel shared by the interpreted eval
  * and the generated code (one static call — like MinHashKernel, the
  * win is escaping the interpreted higher-order-function tree, which
  * re-walks a transform per gram). */
object RollingFpKernel {

  val K = 8 // gram width (chars)
  val Bottom = 4 // sketch size

  /** Bottom-4 of the 32-bit gram hashes over every K-char gram of `s`
    * (single whole-string gram when shorter than K), joined with '-'
    * in ascending order — value-identical to the composable form
    *   concat_ws("-", slice(array_sort(transform(grams, h32)), 1, 4))
    * including duplicate hash values (a multiset bottom-k, not a
    * distinct one). */
  def fingerprint(s: UTF8String): UTF8String = {
    val n = s.numChars()
    val count = math.max(n - (K - 1), 1)
    val bottom = new Array[Long](Bottom)
    var filled = 0
    var i = 0
    while (i < count) {
      val h = MinHashKernel.h32(s.substring(i, math.min(i + K, n)))
      if (filled < Bottom) {
        // insertion sort into the not-yet-full sketch
        var j = filled - 1
        filled += 1
        while (j >= 0 && bottom(j) > h) {
          bottom(j + 1) = bottom(j); j -= 1
        }
        bottom(j + 1) = h
      } else if (h < bottom(Bottom - 1)) {
        var j = Bottom - 2
        while (j >= 0 && bottom(j) > h) {
          bottom(j + 1) = bottom(j); j -= 1
        }
        bottom(j + 1) = h
      }
      i += 1
    }
    val sb = new java.lang.StringBuilder(48)
    var j = 0
    while (j < filled) {
      if (j > 0) sb.append('-')
      sb.append(bottom(j))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `rolling_fp(normalized_text)` → bottom-4 rolling k-gram hash
  * fingerprint as a '-'-joined string.
  *
  * Replaces the interpreted chain `transform(sequence→substr)` →
  * `transform(md5→conv)` → `array_sort`/`slice`/`concat_ws`, which
  * walks every gram through four interpreted lambdas.
  * RollingFpNativeSpec asserts byte-identical output against that
  * composable form; the oracle-checked `text_fingerprint_rolling`
  * query pins the values against DuckDB. */
case class RollingFp(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "rolling_fp"

  override def nullSafeEval(v: Any): Any =
    RollingFpKernel.fingerprint(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.RollingFpKernel.fingerprint($in);")

  override protected def withNewChildInternal(c: Expression): RollingFp =
    copy(child = c)
}
