package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine-similarity kernel over two `array<float>` columns.
  *
  * The composable form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * is correct but runs on the interpreted higher-order-function path:
  * per element it allocates lambda variables and boxes through
  * `InternalRow`s, and the expression is opaque to whole-stage codegen.
  * This Expression is the "(b) custom Catalyst Expression" rung of the
  * extension ladder: `doGenCode` emits a tight primitive loop directly
  * over the two `ArrayData` buffers — no boxing, no allocation, fully
  * inside the stage's generated method — and `nullSafeEval` provides
  * the identical interpreted fallback.
  *
  * Float elements are widened to double and accumulated in index order,
  * bit-identical to the HOF formulation (CosineNativeSpec asserts
  * equality on every corpus pair; the oracle-checked
  * `sim_cosine_native` query pins it against DuckDB too).
  *
  * Shorter arrays dominate: ALL THREE accumulators — dot product and
  * both norms — run over min(len(a), len(b)) in one fused loop. For
  * unequal lengths that is neither `zip_with` null-padding nor
  * full-length norms; the contract here is fixed-width embeddings
  * (64) on both sides, where the distinction vanishes. Extending to
  * variable-length vectors requires choosing (and implementing) a
  * per-side norm. Returns null if either input is null; NaN
  * propagates like plain double arithmetic (0-norm → NaN via 0/0).
  */
case class CosineSimF32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> inputs, " +
        s"got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($x.numElements(), $y.numElements());
        double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $x.getFloat($i);
          double $yi = (double) $y.getFloat($i);
          $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF32 =
    copy(left = newLeft, right = newRight)
}

object CosineSimF32 {
  /** Register the library's kernels (this one included) in the
    * session's function registry so they are callable via
    * `call_function`/SQL. Delegates to [[graft.GraftExtensions]] — the
    * `spark.sql.extensions=graft.GraftExtensions` config is the
    * cluster-wide equivalent. Idempotent. */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerAll(spark)
}
