package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row SimHash kernel: 64 signed bit-sums in one pass over the
  * token array. Token hash = first 8 md5 bytes big-endian — identical
  * to `shiftleft(h32(tok),32) | conv(substring(md5(tok),9,8),16,10)`,
  * the value the composable SWAR formulation uses, so signatures are
  * interchangeable between the two forms (SimHashNativeSpec pins it). */
object SimHashKernel {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Signature of an (already-distinct) token array: bit i is set iff
    * at least half the tokens have md5-bit i set (Σ±1 ≥ 0 ⟺
    * 2·count ≥ n — the same sign recovery as the SWAR aggregation). */
  def sign(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](64)
    val d = digest.get()
    var t = 0
    while (t < n) {
      d.reset()
      val md = d.digest(tokens.getUTF8String(t).getBytes)
      val th =
        ((md(0) & 0xffL) << 56) | ((md(1) & 0xffL) << 48) |
        ((md(2) & 0xffL) << 40) | ((md(3) & 0xffL) << 32) |
        ((md(4) & 0xffL) << 24) | ((md(5) & 0xffL) << 16) |
        ((md(6) & 0xffL) << 8) | (md(7) & 0xffL)
      var i = 0
      while (i < 64) {
        counts(i) += ((th >>> i) & 1L).toInt
        i += 1
      }
      t += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (2 * counts(i) >= n) sig |= (1L << i)
      i += 1
    }
    sig
  }
}

/** `simhash_sig(tokens)` → the 64-bit SimHash signature as a long.
  *
  * Replaces the composable formulation — positions-explode of every
  * token, 4-lane SWAR bit packing, a 16-buffer sum aggregation, and a
  * 64-term bit-reassembly projection — with one imperative pass per
  * row. The plan consequence is the point at scale: the signature
  * becomes a pure scan-side projection (like `minhash_sig`), so the
  * corpus is never exploded token-per-row and the only shuffle left in
  * SimHash dedup is the slim band-tuple self-join. Callers pass the
  * DISTINCT token array (`array_distinct(tokens(text))`), matching the
  * SWAR form's staging.
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  // An empty token array has no defined signature: sign() would emit
  // all-64-bits-set (2·0 ≥ 0 for every bit), making every tokenless doc
  // a Hamming-0 "near-dup" of every other one. NULL instead — a null
  // band value never satisfies a join equality, so such docs simply
  // produce no candidate pairs (the same outcome as the SWAR form,
  // whose explode drops them entirely).
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() == 0) null else SimHashKernel.sign(a)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"""if ($in.numElements() == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.SimHashKernel.sign($in);
         |}""".stripMargin)

  override protected def withNewChildInternal(c: Expression): SimHashSig =
    copy(child = c)
}
