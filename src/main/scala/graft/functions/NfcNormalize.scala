package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC kernel. Canonical composition is the first step of any
  * text pipeline that hashes, dedups, or fingerprints bytes: "café"
  * spelled e+◌́ and é are the same text but different bytes, so
  * without NFC every digest-keyed operator (exact dedup, shingles,
  * minhash, span removal) silently treats them as distinct documents.
  * Spark has no built-in; this is the [[RollingFpKernel]] pattern — a
  * static per-row call shared by interpreted eval and codegen.
  *
  * The fast path matters at corpus scale and is two-tiered: a pure
  * byte scan returns ASCII rows (the overwhelming majority) with ZERO
  * allocation — no String decode at all — and only non-ASCII rows pay
  * the String round-trip, where `isNormalized` still avoids the
  * normalize allocation for already-composed text. */
object NfcKernel {
  private val Form = java.text.Normalizer.Form.NFC

  def nfc(s: UTF8String): UTF8String = {
    // ASCII is closed under NFC: every byte < 0x80 → already normal
    val n = s.numBytes()
    var i = 0
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, Form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, Form))
  }
}

/** `nfc_normalize(text)` → the NFC canonical composition of `text`.
  * The oracle-checked `text_normalize` query pins byte-identical
  * output against DuckDB's `nfc_normalize` (both implement UAX #15,
  * which is fully specified — engines can only disagree on codepoints
  * unassigned in one of their Unicode versions, which curated corpora
  * do not contain). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(v: Any): Any =
    NfcKernel.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.NfcKernel.nfc($in);")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}
