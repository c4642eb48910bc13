package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword table: the vocabulary bucketed by
  * token length for O(maxLen) probes per position. Built ONCE per
  * expression instance from the foldable vocab literal — never per
  * row. */
final class SubwordTable(vocab: Array[String]) extends Serializable {
  val maxLen: Int = if (vocab.isEmpty) 0 else vocab.map(_.length).max
  private val set = new java.util.HashSet[String](vocab.length * 2)
  vocab.foreach(set.add)
  def contains(s: String): Boolean = set.contains(s)
}

object SubwordKernel {
  /** WordPiece-style greedy longest-prefix-match: at each position
    * take the LONGEST vocabulary token matching the remaining prefix;
    * no match → emit the single character (the tokenizer alphabet is
    * closed, so encoding always terminates in ≤ len steps and is
    * trivially reversible by concatenation). Deterministic: two
    * same-length matches at one position are the same string, so
    * "longest" needs no tie-break. */
  def encode(word: UTF8String, t: SubwordTable): ArrayData = {
    val s = word.toString
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < s.length) {
      var l = math.min(t.maxLen, s.length - pos)
      var tok: String = null
      while (l >= 1 && tok == null) {
        val cand = s.substring(pos, pos + l)
        if (t.contains(cand)) tok = cand else l -= 1
      }
      // fallback advances one CODE POINT, not one char — slicing a
      // surrogate pair in half would emit lone surrogates that decode
      // to '?', breaking the concatenation-reversibility contract for
      // astral-plane input
      if (tok == null) tok = s.substring(pos, s.offsetByCodePoints(pos, 1))
      out += UTF8String.fromString(tok)
      pos += tok.length
    }
    new GenericArrayData(out.toArray)
  }
}

/** `subword_encode(word, vocab)` → array of subword tokens by greedy
  * longest-match against `vocab` (a foldable array<string> literal —
  * typically the driver-collected top-K corpus words, a bounded
  * driver collect like the repo's code lists). Native kernel on the
  * [[NfcNormalize]] pattern: a static per-row call shared by
  * interpreted eval and codegen, so the encode stays inside
  * whole-stage codegen. The per-instance [[SubwordTable]] is built
  * once from the literal and shipped via `addReferenceObj`.
  *
  * Scale shape: encode DISTINCT words (a corpus's word universe is
  * millions, not billions), then join token arrays back to documents
  * if per-doc ids are needed — the kernel itself is scan-local,
  * O(len · maxVocabTokenLen) hash probes per word. */
case class SubwordEncode(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable vocabulary literal")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, array<string>), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "subword_encode"

  /** None when the foldable vocab evaluates to NULL — the expression
    * is then null for every row (SQL null propagation), matching what
    * interpreted eval does. NULL elements inside the array are
    * skipped (they can't match any prefix). */
  @transient private lazy val tableOpt: Option[SubwordTable] =
    Option(right.eval(null).asInstanceOf[ArrayData]).map { arr =>
      new SubwordTable((0 until arr.numElements())
        .filterNot(arr.isNullAt)
        .map(arr.getUTF8String(_).toString).toArray)
    }

  override def nullSafeEval(word: Any, vocab: Any): Any =
    SubwordKernel.encode(word.asInstanceOf[UTF8String], tableOpt.get)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = tableOpt match {
    case None =>
      // null vocab literal → constant-null result; don't even
      // evaluate the word child
      ExprCode.forNullValue(dataType)
    case Some(table) =>
      // generate code for the WORD child only: the vocab is foldable
      // and already baked into the reference object — nullSafeCodeGen
      // over both children would materialize the ignored array per row
      import org.apache.spark.sql.catalyst.expressions.codegen.Block._
      val tableRef = ctx.addReferenceObj("subwordTable", table,
        classOf[SubwordTable].getName)
      val javaType = org.apache.spark.sql.catalyst.expressions.codegen
        .CodeGenerator.javaType(dataType)
      val wordGen = left.genCode(ctx)
      ev.copy(code =
        code"""
          ${wordGen.code}
          boolean ${ev.isNull} = ${wordGen.isNull};
          $javaType ${ev.value} = null;
          if (!${ev.isNull}) {
            ${ev.value} = graft.functions.SubwordKernel.encode(
              ${wordGen.value}, $tableRef);
          }""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubwordEncode =
    copy(left = newLeft, right = newRight)
}
