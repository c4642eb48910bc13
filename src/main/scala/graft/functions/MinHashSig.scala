package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The per-row MinHash kernel, shared by the interpreted eval and the
  * generated code (codegen emits one static call — the row work is
  * md5/string-heavy, so the win is escaping the interpreted
  * higher-order-function tree, not inlining arithmetic). */
object MinHashKernel {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the UTF-8 string, as an unsigned 32-bit value
    * in a long — identical to conv(substring(md5(s),1,8),16,10).
    * Shared with RollingFpKernel. */
  private[functions] def h32(s: UTF8String): Long = {
    val d = digest.get()
    d.reset()
    val md = d.digest(s.getBytes)
    ((md(0) & 0xffL) << 24) | ((md(1) & 0xffL) << 16) |
      ((md(2) & 0xffL) << 8) | (md(3) & 0xffL)
  }

  /** 3-token shingles (single joined shingle under 3 tokens), distinct,
    * hashed, then k universal-hash permutation minima:
    * min over shingles of (a_j·h + b_j) mod p. */
  def sign(tokens: ArrayData, a: Array[Long], b: Array[Long],
           p: Long): ArrayData = {
    val n = tokens.numElements()
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val seen = new java.util.HashSet[Long]() // distinct by 32-bit hash
    def absorb(sh: UTF8String): Unit = {
      val h = h32(sh)
      if (seen.add(h)) {
        var j = 0
        while (j < k) {
          val v = java.lang.Math.floorMod(a(j) * h + b(j), p)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
    }
    if (n < 3) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i < n) { parts(i) = tokens.getUTF8String(i); i += 1 }
      absorb(UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
    } else {
      var i = 0
      while (i + 2 < n) {
        absorb(UTF8String.concatWs(UTF8String.fromString(" "),
          tokens.getUTF8String(i), tokens.getUTF8String(i + 1),
          tokens.getUTF8String(i + 2)))
        i += 1
      }
    }
    new GenericArrayData(mins)
  }
}

/** `minhash_sig(tokens)` → array<long> of the k MinHash values.
  *
  * Replaces the composable chain — `shinglesOf` (sequence + transform +
  * concat_ws) → array_distinct → transform(md5→h32) → k ×
  * array_min(transform(permutation)) — which runs entirely on the
  * interpreted HOF path and re-walks the shingle array k+2 times. One
  * imperative pass per row computes identical values
  * (MinHashNativeSpec asserts element-for-element equality against the
  * HOF formulation).
  *
  * Distinctness is by 32-bit shingle hash rather than shingle text —
  * indistinguishable downstream, because a colliding pair of shingles
  * contributes the same h to every permutation anyway.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.sign(v.asInstanceOf[ArrayData], aArr, bArr, p)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = graft.functions.MinHashKernel.sign($in, $aRef, $bRef, ${p}L);")
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

object MinHashSig {
  /** Universal-hash permutation defaults: minhash_j(h) = (a_j·h + b_j)
    * mod P. a_j < 2^30 keeps a_j·h < 2^62 (no overflow); P prime >
    * 2^32. One md5 per shingle + k multiply-adds replaces k md5s per
    * shingle — the difference between scan-speed and hours at 100 TB.
    * Deterministic (LCG-derived) so signatures are stable across runs
    * and sessions — a requirement for incremental dedup, where today's
    * signatures join against last month's. */
  val DefaultP = 4294967311L
  val DefaultK = 16
  val defaultAB: Seq[(Long, Long)] = {
    var x = 1103515245L
    (0 until DefaultK).map { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L) >>> 3
      val a = (x % (1L << 30)) | 1L
      x = (x * 6364136223846793005L + 1442695040888963407L) >>> 3
      val b = x % (1L << 31)
      (a, b)
    }
  }

  /** Registry builder using the default permutation set. */
  def fromDefaults(e: Expression): MinHashSig =
    MinHashSig(e, defaultAB.map(_._1), defaultAB.map(_._2), DefaultP)
}
