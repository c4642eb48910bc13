package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** The library's `SparkSessionExtensions` entry point — the idiomatic
  * way to ship custom Catalyst expressions with a Spark library
  * (extension ladder rung (b), SURVEY §2.10/§4): a cluster opts in with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * and every session — SQL-only ones included — gets the native
  * kernels as ordinary functions, no Scala import required:
  *
  *   - `cosine_f32(a, b)`: fused dot+norms cosine over array<float>
  *     ([[graft.functions.CosineSimF32]])
  *   - `minhash_sig(tokens)`: k-permutation MinHash signature over a
  *     token array ([[graft.functions.MinHashSig]], default
  *     16-permutation set)
  *   - `rolling_fp(text)`: bottom-k rolling-gram fingerprint
  *     ([[graft.functions.RollingFp]])
  *   - `simhash_sig(tokens)`: 64-bit SimHash signature
  *     ([[graft.functions.SimHashSig]])
  *
  * `registerAll` is the session-scoped equivalent for callers that
  * build their own `SparkSession` without the config (the query packs
  * use it so each query stays self-contained). Both paths share the
  * same function descriptions, so SQL-text queries and the Column DSL
  * resolve to the identical Expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Materialized-aggregate routing (plans/GoldRoutingRule): post-hoc
    // resolution so the match key is the stable analyzed form and the
    // optimizer still prunes/pushes into the routed scan.
    ext.injectPostHocResolutionRule(graft.plans.GoldRoutingRule)
    // Opt-in approximate tier (plans/ApproxTierRule): injected AFTER
    // routing on purpose. With both enabled, a query matching an exact
    // materialization routes first — exact values at MV-read speed —
    // and only unmatched aggregates degrade to the sketch. The
    // routed/approx'd plans can never cross: a routed subtree has no
    // Percentile left, and an approx'd subtree no longer canonically
    // matches an exact registration.
    ext.injectPostHocResolutionRule(graft.plans.ApproxTierRule)
  }
}

object GraftExtensions {
  private type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  /** One shared description per kernel — injected by the extensions
    * hook and by per-session registration alike. Every builder goes
    * through [[arity]] — a SQL caller with the wrong argument count
    * gets Spark's standard WRONG_NUM_ARGS analysis error, not an
    * IndexOutOfBounds from a bare `exprs(i)`. */
  private def arity(name: String, n: Int)(
      build: Seq[Expression] => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> s"`$name`",
          "expectedNum" -> n.toString, "actualNum" -> exprs.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
      build(exprs)
    }

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("cosine_f32"),
      new ExpressionInfo(
        classOf[graft.functions.CosineSimF32].getName, "cosine_f32"),
      arity("cosine_f32", 2)(exprs =>
        graft.functions.CosineSimF32(exprs.head, exprs(1)))),
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(
        classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      arity("minhash_sig", 1)(exprs =>
        graft.functions.MinHashSig.fromDefaults(exprs.head))),
    (FunctionIdentifier("rolling_fp"),
      new ExpressionInfo(
        classOf[graft.functions.RollingFp].getName, "rolling_fp"),
      arity("rolling_fp", 1)(exprs =>
        graft.functions.RollingFp(exprs.head))),
    (FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(
        classOf[graft.functions.SimHashSig].getName, "simhash_sig"),
      arity("simhash_sig", 1)(exprs =>
        graft.functions.SimHashSig(exprs.head))),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(
        classOf[graft.functions.NfcNormalize].getName, "nfc_normalize"),
      arity("nfc_normalize", 1)(exprs =>
        graft.functions.NfcNormalize(exprs.head))),
    (FunctionIdentifier("subword_encode"),
      new ExpressionInfo(
        classOf[graft.functions.SubwordEncode].getName, "subword_encode"),
      arity("subword_encode", 2)(exprs =>
        graft.functions.SubwordEncode(exprs.head, exprs(1)))),
    // Catalyst's own runtime-filter bloom machinery surfaced as
    // ordinary functions (it ships unregistered, reserved for
    // InjectRuntimeFilter): bloom_build(value, est_items, num_bits)
    // aggregates xxhash64(value) into a mergeable bloom bitset;
    // bloom_might_contain(bloom, value) is the codegen'd scan-side
    // probe. The value is hashed IDENTICALLY on both sides (XxHash64,
    // default seed), so membership of every inserted value is
    // guaranteed — no false negatives, which is what makes the
    // prefilter-then-exact-join pattern semantics-preserving. The
    // bloom operand must be foldable (Catalyst's own contract), i.e.
    // a collected literal — the codebook/centroid bounded-collect
    // convention.
    (FunctionIdentifier("bloom_build"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getName, "bloom_build"),
      arity("bloom_build", 3)(exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate(
            new org.apache.spark.sql.catalyst.expressions.XxHash64(
              Seq(exprs.head)),
            exprs(1), exprs(2)))),
    (FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getName, "bloom_might_contain"),
      arity("bloom_might_contain", 2)(exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs.head,
          new org.apache.spark.sql.catalyst.expressions.XxHash64(
            Seq(exprs(1)))))))

  /** Register every kernel into an existing session's function
    * registry. Idempotent (re-registration replaces the same entry). */
  def registerAll(spark: SparkSession): Unit =
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(ident, info, builder)
    }
}
