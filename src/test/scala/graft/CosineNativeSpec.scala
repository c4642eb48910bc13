package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSimF32

/** The native codegen'd cosine kernel must be bit-identical to the
  * composable HOF formulation, and must actually run inside
  * whole-stage codegen. */
class CosineNativeSpec extends SparkSpec {

  test("native cosine == HOF cosine on every corpus pair, and codegens") {
    CosineSimF32.register(spark)
    val e = Tables.load(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("a").crossJoin(e.as("b").limit(50))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
    def hof(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
      def dot(p: org.apache.spark.sql.Column, q: org.apache.spark.sql.Column) =
        aggregate(zip_with(p, q, (u, v) => u.cast("double") * v.cast("double")),
          lit(0.0), (acc, v) => acc + v)
      dot(x, y) / (sqrt(dot(x, x)) * sqrt(dot(y, y)))
    }
    val both = pairs.select(col("ida"), col("idb"),
      call_function("cosine_f32", col("ea"), col("eb")).as("native"),
      hof(col("ea"), col("eb")).as("composed"))
    // bit-identical: same widening, same accumulation order
    assert(both.filter(col("native") =!= col("composed")).count() == 0)
    assert(both.count() == 500L * 50)
    // the native expression participates in whole-stage codegen; the
    // HOF formulation in the same projection would force a fallback,
    // so assert on a native-only plan
    val nativeOnly = pairs.select(
      call_function("cosine_f32", col("ea"), col("eb")).as("native"))
    nativeOnly.collect()
    // a `*(n)`-prefixed Project containing the expression = the node
    // runs inside WholeStageCodegen stage n (AQE's rendered form)
    val plan = nativeOnly.queryExecution.executedPlan.toString
    assert("\\*\\(\\d+\\) Project \\[cosine_f32".r.findFirstIn(plan).isDefined,
      plan.take(600))
  }
}
