package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.queries.QueryPack

/** Exact global ranking WITHOUT the single-partition window — the
  * distributed two-pass that replaces `row_number().over(orderBy(…))`
  * (which funnels every row through ONE task; [[graft.plans.PlanLint]]
  * flags exactly that shape) for corpus-scale total orders: epoch
  * curricula, leaderboards, percentile-exact positions.
  *
  * Shape: (1) one aggregate computes ~nBuckets approximate quantile
  * boundaries of the order key, collected driver-side as LITERALS
  * (bounded by nBuckets, never by data); (2) rows bucket scan-side by
  * counting boundaries ≤ key — rows with EQUAL keys always share a
  * bucket, so the (key, id) total order never straddles a boundary;
  * (3) a count-per-bucket aggregate (≤ nBuckets rows to the driver)
  * becomes a literal offset map; (4) rank = offset[bucket] +
  * row_number within the bucket. Two scans, one bucket-keyed shuffle,
  * no task ever holds more than ~1/nBuckets of the data (quantile
  * boundaries keep buckets balanced; a single massively-tied key is
  * the irreducible skew of exact ranking — its ties must be adjacent).
  *
  * The rank VALUES are invariant to the boundary choice (any
  * key-monotone bucketing yields the same global positions in a
  * tie-free total order), so results are deterministic across runs,
  * engines, and approximation accuracy — which is what lets the
  * DuckDB oracle pin this with a plain row_number window. */
object Ranking extends QueryPack {

  /** Adds `rank` (1-based, dense in the row_number sense) by the total
    * order (orderCol, idCol). `orderCol` must be numeric/orderable;
    * (orderCol, idCol) must be unique or ranks among ties follow
    * idCol. */
  def globalRank(df: DataFrame, orderCol: String, idCol: String,
                 nBuckets: Int = 32): DataFrame = {
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val bs: Seq[Any] =
      if (probs.isEmpty) Seq.empty
      else df.agg(percentile_approx(col(orderCol),
          lit(probs.toArray), lit(10000)).as("bs"))
        .head match {
          case r if r.isNullAt(0) => Seq.empty // empty input
          case r => r.getSeq[Any](0)
        }
    val distinctBs = bs.distinct
    val bucketed = df.withColumn("__b",
      if (distinctBs.isEmpty) lit(0)
      else size(filter(array(distinctBs.map(lit(_)): _*),
        b => col(orderCol) >= b)))
    val counts = bucketed.groupBy("__b").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets =
      if (counts.isEmpty) Seq.empty[(Int, Long)]
      else counts.scanLeft((0, 0L)) { case ((_, acc), (b, n)) =>
        (b, acc + n)
      }.sliding(2).map { case Array((_, acc), (b, _)) => (b, acc) }.toSeq
    val offsetMap =
      if (offsets.isEmpty) map(lit(0), lit(0L))
      else map(offsets.flatMap { case (b, o) => Seq(lit(b), lit(o)) }: _*)
    val w = Window.partitionBy("__b").orderBy(col(orderCol), col(idCol))
    bucketed
      .withColumn("rank",
        element_at(offsetMap, col("__b")) +
          row_number().over(w).cast("long"))
      .drop("__b")
  }

  def queries: Map[String, QFn] = Map(
    // Global event ordering by (ts, event_id) — the epoch-curriculum /
    // replay-order primitive, exact and single-task-free.
    "events_global_rank" -> ((s, d) => {
      val e = Tables.load(s, d, "events")
      val tsKey = e.schema("ts").dataType match {
        case LongType => col("ts") // int64-nanos testdata generations
        case _ => unix_micros(col("ts").cast("timestamp")) // NTZ → UTC
      }
      globalRank(e.select(col("event_id"), tsKey.as("ts_key")),
        "ts_key", "event_id")
        .select(col("event_id"), col("rank"))
    })
  )

  def oracles: Map[String, String] = Map(
    // The single-window form IS the spec; the Spark side must produce
    // identical positions from the bucketed two-pass.
    "events_global_rank" -> """
      SELECT event_id,
             CAST(row_number() OVER (ORDER BY ts, event_id) AS BIGINT)
               AS rank
      FROM events"""
  )
}
