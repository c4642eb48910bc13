package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NormExprs.pround
import graft.queries.QueryPack

/** Iterative graph analytics over relationship edges derived from the
  * fact tables: PageRank (power iteration) and co-occurrence edge
  * building. Complements [[Curation.connectedComponents]] (the
  * min-label family) with the weighted-propagation family — the
  * second primitive a curation pipeline needs for graph-shaped
  * signals (site/domain authority for quality weighting, co-purchase
  * affinity for negative sampling).
  *
  * Scale design:
  *  - the edge list is built once, symmetrized, deduped and
  *    checkpointed — iterations REUSE it (one persisted dataset, no
  *    per-round rebuild) and shuffle only slim (id, double) rank rows
  *    on the dst key: per-iteration cost is one join + one
  *    sum-aggregate, both partial-agg friendly.
  *  - lineage is truncated per round (same contract as
  *    [[Curation.connectedComponents]]): the plan does not grow with
  *    the iteration count, so 20 rounds on 1000 executors plan as
  *    fast as 3.
  *  - power iteration converges geometrically (damping^k); fixed
  *    small k is the standard production envelope, and the output is
  *    rounded to 6dp — the cross-engine-stable precision class the
  *    repo uses for all double aggregates.
  */
object Graph extends QueryPack {

  /** Simplified PageRank by power iteration over an edge list
    * (src, dst). Edges are symmetrized + deduped, so every node has
    * outdegree ≥ 1 and no dangling-mass correction is needed (the
    * directed variant would need the standard redistribution term —
    * out of scope for the undirected affinity ranking built here).
    * Returns (id, rank) with full-precision doubles; callers round
    * for cross-engine comparison. */
  def pagerank(edges: DataFrame, iterations: Int = 3,
               damping: Double = 0.85,
               checkpoint: DataFrame => DataFrame =
                 _.localCheckpoint()): DataFrame = {
    val und = checkpoint(edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"),
        col("src").as("dst")))
      .distinct())
    val deg = checkpoint(und.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("outdeg")))
    // bounded driver-side scalar (node count), same class as the
    // z-order bounds / code-list collects the repo already allows
    val n = deg.count()
    var ranks = deg.select(col("id"), lit(1.0 / n).as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = und
        .join(ranks.select(col("id").as("src"), col("rank")), "src")
        .join(deg.select(col("id").as("src"), col("outdeg")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("rank") / col("outdeg")).as("c"))
      ranks = checkpoint(deg.select(col("id"))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("c"), lit(0.0))).as("rank")))
    }
    ranks
  }

  /** Customer–supplier interaction edges from the order facts, with
    * the two key spaces interleaved into one node-id space (customer
    * keys are even, supplier keys odd — both sides are dense small
    * ints that would otherwise collide). */
  private def custSuppEdges(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "orders")
      .join(Tables.load(s, d, "lineitem"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()

  private val custSuppEdgesSql = """
    SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey"""

  def queries: Map[String, QFn] = Map(
    // Node authority over the (undirected) customer-supplier graph:
    // 3 power-iteration rounds, damping 0.85.
    "graph_pagerank" -> ((s, d) =>
      pagerank(custSuppEdges(s, d))
        .select(col("id").as("node_id"),
          pround(col("rank"), 6).as("rank"))),

    // Co-occurrence edge building: parts bought together in one order,
    // weighted by distinct co-orders — the item-item affinity graph a
    // negative-sampling / embedding pipeline starts from. Kept to
    // pairs seen in >= 2 orders: the noise floor that at corpus scale
    // also bounds the output quadratic (an order with k items emits
    // k(k-1)/2 pairs; the >= 2 filter runs AFTER the aggregate, so
    // the shuffle carries one row per distinct pair, map-side
    // combined).
    "graph_copurchase_edges" -> ((s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
      val a = li.as("a")
      val b = li.as("b")
      a.join(b, col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
        .groupBy(col("a.l_partkey").as("part_a"),
          col("b.l_partkey").as("part_b"))
        .agg(count(lit(1)).as("n_coorders"))
        .filter(col("n_coorders") >= 2)
    })
  )

  def oracles: Map[String, String] = Map(
    // Three unrolled power-iteration rounds; every fractional literal
    // is CAST to DOUBLE (DuckDB parses bare decimals as DECIMAL,
    // whose arithmetic would diverge from Spark's doubles).
    "graph_pagerank" -> s"""
      WITH e0 AS ($custSuppEdgesSql),
      und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      deg AS (SELECT src AS id, count(*) AS outdeg FROM und GROUP BY 1),
      nn AS (SELECT count(*) AS n FROM deg),
      r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
             FROM deg),
      c1 AS (SELECT u.dst AS id, sum(r.rank / d.outdeg) AS c
             FROM und u JOIN r0 r ON r.id = u.src
             JOIN deg d ON d.id = u.src GROUP BY 1),
      r1 AS (SELECT d.id,
               CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) +
               CAST(0.85 AS DOUBLE) * coalesce(c.c, 0) AS rank
             FROM deg d LEFT JOIN c1 c ON c.id = d.id),
      c2 AS (SELECT u.dst AS id, sum(r.rank / d.outdeg) AS c
             FROM und u JOIN r1 r ON r.id = u.src
             JOIN deg d ON d.id = u.src GROUP BY 1),
      r2 AS (SELECT d.id,
               CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) +
               CAST(0.85 AS DOUBLE) * coalesce(c.c, 0) AS rank
             FROM deg d LEFT JOIN c2 c ON c.id = d.id),
      c3 AS (SELECT u.dst AS id, sum(r.rank / d.outdeg) AS c
             FROM und u JOIN r2 r ON r.id = u.src
             JOIN deg d ON d.id = u.src GROUP BY 1),
      r3 AS (SELECT d.id,
               CAST(0.15 AS DOUBLE) / (SELECT n FROM nn) +
               CAST(0.85 AS DOUBLE) * coalesce(c.c, 0) AS rank
             FROM deg d LEFT JOIN c3 c ON c.id = d.id)
      SELECT id AS node_id,
             floor(rank * 1000000.0 + 0.5) / 1000000.0 AS rank
      FROM r3""",

    "graph_copurchase_edges" -> """
      WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             count(*) AS n_coorders
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING count(*) >= 2"""
  )
}
