package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Graph-analytics invariants the DuckDB oracle can't express: rank
  * mass conservation, degree-proportionality on regular graphs, and
  * the co-occurrence edge bound. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank conserves probability mass (no dangling leakage)") {
    val ranks = Graph.queries("graph_pagerank")(spark, sf0001)
      .agg(sum("rank")).collect().head.getDouble(0)
    // symmetrized edges => stochastic matrix => total mass stays 1;
    // 6dp rounding over ~hundreds of nodes bounds the drift
    assert(math.abs(ranks - 1.0) < 1e-3, s"mass $ranks")
  }

  test("pagerank on a regular graph is uniform; star center dominates") {
    // 4-cycle (2-regular): every node must get exactly 1/4
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
      .toDF("src", "dst")
    val cr = Graph.pagerank(cycle).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    cr.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12, cr.toString))
    // star: the hub out-ranks every leaf
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .toDF("src", "dst")
    val sr = Graph.pagerank(star).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sr(0L) > sr(1L) * 2, sr.toString)
    // leaves are symmetric => identical ranks
    assert(Set(sr(1L), sr(2L), sr(3L), sr(4L)).size == 1)
  }

  test("pagerank iterations move ranks toward the stationary point") {
    val star = (1L to 6L).map(l => (0L, l)).toDF("src", "dst")
    val r1 = Graph.pagerank(star, iterations = 1).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val r8 = Graph.pagerank(star, iterations = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // closed-form stationary hub rank for the 6-leaf star (solve
    // h = 0.15/7 + 0.85·6·l with l = 0.15/7 + 0.85·h/6):
    val stat = (0.15 / 7.0) * (1.0 + 0.85 * 6.0) / (1.0 - 0.85 * 0.85)
    assert(math.abs(r8(0L) - stat) < math.abs(r1(0L) - stat),
      s"1-round ${r1(0L)}, 8-round ${r8(0L)}, stationary ~$stat")
  }

  test("copurchase edges: canonical order, symmetric support, floor 2") {
    val rows = Graph.queries("graph_copurchase_edges")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    rows.foreach { case (a, b, n) =>
      assert(a < b, s"pair ($a,$b) not canonical")
      assert(n >= 2, s"support $n under floor")
    }
    // spot-check one count against a direct recompute
    rows.headOption.foreach { case (a, b, n) =>
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select("l_orderkey", "l_partkey").distinct()
      val oa = li.filter(col("l_partkey") === a)
        .select("l_orderkey").collect().map(_.getLong(0)).toSet
      val ob = li.filter(col("l_partkey") === b)
        .select("l_orderkey").collect().map(_.getLong(0)).toSet
      assert((oa intersect ob).size.toLong == n)
    }
  }

  test("triangle count: every reported node sits in a recomputable triangle") {
    val got = Graph.queries("graph_triangle_count")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty, "no triangles at sf0.001 — fixture regression")
    // independent recompute from the raw edge set (no orientation):
    // adjacency sets, count triangles per node directly
    val edges = Graph.queries("graph_copurchase_edges")(spark, sf0001)
      .select("part_a", "part_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).toSet }
    val want = scala.collection.mutable.Map.empty[Long, Long]
    edges.foreach { case (a, b) =>
      (adj(a) intersect adj(b)).foreach { c =>
        // count each triangle once at its smallest vertex's edge walk
        if (a < b && b < c) Seq(a, b, c).foreach(v =>
          want(v) = want.getOrElse(v, 0L) + 1)
      }
    }
    assert(got == want.toMap,
      s"triangle participation mismatch: ${got.size} vs ${want.size} nodes")
  }

  test("itemsets3: apriori-pruned plan equals the naive 3-way join") {
    val got = Graph.queries("basket_itemsets3")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got.nonEmpty, "no frequent triples at sf0.001")
    got.foreach { case (a, b, c, n) =>
      assert(a < b && b < c, s"triple ($a,$b,$c) not canonical")
      assert(n >= 2, s"support $n under floor")
    }
    // the naive (prune-free) Spark formulation — the A-priori
    // downward-closure claim checked in-engine
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
    val naive = li.as("a")
      .join(li.as("b"), col("a.l_orderkey") === col("b.l_orderkey") &&
        col("a.l_partkey") < col("b.l_partkey"))
      .join(li.as("c"), col("b.l_orderkey") === col("c.l_orderkey") &&
        col("b.l_partkey") < col("c.l_partkey"))
      .groupBy(col("a.l_partkey"), col("b.l_partkey"), col("c.l_partkey"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == naive)
  }

  test("kcore2: the 6-round unroll reaches the true 2-core fixpoint") {
    val got = Graph.queries("graph_kcore2")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.nonEmpty)
    // driver-side peel to ACTUAL fixpoint from the raw edge list
    var edges = Graph.queries("graph_copurchase_edges")(spark, sf0001)
      .select("part_a", "part_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != edges
      edges = next
    }
    val want = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    assert(got == want,
      s"6-round unroll != driver fixpoint (${got.size} vs ${want.size})")
    assert(got.values.forall(_ >= 2), "a 2-core node with degree < 2")
    // the convergence-checked variant must agree on the corpus too
    val gotFix = Graph.queries("graph_kcore2_fix")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(gotFix == want, "fixpoint variant diverged on the corpus")
  }

  /** Driver-side synchronous peel to the true k-core fixpoint. */
  private def peelToFixpoint(edges0: Set[(Long, Long)]): Set[(Long, Long)] = {
    var edges = edges0
    var changed = true
    while (changed) {
      val deg = edges.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 2).keySet
      val next = edges.filter { case (a, b) => keep(a) && keep(b) }
      changed = next != edges
      edges = next
    }
    edges
  }

  test("kcoreFixpoint: converges on a chain longer than the unroll, " +
      "where 6 rounds provably have not finished") {
    import spark.implicits._
    // a 21-edge path glued to a triangle: each peel round removes one
    // leaf edge from the free end, so the true 2-core (the triangle)
    // takes ~21 rounds to emerge — 6 unrolled rounds leave a tail
    val path = (0L until 21L).map(i => (i, i + 1))
    val tri = Seq((100L, 101L), (101L, 102L), (100L, 102L), (21L, 100L))
    val all = (path ++ tri).toSet
    val df = all.toSeq.toDF("u", "v")
    val got = Graph.kcoreFixpoint(df, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = peelToFixpoint(all)
    assert(want == Set((100L, 101L), (101L, 102L), (100L, 102L)))
    assert(got == want, s"$got != $want")
    // and the fixed 6-round unroll genuinely has NOT converged here —
    // the case that makes the convergence-checked variant necessary
    var e6 = all
    for (_ <- 1 to Graph.KcoreRounds) {
      val deg = e6.toSeq.flatMap { case (a, b) => Seq(a, b) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
      val keep = deg.filter(_._2 >= 2).keySet
      e6 = e6.filter { case (a, b) => keep(a) && keep(b) }
    }
    assert(e6 != want, "chain too short to exercise the divergence")
  }
}
