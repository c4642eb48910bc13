package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is pathological —
  * the manual fallback when AQE's skew-join split cannot apply (e.g.
  * the skewed side feeds a co-grouped downstream op, or the join is
  * inside a cached/staged subtree AQE won't replan).
  *
  * Shape: the fact side gets a deterministic salt in [0, n) derived by
  * hashing its full row, so one hot key's rows spread across n
  * reducer partitions; the dim side is replicated n× with an exploded
  * salt column; the join adds `salt` to the equi-keys. Results are
  * identical to the unsalted join (asserted in SkewSpec) because each
  * fact row still matches exactly its dim row, just in a salted
  * bucket.
  *
  * Cost model: dim side grows n× (keep n small, 8-32, and the dim
  * broadcast-small or the replication is itself a shuffle); fact side
  * is untouched. Use ONLY when a key's row count ≫ one executor's
  * share; otherwise plain hash partitioning is already balanced.
  */
object SkewTools {

  /** Equi-join `fact ⋈ dim` on `key`, salted n ways (left by default —
    * an unmatched fact row is unmatched for its one salt iff it is
    * unmatched outright, so left semantics survive exactly). `dim`
    * must be unique per key (a dim/LUT), otherwise replication would
    * duplicate matches. The SHUFFLE_HASH hint keeps the replicated dim
    * as the BUILD side of a shuffled join: without it a test-scale dim
    * broadcasts and the salt spread never reaches an exchange — the
    * exact regime this operator exists for is "dim too big to
    * broadcast", so the plan must shuffle on (key, salt). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 nSalts: Int, joinType: String = "left"): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(nSalts))
        .cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt"),
      joinType).drop("__salt")
  }

  /** The remedy chosen for a skewed join. `strategy` is one of
    * `broadcast` / `aqe` / `salt`; `saltN` is the [[saltedJoin]] fan
    * (0 unless `strategy == "salt"`). */
  final case class SkewAdvice(strategy: String, saltN: Int, reason: String)

  /** Turn the `dq_key_skew` report into a remediation decision — the
    * judgment call a pipeline owner otherwise makes by eye, as a pure
    * (hence unit-testable) function. Inputs: the report's hottest-key
    * share in basis points (`share_bp` of its top row) and a dim size
    * estimate in bytes (rows × avg row width — the report's key count
    * times the dim's payload width is a fine estimate).
    *
    * Decision ladder, cheapest remedy first:
    *  1. dim fits the broadcast threshold → `broadcast`: no shuffle at
    *     all, so fact-side skew is irrelevant.
    *  2. hottest key's share ≤ `skewFactor` × an even reducer's share
    *     (10000/shufflePartitions bp) → `aqe`: plain hash partitioning
    *     is near-balanced and AQE's skew-join split absorbs the rest —
    *     salting would replicate the dim for nothing.
    *  3. otherwise → `salt`, with n sized so the hot key's
    *     per-partition share drops to ~an even reducer's share
    *     (`ceil(share / evenShare)`), clamped to [[saltedJoin]]'s
    *     economic band [8, 64] (below 8 the replication overhead isn't
    *     worth engaging; above 64 the dim blow-up dominates — pre-split
    *     the hot keys out instead). */
  def advise(hotShareBp: Double, dimBytes: Long,
             broadcastThresholdBytes: Long = 10L << 20,
             shufflePartitions: Int = 200,
             skewFactor: Double = 4.0): SkewAdvice = {
    require(hotShareBp >= 0 && hotShareBp <= 10000,
      s"hotShareBp must be in [0, 10000]: $hotShareBp")
    val evenBp = 10000.0 / shufflePartitions
    if (dimBytes <= broadcastThresholdBytes)
      SkewAdvice("broadcast", 0,
        s"dim ~$dimBytes B fits the $broadcastThresholdBytes B " +
          "broadcast threshold: no shuffle, skew irrelevant")
    else if (hotShareBp <= skewFactor * evenBp)
      SkewAdvice("aqe", 0,
        f"hottest key holds $hotShareBp%.1f bp ≤ $skewFactor%.0fx the " +
          f"even reducer share ($evenBp%.1f bp): plain shuffle + AQE " +
          "skew split suffices")
    else {
      val n = math.min(64L, math.max(8L,
        math.ceil(hotShareBp / evenBp).toLong)).toInt
      SkewAdvice("salt", n,
        f"hottest key holds $hotShareBp%.1f bp vs an even reducer " +
          f"share of $evenBp%.1f bp: salt $n ways to spread it back " +
          "to ~even")
    }
  }

  /** Execute an [[advise]] decision — the remediation half of the
    * `dq_skew_advice` → fix loop, so report → remedied join is one
    * call (`applyAdvice(advise(...), fact, dim, key)`). Every branch
    * returns EXACTLY the plain join's rows (SkewSpec pins all three
    * against the unhinted join); only the physical strategy moves:
    *  - `broadcast`: dim ships to every task — no shuffle, no skew;
    *  - `aqe`: the plain shuffled join, leaving AQE's runtime skew
    *    split to do its work (no hint — the planner stays free);
    *  - `salt`: [[saltedJoin]] at the advised fan. */
  def applyAdvice(advice: SkewAdvice, fact: DataFrame, dim: DataFrame,
                  key: String, joinType: String = "left"): DataFrame =
    advice.strategy match {
      case "broadcast" => fact.join(broadcast(dim), Seq(key), joinType)
      case "aqe" => fact.join(dim, Seq(key), joinType)
      case "salt" => saltedJoin(fact, dim, key, advice.saltN, joinType)
      case other => throw new IllegalArgumentException(
        s"unknown skew strategy '$other' (broadcast|aqe|salt)")
    }

  /** Measure → decide → rewrite in one call: the fact side's hottest
    * key share comes from ONE key-grain aggregate (map-side-combined
    * counts, then a 2-row max/sum over the key-grain frame — never a
    * row-grain sort), the dim size from its row count × schema default
    * width, and the join is rewritten per [[advise]]. Returns the
    * decision alongside the frame so callers can log WHY the plan
    * changed. The measurement pass costs one extra job over the fact —
    * this is the diagnostic entry point; steady-state pipelines cache
    * the advice and call [[applyAdvice]] directly. */
  def adviseAndJoin(fact: DataFrame, dim: DataFrame, key: String,
                    joinType: String = "left",
                    broadcastThresholdBytes: Long = 10L << 20,
                    shufflePartitions: Int = 200,
                    skewFactor: Double = 4.0): (SkewAdvice, DataFrame) = {
    val stats = fact.groupBy(col(key)).count()
      .agg(max(col("count")).as("hot"), sum(col("count")).as("total"))
      .head()
    val hotShareBp =
      if (stats.isNullAt(1) || stats.getLong(1) == 0L) 0.0
      else stats.getLong(0).toDouble / stats.getLong(1) * 10000.0
    val dimBytes = dim.count() * dim.schema.defaultSize
    val a = advise(hotShareBp, dimBytes, broadcastThresholdBytes,
      shufflePartitions, skewFactor)
    (a, applyAdvice(a, fact, dim, key, joinType))
  }

  /** [[advise]]'s ladder as codegen'd Column expressions — (strategy,
    * salt_n) — so a per-key skew report can carry its remediation at
    * KEY grain inside one distributed pass (the scalar form decides
    * for the report's hottest key driver-side; this form annotates
    * every key). SkewSpec pins scalar ≡ column over the threshold
    * lattice. */
  def adviseColumns(shareBp: Column, dimBytes: Column,
                    broadcastThresholdBytes: Long = 10L << 20,
                    shufflePartitions: Int = 200,
                    skewFactor: Double = 4.0): (Column, Column) = {
    val evenBp = 10000.0 / shufflePartitions
    val strategy =
      when(dimBytes <= broadcastThresholdBytes, "broadcast")
        .when(shareBp <= skewFactor * evenBp, "aqe")
        .otherwise("salt")
    val n = least(lit(64L), greatest(lit(8L), ceil(shareBp / evenBp)))
      .cast("int")
    (strategy, when(strategy === "salt", n).otherwise(0).as("salt_n"))
  }
}
