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
}
