package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryPack

/** Mergeable data sketches — the distributive stand-ins for the two
  * aggregates that do NOT roll up in a pre-aggregate layer:
  * COUNT(DISTINCT x) (HyperLogLog registers) and per-item frequency
  * over an unbounded item domain (count-min counters).
  *
  * Why this exists at 100 TB: [[graft.etl.GoldAggregates]] can serve
  * sums/counts/percentile-ready buffers from slices, but a distinct
  * count is not algebraic — two slices' distinct counts cannot be
  * added, so every dashboard distinct either rescans the fact or is
  * wrong. A register/counter table IS algebraic (merge = per-cell
  * max / sum), so it lives in the gold layer, folds in new ingest
  * batches incrementally (same union+re-aggregate shape as the dedup
  * signature store), and answers at serving latency with a bounded
  * error that is documented instead of silent.
  *
  * Determinism contract (what makes these oracle-hashable): the hash
  * is the repo-wide md5 idiom (15 hex chars → non-negative BIGINT in
  * both engines), register index/rank are pure integer bit math
  * (`&`, `>>`, `length(bin(w))` — both engines render minimal binary
  * strings), the register sum is scaled to an exact integer (every
  * term `1L << (F+2-rank)`, total bounded by 2^62 — no fp, no
  * ordering sensitivity), and the only transcendental (`ln` in the
  * linear-counting branch) is rounded through [[graft.functions
  * .NormExprs.pround]] so a last-ulp libm disagreement cannot
  * surface. Estimates are Flajolet et al.'s HLL formula with the
  * standard small-range (linear counting) correction; the 60-bit
  * hash space makes the large-range correction unreachable.
  *
  * Plan shape (both sketches): one scan → map-side-combined
  * pre-aggregate on the *sketch cell* grain (key×2^p cells / d×w
  * cells) → tiny final shuffle. Nothing wide ever shuffles; the
  * estimate step runs over the cell table, which is small enough to
  * broadcast at any corpus size.
  */
object Sketches extends QueryPack {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")
  private def events(s: SparkSession, d: String) = Tables.load(s, d, "events")
  private def lineitem(s: SparkSession, d: String) = Tables.load(s, d, "lineitem")

  // ---------------------------------------------------------------- HLL

  /** Register-index bits for the oracled queries: m=256 registers,
    * ~6.5% standard error — small enough that the whole register
    * table for thousands of group keys still broadcasts. */
  val HllP = 8

  private def alphaM(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** 60-bit md5-derived hash of `v` (cast to string) under `salt` —
    * non-negative and representable as BIGINT in Spark and DuckDB. */
  private def h60(salt: String, v: Column): Column =
    conv(substring(md5(concat(lit(salt + ":"), v.cast("string"))), 1, 15),
      16, 10).cast("long")

  /** HLL register table of COUNT(DISTINCT valueCol) per key: one row
    * per (key, reg_idx) with the max observed rank. Mergeable: union
    * two register tables and re-run [[hllMergeRegisters]]; idempotent
    * under duplicate values by construction (max). The pre-aggregate
    * combines map-side, so the shuffle carries at most
    * |keys|·m·partitions rows regardless of input width. */
  def hllRegisters(df: DataFrame, keyCols: Seq[String], valueCol: String,
                   p: Int = HllP): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p outside [4,16]")
    val m = 1 << p
    val fieldBits = 60 - p
    val h = h60("hll", col(valueCol))
    val w = shiftright(h, p)
    val rank = when(w === 0, lit(fieldBits + 1))
      .otherwise(lit(fieldBits + 1) - length(bin(w)))
    // NULL values don't count toward a distinct estimate (COUNT
    // DISTINCT semantics); without this filter a null would mint a
    // phantom NULL-cell register that shrinks v_zero and drops its
    // s_scaled term — inflating every linear-counting estimate
    df.filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+ h.bitwiseAND(lit((m - 1).toLong))
      .as("reg_idx") :+ rank.as("reg_rank")): _*)
      .groupBy(keyCols.head, (keyCols.tail :+ "reg_idx"): _*)
      .agg(max(col("reg_rank")).as("reg_rank"))
  }

  /** Merge any number of register tables (or fold a delta batch into
    * a persisted register store): per-cell max. Associative and
    * commutative, so incremental ingest == one-shot — SketchesSpec
    * pins the equality exactly (registers are integers). */
  def hllMergeRegisters(keyCols: Seq[String], tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(keyCols.head, (keyCols.tail :+ "reg_idx"): _*)
      .agg(max(col("reg_rank")).as("reg_rank"))

  /** Estimate per key from a register table: `est_distinct` (HLL with
    * linear-counting small-range branch, pround(…,4)), plus the exact
    * integer evidence (`s_scaled`, `v_zero`) so the fp step is one
    * deterministic expression over integers. */
  def hllEstimate(registers: DataFrame, keyCols: Seq[String],
                  p: Int = HllP): DataFrame = {
    import graft.functions.NormExprs.pround
    val m = 1 << p
    val fieldBits = 60 - p
    // term(rank) = 2^(F+2-rank): empty cell (rank 0) contributes
    // 2^(F+2); total <= m·2^(F+2) = 2^62 — exact in a BIGINT sum.
    val sHit = sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${fieldBits + 2} - reg_rank)"))
    val perKey = registers
      .groupBy(keyCols.head, keyCols.tail: _*)
      .agg(count(lit(1)).as("reg_cnt"), sHit.as("s_hit"))
      .select((keyCols.map(col) :+
        (lit(m.toLong) - col("reg_cnt")).as("v_zero") :+
        (col("s_hit") + (lit(m.toLong) - col("reg_cnt")) *
          lit(1L << (fieldBits + 2))).as("s_scaled")): _*)
    // E_raw = alpha_m · m² · 2^(F+2) / s_scaled — the 2^(F+2) factor
    // cancels the integer scaling. Same literal, same op order in the
    // SQL twin → bit-identical doubles.
    val eRaw = (lit(alphaM(m)) * lit(m.toDouble) * lit(m.toDouble) *
      lit(math.pow(2.0, fieldBits + 2))) / col("s_scaled").cast("double")
    val est = when(col("v_zero") > 0 && eRaw <= lit(2.5 * m),
      lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double")))
      .otherwise(eRaw)
    perKey.select((keyCols.map(col) :+ col("v_zero") :+ col("s_scaled") :+
      pround(est, 4).as("est_distinct")): _*)
  }

  /** The DuckDB twin of register build + estimate as a CTE chain,
    * parameterized on the deduped (key, value) source. Every constant
    * below must stay in lockstep with [[hllRegisters]]/[[hllEstimate]]
    * at p=8 — the twin is generated from the same numbers. */
  private def hllSql(srcCte: String, keyCol: String): String = {
    val m = 1 << HllP
    val f = 60 - HllP
    val alpha = alphaM(m)
    s"""
      WITH src AS ($srcCte),
      hashed AS (
        SELECT $keyCol,
               CAST(('0x' || substr(md5('hll:' || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM src),
      regs AS (
        SELECT $keyCol, h & ${m - 1} AS reg_idx,
               MAX(CASE WHEN (h >> $HllP) = 0 THEN ${f + 1}
                        ELSE ${f + 1} - length(bin(h >> $HllP)) END) AS reg_rank
        FROM hashed GROUP BY 1, 2),
      perkey AS (
        SELECT $keyCol, COUNT(*) AS reg_cnt,
               CAST(SUM(CAST(1 AS BIGINT) << (${f + 2} - reg_rank)) AS BIGINT) AS s_hit
        FROM regs GROUP BY 1),
      ev AS (
        SELECT $keyCol, $m - reg_cnt AS v_zero,
               s_hit + ($m - reg_cnt) * (CAST(1 AS BIGINT) << ${f + 2}) AS s_scaled
        FROM perkey),
      exact AS (SELECT $keyCol, COUNT(*) AS exact_distinct FROM src GROUP BY 1)
      SELECT ev.$keyCol, ev.v_zero, ev.s_scaled,
             floor((CASE WHEN ev.v_zero > 0
                      AND (CAST($alpha AS DOUBLE) * ${m.toDouble} * ${m.toDouble} * ${math.pow(2.0, f + 2)}) / CAST(ev.s_scaled AS DOUBLE) <= ${2.5 * m}
                    THEN ${m.toDouble} * ln(${m.toDouble} / CAST(ev.v_zero AS DOUBLE))
                    ELSE (CAST($alpha AS DOUBLE) * ${m.toDouble} * ${m.toDouble} * ${math.pow(2.0, f + 2)}) / CAST(ev.s_scaled AS DOUBLE)
                    END) * 10000.0 + 0.5) / 10000.0 AS est_distinct,
             exact.exact_distinct
      FROM ev JOIN exact USING ($keyCol)"""
  }

  /** Oracled HLL query: register build + estimate + exact
    * side-by-side. `dedup` pre-groups (key, value) once so ONE scan
    * feeds both the registers and the exact count — the exact count
    * is the accuracy report a test-scale run wants; a 100 TB run
    * drops the `exact` branch and keeps everything else. */
  private def hllQuery(base: DataFrame, keyCol: String,
                       valueCol: String): DataFrame = {
    // checkpointed (r16, the kmv_distinct rationale): the distinct
    // (key, value) base feeds registers AND the exact count — without
    // it both consumers re-scan + re-distinct; the frame is
    // value-domain-bounded (the dim-grain class).
    val dedup = base.select(col(keyCol), col(valueCol).as("v")).distinct()
      .localCheckpoint()
    val est = hllEstimate(hllRegisters(dedup, Seq(keyCol), "v"), Seq(keyCol))
    val exact = dedup.groupBy(keyCol).agg(count(lit(1)).as("exact_distinct"))
    est.join(exact, keyCol)
      .select(col(keyCol), col("v_zero"), col("s_scaled"),
        col("est_distinct"), col("exact_distinct"))
  }

  // ---------------------------------------------------------- count-min

  /** Count-min geometry for the oracled query: d=3 independent rows ×
    * w=1024 columns = 3 072 BIGINT cells. Error: est ∈ [exact,
    * exact + ~e/w · N] with prob 1−e^−d per row; always one-sided. */
  val CmsDepth = 3
  val CmsWidth = 1024

  /** Count-min counter table from weighted items: rows (cms_row,
    * cms_idx, cnt). Mergeable by per-cell SUM (associative), so
    * batches fold into a persisted counter table exactly like HLL
    * registers. Input is (item, weight) — pass pre-aggregated counts
    * so only DISTINCT items are hashed. */
  def cmsCounters(itemCounts: DataFrame, itemCol: String,
                  cntCol: String): DataFrame =
    itemCounts.filter(col(itemCol).isNotNull)
      .select(explode(array((0 until CmsDepth).map(lit): _*)).as("cms_row"),
        col(itemCol), col(cntCol))
      .select(col("cms_row"),
        h60("cms", concat(col("cms_row").cast("string"), lit("|"),
          col(itemCol).cast("string")))
          .bitwiseAND(lit((CmsWidth - 1).toLong)).as("cms_idx"),
        col(cntCol))
      .groupBy("cms_row", "cms_idx")
      .agg(sum(col(cntCol)).as("cnt"))

  /** Merge counter tables / fold a delta batch: per-cell sum. */
  def cmsMerge(tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy("cms_row", "cms_idx")
      .agg(sum(col("cnt")).as("cnt"))

  /** Point-estimate each probe item against a counter table:
    * min over the d rows of the item's cell. The counter table is
    * 3 072 rows at ANY corpus size — broadcast side of the join. */
  def cmsEstimate(counters: DataFrame, probe: DataFrame,
                  itemCol: String): DataFrame = {
    // project the probe down to the item before joining: any other
    // probe column (e.g. its own `cnt`) would collide with the
    // counter table's columns
    val hashed = probe
      .select(col(itemCol),
        explode(array((0 until CmsDepth).map(lit): _*)).as("cms_row"))
      .withColumn("cms_idx",
        h60("cms", concat(col("cms_row").cast("string"), lit("|"),
          col(itemCol).cast("string")))
          .bitwiseAND(lit((CmsWidth - 1).toLong)))
    // LEFT join + 0-coalesce: a probe item the counters never saw has
    // empty cells — its true estimate is 0 (min over d cells, some
    // absent). An inner join would silently drop it, or worse, take
    // the min over only its non-empty cells.
    hashed.join(broadcast(counters), Seq("cms_row", "cms_idx"), "left")
      .groupBy(itemCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  // ------------------------------------------------------------ KMV

  /** Bottom-k (KMV / theta-style) sketch size for the oracled
    * queries. KMV is the sketch HLL is not: because it keeps actual
    * hash VALUES, two sketches support set algebra — union (bottom-k
    * of the merged hashes) and intersection (inclusion–exclusion on
    * the union's theta) — so "distinct users who did BOTH X and Y"
    * becomes sketch math instead of a fact rescan. RSE ≈ 1/√(k−2). */
  val KmvK = 64

  /** Bottom-k sketch per key: the k smallest md5-derived hashes of
    * the distinct values. Below k distinct values the sketch IS the
    * value set (exact mode). One shuffle on the key grain; the
    * per-partition bottom-k is the only state. */
  def kmvSketch(df: DataFrame, keyCols: Seq[String], valueCol: String,
                k: Int = KmvK): DataFrame = {
    val hashed = df.filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+ h60("kmv", col(valueCol)).as("kmv_h")): _*)
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("kmv_h"))
    hashed.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
  }

  /** Distinct estimate per key from a bottom-k sketch: exact when the
    * sketch is not full, else (k−1)·2^60 / h_k. */
  def kmvEstimate(sketch: DataFrame, keyCols: Seq[String],
                  k: Int = KmvK): DataFrame = {
    import graft.functions.NormExprs.pround
    val perKey = sketch.groupBy(keyCols.head, keyCols.tail: _*)
      .agg(count(lit(1)).as("kmv_cnt"), max(col("kmv_h")).as("kmv_kth"))
    perKey.select((keyCols.map(col) :+ col("kmv_cnt") :+ col("kmv_kth") :+
      pround(when(col("kmv_cnt") < k, col("kmv_cnt").cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
          col("kmv_kth").cast("double")), 4).as("est_distinct")): _*)
  }

  /** Set algebra over two single-set sketches (each a frame of
    * `kmv_h` rows): distinct-union and distinct-intersection
    * estimates, plus the integer evidence. Exact mode (union sketch
    * not full) falls out of the same expressions: theta covers
    * everything, the common count IS the intersection. All inputs to
    * the fp step are integers, so the estimate is deterministic. */
  def kmvIntersect(a: DataFrame, b: DataFrame,
                   k: Int = KmvK): DataFrame = {
    import graft.functions.NormExprs.pround
    val u = a.select("kmv_h").union(b.select("kmv_h")).distinct()
      .orderBy(col("kmv_h")).limit(k)
    val stats = u.agg(count(lit(1)).as("u_cnt"), max(col("kmv_h")).as("u_kth"))
    val common = a.join(b, "kmv_h").join(u, "kmv_h")
      .agg(count(lit(1)).as("common_cnt"))
    val aStats = a.agg(count(lit(1)).as("a_cnt"), max(col("kmv_h")).as("a_kth"))
    val bStats = b.agg(count(lit(1)).as("b_cnt"), max(col("kmv_h")).as("b_kth"))
    def estOf(cnt: Column, kth: Column): Column =
      when(cnt < k, cnt.cast("double"))
        .otherwise(lit((k - 1).toDouble) * lit(math.pow(2.0, 60)) /
          kth.cast("double"))
    val estU = estOf(col("u_cnt"), col("u_kth"))
    // Jaccard denominator is the union sketch's EFFECTIVE size u_cnt
    // (= k when full). Dividing by the constant k would shrink the
    // exact-mode intersection by u_cnt/k — with both sets below k the
    // common count IS the intersection and must come back unscaled.
    val estI = col("common_cnt").cast("double") /
      col("u_cnt").cast("double") * estU
    // difference by inclusion–exclusion (|A\B| = |A| − |A∩B|);
    // clamped at 0 because the two estimates carry independent noise
    stats.crossJoin(broadcast(common))
      .crossJoin(broadcast(aStats)).crossJoin(broadcast(bStats))
      .select(col("u_cnt"), col("u_kth"), col("common_cnt"),
        pround(estOf(col("a_cnt"), col("a_kth")), 4).as("est_a"),
        pround(estOf(col("b_cnt"), col("b_kth")), 4).as("est_b"),
        pround(estU, 4).as("est_union"),
        pround(estI, 4).as("est_intersection"),
        pround(greatest(estOf(col("a_cnt"), col("a_kth")) - estI,
          lit(0.0)), 4).as("est_a_minus_b"))
  }

  // ------------------------------------------------- HDR-style histogram

  /** Mergeable value-distribution sketch — the quantile member of the
    * family (percentiles, like distinct counts, do NOT roll up from
    * per-slice results). HdrHistogram-style buckets on the
    * cent-scaled integer value: octave = bit length, 3 sub-bucket
    * bits → relative bucket width ≤ 2^-3 (≈6% worst-case quantile
    * error), values < 8 cents exact. ALL bucket math is integer
    * (`floor(v·100+0.5)`, `length(bin(x))`, shift/mask), so the
    * histogram is deterministic and cross-engine replayable; the only
    * fp steps are the final representative division and the q·N rank
    * comparison, both single deterministic expressions. Merge =
    * per-bucket SUM (same gold-layer algebra as the other sketches);
    * state per key is ≤ ~350 buckets regardless of input size. */
  def histBuckets(df: DataFrame, keyCols: Seq[String],
                  valueCol: String): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select((keyCols.map(col) :+
        greatest(floor(col(valueCol) * lit(100.0) + lit(0.5)).cast("long"),
          lit(1L)).as("hv")): _*)
      .withColumn("ho", length(bin(col("hv"))).cast("long"))
      .withColumn("bucket", col("ho") * 8 +
        expr("shiftrightunsigned(hv, CAST(greatest(ho - 4, 0) AS INT)) & 7"))
      .groupBy(keyCols.head, (keyCols.tail :+ "bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge histogram tables / fold a delta batch: per-bucket sum. */
  def histMerge(keyCols: Seq[String], tables: DataFrame*): DataFrame =
    tables.reduce(_ unionByName _)
      .groupBy(keyCols.head, (keyCols.tail :+ "bucket"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Twice the representative (bucket-midpoint) value of a bucket id
    * column named `name`, in cents — integer, so /200.0 at the end is
    * the one fp step. Octave ≤ 3 buckets are exact singletons
    * (rep2 = 2·value). Kept as a SQL-text expression because the
    * octave-dependent shift needs a column shift amount. */
  private def rep2Expr(name: String): Column = expr(
    s"""CASE WHEN shiftright($name, 3) <= 3 THEN ($name & 7) * 2
        ELSE (8 + ($name & 7)) *
               shiftleft(CAST(1 AS BIGINT),
                 CAST(shiftright($name, 3) - 4 AS INT)) * 2 +
             shiftleft(CAST(1 AS BIGINT),
               CAST(shiftright($name, 3) - 4 AS INT))
        END""")

  /** p50/p90 estimates per key from a (possibly merged) histogram:
    * cumulative counts in bucket order, first bucket whose cumulative
    * reaches q·N, bucket midpoint as the estimate. */
  def histQuantiles(hist: DataFrame, keyCols: Seq[String]): DataFrame = {
    import graft.functions.NormExprs.pround
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("bucket"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wAll))
    def pick(q: Double): Column =
      min(when(col("cum").cast("double") >=
        lit(q) * col("total").cast("double"), col("bucket")))
    cum.groupBy(keyCols.head, keyCols.tail: _*)
      .agg(max(col("total")).as("n_values"),
        pick(0.5).as("b50"), pick(0.9).as("b90"))
      .select((keyCols.map(col) :+ col("n_values") :+
        pround(rep2Expr("b50").cast("double") / lit(200.0), 4)
          .as("est_p50") :+
        pround(rep2Expr("b90").cast("double") / lit(200.0), 4)
          .as("est_p90")): _*)
  }

  /** Arbitrary-quantile picks from a (possibly merged) histogram: for
    * each (q, name), the bucket-midpoint estimate of quantile q as an
    * UNROUNDED double column `name` (callers round for output; scalar
    * consumers — winsorize fences, MAD thresholds — compare against
    * the raw rep so a rounding step can't flip a boundary row). Same
    * cumulative-in-bucket-order pick as [[histQuantiles]]; kept
    * separate so that serving path's (p50, p90, n_values) shape stays
    * pinned. */
  def histQuantilesAt(hist: DataFrame, keyCols: Seq[String],
                      qs: Seq[(Double, String)]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy(col("bucket"))
    val wAll = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("total", sum(col("cnt")).over(wAll))
    val picks = qs.map { case (q, name) =>
      min(when(col("cum").cast("double") >=
        lit(q) * col("total").cast("double"), col("bucket")))
        .as(s"b_$name")
    }
    cum.groupBy(keyCols.head, keyCols.tail: _*)
      .agg(picks.head, picks.tail: _*)
      .select((keyCols.map(col) ++ qs.map { case (_, name) =>
        (rep2Expr(s"b_$name").cast("double") / lit(200.0)).as(name)
      }): _*)
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, QFn] = Map(
    // Distinct parts per return flag — ~2k distinct per key at any sf,
    // so the estimate takes the HLL branch (E_raw > 2.5m).
    "sketch_hll_distinct" -> ((s, d) =>
      hllQuery(lineitem(s, d).filter(col("l_partkey").isNotNull),
        "l_returnflag", "l_partkey")),
    // Distinct users per event type — 150 per key at sf0.01, so the
    // linear-counting branch is the one the oracle pins here.
    "sketch_hll_users" -> ((s, d) =>
      hllQuery(events(s, d), "event_type", "user_id")),
    // Bottom-k distinct per return flag: ~2k distinct against k=64
    // exercises the estimation branch; exact side-by-side.
    // The distinct (key, value) base is checkpointed ONCE (r16): it
    // feeds the sketch AND the exact count, and without the checkpoint
    // each consumer re-scans + re-distincts lineitem (no common-subtree
    // reuse across the join). The frame is VALUE-DOMAIN-bounded (flags
    // × distinct parts), the same dim-grain class the repo already
    // materializes — never corpus-sized.
    "sketch_kmv_distinct" -> ((s, d) => {
      val src = lineitem(s, d).filter(col("l_partkey").isNotNull)
        .select(col("l_returnflag"), col("l_partkey").as("v")).distinct()
        .localCheckpoint()
      kmvEstimate(kmvSketch(src, Seq("l_returnflag"), "v"),
          Seq("l_returnflag"))
        .join(src.groupBy("l_returnflag")
          .agg(count(lit(1)).as("exact_distinct")), "l_returnflag")
    }),
    // Set algebra on sketches: distinct parts appearing under BOTH
    // return flags A and N — the question per-key distinct counts
    // cannot answer without a rescan.
    // Checkpoint discipline (r16, the kmv_distinct rationale): `src`
    // (domain-bounded distinct values) is consumed by the sketch and
    // BOTH sides of the exact intersect; `sk` (≤ 2·k rows) is consumed
    // by kmvIntersect's union/common/per-side stats legs 3× per side.
    // Un-checkpointed, the one-shot plan re-ran the lineitem scan +
    // distinct shuffle EIGHT times (82 Exchange nodes on the r16
    // before-plan); now lineitem is scanned once.
    "sketch_kmv_intersection" -> ((s, d) => {
      val src = lineitem(s, d)
        .filter(col("l_partkey").isNotNull &&
          col("l_returnflag").isin("A", "N"))
        .select(col("l_returnflag"), col("l_partkey").as("v")).distinct()
        .localCheckpoint()
      val sk = kmvSketch(src, Seq("l_returnflag"), "v").localCheckpoint()
      val exact = src.filter(col("l_returnflag") === "A").select("v")
        .intersect(src.filter(col("l_returnflag") === "N").select("v"))
        .agg(count(lit(1)).as("exact_intersection"))
      kmvIntersect(sk.filter(col("l_returnflag") === "A").select("kmv_h"),
          sk.filter(col("l_returnflag") === "N").select("kmv_h"))
        .crossJoin(broadcast(exact))
    }),
    // Mergeable-histogram quantiles vs the exact percentiles: the
    // bucket-midpoint estimate must land within one bucket width
    // (≤ ~6%) of the exact value — visible side by side.
    "sketch_hist_quantiles" -> ((s, d) => {
      import graft.functions.NormExprs.pround
      val li = lineitem(s, d)
      histQuantiles(
          histBuckets(li, Seq("l_returnflag"), "l_extendedprice"),
          Seq("l_returnflag"))
        .join(li.groupBy("l_returnflag").agg(
          pround(percentile(col("l_extendedprice"), lit(0.5)), 2)
            .as("exact_p50"),
          pround(percentile(col("l_extendedprice"), lit(0.9)), 2)
            .as("exact_p90")), "l_returnflag")
    }),
    // Slice set algebra (the gold KMV sidecar's serving question,
    // proven cross-engine): providers active in BOTH of the two
    // busiest (state, month) market slices — per-side, union,
    // intersection and difference estimates against the exact
    // intersection. Slice selection is a deterministic top-2
    // (count desc, state, ym), collected like the repo's other
    // bounded literals.
    "sketch_kmv_slices" -> ((s, d) => {
      val fact = graft.etl.GoldAggregates.ratesWithState(s, d)
      val top = fact.filter(col("state").isNotNull)
        .groupBy("state", "year_month").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("state"), col("year_month"))
        .limit(2).collect()
        .map(r => (r.getString(0), r.getString(1)))
      require(top.length == 2,
        s"sketch_kmv_slices needs >= 2 non-empty (state, year_month) " +
          s"slices in the fact; found ${top.length}")
      val Array(sa, sb) = top
      // ONE pass over the fact join for both slices, checkpointed (r16):
      // the sketch sides and the exact intersect consumed the
      // fact-join subtree EIGHT times (124 Exchange nodes on the r16
      // before-plan — kmvIntersect alone reads each side 3×). The
      // checkpointed frame is two market slices' values — the
      // slice-grain working set a serving rollup holds anyway, a tiny
      // fraction of the fact at any scale. The per-side sketches
      // (≤ k rows each) checkpoint too, so kmvIntersect's three legs
      // read 64-row frames instead of replaying the slice filter.
      val sliced = fact
        .filter(col("v").isNotNull &&
          ((col("state") <=> lit(sa._1) && col("year_month") <=> lit(sa._2)) ||
            (col("state") <=> lit(sb._1) && col("year_month") <=> lit(sb._2))))
        .select(col("state"), col("year_month"), col("v"))
        .localCheckpoint()
      def slice(sl: (String, String)) = sliced
        .filter(col("state") <=> lit(sl._1) &&
          col("year_month") <=> lit(sl._2))
      def side(sl: (String, String)) =
        kmvSketch(slice(sl), Seq("state"), "v").select("kmv_h")
          .localCheckpoint()
      val exact = slice(sa).select("v").intersect(slice(sb).select("v"))
        .agg(count(lit(1)).as("exact_intersection"))
      kmvIntersect(side(sa), side(sb))
        .crossJoin(broadcast(exact))
        .select(lit(sa._1 + "|" + sa._2).as("slice_a"),
          lit(sb._1 + "|" + sb._2).as("slice_b"),
          col("u_cnt"), col("u_kth"), col("common_cnt"),
          col("est_a"), col("est_b"), col("est_union"),
          col("est_intersection"), col("est_a_minus_b"),
          col("exact_intersection"))
    }),
    // Heavy hitters: the 20 most frequent document tokens, their
    // exact corpus frequency, and the count-min estimate — the
    // overcount column is the sketch's one-sided error, observable.
    "sketch_cms_heavy" -> ((s, d) => {
      val counts = docs(s, d)
        .select(explode(TextAnalysis.tokCol(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("exact_cnt"))
      val counters = cmsCounters(counts, "token", "exact_cnt")
      val probe = counts.orderBy(col("exact_cnt").desc, col("token").asc)
        .limit(20)
      cmsEstimate(counters, probe, "token")
        .join(probe, "token")
        .select(col("token"), col("exact_cnt"), col("est_cnt"),
          (col("est_cnt") - col("exact_cnt")).as("overcount"))
    }))

  /** The SQL form of [[kmvIntersect]]'s per-sketch estimator —
    * generated once so every use site in the twin stays identical. */
  private def kmvEstSql(cnt: String, kth: String): String =
    s"""CASE WHEN $cnt < $KmvK THEN CAST($cnt AS DOUBLE)
        ELSE (${(KmvK - 1).toDouble} * ${math.pow(2.0, 60)}) / CAST($kth AS DOUBLE)
        END"""

  def oracles: Map[String, String] = Map(
    "sketch_hll_distinct" -> hllSql(
      """SELECT l_returnflag, l_partkey AS v FROM lineitem
         WHERE l_partkey IS NOT NULL GROUP BY 1, 2""", "l_returnflag"),
    "sketch_hll_users" -> hllSql(
      "SELECT event_type, user_id AS v FROM events GROUP BY 1, 2",
      "event_type"),
    "sketch_kmv_distinct" -> s"""
      WITH src AS (
        SELECT l_returnflag, l_partkey AS v FROM lineitem
        WHERE l_partkey IS NOT NULL GROUP BY 1, 2),
      h AS (
        SELECT DISTINCT l_returnflag,
               CAST(('0x' || substr(md5('kmv:' || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS kmv_h
        FROM src),
      sk AS (
        SELECT l_returnflag, kmv_h FROM (
          SELECT l_returnflag, kmv_h,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY kmv_h) AS rn
          FROM h) WHERE rn <= $KmvK),
      est AS (
        SELECT l_returnflag, COUNT(*) AS kmv_cnt,
               CAST(MAX(kmv_h) AS BIGINT) AS kmv_kth
        FROM sk GROUP BY 1),
      exact AS (
        SELECT l_returnflag, COUNT(*) AS exact_distinct FROM src GROUP BY 1)
      SELECT est.l_returnflag, est.kmv_cnt, est.kmv_kth,
             floor((CASE WHEN est.kmv_cnt < $KmvK
                    THEN CAST(est.kmv_cnt AS DOUBLE)
                    ELSE (${(KmvK - 1).toDouble} * ${math.pow(2.0, 60)}) / CAST(est.kmv_kth AS DOUBLE)
                    END) * 10000.0 + 0.5) / 10000.0 AS est_distinct,
             exact.exact_distinct
      FROM est JOIN exact USING (l_returnflag)""",
    "sketch_kmv_intersection" -> s"""
      WITH src AS (
        SELECT l_returnflag, l_partkey AS v FROM lineitem
        WHERE l_partkey IS NOT NULL AND l_returnflag IN ('A', 'N')
        GROUP BY 1, 2),
      h AS (
        SELECT DISTINCT l_returnflag,
               CAST(('0x' || substr(md5('kmv:' || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS kmv_h
        FROM src),
      sk AS (
        SELECT l_returnflag, kmv_h FROM (
          SELECT l_returnflag, kmv_h,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY kmv_h) AS rn
          FROM h) WHERE rn <= $KmvK),
      a AS (SELECT kmv_h FROM sk WHERE l_returnflag = 'A'),
      b AS (SELECT kmv_h FROM sk WHERE l_returnflag = 'N'),
      u AS (
        SELECT kmv_h FROM (
          SELECT DISTINCT kmv_h FROM (
            SELECT kmv_h FROM a UNION ALL SELECT kmv_h FROM b))
        ORDER BY kmv_h LIMIT $KmvK),
      stats AS (
        SELECT COUNT(*) AS u_cnt, CAST(MAX(kmv_h) AS BIGINT) AS u_kth
        FROM u),
      astats AS (
        SELECT COUNT(*) AS a_cnt, CAST(MAX(kmv_h) AS BIGINT) AS a_kth
        FROM a),
      bstats AS (
        SELECT COUNT(*) AS b_cnt, CAST(MAX(kmv_h) AS BIGINT) AS b_kth
        FROM b),
      common AS (
        SELECT COUNT(*) AS common_cnt
        FROM a JOIN b USING (kmv_h) JOIN u USING (kmv_h)),
      exact AS (
        SELECT COUNT(*) AS exact_intersection FROM (
          SELECT v FROM src WHERE l_returnflag = 'A'
          INTERSECT
          SELECT v FROM src WHERE l_returnflag = 'N'))
      SELECT stats.u_cnt, stats.u_kth, common.common_cnt,
             floor((${kmvEstSql("astats.a_cnt", "astats.a_kth")}) * 10000.0 + 0.5) / 10000.0 AS est_a,
             floor((${kmvEstSql("bstats.b_cnt", "bstats.b_kth")}) * 10000.0 + 0.5) / 10000.0 AS est_b,
             floor((${kmvEstSql("stats.u_cnt", "stats.u_kth")}) * 10000.0 + 0.5) / 10000.0 AS est_union,
             floor((CAST(common.common_cnt AS DOUBLE) / CAST(stats.u_cnt AS DOUBLE) *
                    (${kmvEstSql("stats.u_cnt", "stats.u_kth")})) * 10000.0 + 0.5) / 10000.0 AS est_intersection,
             floor((greatest((${kmvEstSql("astats.a_cnt", "astats.a_kth")}) -
                    CAST(common.common_cnt AS DOUBLE) / CAST(stats.u_cnt AS DOUBLE) *
                    (${kmvEstSql("stats.u_cnt", "stats.u_kth")}),
                    CAST(0.0 AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS est_a_minus_b,
             exact.exact_intersection
      FROM stats, astats, bstats, common, exact""",
    "sketch_hist_quantiles" -> {
      def rep2(n: String) =
        s"""(CASE WHEN ($n >> 3) <= 3 THEN ($n & 7) * 2
             ELSE (8 + ($n & 7)) *
                    (CAST(1 AS BIGINT) << CAST(($n >> 3) - 4 AS INTEGER)) * 2
                  + (CAST(1 AS BIGINT) << CAST(($n >> 3) - 4 AS INTEGER))
             END)"""
      s"""
      WITH src AS (
        SELECT l_returnflag,
               greatest(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT),
                 1) AS hv
        FROM lineitem WHERE l_extendedprice IS NOT NULL),
      octv AS (SELECT l_returnflag, hv, length(bin(hv)) AS ho FROM src),
      hist AS (
        SELECT l_returnflag,
               ho * 8 + ((hv >> (CASE WHEN ho - 4 > 0 THEN ho - 4 ELSE 0 END))
                 & 7) AS bucket,
               COUNT(*) AS cnt
        FROM octv GROUP BY 1, 2),
      cum AS (
        SELECT l_returnflag, bucket, cnt,
               SUM(cnt) OVER (PARTITION BY l_returnflag
                              ORDER BY bucket) AS cum,
               SUM(cnt) OVER (PARTITION BY l_returnflag) AS total
        FROM hist),
      picks AS (
        SELECT l_returnflag, CAST(MAX(total) AS BIGINT) AS n_values,
               MIN(CASE WHEN CAST(cum AS DOUBLE) >=
                 0.5 * CAST(total AS DOUBLE) THEN bucket END) AS b50,
               MIN(CASE WHEN CAST(cum AS DOUBLE) >=
                 0.9 * CAST(total AS DOUBLE) THEN bucket END) AS b90
        FROM cum GROUP BY 1),
      exact AS (
        SELECT l_returnflag,
               floor(quantile_cont(l_extendedprice, 0.5) * 100.0 + 0.5)
                 / 100.0 AS exact_p50,
               floor(quantile_cont(l_extendedprice, 0.9) * 100.0 + 0.5)
                 / 100.0 AS exact_p90
        FROM lineitem GROUP BY 1)
      SELECT picks.l_returnflag, picks.n_values,
             floor(CAST(${rep2("b50")} AS DOUBLE) / 200.0 * 10000.0 + 0.5)
               / 10000.0 AS est_p50,
             floor(CAST(${rep2("b90")} AS DOUBLE) / 200.0 * 10000.0 + 0.5)
               / 10000.0 AS est_p90,
             exact.exact_p50, exact.exact_p90
      FROM picks JOIN exact USING (l_returnflag)"""
    },
    "sketch_kmv_slices" -> s"""
      WITH rates AS (${graft.RolesSql.rates}),
      providers AS (${graft.RolesSql.providers}),
      fact AS (
        SELECT p.state, r.year_month, r.provider_reference_id AS v
        FROM rates r LEFT JOIN providers p
          ON r.provider_reference_id = p.provider_group_id),
      top2 AS (
        SELECT state, year_month,
               row_number() OVER (ORDER BY COUNT(*) DESC, state,
                 year_month) AS rn
        FROM fact WHERE state IS NOT NULL GROUP BY state, year_month
        QUALIFY rn <= 2),
      fa AS (SELECT DISTINCT v FROM fact
             JOIN top2 USING (state, year_month)
             WHERE top2.rn = 1 AND v IS NOT NULL),
      fb AS (SELECT DISTINCT v FROM fact
             JOIN top2 USING (state, year_month)
             WHERE top2.rn = 2 AND v IS NOT NULL),
      ha AS (SELECT DISTINCT
               CAST(('0x' || substr(md5('kmv:' || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS kmv_h
             FROM fa),
      hb AS (SELECT DISTINCT
               CAST(('0x' || substr(md5('kmv:' || CAST(v AS VARCHAR)), 1, 15)) AS BIGINT) AS kmv_h
             FROM fb),
      a AS (SELECT kmv_h FROM ha ORDER BY kmv_h LIMIT $KmvK),
      b AS (SELECT kmv_h FROM hb ORDER BY kmv_h LIMIT $KmvK),
      u AS (
        SELECT kmv_h FROM (
          SELECT DISTINCT kmv_h FROM (
            SELECT kmv_h FROM a UNION ALL SELECT kmv_h FROM b))
        ORDER BY kmv_h LIMIT $KmvK),
      stats AS (
        SELECT COUNT(*) AS u_cnt, CAST(MAX(kmv_h) AS BIGINT) AS u_kth
        FROM u),
      astats AS (
        SELECT COUNT(*) AS a_cnt, CAST(MAX(kmv_h) AS BIGINT) AS a_kth
        FROM a),
      bstats AS (
        SELECT COUNT(*) AS b_cnt, CAST(MAX(kmv_h) AS BIGINT) AS b_kth
        FROM b),
      common AS (
        SELECT COUNT(*) AS common_cnt
        FROM a JOIN b USING (kmv_h) JOIN u USING (kmv_h)),
      exact AS (
        SELECT COUNT(*) AS exact_intersection FROM (
          SELECT v FROM fa INTERSECT SELECT v FROM fb))
      SELECT
        (SELECT state || '|' || year_month FROM top2 WHERE rn = 1) AS slice_a,
        (SELECT state || '|' || year_month FROM top2 WHERE rn = 2) AS slice_b,
        stats.u_cnt, stats.u_kth, common.common_cnt,
        floor((${kmvEstSql("astats.a_cnt", "astats.a_kth")}) * 10000.0 + 0.5) / 10000.0 AS est_a,
        floor((${kmvEstSql("bstats.b_cnt", "bstats.b_kth")}) * 10000.0 + 0.5) / 10000.0 AS est_b,
        floor((${kmvEstSql("stats.u_cnt", "stats.u_kth")}) * 10000.0 + 0.5) / 10000.0 AS est_union,
        floor((CAST(common.common_cnt AS DOUBLE) / CAST(stats.u_cnt AS DOUBLE) *
               (${kmvEstSql("stats.u_cnt", "stats.u_kth")})) * 10000.0 + 0.5) / 10000.0 AS est_intersection,
        floor((greatest((${kmvEstSql("astats.a_cnt", "astats.a_kth")}) -
               CAST(common.common_cnt AS DOUBLE) / CAST(stats.u_cnt AS DOUBLE) *
               (${kmvEstSql("stats.u_cnt", "stats.u_kth")}),
               CAST(0.0 AS DOUBLE))) * 10000.0 + 0.5) / 10000.0 AS est_a_minus_b,
        exact.exact_intersection
      FROM stats, astats, bstats, common, exact""",
    "sketch_cms_heavy" -> s"""
      WITH tok AS (${TextAnalysis.tokCteSql}),
      toks AS (SELECT unnest(tk) AS token FROM tok),
      counts AS (
        SELECT token, COUNT(*) AS exact_cnt FROM toks GROUP BY 1),
      probe AS (
        SELECT token, exact_cnt FROM counts
        ORDER BY exact_cnt DESC, token ASC LIMIT 20),
      cells AS (
        SELECT j.j AS cms_row,
               CAST(('0x' || substr(md5('cms:' || CAST(j.j AS VARCHAR) || '|' || token), 1, 15)) AS BIGINT) & ${CmsWidth - 1} AS cms_idx,
               exact_cnt
        FROM counts CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) AS j),
      counters AS (
        SELECT cms_row, cms_idx, CAST(SUM(exact_cnt) AS BIGINT) AS cnt
        FROM cells GROUP BY 1, 2),
      est AS (
        SELECT p.token, MIN(c.cnt) AS est_cnt
        FROM probe p
        CROSS JOIN (SELECT unnest([0, 1, 2]) AS j) AS j
        JOIN counters c
          ON c.cms_row = j.j
         AND c.cms_idx = (CAST(('0x' || substr(md5('cms:' || CAST(j.j AS VARCHAR) || '|' || p.token), 1, 15)) AS BIGINT) & ${CmsWidth - 1})
        GROUP BY 1)
      SELECT probe.token, probe.exact_cnt, est.est_cnt,
             est.est_cnt - probe.exact_cnt AS overcount
      FROM probe JOIN est USING (token)""")
}
