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
    df.select((keyCols.map(col) :+ h.bitwiseAND(lit((m - 1).toLong))
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
    val dedup = base.select(col(keyCol), col(valueCol).as("v")).distinct()
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
    itemCounts
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
    hashed.join(broadcast(counters), Seq("cms_row", "cms_idx"))
      .groupBy(itemCol)
      .agg(min(col("cnt")).as("est_cnt"))
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

  def oracles: Map[String, String] = Map(
    "sketch_hll_distinct" -> hllSql(
      """SELECT l_returnflag, l_partkey AS v FROM lineitem
         WHERE l_partkey IS NOT NULL GROUP BY 1, 2""", "l_returnflag"),
    "sketch_hll_users" -> hllSql(
      "SELECT event_type, user_id AS v FROM events GROUP BY 1, 2",
      "event_type"),
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
