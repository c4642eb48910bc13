package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NormExprs.pround
import graft.queries.QueryPack

/** Model / corpus evaluation operators — the QA layer a training-data
  * platform runs over its own filters and distributions:
  *
  *  - `classifier_eval_auc`: EXACT distributed ROC-AUC of the quality
  *    classifier against the language label, via the rank-sum
  *    (Mann-Whitney) identity computed entirely in INTEGERS — tie
  *    groups get average ranks, carried as doubled ranks so nothing
  *    is ever fractional until the single final divide. No sampling,
  *    no approximation, no fp accumulation anywhere.
  *  - `classifier_calibration`: decile-bucketed observed positive
  *    rates — the calibration curve behind threshold selection. Rank
  *    deciles come from an explicit integer formula (not ntile, whose
  *    edge semantics would be an engine-compat risk), mean scores are
  *    fixed-point sums of the published 4-dp scores.
  *  - `corpus_drift_js`: Jensen-Shannon divergence between two
  *    sub-corpora's Laplace-smoothed unigram distributions — the
  *    drift monitor between ingest generations. Per-token terms are
  *    fixed-point rounded and summed as BIGINTs (order-free), so the
  *    divergence is deterministic without collecting the vocabulary
  *    anywhere.
  *
  * Scale shapes: AUC aggregates at SCORE-group grain (thousands of
  * distinct rounded scores, not corpus rows) — the one ordered window
  * runs over that bounded frame; calibration's rank window orders
  * score groups the same way; drift is two map-side-combinable
  * aggregates and a broadcast totals row.
  */
object Evaluation extends QueryPack {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Published classifier scores joined with the binary label. */
  private def scoredLabeled(s: SparkSession, d: String): DataFrame =
    TextAnalysis.classifierScore(docs(s, d), "doc_id", "text",
      TextAnalysis.ClsWeights)
      .join(docs(s, d).select(col("doc_id"),
        when(col("lang") === "en", 1).otherwise(0).as("y")), "doc_id")

  /** JS-divergence fixed-point scale (term magnitudes ≤ 1; vocab-many
    * roundings stay far below the published 4 dp). */
  private val JsScale = 1e12

  def queries: Map[String, QFn] = Map(
    "classifier_eval_auc" -> ((s, d) => {
      val groups = scoredLabeled(s, d)
        .groupBy("score")
        .agg(count(lit(1)).as("c"), sum(col("y")).as("p"))
      val w = Window.orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      val withCum = groups
        .withColumn("cum_before", coalesce(sum(col("c")).over(w), lit(0L)))
      // doubled average rank of a tie group = 2·cum_before + c + 1;
      // Σ over positives stays integral
      withCum.agg(
          sum(col("p") * (lit(2) * col("cum_before") + col("c") + 1))
            .as("s2"),
          sum(col("p")).as("n_pos"),
          sum(col("c")).as("n_all"))
        .select(col("n_pos"), (col("n_all") - col("n_pos")).as("n_neg"),
          // single-class input has no ROC curve: explicit NULL on both
          // engines (Spark's 0-divide is NULL, DuckDB's is inf — an
          // unguarded divide would diverge cross-engine)
          when(col("n_pos") === 0 || col("n_all") === col("n_pos"),
            lit(null).cast("double"))
            .otherwise(pround((col("s2") - col("n_pos") * (col("n_pos") + 1))
                .cast("double") /
              (lit(2.0) * col("n_pos") * (col("n_all") - col("n_pos"))), 6))
            .as("auc"))
    }),

    "classifier_calibration" -> ((s, d) => {
      // checkpointed (r16): the scored frame is consumed THREE times
      // (total count, score-group offsets, the ranked join) and each
      // consumer re-ran the tokenize + classifier score over the
      // corpus. The frame is doc-grain and slim (id, score, label) —
      // the score table an eval pipeline materializes anyway.
      val sc = scoredLabeled(s, d).localCheckpoint()
      val n = sc.agg(count(lit(1)).as("n_total"))
      // TWO-LEVEL ranking (the distributed prefix-sum): a global
      // row_number window would funnel the whole corpus through one
      // task. Instead the bounded score-group frame carries each
      // group's rank offset (cum_before — the same grain AUC uses),
      // and the per-doc tiebreak ranks only WITHIN its score
      // partition; rank = cum_before + rn_within is exactly the
      // global (score desc, doc_id) row_number.
      val groups = sc.groupBy("score").agg(count(lit(1)).as("gc"))
      val wg = Window.orderBy(col("score").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = groups
        .withColumn("cum_before", coalesce(sum(col("gc")).over(wg), lit(0L)))
        .select("score", "cum_before")
      val wIn = Window.partitionBy("score").orderBy("doc_id")
      sc.join(broadcast(offsets), "score")
        .withColumn("rn", col("cum_before") + row_number().over(wIn))
        .crossJoin(broadcast(n))
        .withColumn("decile",
          // widen BEFORE the ×10: row_number is 32-bit, so (rn−1)*10
          // wraps above ~214M rows while the BIGINT oracle stays right
          (floor(((col("rn") - 1).cast("long") * 10).cast("double") /
            col("n_total")) + 1).cast("int"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("y")).as("n_pos"),
          // the published score is k/1e4; recover k exactly, sum ints
          sum(floor(col("score") * 10000 + lit(0.5))).as("s4"))
        .select(col("decile"), col("n_docs"), col("n_pos"),
          pround(col("n_pos").cast("double") / col("n_docs"), 4)
            .as("pos_rate"),
          pround((col("s4") / lit(10000.0)) / col("n_docs"), 6)
            .as("mean_score"))
    }),

    "corpus_drift_js" -> ((s, d) => {
      val tok = docs(s, d)
        .select((col("doc_id") % 2 === 0).as("side_a"),
          explode(TextAnalysis.tokCol(col("text"))).as("token"))
      val counts = tok.groupBy("token")
        .agg(sum(when(col("side_a"), 1L).otherwise(0L)).as("ca"),
          sum(when(col("side_a"), 0L).otherwise(1L)).as("cb"))
      val tot = counts.agg(sum(col("ca")).cast("double").as("ta"),
        sum(col("cb")).cast("double").as("tb"),
        count(lit(1)).cast("double").as("v"))
      val pa = (col("ca").cast("double") + lit(1.0)) / (col("ta") + col("v"))
      val pb = (col("cb").cast("double") + lit(1.0)) / (col("tb") + col("v"))
      val m = (pa + pb) / lit(2.0)
      val term = lit(0.5) * (pa * log(pa / m)) + lit(0.5) * (pb * log(pb / m))
      counts.crossJoin(broadcast(tot))
        .select(col("ta"), col("tb"), col("v"),
          floor(term * lit(JsScale) + lit(0.5)).as("t_scaled"))
        .groupBy("ta", "tb", "v")
        .agg(sum(col("t_scaled")).as("s"))
        .select(col("v").cast("long").as("v_size"),
          col("ta").cast("long").as("tokens_a"),
          col("tb").cast("long").as("tokens_b"),
          pround(col("s") / lit(JsScale), 4).as("js_div"))
    }),

    // Population Stability Index — JS's industry twin for monitoring
    // a SCALAR feature's distribution drift (model-risk teams read
    // PSI per feature per refresh; >0.2 = investigate): doc length
    // binned to 10 fixed-width buckets, expected = the 'en' slice,
    // observed = the rest, per-bin (pa−pb)·ln(pa/pb) with Laplace
    // smoothing (+0.5/bin) so an empty side never takes ln(0).
    // Per-BIN terms are emitted (the actionable view — which length
    // band drifted), so no cross-engine fp sum exists at all; both
    // counts ride one map-side-combined aggregate over the
    // 10-row bin grain and the totals broadcast back.
    "corpus_drift_psi" -> ((s, d) => {
      val binned = docs(s, d).select(col("lang"),
        least(lit(9), floor(col("n_chars") / lit(64)).cast("int"))
          .as("bin"))
      // Explicit 0-9 bin spine (r13 ADVICE): a bin empty on BOTH sides
      // is absent from the groupBy output, yet its smoothed psi_term is
      // nonzero — left-joining counts onto the full spine (ca/cb
      // coalesced to 0) keeps the summed PSI equal to the canonical
      // 10-bin smoothed PSI. 10 rows; broadcast, no shuffle.
      val raw = binned.groupBy("bin")
        .agg(sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ca"),
          sum(when(col("lang") === "en", 0L).otherwise(1L)).as("cb"))
      val spine = s.range(0, 10).select(col("id").cast("int").as("bin"))
      val counts = spine.join(broadcast(raw), Seq("bin"), "left")
        .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
          coalesce(col("cb"), lit(0L)).as("cb"))
      val tot = counts.agg(sum(col("ca")).cast("double").as("ta"),
        sum(col("cb")).cast("double").as("tb"))
      val pa = (col("ca").cast("double") + lit(0.5)) / (col("ta") + lit(5.0))
      val pb = (col("cb").cast("double") + lit(0.5)) / (col("tb") + lit(5.0))
      counts.crossJoin(broadcast(tot))
        .select(col("bin"), col("ca"), col("cb"),
          pround((pa - pb) * log(pa / pb), 6).as("psi_term"))
    })
  )

  def oracles: Map[String, String] = Map(
    // ranks from the same score-group cumulative identity; integers
    // end to end until the one divide
    "classifier_eval_auc" -> s"""
        WITH cls AS (${TextAnalysis.classifierOracleSql}),
        lab AS (SELECT c.doc_id, c.score,
                       CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
                FROM cls c JOIN documents d ON c.doc_id = d.doc_id),
        g AS (SELECT score, CAST(COUNT(*) AS BIGINT) AS c,
                     CAST(SUM(y) AS BIGINT) AS p
              FROM lab GROUP BY score),
        cum AS (SELECT score, c, p,
                  coalesce(SUM(c) OVER (ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                    AS cum_before
                FROM g)
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
               CASE WHEN SUM(p) = 0 OR SUM(c) = SUM(p) THEN NULL
                 ELSE floor((CAST(SUM(p * (2 * cum_before + c + 1)) -
                     SUM(p) * (SUM(p) + 1) AS DOUBLE) /
                   (2.0 * SUM(p) * (SUM(c) - SUM(p)))) * 1000000.0 + 0.5)
                   / 1000000.0 END AS auc
        FROM cum""",

    "classifier_calibration" -> s"""
        WITH cls AS (${TextAnalysis.classifierOracleSql}),
        lab AS (SELECT c.doc_id, c.score,
                       CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
                FROM cls c JOIN documents d ON c.doc_id = d.doc_id),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM lab),
        rk AS (SELECT score, y,
                 row_number() OVER (ORDER BY score DESC, doc_id) AS rn
               FROM lab)
        SELECT CAST(floor(CAST((rn - 1) * 10 AS DOUBLE) / n_total) + 1
                 AS INTEGER) AS decile,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               floor((CAST(SUM(y) AS DOUBLE) / COUNT(*)) * 10000.0 + 0.5)
                 / 10000.0 AS pos_rate,
               floor(((SUM(CAST(floor(score * 10000 + 0.5) AS BIGINT))
                   / 10000.0) / COUNT(*)) * 1000000.0 + 0.5)
                 / 1000000.0 AS mean_score
        FROM rk CROSS JOIN n
        GROUP BY 1""",

    "corpus_drift_js" -> s"""
        WITH tok AS (${TextAnalysis.tokCteSql}),
        t AS (SELECT doc_id % 2 = 0 AS side_a, unnest(tk) AS token
              FROM tok),
        counts AS (
          SELECT token,
                 CAST(SUM(CASE WHEN side_a THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN side_a THEN 0 ELSE 1 END) AS BIGINT)
                   AS cb
          FROM t GROUP BY token),
        tot AS (SELECT CAST(SUM(ca) AS DOUBLE) AS ta,
                       CAST(SUM(cb) AS DOUBLE) AS tb,
                       CAST(COUNT(*) AS DOUBLE) AS v FROM counts),
        terms AS (
          SELECT ta, tb, v,
                 CAST(floor((0.5 * (((CAST(ca AS DOUBLE) + 1.0) / (ta + v)) *
                     ln(((CAST(ca AS DOUBLE) + 1.0) / (ta + v)) /
                       ((((CAST(ca AS DOUBLE) + 1.0) / (ta + v)) +
                         ((CAST(cb AS DOUBLE) + 1.0) / (tb + v))) / 2.0))) +
                   0.5 * (((CAST(cb AS DOUBLE) + 1.0) / (tb + v)) *
                     ln(((CAST(cb AS DOUBLE) + 1.0) / (tb + v)) /
                       ((((CAST(ca AS DOUBLE) + 1.0) / (ta + v)) +
                         ((CAST(cb AS DOUBLE) + 1.0) / (tb + v))) / 2.0))))
                   * ${JsScale} + 0.5) AS BIGINT) AS t_scaled
          FROM counts CROSS JOIN tot)
        SELECT CAST(v AS BIGINT) AS v_size,
               CAST(ta AS BIGINT) AS tokens_a,
               CAST(tb AS BIGINT) AS tokens_b,
               floor((SUM(t_scaled) / ${JsScale}) * 10000.0 + 0.5)
                 / 10000.0 AS js_div
        FROM terms GROUP BY ta, tb, v""",

    // same bins, same Laplace smoothing, same (pa-pb)*ln(pa/pb)
    // parenthesization; per-bin rows so no cross-engine sum exists
    "corpus_drift_psi" -> """
        WITH b AS (
          SELECT lang,
                 least(9, CAST(floor(n_chars / 64) AS INTEGER)) AS bin
          FROM documents),
        raw AS (
          SELECT bin,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END)
                   AS BIGINT) AS cb
          FROM b GROUP BY 1),
        spine AS (SELECT CAST(range AS INTEGER) AS bin FROM range(0, 10)),
        counts AS (
          SELECT s.bin,
                 CAST(coalesce(r.ca, 0) AS BIGINT) AS ca,
                 CAST(coalesce(r.cb, 0) AS BIGINT) AS cb
          FROM spine s LEFT JOIN raw r USING (bin)),
        tot AS (SELECT CAST(SUM(ca) AS DOUBLE) AS ta,
                       CAST(SUM(cb) AS DOUBLE) AS tb FROM counts)
        SELECT bin, ca, cb,
               floor((((CAST(ca AS DOUBLE) + 0.5) / (ta + 5.0) -
                       (CAST(cb AS DOUBLE) + 0.5) / (tb + 5.0)) *
                 ln(((CAST(ca AS DOUBLE) + 0.5) / (ta + 5.0)) /
                    ((CAST(cb AS DOUBLE) + 0.5) / (tb + 5.0))))
                 * 1000000.0 + 0.5) / 1000000.0 AS psi_term
        FROM counts CROSS JOIN tot"""
  )
}
