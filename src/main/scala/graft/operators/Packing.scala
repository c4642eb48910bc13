package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NormExprs.pround
import graft.queries.QueryPack

/** Training-sequence packing: assemble documents into fixed-token-budget
  * sequences (the concat-and-chunk step every pretraining pipeline runs
  * between curation and tokenized shards).
  *
  * Semantics = GPT-style concatenation: within a pack group, documents
  * are laid end-to-end in a deterministic order and the token stream is
  * chunked every `budget` tokens; a document may straddle a chunk
  * boundary (`n_seqs_spanned` > 1). No padding between docs.
  *
  * Scale design (the reason this is NOT one global window):
  *  - a single running sum over the whole corpus would be one total
  *    order — a global sort with no parallelism. Instead packing runs
  *    per (source, pack_group) where `pack_group = doc_id / groupDocs`,
  *    so each window sort is bounded at `groupDocs` rows and groups
  *    pack embarrassingly parallel across executors;
  *  - the price is bounded waste: at most one partial trailing sequence
  *    per group (measured by `pack_stats.padding_waste`), which
  *    amortizes to nothing as groupDocs grows;
  *  - only (id, group keys, token count) shuffle — never the text.
  *    Token counts come from a scan-side projection.
  */
object Packing extends QueryPack {

  /** Tokens per packed training sequence (fixture-scale; a real run
    * would use the model context length, e.g. 2048/8192). */
  val Budget = 128

  /** Documents per pack group — the parallel packing unit. Fixture-
    * scale; at corpus scale pick ~10⁵ so a group fills executors'
    * memory comfortably while keeping trailing-sequence waste ≪ 1%. */
  val GroupDocs = 256

  /** Corpus-generic packing kernel. `df` must carry `idCol` (orderable,
    * unique within a group), the `groupCols`, and `tokenCol` (per-doc
    * token count). Emits the input plus:
    *  - `token_start`: the doc's offset in its group's token stream;
    *  - `seq_idx`: index of the sequence the doc STARTS in;
    *  - `seq_offset`: offset within that sequence;
    *  - `n_seqs_spanned`: how many sequences the doc crosses;
    *  - `seq_uid`: md5 of group keys + seq_idx — the shard-stable
    *    sequence identity a writer would partition by.
    */
  def packPrepared(df: DataFrame, groupCols: Seq[String], idCol: String,
                   tokenCol: String, budget: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("token_start",
        coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_idx", floor(col("token_start") / budget))
      .withColumn("seq_offset", col("token_start") % budget)
      .withColumn("n_seqs_spanned",
        (floor((col("token_start") + greatest(col(tokenCol), lit(1)) - 1)
          / budget) - col("seq_idx") + 1).cast("int"))
      .withColumn("seq_uid",
        md5(concat_ws("|", groupCols.map(col) :+ col("seq_idx"): _*)))
  }

  /** Fixture wiring: documents → (source, pack_group) groups with
    * whitespace token counts (same tokenizer as `text_token_count`). */
  private def prepared(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents").select(
      col("doc_id"), col("source"),
      (col("doc_id") / GroupDocs).cast("long").as("pack_group"),
      size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))

  /** Docs per curriculum shard (fixture-scale; a real run sizes this
    * to the data-loader's shard granularity). */
  val CurriculumShard = 64

  /** Curriculum sharding: a global difficulty order (here n_chars asc
    * — short-to-long, the classic length curriculum) mapped to
    * (shard, pos) so a loader streams shards in order and gets the
    * curriculum. The total order comes from [[Ranking.globalRank]] —
    * driver-bounded quantile boundaries, never a single-partition
    * window — so the op is exactly what the PlanLint bar demands of a
    * corpus-scale sort. Rank values are boundary-invariant, which is
    * what lets the oracle pin (shard, pos) with a plain window. */
  def curriculumShards(df: DataFrame, difficulty: String, idCol: String,
                       shardSize: Int): DataFrame =
    Ranking.globalRank(df, difficulty, idCol)
      .withColumn("shard", ((col("rank") - 1) / shardSize).cast("long"))
      .withColumn("pos", ((col("rank") - 1) % shardSize).cast("long"))

  def queries: Map[String, QFn] = Map(
    // Length-curriculum shard assignment over the corpus.
    "pack_curriculum" -> ((s, d) =>
      curriculumShards(
          Tables.load(s, d, "documents")
            .select("doc_id", "source", "n_chars"),
          "n_chars", "doc_id", CurriculumShard)
        .select("doc_id", "source", "n_chars", "rank", "shard", "pos")),

    "pack_sequences" -> ((s, d) =>
      packPrepared(prepared(s, d), Seq("source", "pack_group"),
        "doc_id", "n_tokens", Budget)
        .select("doc_id", "source", "pack_group", "n_tokens",
          "token_start", "seq_idx", "seq_offset", "n_seqs_spanned",
          "seq_uid")),

    // Packing report: per source — docs, tokens, corpus share, emitted
    // sequences (ceil per group), and trailing-waste tokens. The
    // numbers a pipeline owner reads before launching a run.
    "pack_stats" -> ((s, d) => {
      val perGroup = prepared(s, d)
        .groupBy("source", "pack_group")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("grp_tokens"))
        .withColumn("grp_seqs", ceil(col("grp_tokens") / lit(Budget.toDouble)))
      val bySource = perGroup.groupBy("source")
        .agg(sum("n_docs").as("n_docs"),
          sum("grp_tokens").as("n_tokens"),
          sum("grp_seqs").as("n_sequences"),
          sum(col("grp_seqs") * Budget - col("grp_tokens"))
            .as("padding_waste"))
      // corpus share via the broadcast-scalar pattern (one-row grand
      // total cross-joined), not an unpartitioned window — the window
      // form funnels every row through ONE task at scale
      bySource.crossJoin(bySource.agg(sum("n_tokens").as("__tot")))
        .withColumn("token_share", pround(col("n_tokens") / col("__tot"), 6))
        .select("source", "n_docs", "n_tokens", "token_share",
          "n_sequences", "padding_waste")
    })
  )

  def oracles: Map[String, String] = {
    val tok = "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)"
    Map(
      "pack_curriculum" -> s"""
        SELECT doc_id, source, n_chars,
               CAST(row_number() OVER (ORDER BY n_chars, doc_id)
                 AS BIGINT) AS rank,
               CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1)
                 // $CurriculumShard AS BIGINT) AS shard,
               CAST((row_number() OVER (ORDER BY n_chars, doc_id) - 1)
                 % $CurriculumShard AS BIGINT) AS pos
        FROM documents""",

      "pack_sequences" -> s"""
        WITH prep AS (
          SELECT doc_id, source,
                 CAST(doc_id // $GroupDocs AS BIGINT) AS pack_group,
                 $tok AS n_tokens
          FROM documents),
        packed AS (
          SELECT *, CAST(coalesce(SUM(n_tokens) OVER (
                   PARTITION BY source, pack_group ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS token_start
          FROM prep)
        SELECT doc_id, source, pack_group, n_tokens, token_start,
               CAST(floor(token_start / $Budget) AS BIGINT) AS seq_idx,
               token_start % $Budget AS seq_offset,
               CAST(floor((token_start + greatest(n_tokens, 1) - 1) / $Budget)
                    - floor(token_start / $Budget) + 1 AS INTEGER)
                 AS n_seqs_spanned,
               md5(source || '|' || CAST(pack_group AS VARCHAR) || '|' ||
                   CAST(CAST(floor(token_start / $Budget) AS BIGINT) AS VARCHAR))
                 AS seq_uid
        FROM packed""",

      "pack_stats" -> s"""
        WITH prep AS (
          SELECT doc_id, source,
                 CAST(doc_id // $GroupDocs AS BIGINT) AS pack_group,
                 $tok AS n_tokens
          FROM documents),
        grp AS (
          SELECT source, pack_group, COUNT(*) AS n_docs,
                 SUM(n_tokens) AS grp_tokens,
                 CAST(ceil(SUM(n_tokens) / $Budget.0) AS BIGINT) AS grp_seqs
          FROM prep GROUP BY 1, 2)
        SELECT source, CAST(SUM(n_docs) AS BIGINT) AS n_docs,
               CAST(SUM(grp_tokens) AS BIGINT) AS n_tokens,
               floor((SUM(grp_tokens) * 1.0 /
                      SUM(SUM(grp_tokens)) OVER ()) * 1000000.0 + 0.5)
                 / 1000000.0 AS token_share,
               CAST(SUM(grp_seqs) AS BIGINT) AS n_sequences,
               CAST(SUM(grp_seqs * $Budget - grp_tokens) AS BIGINT)
                 AS padding_waste
        FROM grp GROUP BY 1"""
    )
  }
}
