package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryPack

/** Benchmark decontamination for a training-data pipeline: flag every
  * training document that shares an n-gram (default 8 words, the usual
  * eval-overlap window) with any document in a benchmark/eval set, so
  * contaminated docs can be dropped before training.
  *
  * Scale design: the benchmark side is tiny relative to the corpus
  * (thousands of eval items vs billions of docs), so its distinct gram
  * hashes are BROADCAST and the corpus is never shuffled — each scan
  * task filters its own grams against the broadcast set; only slim
  * (id, hit-count) pairs aggregate. Gram keys are 16-hex-char md5
  * prefixes (64 bits — collision-safe at eval-set cardinalities and
  * 4× smaller than the gram text), computed identically in DuckDB so
  * the oracle pins exact values.
  */
object Decontaminate extends QueryPack {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Cleaned word tokens (same normalization as [[Dedup]] / [[Curation]]). */
  private def tokens(t: Column): Column =
    filter(split(regexp_replace(lower(t), "[^a-z0-9 ]", " "), "\\s+"),
      v => length(v) > 0)

  /** Hashed word n-grams over a STAGED token-array attribute (HOFs run
    * interpreted with no CSE — `tk` must be a plain column, not an
    * expression). Docs shorter than n words have no grams. Used only in
    * non-Generate contexts (see [[flagContaminated]]'s explode note). */
  private def gramHashes(tk: Column, n: Int): Column =
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - (n - 1)), i =>
        substring(md5(concat_ws(" ",
          (0 until n).map(j => element_at(tk, i + j)): _*)), 1, 16)))

  /** Valid gram start positions (1-based); empty below n tokens. */
  private def gramPositions(tk: Column, n: Int): Column =
    when(size(tk) < n, array().cast("array<int>"))
      .otherwise(sequence(lit(1), size(tk) - (n - 1)))

  /** The gram hash at one staged position — a plain projection. */
  private def gramAt(tk: Column, i: Column, n: Int): Column =
    substring(md5(concat_ws(" ",
      (0 until n).map(j => element_at(tk, i + j)): _*)), 1, 16)

  /** (id?, gram) rows: explode the CHEAP position array, then compute
    * the md5 gram as an ordinary projection above the Generate.
    * Exploding the computed gram array directly re-evaluates the whole
    * interpreted transform chain per emitted element — measured 240×
    * slower (72 s vs 0.3 s on 5 000 docs) — so the expensive expression
    * must stay out of the generator. explode_outer + null filter, not
    * explode: the inner form infers `size(positions) > 0` and pushes
    * it to the scan with the tokenizer chain inlined (the
    * InferFiltersFromGenerate trap, SURVEY §4). */
  private def gramRows(tokenized: DataFrame, n: Int,
                       keep: Seq[Column]): DataFrame =
    tokenized
      .select(keep :+ col("tk") :+
        explode_outer(gramPositions(col("tk"), n)).as("i"): _*)
      .filter(col("i").isNotNull)
      .select(keep :+ gramAt(col("tk"), col("i"), n).as("gram"): _*)

  /** Corpus-generic entry point: per training doc, the distinct-gram
    * count, how many of its grams appear anywhere in `benchmark`, and
    * the contamination flag. `documents` carries (`idCol`, `textCol`);
    * `benchmark` carries `benchTextCol`.
    *
    * 100 TB shape: the corpus side never shuffles its grams — they are
    * filtered against the broadcast benchmark set in the scan stage,
    * and only the surviving hit pairs (rare by construction) reach the
    * distinct-count aggregation. */
  def flagContaminated(documents: DataFrame, idCol: String, textCol: String,
                       benchmark: DataFrame, benchTextCol: String,
                       n: Int = 8): DataFrame = {
    val tok = documents.select(col(idCol), tokens(col(textCol)).as("tk"))
    val benchGrams = gramRows(
      benchmark.select(tokens(col(benchTextCol)).as("tk")), n, Seq.empty)
      .distinct()
    // Duplicate grams within one doc survive the explode; they are
    // deduped AFTER the broadcast filter (hit rows only) by the
    // distinct count, so the full corpus gram stream is never shuffled.
    val hits = gramRows(tok, n, Seq(col(idCol)))
      .join(broadcast(benchGrams), "gram")
      .groupBy(idCol).agg(countDistinct("gram").as("hits"))
    val nGrams = tok.select(col(idCol),
      size(array_distinct(gramHashes(col("tk"), n))).as("n_grams"))
    nGrams.join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_grams"),
        coalesce(col("hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("hits"), lit(0L)) > 0, 1).otherwise(0)
          .as("contaminated"))
  }

  def queries: Map[String, QFn] = Map(
    // Fixture: the "benchmark set" is the deterministic slice
    // doc_id % 17 = 3 of the corpus itself, so contamination exists by
    // construction (every benchmark doc flags itself) and the oracle
    // stays exact. In production the benchmark frame is the external
    // eval set.
    "decontam_ngram" -> ((s, d) => {
      val corpus = docs(s, d)
      flagContaminated(corpus, "doc_id", "text",
        corpus.filter(col("doc_id") % 17 === 3), "text")
    })
  )

  def oracles: Map[String, String] = {
    // tk[i] .. tk[i+7] concatenated with spaces — the DuckDB twin of
    // gramHashes at n=8 (1-based list indexing on both sides).
    val gramExpr = (0 until 8).map {
      case 0 => "tk[CAST(i AS INTEGER)]"
      case j => s"tk[CAST(i AS INTEGER) + $j]"
    }.mkString(" || ' ' || ")
    Map(
      "decontam_ngram" -> s"""
        WITH tok AS (
          SELECT doc_id, list_filter(string_split_regex(
            regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\\s+'),
            x -> x <> '') AS tk
          FROM documents),
        g AS (
          SELECT doc_id,
            CASE WHEN len(tk) < 8 THEN []
                 ELSE list_distinct(list_transform(range(1, len(tk) - 6),
                   i -> substr(md5($gramExpr), 1, 16))) END AS g
          FROM tok),
        bg AS (
          SELECT DISTINCT unnest(g) AS gram FROM g WHERE doc_id % 17 = 3),
        ex AS (SELECT doc_id, unnest(g) AS gram FROM g),
        hits AS (
          SELECT ex.doc_id, COUNT(*) AS hits
          FROM ex JOIN bg USING (gram) GROUP BY 1)
        SELECT g.doc_id, CAST(len(g.g) AS INTEGER) AS n_grams,
               CAST(coalesce(h.hits, 0) AS BIGINT) AS n_hits,
               CASE WHEN coalesce(h.hits, 0) > 0 THEN 1 ELSE 0 END
                 AS contaminated
        FROM g LEFT JOIN hits h ON h.doc_id = g.doc_id"""
    )
  }
}
