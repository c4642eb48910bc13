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
    * expression). Docs shorter than n words have no grams. */
  private def gramHashes(tk: Column, n: Int): Column =
    when(size(tk) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(tk) - (n - 1)), i =>
        substring(md5(concat_ws(" ",
          (0 until n).map(j => element_at(tk, i + j)): _*)), 1, 16)))

  /** Corpus-generic entry point: per training doc, the distinct-gram
    * count, how many of its grams appear anywhere in `benchmark`, and
    * the contamination flag. `documents` carries (`idCol`, `textCol`);
    * `benchmark` carries `benchTextCol`. */
  def flagContaminated(documents: DataFrame, idCol: String, textCol: String,
                       benchmark: DataFrame, benchTextCol: String,
                       n: Int = 8): DataFrame = {
    val grams = documents
      .select(col(idCol), tokens(col(textCol)).as("tk"))
      .select(col(idCol), array_distinct(gramHashes(col("tk"), n)).as("g"))
    val benchGrams = benchmark
      .select(tokens(col(benchTextCol)).as("tk"))
      .select(explode(gramHashes(col("tk"), n)).as("gram"))
      .distinct()
    val hits = grams.select(col(idCol), explode(col("g")).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .groupBy(idCol).agg(count(lit(1)).as("hits"))
    grams.select(col(idCol), size(col("g")).as("n_grams"))
      .join(hits, Seq(idCol), "left")
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
