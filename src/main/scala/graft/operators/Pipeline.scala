package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryPack

/** The end-to-end corpus-curation pipeline: the composition every
  * pretraining data run executes, chained from the generic kernels the
  * other operator packs expose —
  *
  *   quality gate → exact dedup → PII scrub → benchmark
  *   decontamination → deterministic stratified sampling → sequence
  *   packing
  *
  * ([[Curation]] rules, [[Curation.scrubPii]],
  * [[Decontaminate.flagContaminated]], [[Curation.hashUniform]],
  * [[Packing.packPrepared]]). Near-dup clustering
  * ([[Dedup.lshCandidatePairs]] → [[Curation.clusterAndCanonicalize]])
  * slots between dedup and scrub at corpus scale; it is kept out of
  * the hash-checked fixture because LSH banding is not SQL-stable.
  *
  * Every stage is deterministic (content-hash sampling, not `rand()`),
  * so the whole pipeline — six stages deep — hash-matches a single
  * composed DuckDB oracle. That is the point of the query: the stages
  * don't just work in isolation, their composition is reproducible
  * bit-for-bit across engines, which is what dataset versioning needs.
  *
  * Scale design: stages 1-3 are scan-side projections (no shuffle);
  * dedup shuffles 16-byte digests; decontamination broadcasts the
  * benchmark gram set so the corpus never shuffles; packing windows
  * are bounded per (source, pack_group). The only corpus-sized
  * shuffles are the dedup digest aggregation and the packing
  * repartition.
  */
object Pipeline extends QueryPack {

  /** Corpus-generic pipeline. `docs` carries (`idCol`, `textCol`,
    * `sourceCol`); `benchmark` carries `benchTextCol` (the eval set,
    * raw text). `sampleRate` is any per-row expression over the doc
    * columns. Output: one row per surviving document with its PII
    * counts, token count, and packed-sequence coordinates — slim on
    * purpose (ids + numbers shuffle through packing, never text); a
    * shard writer joins the payloads back on `idCol`.
    */
  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, benchmark: DataFrame,
                   benchTextCol: String, minWords: Int, maxWords: Int,
                   sampleRate: Column, budget: Int,
                   groupDocs: Int): DataFrame = {
    val t = col(textCol)
    val wordCnt = size(split(trim(t), "\\s+"))
    // 1. quality gate (Gopher-rule family, thresholds caller-tuned)
    val q = docs.filter(length(t) > 0 &&
      wordCnt.between(minWords, maxWords) &&
      (length(regexp_replace(t, "\\s", "")).cast("double") / wordCnt)
        .between(3.0, 10.0) &&
      (regexp_count(t, lit("#|\\.\\.\\.")).cast("double") / wordCnt) < 0.1)
    // 2. exact dedup: keep the lowest id per content hash (the shuffle
    //    carries digests, never text)
    val hashed = q.withColumn("hh", md5(t))
    val keep = hashed.groupBy("hh").agg(min(col(idCol)).as(idCol))
    val dq = hashed.join(keep, Seq("hh", idCol)).drop("hh")
    // 3. PII scrub (counts + redaction, scan-side)
    val sc = Curation.scrubPii(dq, textCol)
    // 4. benchmark decontamination on the scrubbed text: drop any doc
    //    sharing an 8-gram with the eval set (gram set broadcast)
    val clean = sc.join(
      Decontaminate.flagContaminated(sc, idCol, textCol,
          benchmark, benchTextCol)
        .filter(col("contaminated") === 0).select(idCol),
      Seq(idCol), "left_semi")
    // 5. deterministic stratified sampling (content-hash uniform)
    val sampled = Curation.sampleStratified(clean, sampleRate, col(idCol))
    // 6. sequence packing per (source, pack_group)
    val prepared = sampled.select(col(idCol), col(sourceCol),
      col("n_email"), col("n_phone"), col("n_ip"),
      (col(idCol) / groupDocs).cast("long").as("pack_group"),
      size(split(trim(t), "\\s+")).cast("long").as("n_tokens"))
    Packing.packPrepared(prepared, Seq(sourceCol, "pack_group"),
        idCol, "n_tokens", budget)
      .select(col(idCol), col(sourceCol), col("n_email"), col("n_phone"),
        col("n_ip"), col("n_tokens"), col("token_start"), col("seq_idx"),
        col("seq_uid"))
  }

  /** Oracle fixture: documents + the [[Dedup]] duplicate injection
    * (exact copies of 0-9, suffixed near-copies of 10-19 at
    * id+100000) with the [[Curation]] PII footer on every 7th base doc
    * — applied BEFORE augmentation so exact copies stay exact. */
  private def fixtureCorpus(s: SparkSession, d: String): DataFrame = {
    val base = Tables.load(s, d, "documents")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(Curation.PiiFooter)))
          .otherwise(col("text")).as("text"))
    base.unionByName(base.filter(col("doc_id") < 20).select(
      (col("doc_id") + 100000).as("doc_id"), col("source"),
      when(col("doc_id") < 10, col("text"))
        .otherwise(concat(col("text"), lit(" extra suffix tokens")))
        .as("text")))
  }

  def queries: Map[String, QFn] = Map(
    // The full pipeline, hash-matched end to end. Benchmark = the raw
    // corpus slice doc_id % 17 = 3 (an external eval set stand-in,
    // same trick as decontam_ngram); per-source sample rates as in
    // sample_hash_stratified; packing at the Packing fixture budget.
    "corpus_curate_e2e" -> ((s, d) => {
      val corpus = fixtureCorpus(s, d)
      curateCorpus(corpus, "doc_id", "text", "source",
        benchmark = corpus.filter(col("doc_id") % 17 === 3),
        benchTextCol = "text",
        minWords = 30, maxWords = 100000,
        sampleRate = (substring(col("source"), 4, Int.MaxValue).cast("int")
          % 4 + 1).cast("double") * 0.2,
        budget = Packing.Budget, groupDocs = Packing.GroupDocs)
    })
  )

  def oracles: Map[String, String] = {
    val tokExpr = """list_filter(string_split_regex(
      regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), '\s+'),
      x -> x <> '')"""
    val gramExpr = (0 until 8).map {
      case 0 => "tk[CAST(i AS INTEGER)]"
      case j => s"tk[CAST(i AS INTEGER) + $j]"
    }.mkString(" || ' ' || ")
    val wc = "len(string_split_regex(trim(text), '\\s+'))"
    val B = Packing.Budget
    val G = Packing.GroupDocs
    Map(
      "corpus_curate_e2e" -> s"""
        WITH base AS (
          SELECT doc_id, source,
                 CASE WHEN doc_id % 7 = 0 THEN text || '${Curation.PiiFooter}'
                      ELSE text END AS text
          FROM documents),
        corpus AS (
          SELECT doc_id, source, text FROM base
          UNION ALL
          SELECT doc_id + 100000 AS doc_id, source,
                 CASE WHEN doc_id < 10 THEN text
                      ELSE text || ' extra suffix tokens' END AS text
          FROM base WHERE doc_id < 20),
        q AS (
          SELECT * FROM corpus
          WHERE length(text) > 0
            AND $wc BETWEEN 30 AND 100000
            AND (length(regexp_replace(text, '\\s', '', 'g')) * 1.0 / $wc)
                BETWEEN 3.0 AND 10.0
            AND (len(regexp_extract_all(text, '#|\\.\\.\\.')) * 1.0 / $wc)
                < 0.1),
        k AS (SELECT md5(text) AS hh, min(doc_id) AS doc_id
              FROM q GROUP BY 1),
        dq AS (SELECT q.* FROM q
               JOIN k ON md5(q.text) = k.hh AND q.doc_id = k.doc_id),
        sc AS (
          SELECT doc_id, source,
            CAST(len(regexp_extract_all(text, '${Curation.EmailRe}'))
                 AS INTEGER) AS n_email,
            CAST(len(regexp_extract_all(text, '${Curation.PhoneRe}'))
                 AS INTEGER) AS n_phone,
            CAST(len(regexp_extract_all(text, '${Curation.IpRe}'))
                 AS INTEGER) AS n_ip,
            regexp_replace(regexp_replace(regexp_replace(text,
              '${Curation.EmailRe}', '<EMAIL>', 'g'),
              '${Curation.PhoneRe}', '<PHONE>', 'g'),
              '${Curation.IpRe}', '<IP>', 'g') AS text
          FROM dq),
        ctok AS (SELECT doc_id, source, n_email, n_phone, n_ip, text,
                        $tokExpr AS tk FROM sc),
        cg AS (SELECT doc_id, CASE WHEN len(tk) < 8 THEN []
                 ELSE list_distinct(list_transform(range(1, len(tk) - 6),
                   i -> substr(md5($gramExpr), 1, 16))) END AS g
               FROM ctok),
        btok AS (SELECT $tokExpr AS tk FROM corpus WHERE doc_id % 17 = 3),
        bg AS (SELECT DISTINCT gram FROM (
                 SELECT unnest(CASE WHEN len(tk) < 8 THEN []
                   ELSE list_transform(range(1, len(tk) - 6),
                     i -> substr(md5($gramExpr), 1, 16)) END) AS gram
                 FROM btok)),
        hits AS (SELECT DISTINCT ex.doc_id
                 FROM (SELECT doc_id, unnest(g) AS gram FROM cg) ex
                 JOIN bg USING (gram)),
        cl AS (SELECT t.* FROM ctok t
               LEFT JOIN hits h ON h.doc_id = t.doc_id
               WHERE h.doc_id IS NULL),
        sm AS (SELECT * FROM cl
               WHERE CAST(('0x' || substr(md5('sample:' ||
                       CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                     / 4294967296.0
                   < (CAST(substr(source, 4) AS INTEGER) % 4 + 1)
                     * CAST(0.2 AS DOUBLE)),
        prep AS (SELECT doc_id, source, n_email, n_phone, n_ip,
                   CAST(doc_id // $G AS BIGINT) AS pack_group,
                   CAST($wc AS BIGINT) AS n_tokens
                 FROM sm),
        packed AS (SELECT *, CAST(coalesce(SUM(n_tokens) OVER (
                     PARTITION BY source, pack_group ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS token_start
                   FROM prep)
        SELECT doc_id, source, n_email, n_phone, n_ip, n_tokens,
               token_start,
               CAST(floor(token_start / $B) AS BIGINT) AS seq_idx,
               md5(source || '|' || CAST(pack_group AS VARCHAR) || '|' ||
                   CAST(CAST(floor(token_start / $B) AS BIGINT) AS VARCHAR))
                 AS seq_uid
        FROM packed"""
    )
  }
}
