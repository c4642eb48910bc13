package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Analytics, Builders, Inventory, QueryPack, Sources, SqlSurface}
import graft.operators.{Curation, Decontaminate, Dedup, Evaluation, Export, Graph, Layout, Linkage, Multimodal, Packing, Pipeline, Ranking, Retrieval, Similarity, Sketches, TextAnalysis, Training}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY.md §2 via
  * [[graft.queries.Inventory]], plus the LLM-data-pipeline operators in
  * [[graft.operators]]); `oracleSql` holds each query's DuckDB twin
  * where SQL-expressible.
  */
object SparkEntry {

  private val packs: Seq[QueryPack] =
    Seq(Inventory, Analytics, Builders, Sources, SqlSurface, TextAnalysis,
      Dedup, Similarity, Multimodal, Curation, Decontaminate, Packing,
      Pipeline, Export, Linkage, Graph, Sketches, Training, Retrieval,
      Evaluation, Ranking, Layout)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The star fact build is the engine's centerpiece: role
    * mapping, uid minting, broadcast dim join, keyed dedup. */
  def entry(spark: SparkSession): DataFrame =
    Inventory.queries("star_fact_build")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracles).toMap
}
