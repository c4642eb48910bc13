package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.queries.QueryPack

/** Fuzzy record linkage (entity resolution): match dirty records to a
  * canonical master catalog by name similarity. The reference pipeline
  * joins provider rows to the NPPES dimension on exact keys
  * (/root/reference/src/dimensions/dim_npi.py); real feeds also carry
  * free-text org names with typos that exact joins silently drop — the
  * classic record-linkage problem. This pack adds the standard
  * blocking + edit-distance scheme as a first-class operator.
  *
  * Shape (Fellegi–Sunter style, token blocking):
  *  1. BLOCK — explode each side's normalized name into word tokens;
  *     records sharing ANY token become candidates. A single
  *     character-level typo corrupts one token, so multi-token names
  *     still block on their intact tokens (robust where prefix
  *     blocking is not: a first-character typo escapes every prefix
  *     block).
  *  2. CAP — drop tokens whose master-side block exceeds `maxBlock`
  *     (stopword-like tokens: candidate growth is |master block| ×
  *     |dirty block|, quadratic at corpus scale — same reasoning as
  *     the dedup family's hot-bucket cap). Dropped-token counts are
  *     surfaced via `observe` (no silent caps).
  *  3. SCORE — banded Levenshtein on the candidate pairs only, with a
  *     length pre-filter (|len(a)−len(b)| > maxDist can never pass;
  *     skips the O(len²) DP on obviously-far pairs) and the threshold
  *     form `levenshtein(a, b, maxDist)` (O(maxDist·len) banded DP,
  *     returns −1 past the band — never pays full DP on far pairs).
  *  4. RESOLVE — best match per dirty record by (distance, master_id):
  *     deterministic under master-name collisions, which the part
  *     fixture has by construction (small vocabulary).
  *
  * Scale design: the master token table is dim-sized (a canonical
  *  catalog, e.g. NPPES ~8M rows → low-GB tokenized) — broadcast it
  *  and the whole link is shuffle-free until the final per-dirty-id
  *  resolve, which rides ONE shuffle keyed by dirty_id. When the
  *  master outgrows broadcast (`broadcastMaster = false`) the
  *  candidate join becomes a shuffle on `token`, where the cap is
  *  exactly what bounds the hottest token partitions (skew = hot
  *  token). Levenshtein runs codegen'd inside the join's project —
  *  no UDFs anywhere.
  */
object Linkage extends QueryPack {

  /** Master-side block-size cap: tokens present in more master names
    * are stopwords for blocking purposes (a token shared by 10k
    * catalog entries identifies nothing and costs |10k × dirty block|
    * candidates). The fixture vocabulary is ~tens of words so every
    * block is fat relative to a real catalog; queries pass a generous
    * cap and the degenerate-cap behavior is spec'd separately. */
  val MaxBlock = 1 << 20

  /** Normalized name: lowercase, trimmed, single-spaced. */
  private def normName(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Word-token rows (id, name, token), deduped per id — a token
    * repeated inside one name must not double-candidate the pair. */
  private def tokenRows(df: DataFrame, idCol: String,
                        nameCol: String): DataFrame =
    df.select(col(idCol), col(nameCol),
        explode(split(col(nameCol), " ")).as("token"))
      .filter(length(col("token")) > 0)
      .dropDuplicates(idCol, "token")

  /** Generic fuzzy link: `master` must expose (master_id, master_name),
    * `dirty` (dirty_id, dirty_name), names pre-normalized by the
    * caller (or via [[normName]]). Returns one row per LINKED dirty
    * record: (dirty_id, dirty_name, master_id, master_name, distance)
    * with the deterministic (distance, master_id) argmin. Dirty
    * records with no candidate within `maxDist` are absent (the
    * unlinked residue is `dirty` anti-join the result — a cheap
    * follow-up the caller owns).
    *
    * `observeName`: when set, the returned frame reports
    * `dropped_tokens` / `dropped_block_rows` for the hot-token cap
    * via a named `observe` — the no-silent-caps contract shared with
    * [[Dedup]]'s bucket cap.
    */
  def fuzzyLink(master: DataFrame, dirty: DataFrame, maxDist: Int = 2,
                maxBlock: Int = MaxBlock, broadcastMaster: Boolean = true,
                observeName: Option[String] = None): DataFrame = {
    val mTok = tokenRows(master, "master_id", "master_name")
    // Cap on the MASTER side only: block cost is master_n × dirty_n,
    // and master_n is the stable, catalog-derived factor (dirty-side
    // frequency varies per batch). Counting rows of the deduped token
    // frame = distinct masters per token.
    val blockCounts = mTok.groupBy("token")
      .agg(count(lit(1)).as("block_n"))
    val observed = observeName.fold(blockCounts) { n =>
      blockCounts.observe(n,
        sum(when(col("block_n") > maxBlock, lit(1L)).otherwise(lit(0L)))
          .as("dropped_tokens"),
        coalesce(sum(when(col("block_n") > maxBlock, col("block_n"))),
          lit(0L)).as("dropped_block_rows"))
    }
    val keepTokens = observed.filter(col("block_n") <= maxBlock)
      .select("token")
    val mKept = mTok.join(keepTokens, "token")
    val mSide = if (broadcastMaster) broadcast(mKept) else mKept
    val dTok = tokenRows(dirty, "dirty_id", "dirty_name")
    // NO candidate dedup (r16): the final (distance, master_id,
    // master_name) min-aggregate is duplicate-insensitive, so a pair
    // blocked by k shared tokens simply scores k times IN-TASK (k is
    // bounded by tokens-per-name, a small constant) instead of riding
    // a corpus-wide (dirty_id, master_id) dedup exchange that shuffled
    // every candidate pair with both name payloads. The length
    // pre-filter and the banded levenshtein now run inside the
    // broadcast-join's map stage, so the only shuffle left in the
    // whole link is the final argmin's one-row-per-dirty-id-per-task
    // partial-agg exchange.
    val scored = dTok.join(mSide, "token")
      .filter(abs(length(col("dirty_name")) - length(col("master_name")))
        <= maxDist)
      .withColumn("distance",
        levenshtein(col("dirty_name"), col("master_name"), maxDist))
      .filter(col("distance") >= 0 && col("distance") <= maxDist)
    // argmin as a map-side-combinable aggregate (r16): the old
    // row_number window shuffled the scored candidates and SORTED each
    // dirty_id partition for a rank-1 pick; min(struct) collapses to
    // one row per dirty record before the exchange. Ordering identical
    // to the window's (distance, master_id); master_name rides the
    // struct tail and can never flip the min (master_id determines it).
    scored.groupBy("dirty_id", "dirty_name")
      .agg(min(struct(col("distance"), col("master_id"),
        col("master_name"))).as("m"))
      .select(col("dirty_id"), col("dirty_name"),
        col("m.master_id").as("master_id"),
        col("m.master_name").as("master_name"),
        col("m.distance").as("distance"))
  }

  // ------------------------------------------------------- fixture

  /** Master catalog: part names normalized. The small generator
    * vocabulary means many parts SHARE a name — realistic (catalogs
    * carry duplicate display names) and exactly what makes the
    * (distance, master_id) tie-break load-bearing. */
  private def masterParts(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "part").select(
      col("p_partkey").as("master_id"),
      normName(col("p_name")).as("master_name"))

  /** Dirty fixture: deterministic single-typo variants of parts
    * 0..399 — a character DELETE at position 2 (+100000, distance 1)
    * and a TRANSPOSITION of characters 2–3 (+200000, distance ≤ 2 —
    * two substitutions under plain Levenshtein). Both corrupt the
    * FIRST token only, so blocking must recover the pair through the
    * intact second token — the property prefix blocking lacks. */
  private def dirtyVariants(s: SparkSession, d: String): DataFrame = {
    val base = masterParts(s, d).filter(col("master_id") < 400)
    val nm = col("master_name")
    val deleted = base.select(
      (col("master_id") + 100000).as("dirty_id"),
      concat(substring(nm, 1, 1), substring(nm, 3, 1000000))
        .as("dirty_name"))
    val transposed = base.select(
      (col("master_id") + 200000).as("dirty_id"),
      concat(substring(nm, 1, 1), substring(nm, 3, 1),
        substring(nm, 2, 1), substring(nm, 4, 1000000)).as("dirty_name"))
    deleted.unionByName(transposed)
  }

  private val masterSql = """
    SELECT p_partkey AS master_id,
           regexp_replace(lower(trim(p_name)), '\s+', ' ', 'g') AS master_name
    FROM part"""

  private val dirtySql = """
    SELECT master_id + 100000 AS dirty_id,
           substr(master_name, 1, 1) || substr(master_name, 3) AS dirty_name
    FROM master WHERE master_id < 400
    UNION ALL
    SELECT master_id + 200000 AS dirty_id,
           substr(master_name, 1, 1) || substr(master_name, 3, 1) ||
           substr(master_name, 2, 1) || substr(master_name, 4) AS dirty_name
    FROM master WHERE master_id < 400"""

  def queries: Map[String, QFn] = Map(
    // Full linkage: every dirty variant resolved to its best master.
    "link_fuzzy_match" -> ((s, d) =>
      fuzzyLink(masterParts(s, d), dirtyVariants(s, d))),

    // Blocking profile: per-token master/dirty block sizes and the
    // candidate-pair cost they induce — the stats a pipeline owner
    // reads to pick maxBlock before an expensive run (the same
    // observability story as the dedup family's capstats).
    "link_blocking_stats" -> ((s, d) => {
      val mTok = tokenRows(masterParts(s, d), "master_id", "master_name")
        .groupBy("token").agg(count(lit(1)).as("master_n"))
      val dTok = tokenRows(dirtyVariants(s, d), "dirty_id", "dirty_name")
        .groupBy("token").agg(count(lit(1)).as("dirty_n"))
      mTok.join(dTok, Seq("token"), "left")
        .select(col("token"), col("master_n"),
          coalesce(col("dirty_n"), lit(0L)).as("dirty_n"),
          (col("master_n") * coalesce(col("dirty_n"), lit(0L)))
            .as("candidate_pairs"))
    })
  )

  def oracles: Map[String, String] = Map(
    "link_fuzzy_match" -> s"""
      WITH master AS ($masterSql),
      dirty AS ($dirtySql),
      mtok AS (
        SELECT DISTINCT master_id, master_name, t.token
        FROM master, unnest(string_split(master_name, ' ')) AS t(token)
        WHERE length(t.token) > 0),
      keep AS (
        SELECT token FROM mtok GROUP BY token
        HAVING count(*) <= ${MaxBlock}),
      dtok AS (
        SELECT DISTINCT dirty_id, dirty_name, t.token
        FROM dirty, unnest(string_split(dirty_name, ' ')) AS t(token)
        WHERE length(t.token) > 0),
      cand AS (
        SELECT DISTINCT dirty_id, dirty_name, master_id, master_name
        FROM dtok JOIN keep USING (token) JOIN mtok USING (token)),
      scored AS (
        SELECT dirty_id, dirty_name, master_id, master_name,
               levenshtein(dirty_name, master_name) AS distance
        FROM cand
        WHERE abs(length(dirty_name) - length(master_name)) <= 2
          AND levenshtein(dirty_name, master_name) <= 2)
      SELECT dirty_id, dirty_name, master_id, master_name, distance
      FROM scored
      QUALIFY row_number() OVER (
        PARTITION BY dirty_id ORDER BY distance, master_id) = 1""",

    "link_blocking_stats" -> s"""
      WITH master AS ($masterSql),
      dirty AS ($dirtySql),
      mtok AS (
        SELECT token, count(*) AS master_n FROM (
          SELECT DISTINCT master_id, t.token
          FROM master, unnest(string_split(master_name, ' ')) AS t(token)
          WHERE length(t.token) > 0) GROUP BY token),
      dtok AS (
        SELECT token, count(*) AS dirty_n FROM (
          SELECT DISTINCT dirty_id, t.token
          FROM dirty, unnest(string_split(dirty_name, ' ')) AS t(token)
          WHERE length(t.token) > 0) GROUP BY token)
      SELECT m.token, m.master_n,
             coalesce(d.dirty_n, 0) AS dirty_n,
             m.master_n * coalesce(d.dirty_n, 0) AS candidate_pairs
      FROM mtok m LEFT JOIN dtok d USING (token)"""
  )
}
