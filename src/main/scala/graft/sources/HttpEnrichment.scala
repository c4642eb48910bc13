package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The live HTTP enrichment seam (S8–S10): a rate-limited, retrying,
  * batched fetch stage expressed as `mapPartitions` over the distinct
  * key set — the dim-BUILD path that stands between the raw registry
  * APIs and the broadcastable dims the join inventory consumes
  * ([[graft.etl.EnrichmentDims]]). Semantics mirror the reference's
  * client (src/utils/api_clients.py:16-206 + config/settings.py:50-57):
  *
  *  - batches of `batchSize` (100) ids, fanned across `maxWorkers`
  *    (10) threads per batch, a `interBatchDelayMs` (500) pause
  *    between batches;
  *  - per request `retryAttempts` (2) tries with linear backoff
  *    `rateLimitDelayMs * (attempt+1)` on HTTP 429 AND on transport /
  *    non-2xx / malformed-JSON errors;
  *  - a key that exhausts its retries yields an ERROR-FLAGGED row
  *    (`error = "fetch_failed"`), never a task failure — at scale one
  *    flaky key must not kill (and re-run) a whole fetch partition;
  *  - zero results is data, not an error class of its own upstream:
  *    `error = "no_results"`, every enrichment column null.
  *
  * 100 TB shape: the input is the DISTINCT key set (the fact table
  * never fans out to HTTP), coalesced to `fetchPartitions` bounded
  * partitions — the API, not Spark, is the bottleneck, and total
  * concurrency is `fetchPartitions * maxWorkers`, which is what the
  * operator actually rate-limits. The output is a dim to persist and
  * broadcast; the deterministic fixture path
  * ([[graft.etl.EnrichmentDims.dimNpi]]) remains the oracle-checked
  * twin of the join inventory, exactly as the reference's tests stub
  * `requests`.
  *
  * The seam is generic: [[fetchJson]] is the transport+policy core
  * (HttpEnrichmentSpec pins retry/backoff/batch/flag semantics against
  * an in-process stub server); [[dimNpiFetch]] layers the NPPES
  * parse (api_clients.py:80-139 — LOCATION-preferred address, primary
  * taxonomy, basic org fields). A Census-geocoder or HUD-crosswalk
  * build is the same core with its own `urlOf` + parse.
  */
object HttpEnrichment {

  /** Client policy knobs; defaults are the reference's
    * (config/settings.py:50-57). */
  case class HttpConfig(maxWorkers: Int = 10,
                        batchSize: Int = 100,
                        retryAttempts: Int = 2,
                        rateLimitDelayMs: Long = 1000L,
                        interBatchDelayMs: Long = 500L,
                        timeoutMs: Long = 10000L,
                        fetchPartitions: Int = 1)

  /** One fetched key: the raw body on success, else the error class. */
  case class Fetched(key: String, body: Option[String],
                     error: Option[String])

  /** The parsed NPPES record — field-for-field the reference's
    * parse_npi_response dict (api_clients.py:82-97). */
  case class NpiRecord(npi: String,
                       enumeration_type: Option[String],
                       org_name: Option[String],
                       status: Option[String],
                       primary_taxonomy_code: Option[String],
                       primary_taxonomy_desc: Option[String],
                       address_1: Option[String],
                       city: Option[String],
                       state: Option[String],
                       postal_code: Option[String],
                       telephone_number: Option[String],
                       error: Option[String])

  /** Fetch `urlOf(key)` for every key: batched, threaded, retried,
    * 429-aware. One `HttpClient` per partition (it is immutable and
    * pooled); one short-lived executor per batch, so the lazily-pulled
    * partition iterator never strands a live pool. */
  def fetchJson(keys: Dataset[String], urlOf: String => String,
                cfg: HttpConfig = HttpConfig()): Dataset[Fetched] = {
    import keys.sparkSession.implicits._
    keys.distinct()
      .repartition(cfg.fetchPartitions)
      .mapPartitions { it =>
        // <- per-partition client init (the codec-seam convention)
        val client = java.net.http.HttpClient.newBuilder()
          .connectTimeout(java.time.Duration.ofMillis(cfg.timeoutMs))
          .build()
        var firstBatch = true
        it.grouped(cfg.batchSize).flatMap { batch =>
          // "small delay between batches to be respectful to the API"
          // (api_clients.py:196-198)
          if (!firstBatch && cfg.interBatchDelayMs > 0)
            Thread.sleep(cfg.interBatchDelayMs)
          firstBatch = false
          val pool = java.util.concurrent.Executors
            .newFixedThreadPool(math.max(1, cfg.maxWorkers))
          try {
            val futures = batch.map { k =>
              pool.submit(new java.util.concurrent.Callable[Fetched] {
                def call(): Fetched = fetchOne(client, k, urlOf(k), cfg)
              })
            }
            futures.map(_.get()).toVector
          } finally pool.shutdown()
        }
      }
  }

  /** One key through the retry/backoff policy. 429 and every error
    * class share the linear backoff `rateLimitDelayMs * (attempt+1)`;
    * the LAST attempt's failure returns the flagged row. */
  private def fetchOne(client: java.net.http.HttpClient, key: String,
                       url: String, cfg: HttpConfig): Fetched = {
    var attempt = 0
    while (attempt < cfg.retryAttempts) {
      val backoffMs = cfg.rateLimitDelayMs * (attempt + 1)
      try {
        val req = java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(url))
          .timeout(java.time.Duration.ofMillis(cfg.timeoutMs))
          .GET().build()
        val resp = client.send(req,
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 429) {
          Thread.sleep(backoffMs) // rate-limited: back off and retry
        } else if (resp.statusCode() / 100 != 2) {
          // raise_for_status analogue: non-2xx is a retryable error
          if (attempt < cfg.retryAttempts - 1) Thread.sleep(backoffMs)
          else return Fetched(key, None, Some("fetch_failed"))
        } else {
          return Fetched(key, Some(resp.body()), None)
        }
      } catch {
        case _: InterruptedException =>
          Thread.currentThread().interrupt()
          return Fetched(key, None, Some("fetch_failed"))
        case scala.util.control.NonFatal(_) =>
          if (attempt < cfg.retryAttempts - 1) Thread.sleep(backoffMs)
          else return Fetched(key, None, Some("fetch_failed"))
      }
      attempt += 1
    }
    Fetched(key, None, Some("fetch_failed"))
  }

  /** Build the NPPES dim LIVE: fetch `?number=<npi>&version=2.1` per
    * distinct NPI against `baseUrl` and parse each payload with the
    * reference's field mapping. The result has the same shape as the
    * fixture dim build and is meant to be persisted then broadcast. */
  def dimNpiFetch(spark: SparkSession, npis: DataFrame, npiCol: String,
                  baseUrl: String,
                  cfg: HttpConfig = HttpConfig()): DataFrame = {
    import spark.implicits._
    val keys = npis.select(col(npiCol).cast("string")).as[String]
      .filter((s: String) => s != null)
    fetchJson(keys, npi => s"$baseUrl?number=$npi&version=2.1", cfg)
      .map(f => parseNpiBody(f.key, f.body, f.error))
      .toDF()
  }

  /** The NPPES payload parse (api_clients.py:80-139): basic org
    * fields, the LOCATION-purpose address (fallback: first address),
    * the primary taxonomy; `result_count == 0` → `no_results`;
    * malformed JSON → `fetch_failed` (the reference's JSONDecodeError
    * lands in the same retry/fail path). */
  private[sources] def parseNpiBody(npi: String, body: Option[String],
                                    error: Option[String]): NpiRecord = {
    val empty = NpiRecord(npi, None, None, None, None, None,
      None, None, None, None, None, error)
    if (error.isDefined || body.isEmpty) return empty
    val root =
      try new com.fasterxml.jackson.databind.ObjectMapper()
        .readTree(body.get)
      catch { case scala.util.control.NonFatal(_) =>
        return empty.copy(error = Some("fetch_failed")) }
    if (root.path("result_count").asInt(0) == 0)
      return empty.copy(error = Some("no_results"))
    val data = root.path("results").path(0)
    def str(n: com.fasterxml.jackson.databind.JsonNode,
            f: String): Option[String] = {
      val v = n.path(f)
      if (v.isMissingNode || v.isNull) None else Some(v.asText())
    }
    val basic = data.path("basic")
    // address: prefer LOCATION purpose, else the first one
    val addrs = data.path("addresses")
    val addr =
      if (!addrs.isArray || addrs.size() == 0) addrs.path(-1) // missing
      else {
        var loc: com.fasterxml.jackson.databind.JsonNode = null
        var i = 0
        while (i < addrs.size() && loc == null) {
          if (addrs.get(i).path("address_purpose").asText("")
              .equalsIgnoreCase("LOCATION")) loc = addrs.get(i)
          i += 1
        }
        if (loc != null) loc else addrs.get(0)
      }
    // taxonomy: the primary-flagged entry, if any
    val taxs = data.path("taxonomies")
    var primaryTax: Option[com.fasterxml.jackson.databind.JsonNode] = None
    if (taxs.isArray) {
      var i = 0
      while (i < taxs.size() && primaryTax.isEmpty) {
        if (taxs.get(i).path("primary").asBoolean(false))
          primaryTax = Some(taxs.get(i))
        i += 1
      }
    }
    NpiRecord(npi,
      str(data, "enumeration_type"),
      str(basic, "organization_name"),
      str(basic, "status"),
      primaryTax.flatMap(str(_, "code")),
      primaryTax.flatMap(str(_, "desc")),
      str(addr, "address_1"),
      str(addr, "city"),
      str(addr, "state"),
      str(addr, "postal_code"),
      str(addr, "telephone_number"),
      None)
  }
}
