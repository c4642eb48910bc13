package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicInteger
import graft.sources.HttpEnrichment
import graft.sources.HttpEnrichment.HttpConfig

/** The live HTTP dim-builder seam against an in-process stub server:
  * retry/backoff on 429, error flagging (never task failure) on
  * persistent 5xx and malformed JSON, batch fan-out bounds, and the
  * reference's NPPES field mapping (api_clients.py:80-139). */
class HttpEnrichmentSpec extends SparkSpec {

  /** NPPES-shaped payload for a stub id. */
  private def npiJson(npi: String): String =
    s"""{"result_count":1,"results":[{
       |  "enumeration_type":"NPI-2",
       |  "basic":{"organization_name":"ORG $npi","status":"A"},
       |  "addresses":[
       |    {"address_purpose":"MAILING","address_1":"PO BOX $npi",
       |     "city":"NOWHERE","state":"ZZ","postal_code":"00000"},
       |    {"address_purpose":"LOCATION","address_1":"$npi MAIN ST",
       |     "city":"ATLANTA","state":"GA","postal_code":"30301",
       |     "telephone_number":"555-$npi"}],
       |  "taxonomies":[
       |    {"code":"999X","desc":"SECONDARY","primary":false},
       |    {"code":"207Q00000X","desc":"FAMILY MEDICINE","primary":true}]
       |}]}""".stripMargin

  /** Stub registry server: per-id scripted behavior.
    *  - ids ending in 7: first `rateLimit429s` hits answer 429;
    *  - id "666": always 500;
    *  - id "42":  malformed JSON body;
    *  - id "0":   result_count 0;
    *  - others:   the NPPES payload. */
  private def withStubServer[T](rateLimit429s: Int)(
      f: (String, ConcurrentHashMap[String, AtomicInteger]) => T): T = {
    val hits = new ConcurrentHashMap[String, AtomicInteger]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api", { exchange =>
      val q = Option(exchange.getRequestURI.getQuery).getOrElse("")
      val npi = q.split("&").collectFirst {
        case kv if kv.startsWith("number=") => kv.drop("number=".length)
      }.getOrElse("")
      val n = hits.computeIfAbsent(npi, _ => new AtomicInteger(0))
        .incrementAndGet()
      val (code, body) =
        if (npi.endsWith("7") && n <= rateLimit429s) (429, "slow down")
        else if (npi == "666") (500, "boom")
        else if (npi == "42") (200, "{not json")
        else if (npi == "0") (200, """{"result_count":0,"results":[]}""")
        else (200, npiJson(npi))
      val bytes = body.getBytes("UTF-8")
      exchange.sendResponseHeaders(code, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/api", hits)
    finally server.stop(0)
  }

  private val cfg = HttpConfig(maxWorkers = 4, batchSize = 8,
    retryAttempts = 2, rateLimitDelayMs = 10L, interBatchDelayMs = 5L,
    timeoutMs = 5000L, fetchPartitions = 2)

  test("dim build: parse parity, 429 backoff succeeds, errors flagged") {
    withStubServer(rateLimit429s = 1) { (base, hits) =>
      import spark.implicits._
      val ids = Seq("1003000126", "1396745167", "666", "42", "0") ++
        (1 to 20).map(i => s"19$i")
      val dim = HttpEnrichment.dimNpiFetch(spark,
        ids.toDF("npi"), "npi", base, cfg).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(dim.size == ids.distinct.size)

      // full NPPES parse on a healthy id: LOCATION address preferred
      // over MAILING, primary taxonomy picked out of two
      val ok = dim("1003000126")
      assert(ok.getString(1) == "NPI-2")
      assert(ok.getString(2) == "ORG 1003000126")
      assert(ok.getString(4) == "207Q00000X")
      assert(ok.getString(5) == "FAMILY MEDICINE")
      assert(ok.getString(6) == "1003000126 MAIN ST", "MAILING won")
      assert(ok.getString(7) == "ATLANTA" && ok.getString(8) == "GA")
      assert(ok.isNullAt(11), s"healthy id flagged: ${ok.getString(11)}")

      // 429 on first hit, success on the backoff retry — and the
      // server really was hit twice
      val limited = dim("1396745167")
      assert(limited.isNullAt(11) && limited.getString(2) != null,
        "429'd id did not recover via backoff")
      assert(hits.get("1396745167").get() == 2)

      // persistent 500: flagged fetch_failed after exactly
      // retryAttempts tries, row present, no exception
      assert(dim("666").getString(11) == "fetch_failed")
      assert(hits.get("666").get() == cfg.retryAttempts)

      // malformed JSON: transport succeeded once, parse flags it
      assert(dim("42").getString(11) == "fetch_failed")

      // zero results: its own class, all enrichment columns null
      assert(dim("0").getString(11) == "no_results")
      assert(dim("0").isNullAt(1) && dim("0").isNullAt(6))

      // every healthy id fetched exactly once (no over-fetch from the
      // batch fan-out), 429 ids exactly twice
      (1 to 20).map(i => s"19$i").foreach { id =>
        val expected = if (id.endsWith("7")) 2 else 1
        assert(hits.get(id).get() == expected,
          s"$id fetched ${hits.get(id).get()} times, want $expected")
      }
    }
  }

  test("exhausted 429 budget flags instead of failing the task") {
    // server never stops 429ing the *7 ids; the fetch must complete
    // with flagged rows, not a thrown stage failure
    withStubServer(rateLimit429s = Int.MaxValue) { (base, hits) =>
      import spark.implicits._
      val dim = HttpEnrichment.dimNpiFetch(spark,
        Seq("17", "18").toDF("npi"), "npi", base, cfg).collect()
        .map(r => r.getString(0) -> r).toMap
      assert(dim("17").getString(11) == "fetch_failed")
      assert(hits.get("17").get() == cfg.retryAttempts)
      assert(dim("18").isNullAt(11))
    }
  }

  test("distinct keys only: duplicate inputs collapse before the fetch") {
    withStubServer(rateLimit429s = 0) { (base, hits) =>
      import spark.implicits._
      val dim = HttpEnrichment.dimNpiFetch(spark,
        Seq("21", "21", "21", "22").toDF("npi"), "npi", base, cfg)
      assert(dim.count() == 2)
      assert(hits.get("21").get() == 1, "duplicate keys re-fetched")
    }
  }
}
