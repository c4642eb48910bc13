package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.serving.RestServer

/** The REST shell over real HTTP: param decoding (incl. the
  * comma-separated multi-select grammar), limit clamps, whitelists,
  * error statuses, and — the part that matters — numeric parity with
  * the same computation done directly through QueryApi. */
class RestServerSpec extends SparkSpec {

  private val mapper = new ObjectMapper()
  private lazy val server = new RestServer(spark, sf0001)
  private lazy val base = s"http://127.0.0.1:${server.start()}"
  private lazy val client = java.net.http.HttpClient.newHttpClient()

  private def get(path: String): (Int, com.fasterxml.jackson.databind.JsonNode) = {
    val resp = client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$base$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), mapper.readTree(resp.body()))
  }

  /** A (state, year_month) slice that actually exists in the fixture. */
  private lazy val (st, ym) = {
    val r = Roles.rates(spark, sf0001)
    val p = Roles.providers(spark, sf0001)
    val row = r.join(p,
        r("provider_reference_id") === p("provider_group_id"))
      .groupBy("state", "year_month").count()
      .orderBy(col("count").desc).head()
    (row.getString(0), row.getString(1))
  }

  // no afterAll hook on the shared-session base: the ephemeral server
  // dies with the forked test JVM, but stop it politely in the last test

  test("health + root respond, unknown paths 404") {
    assert(get("/api/health")._2.get("status").asText() == "healthy")
    assert(get("/")._1 == 200)
    assert(get("/nope")._1 == 404)
    assert(get("/api/rates/summary/extra?state=x&year_month=y")._1 == 404)
  }

  test("rates/summary matches the direct QueryApi computation") {
    val (code, node) = get(s"/api/rates/summary?state=$st&year_month=$ym")
    assert(code == 200, node.toString)
    val s = node.get("summary")
    val want = graft.queries.QueryApi.filteredRates(spark, sf0001,
        graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
      .agg(count(lit(1)), avg("negotiated_rate"),
        countDistinct(col("billing_code")),
        countDistinct(col("payer_slug"))).head()
    assert(s.get("total_rates").asLong() == want.getLong(0))
    assert(math.abs(s.get("avg_rate").asDouble() - want.getDouble(1)) < 0.01)
    assert(s.get("unique_procedures").asLong() == want.getLong(2))
    assert(s.get("unique_payers").asLong() == want.getLong(3))
    assert(node.get("state").asText() == st)
    // optional single-value filter narrows the count
    val (c2, n2) = get(
      s"/api/rates/summary?state=$st&year_month=$ym&billing_class=professional")
    assert(c2 == 200)
    assert(n2.get("summary").get("total_rates").asLong() <=
      s.get("total_rates").asLong())
  }

  test("missing required params answer 422; bad limit answers 422") {
    assert(get("/api/rates/summary?state=GA")._1 == 422)
    assert(get(s"/api/rates/by-payer?state=$st")._1 == 422)
    assert(get(
      s"/api/rates/by-payer?state=$st&year_month=$ym&limit=abc")._1 == 422)
  }

  test("by-payer honors the limit clamp and ranks by count") {
    val (_, n1) = get(
      s"/api/rates/by-payer?state=$st&year_month=$ym&limit=2")
    assert(n1.get("count").asInt() <= 2)
    val counts = (0 until n1.get("results").size())
      .map(i => n1.get("results").get(i).get("rate_count").asLong())
    assert(counts == counts.sortBy(-_), s"not rank-ordered: $counts")
    // a limit beyond MaxLimit is clamped, not echoed into the plan
    val (c2, _) = get(
      s"/api/rates/by-payer?state=$st&year_month=$ym&limit=999999")
    assert(c2 == 200)
  }

  test("dimension-values: whitelisted dims work, unknown dim 400") {
    val (c1, n1) = get(
      s"/api/meta/dimension-values?state=$st&year_month=$ym&dimension=billing_class")
    assert(c1 == 200)
    val vals = (0 until n1.get("results").size())
      .map(i => n1.get("results").get(i).get("billing_class").asText()).toSet
    assert(vals.subsetOf(Set("professional", "institutional")))
    assert(get(s"/api/meta/dimension-values?state=$st&year_month=$ym" +
      "&dimension=negotiated_rate")._1 == 400)
  }

  test("multi-field search decodes comma lists into IN predicates") {
    val (c, n) = get(s"/api/search/multi-field?year_month=$ym" +
      s"&states=$st&billing_classes=professional,%20institutional&limit=5")
    assert(c == 200, n.toString)
    assert(n.get("summary").get("total_rates").asLong() > 0)
    assert(n.get("results").size() <= 5)
    // parity with the grammar called directly
    val want = graft.queries.QueryApi.filteredRates(spark, sf0001,
      graft.queries.QueryApi.RateFilter(state = "", yearMonth = ym,
        states = Seq(st),
        billingClasses = Seq("professional", "institutional"))).count()
    assert(n.get("summary").get("total_rates").asLong() == want)
  }

  test("autocomplete: path-param field, contains filter, whitelist 400") {
    val (c, n) = get(
      s"/api/autocomplete/payer?query=payer_&state=$st&year_month=$ym&limit=3")
    assert(c == 200, n.toString)
    assert(n.get("count").asInt() > 0 && n.get("count").asInt() <= 3)
    val vs = (0 until n.get("results").size())
      .map(i => n.get("results").get(i).get("value").asText())
    assert(vs.forall(_.startsWith("payer_")))
    assert(get(s"/api/autocomplete/ssn?query=x&state=$st&year_month=$ym")
      ._1 == 400)
    // the reference's full field surface (r14): proc taxonomy via the
    // categorizer, tin via the xref, npi via the dim
    val (cp, np) = get(
      s"/api/autocomplete/proc_class?query=&state=$st&year_month=$ym&limit=5")
    assert(cp == 200 && np.get("count").asInt() > 0, np.toString)
    val (ct, nt) = get(
      s"/api/autocomplete/tin_value?query=&state=$st&year_month=$ym&limit=5")
    assert(ct == 200 && nt.get("count").asInt() > 0, nt.toString)
    val (cn, nn) = get(
      s"/api/autocomplete/npi?query=&state=$st&year_month=$ym&limit=5")
    assert(cn == 200 && nn.get("count").asInt() > 0, nn.toString)
    // reference-spelled alias resolves like our short name
    assert(get(s"/api/autocomplete/organization_name?query=" +
      s"&state=$st&year_month=$ym&limit=3")._1 == 200)
  }

  test("providers/search and explore endpoints answer with rows") {
    val (c1, n1) = get("/api/providers/search?q=supplier&limit=4")
    assert(c1 == 200 && n1.get("count").asInt() <= 4)
    val (c2, n2) = get(
      s"/api/explore/data-availability?state=$st&year_month=$ym")
    assert(c2 == 200 && n2.get("count").asInt() > 0)
    val (c3, n3) = get("/api/meta/available-data")
    assert(c3 == 200 && n3.get("count").asInt() > 0)
  }

  test("search/documents: BM25 over the index, parity with a direct probe") {
    val terms = Seq("order", "customer", "scan") // TextAnalysis.Bm25Terms
    val q = java.net.URLEncoder.encode(terms.mkString(" "), "UTF-8")
    val (c, n) = get(s"/api/search/documents?q=$q&limit=5")
    assert(c == 200, n.toString)
    assert(n.get("count").asInt() > 0 && n.get("count").asInt() <= 5)
    val got = (0 until n.get("results").size()).map { i =>
      val r = n.get("results").get(i)
      (r.get("rank").asInt(), r.get("doc_id").asLong(),
        r.get("score").asDouble())
    }
    // the index build is deterministic, so a privately built index
    // must serve the identical ranking and scores
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rest_twin_index").toString
    graft.operators.Retrieval.writeTextIndex(
      Tables.load(spark, sf0001, "documents"), "doc_id", "text", dir)
    val want = graft.operators.Retrieval
      .probeIndexTopK(spark, dir, terms, 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .toSeq
    assert(got == want, s"$got != $want")
    // grammar: missing q is a 422, q with no indexable terms is a 422
    assert(get("/api/search/documents")._1 == 422)
    assert(get("/api/search/documents?q=%2B%2B")._1 == 422)
    // term counts other than 3 must work too (r14: the score fold was
    // hard-wired to three positions and 500'd on 1/2/4-term queries)
    assert(get("/api/search/documents?q=order&limit=3")._1 == 200)
    assert(get("/api/search/documents?q=order+customer&limit=3")._1 == 200)
    val (c4, _) = get(
      "/api/search/documents?q=order+customer+scan+part&limit=3")
    assert(c4 == 200)
  }

  test("search/payer: ILIKE grouped stats match the direct computation") {
    // a payer that actually exists in the fixture slice
    val payer = graft.queries.QueryApi.filteredRates(spark, sf0001,
        graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
      .select("payer_slug").head().getString(0)
    val (c, n) = get(
      s"/api/search/payer?payer_name=$payer&state=$st&year_month=$ym")
    assert(c == 200, n.toString)
    assert(n.get("search_type").asText() == "payer")
    // the route matches by ILIKE-contains, so other slugs containing
    // this one may ride along — locate the exact row, don't count
    assert(n.get("result_count").asInt() >= 1)
    val row = (0 until n.get("results").size())
      .map(n.get("results").get)
      .find(_.get("payer_slug").asText() == payer)
      .getOrElse(fail(s"searched payer $payer missing from results"))
    val want = graft.queries.QueryApi.filteredRates(spark, sf0001,
        graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
      .filter(col("payer_slug") === payer)
      .agg(count(lit(1)), avg("negotiated_rate"),
        countDistinct(col("billing_code")),
        countDistinct(col("provider_reference_id"))).head()
    assert(row.get("rate_count").asLong() == want.getLong(0))
    assert(math.abs(row.get("avg_rate").asDouble() - want.getDouble(1)) < 0.01)
    assert(row.get("unique_procedures").asLong() == want.getLong(2))
    assert(row.get("unique_provider_groups").asLong() == want.getLong(3))
    // missing required param → 422
    assert(get(s"/api/search/payer?state=$st&year_month=$ym")._1 == 422)
  }

  test("search/tin + billing-code + organization + taxonomy + " +
      "procedure-category answer with ranked rows") {
    // a TIN that exists in the slice: take any provider in the slice
    // and derive its tin through the same xref the server uses
    val slice = graft.queries.QueryApi.filteredRates(spark, sf0001,
      graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
    val pgid = slice.select("provider_reference_id").head().getString(0)
    val tin = graft.etl.EnrichmentDims
      .xrefPgMemberTin(Roles.providers(spark, sf0001))
      .filter(col("provider_group_id") === pgid)
      .select("tin_value").head().getString(0)
    val (c1, n1) = get(
      s"/api/search/tin?tin_value=$tin&state=$st&year_month=$ym")
    assert(c1 == 200, n1.toString)
    assert(n1.get("result_count").asInt() > 0)
    // every result row carries the searched tin and a positive count
    (0 until n1.get("results").size()).foreach { i =>
      val r = n1.get("results").get(i)
      assert(r.get("tin_value").asText() == tin)
      assert(r.get("rate_count").asLong() > 0)
    }
    // rate_count parity: the slice rows whose provider carries this tin
    val wantTin = slice.join(
      graft.etl.EnrichmentDims
        .xrefPgMemberTin(Roles.providers(spark, sf0001))
        .filter(col("tin_value") === tin)
        .select(col("provider_group_id").as("pg")),
      slice("provider_reference_id") === col("pg")).count()
    val gotTin = (0 until n1.get("results").size())
      .map(i => n1.get("results").get(i).get("rate_count").asLong()).sum
    assert(gotTin == wantTin, s"$gotTin != $wantTin")

    val code = slice.select("billing_code").head().getString(0)
    val (c2, n2) = get(
      s"/api/search/billing-code?billing_code=$code&state=$st&year_month=$ym")
    assert(c2 == 200, n2.toString)
    assert(n2.get("result_count").asInt() > 0)
    val wantCode = slice.filter(col("billing_code") === code).count()
    val gotCode = (0 until n2.get("results").size())
      .map(i => n2.get("results").get(i).get("rate_count").asLong()).sum
    assert(gotCode == wantCode)

    // org / taxonomy / procedure-category: ranked, bounded, non-empty
    val (c3, n3) = get(
      s"/api/search/organization?org_name=supplier&state=$st&year_month=$ym&limit=5")
    assert(c3 == 200 && n3.get("result_count").asInt() <= 5)
    val (c4, n4) = get(
      s"/api/search/taxonomy?taxonomy_desc=taxonomy&state=$st&year_month=$ym&limit=5")
    assert(c4 == 200 && n4.get("result_count").asInt() <= 5)
    val (c5, n5) = get(
      s"/api/search/procedure-category?proc_class=&state=$st&year_month=$ym&limit=5")
    assert(c5 == 200 && n5.get("result_count").asInt() <= 5)
    val counts5 = (0 until n5.get("results").size())
      .map(i => n5.get("results").get(i).get("rate_count").asLong())
    assert(counts5 == counts5.sortBy(-_), s"not rank-ordered: $counts5")
  }

  test("search/statistics + explore/category-stats: distinct counters " +
      "match the direct computation") {
    val slice = graft.queries.QueryApi.filteredRates(spark, sf0001,
      graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
    val want = slice.agg(count(lit(1)),
      countDistinct(col("billing_code")),
      countDistinct(col("payer_slug")),
      countDistinct(col("provider_reference_id"))).head()
    val (c1, n1) = get(s"/api/search/statistics?state=$st&year_month=$ym")
    assert(c1 == 200, n1.toString)
    val s1 = n1.get("statistics")
    assert(s1.get("total_records").asLong() == want.getLong(0))
    assert(s1.get("unique_procedures").asLong() == want.getLong(1))
    assert(s1.get("unique_payers").asLong() == want.getLong(2))
    // every rate row's provider exists in the fixture's supplier
    // universe, so npi (left-joined dim key) counts the same set
    assert(s1.get("unique_providers").asLong() == want.getLong(3))
    assert(s1.get("unique_tins").asLong() > 0)

    val (c2, n2) = get(s"/api/explore/category-stats?state=$st&year_month=$ym")
    assert(c2 == 200, n2.toString)
    val cs = n2.get("category_statistics")
    assert(cs.get("total_records").asLong() == want.getLong(0))
    assert(cs.get("procedure").get("count").asLong() == want.getLong(1))
    assert(cs.get("payer").get("count").asLong() == want.getLong(2))
    assert(cs.get("provider").get("count").asLong() == want.getLong(3))
    assert(cs.get("payer").get("label").asText() == "Payers")
  }

  test("explore/drill-down: payer → procedure_class partition sums to " +
      "the payer's slice; unknown category 400") {
    val slice = graft.queries.QueryApi.filteredRates(spark, sf0001,
      graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
    val payer = slice.select("payer_slug").head().getString(0)
    val wantTotal = slice.filter(col("payer_slug") === payer).count()
    val (c, n) = get("/api/explore/drill-down?category=payer" +
      s"&selected_value=$payer&drill_category=procedure_class" +
      s"&state=$st&year_month=$ym&limit=500")
    assert(c == 200, n.toString)
    val got = (0 until n.get("results").size())
      .map(i => n.get("results").get(i).get("record_count").asLong()).sum
    // the categorizer never emits null/'' classes, so the drill rows
    // partition the payer's slice exactly
    assert(got == wantTotal, s"$got != $wantTotal")
    assert(n.get("source_category").asText() == "payer")
    assert(get("/api/explore/drill-down?category=ssn&selected_value=x" +
      s"&drill_category=payer&state=$st&year_month=$ym")._1 == 400)
  }

  test("explore/data-availability with category: paginated value grain, " +
      "has_more contract, unknown category 400") {
    val (c1, n1) = get("/api/explore/data-availability?category=payer" +
      s"&state=$st&year_month=$ym&limit=2&offset=0")
    assert(c1 == 200, n1.toString)
    assert(n1.get("result_count").asInt() <= 2)
    assert(n1.get("has_more").isBoolean)
    val page1 = (0 until n1.get("results").size())
      .map(i => n1.get("results").get(i).get("value").asText())
    // page 2 must not repeat page 1 (deterministic order + offset)
    val (c2, n2) = get("/api/explore/data-availability?category=payer" +
      s"&state=$st&year_month=$ym&limit=2&offset=2")
    assert(c2 == 200)
    val page2 = (0 until n2.get("results").size())
      .map(i => n2.get("results").get(i).get("value").asText())
    assert(page1.toSet.intersect(page2.toSet).isEmpty)
    // record counts partition the slice across all pages
    val slice = graft.queries.QueryApi.filteredRates(spark, sf0001,
      graft.queries.QueryApi.RateFilter(state = st, yearMonth = ym))
    val want = slice.count()
    val (c3, n3) = get("/api/explore/data-availability?category=payer" +
      s"&state=$st&year_month=$ym&limit=500")
    assert(c3 == 200)
    val got = (0 until n3.get("results").size())
      .map(i => n3.get("results").get(i).get("record_count").asLong()).sum
    assert(got == want, s"$got != $want")
    assert(get("/api/explore/data-availability?category=ssn" +
      s"&state=$st&year_month=$ym")._1 == 400)
    // the category-less matrix keeps working
    assert(get(
      s"/api/explore/data-availability?state=$st&year_month=$ym")._1 == 200)
  }

  test("root endpoint lists the registered route inventory (main.py:57-60)") {
    val (c, n) = get("/")
    assert(c == 200, n.toString)
    assert(n.get("message").asText().nonEmpty)
    val eps = (0 until n.get("endpoints").size())
      .map(i => n.get("endpoints").get(i).asText()).toSet
    assert(Set("/api/health", "/api/rates/summary", "/api/rates/by-payer",
      "/api/search/multi-field", "/api/knn", "/api/autocomplete",
      "/api/explore/drill-down").subsetOf(eps), eps.toString)
  }

  test("summary/by-payer gold fast path: byte-identical to the live " +
      "plan, extra predicates fall back, absent slices answer empty") {
    def raw(path: String): String = client.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(s"$base$path")).GET().build(),
      java.net.http.HttpResponse.BodyHandlers.ofString()).body()
    val su = s"/api/rates/summary?state=$st&year_month=$ym"
    val bp = s"/api/rates/by-payer?state=$st&year_month=$ym&limit=3"
    val fi = s"/api/rates/summary?state=$st&year_month=$ym&code_type=CPT"
    val mf = s"/api/search/multi-field?year_month=$ym&states=$st&limit=5"
    val ac = s"/api/autocomplete/payer?query=payer&state=$st&year_month=$ym"
    val dq = "/api/search/documents?q=order+customer&limit=5"
    // pre-warmup: servingReady is false, so these are the LIVE plans
    val liveSu = raw(su)
    val liveBp = raw(bp)
    val liveFi = raw(fi)
    val liveMf = raw(mf)
    val liveAc = raw(ac)
    val liveDq = raw(dq)
    server.warmup() // builds the gold tables + arms the fast paths
    // post-warmup: the same requests read the gold slices — the shared
    // aggregate definition (decimal-sum mean, exact percentile,
    // collect_set distincts) makes the responses EXACTLY equal, not
    // merely close
    assert(raw(su) == liveSu, s"routed summary diverged:\n${raw(su)}\n$liveSu")
    assert(raw(bp) == liveBp, s"routed by-payer diverged:\n${raw(bp)}\n$liveBp")
    assert(raw(mf) == liveMf,
      s"routed multi-field diverged:\n${raw(mf)}\n$liveMf")
    assert(raw(ac) == liveAc,
      s"gold autocomplete diverged:\n${raw(ac)}\n$liveAc")
    assert(raw(dq) == liveDq,
      s"literal-stats BM25 diverged:\n${raw(dq)}\n$liveDq")
    // a request with extra predicates is NOT gold-servable and must
    // keep answering from the live plan, unchanged
    assert(raw(fi) == liveFi)
    // a slice absent from the gold table falls back to the live empty
    // aggregate (count 0), never an empty object mismatch
    val missing = mapper.readTree(
      raw(s"/api/rates/summary?state=__nope__&year_month=$ym"))
    assert(missing.get("summary").get("total_rates").asLong() == 0)
  }

  test("knn k/nprobe grammar: malformed ints answer 422, not 500") {
    assert(get("/api/knn/5?k=abc")._1 == 422)
    assert(get("/api/knn/5?nprobe=xyz")._1 == 422)
  }

  test("knn/{vec_id}: IVF-probed neighbors, parity with a direct index probe") {
    val (c, n) = get("/api/knn/5?k=3")
    assert(c == 200, n.toString)
    assert(n.get("count").asInt() > 0 && n.get("count").asInt() <= 3)
    val got = (0 until n.get("results").size()).map { i =>
      val r = n.get("results").get(i)
      (r.get("qid").asLong(), r.get("cid").asLong(),
        r.get("rank").asInt(), r.get("cosine").asDouble())
    }
    assert(got.forall(_._1 == 5L))
    // deterministic build -> a privately built index answers identically
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rest_twin_ivf").toString + "/ivf"
    graft.operators.Similarity.writeIvfIndex(spark, sf0001, dir)
    val want = graft.operators.Similarity
      .probeIvfIndexForIds(spark, sf0001, dir, Seq(5L), nprobe = 2, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      .toSeq
    assert(got == want, s"$got != $want")
    // grammar: missing / non-integer vec_id answer 422
    assert(get("/api/knn")._1 == 422)
    assert(get("/api/knn/abc")._1 == 422)
    server.stop()
  }
}
