package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the LAST line of the bench's captured stdout tail
  * (~2000 chars). Four rounds shipped parsed:null because the line
  * outgrew the window — pin the two properties that prevent a
  * regression: the compact line always fits, and it is always valid
  * JSON with the headline fields present. */
class BenchLineSpec extends AnyFunSuite {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def mkResults(n: Int): Seq[(String, Double)] =
    (0 until n).map(i => s"some_quite_long_query_name_number_$i" -> i * 0.137)

  test("compact line fits the 2000-char tail window at any query count") {
    Seq(0, 1, 50, 94, 300).foreach { n =>
      val line = Bench.compactLine(mkResults(n), 123.456, 101.2, 88.8, 333.4,
        "/root/testdata/sf0.1")
      assert(line.length < 1700, s"n=$n: ${line.length} chars")
    }
  }

  test("compact line is valid JSON with the headline fields") {
    Seq(0, 94, 300).foreach { n =>
      val line = Bench.compactLine(mkResults(n), 99.9, -1.0, -1.0, -1.0, "/x")
      val node = mapper.readTree(line) // throws on malformed JSON
      assert(node.get("metric").asText() == "total")
      assert(node.get("value").asDouble() == 99.9)
      assert(node.get("n_queries").asInt() == n)
      assert(node.get("queries").isObject)
      assert(node.get("queries_omitted").asInt() ==
        n - node.get("queries").size())
    }
  }

  test("kept set is a strict slowest-prefix and omitted_sec reconciles") {
    // A very long name ranked mid-pack: skip-and-continue packing would
    // drop it yet keep later (faster) entries, so drop(entries.length)
    // would misattribute which queries were omitted and their seconds.
    val results = (0 until 200).map { i =>
      val name = if (i == 50) "long_" * 400 else s"q$i"
      name -> (200 - i) * 1.0
    }
    val node = mapper.readTree(Bench.compactLine(results, 0, 0, 0, 0, "/x"))
    val kept = {
      val it = node.get("queries").fieldNames()
      val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next()
      b.result()
    }
    val bySlowest = results.sortBy(-_._2)
    assert(kept == bySlowest.take(kept.size).map(_._1),
      "kept keys must be exactly the slowest prefix")
    assert(kept.size <= 50, "the unfittable long name must end the prefix")
    val omittedSum = bySlowest.drop(kept.size).map(_._2).sum
    assert(math.abs(node.get("omitted_sec").asDouble() - omittedSum) < 1e-6)
    assert(node.get("queries_omitted").asInt() == 200 - kept.size)
  }

  test("drift flags only real movers: banded, absolute-floored, best-based") {
    val best = Map("big" -> 4.0, "mid" -> 2.0, "tiny" -> 0.2, "gone" -> 3.0)
    val cur = Seq(
      "big" -> 6.0, // +50% and +2.0s vs best -> flagged at floor band
      "mid" -> 2.4, // +20% < 30% floor band -> not flagged
      "tiny" -> 0.6, // 3x but absolute delta 0.4s < 0.5s -> not flagged
      "new" -> 9.0) // no history -> not flagged
    val d = Bench.driftAgainst(best, cur, noiseFloor = 0.05)
    assert(d.keySet == Set("big"), d.toString)
    assert(math.abs(d("big") - 1.5) < 1e-9)
    // a noisier floor widens the band: 3 x 0.2 = 60% > big's 50%
    assert(Bench.driftAgainst(best, cur, noiseFloor = 0.2).isEmpty)
    // the contention-guard gate: a query whose idle reference says
    // "6s is under 3x normal" (e.g. a one-time sidecar build) is not
    // drift even when it exceeds its best-record band
    assert(Bench.driftAgainst(best, cur, noiseFloor = 0.05,
      refSec = Map("big" -> 2.5)).isEmpty)
    // ms metrics pass class-scaled floors AND a 1x contention guard
    // (guardMult=1.0 — a latency median has no build-cost excuse for
    // running above its idle reference): a 0.08s -> 0.5s or -> 0.3s
    // routed regression flags, while 0.14s — under the 0.15s idle
    // reference itself — does not
    val msBest = Map("routed_ms_p50" -> 0.08)
    def msDrift(cur: Double) = Bench.driftAgainst(msBest,
      Seq("routed_ms_p50" -> cur), noiseFloor = 0.05,
      refSec = Map("routed_ms_p50" -> 0.15), defaultRef = 0.0,
      minAbsSec = 0.05, minGuardSec = 0.1, guardMult = 1.0)
    assert(msDrift(0.5).contains("routed_ms_p50"))
    assert(msDrift(0.3).contains("routed_ms_p50"))
    assert(msDrift(0.14).isEmpty)
  }

  test("a 1.5x sketch-rollup regression is flagged under the ms-metric " +
      "guard (r14: 469 -> 690 ms sat unwatched under the 3x guard)") {
    def roll(cur: Double, guardMult: Double) = Bench.driftAgainst(
      Map("sketch_rollup_ms_p50" -> 0.469),
      Seq("sketch_rollup_ms_p50" -> cur), noiseFloor = 0.05,
      refSec = Map("sketch_rollup_ms_p50" -> 0.5), defaultRef = 0.0,
      minAbsSec = 0.05, minGuardSec = 0.1, guardMult = guardMult)
    // the exact r14 escape: 0.690 vs best 0.469 under the old 3x guard
    assert(roll(0.690, 3.0).isEmpty, "reproduces the r14 escape")
    val d = roll(0.690, 1.0)
    assert(d.contains("sketch_rollup_ms_p50"), d.toString)
    assert(math.abs(d("sketch_rollup_ms_p50") - 0.690 / 0.469) < 1e-9)
    // within-band wobble still passes
    assert(roll(0.55, 1.0).isEmpty)
  }

  test("history-derived idle refs arm the drift guard the hardcoded " +
      "table muted") {
    // the r13 escape: a6_payer_index ran ~5.4s vs a ~1.0-1.3s history,
    // but the hardcoded table's 2.1s reference put the contention
    // guard at 6.3s, so an 18x-vs-best run never flagged. With refs
    // derived from history (p25 of the per-sf records), a synthetic
    // 3x-inflated query IS flagged…
    val history = Map(
      "q_inflated" -> Seq(1.0, 1.1, 0.9, 1.2, 6.0), // one contended round
      "q_quiet" -> Seq(1.0, 1.1, 0.9, 1.2),
      "q_thin" -> Seq(0.5)) // < minRecords -> no history ref
    val idle = Bench.idleRefsFrom(history)
    assert(math.abs(idle("q_inflated") - 1.0) < 1e-9) // p25, not the 6.0
    assert(!idle.contains("q_thin"), "thin history must fall back")
    val best = history.map { case (k, v) => k -> v.min }
    val staleTable = Map("q_inflated" -> 2.1) // the r13-style stale ref
    val cur = Seq("q_inflated" -> 3.5, "q_quiet" -> 1.05)
    // …while the stale table alone muted it (guard 3 x 2.1 = 6.3)
    assert(Bench.driftAgainst(best, cur, noiseFloor = 0.05,
      refSec = staleTable).isEmpty)
    val d = Bench.driftAgainst(best, cur, noiseFloor = 0.05,
      refSec = staleTable ++ idle)
    assert(d.keySet == Set("q_inflated"), d.toString)
    assert(math.abs(d("q_inflated") - 3.5 / 0.9) < 1e-9)
  }

  test("contended slopes publish as JSON null, never as a number " +
      "(r14: pmi slope 31.95 printed beside probe_noise 0.4154)") {
    val noise = Map("text_pmi_pairs" -> 0.4154, "sim_ivf_topk" -> 0.06,
      "layout_zorder_box" -> 4.53)
    // gate = max(3 x floor, 0.10): at the r14 floor (0.034) both
    // contended probes gate, the quiet one does not
    val gated = Bench.noiseGated(noise, noiseFloor = 0.034)
    assert(gated == Set("text_pmi_pairs", "layout_zorder_box"), gated)
    // a negative/absent floor still applies the 0.10 lower bound
    assert(Bench.noiseGated(noise, -1.0) == gated)
    val json = Bench.slopeJsonOf(
      Map("text_pmi_pairs" -> 31.95, "sim_ivf_topk" -> 1.11), gated)
    val node = mapper.readTree(json) // stays valid JSON with the null
    assert(node.get("text_pmi_pairs").isNull,
      "a gated slope must publish as null")
    assert(node.get("sim_ivf_topk").asDouble() == 1.11)
  }

  test("a contended suite floor nulls the WHOLE slope block " +
      "(r15: floor 0.2645 ballooned the gate to 0.79 and a contended " +
      "dedup_span_removal 19.35 printed beside probe_noise 0.0897)") {
    val noise = Map("dedup_span_removal" -> 0.0897, "sim_ivf_topk" -> 0.02)
    // quiet floor: the low-gap probes publish
    assert(Bench.noiseGated(noise, noiseFloor = 0.033).isEmpty)
    // the exact r15 escape: a 0.2645 floor must gate EVERYTHING —
    // repeats that are equally contended leave no gap to detect
    assert(Bench.noiseGated(noise, noiseFloor = 0.2645) == noise.keySet)
    // boundary: at the cap the per-probe gate still applies
    assert(Bench.noiseGated(noise, noiseFloor = 0.15).isEmpty)
    assert(Bench.noiseGated(noise, noiseFloor = 0.151) == noise.keySet)
  }

  test("slow creep stays visible after the windowed drift baseline " +
      "ratchets (r16 ask #4: 5 slow records silently become the baseline)") {
    // a genuine regression that persisted: 8 recent records all ~3x the
    // old cost — the windowed best (2.9) no longer flags anything, but
    // windowed/all-time = 2.9 must appear in the creep field
    val crept = Map("q_crept" ->
      (Seq(1.0, 1.05, 0.98) ++ Seq.fill(8)(3.0) ++ Seq(2.9)))
    val c = Bench.creepAgainst(crept, window = 8)
    assert(c.keySet == Set("q_crept"), c.toString)
    assert(math.abs(c("q_crept") - 2.9 / 0.98) < 1e-9)
    // a one-record mood inside the window does NOT creep (the windowed
    // min skips over it)
    val mood = Map("q_mood" ->
      (Seq(1.0, 1.05) ++ Seq(0.98, 5.0, 1.02, 1.0, 1.1, 0.99, 1.03, 1.0)))
    assert(Bench.creepAgainst(mood, window = 8).isEmpty)
    // history no longer than the window cannot creep by construction
    assert(Bench.creepAgainst(Map("q_thin" -> Seq.fill(8)(3.0)),
      window = 8).isEmpty)
    // sub-minAbsSec ms-metric wobble stays out even at a high ratio
    assert(Bench.creepAgainst(Map("m" ->
      (Seq(0.05) ++ Seq.fill(9)(0.15))), window = 8).isEmpty)
  }

  test("compact line carries the drift/creep/cold-p95 fields as JSON") {
    val line = Bench.compactLine(mkResults(94), 1.0, 0, 0, 0, "/x",
      driftJson = """{"q_slow":1.62}""", restP95ColdMs = 1234.5,
      creepJson = """{"q_crept":2.31}""")
    val node = mapper.readTree(line)
    assert(node.get("drift").get("q_slow").asDouble() == 1.62)
    assert(node.get("creep").get("q_crept").asDouble() == 2.31)
    assert(node.get("rest_p95_cold_ms").asDouble() == 1234.5)
    assert(line.length < 1700)
  }

  test("the slowest queries survive omission, never the fastest-first") {
    val line = Bench.compactLine(mkResults(300), 1.0, 0, 0, 0, "/x")
    val node = mapper.readTree(line)
    val kept = node.get("queries").fieldNames()
    // slowest = highest index in mkResults; the first kept key is it
    assert(kept.next() == "some_quite_long_query_name_number_299")
  }
}
