package graft

/** Guards on the driver contract: `SparkEntry.queries` is merged from
  * several packs with `toMap`, so a duplicated name across packs would
  * SILENTLY drop one implementation — fail loudly here instead. */
class EntryContractSpec extends SparkSpec {

  test("no query name collides across packs") {
    val names = Seq(graft.queries.Inventory, graft.queries.Analytics,
      graft.queries.Builders, graft.queries.Sources,
      graft.queries.SqlSurface, graft.operators.TextAnalysis,
      graft.operators.Dedup, graft.operators.Similarity,
      graft.operators.Multimodal, graft.operators.Curation,
      graft.operators.Decontaminate, graft.operators.Packing,
      graft.operators.Pipeline, graft.operators.Export,
      graft.operators.Linkage, graft.operators.Graph,
      graft.operators.Sketches, graft.operators.Training,
      graft.operators.Retrieval, graft.operators.Evaluation,
      graft.operators.Ranking, graft.operators.Layout)
      .flatMap(_.queries.keys)
    val dups = names.groupBy(identity).collect {
      case (n, occ) if occ.size > 1 => n
    }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    assert(names.toSet == SparkEntry.queries.keySet)
  }

  test("every oracle key names a declared query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are stable identifiers") {
    val bad = SparkEntry.queries.keys.filterNot(_.matches("[a-z0-9_]+"))
    assert(bad.isEmpty, s"non-identifier query names: $bad")
  }

  /** Every query must be oracle-checked unless it is on the explicit
    * rows-only allowlist (approximate/engine-specific by design). A
    * new query silently missing its oracle would downgrade the
    * driver's check without anyone noticing — fail here instead. */
  test("un-oracled queries are exactly the documented rows-only set") {
    // Empty as of round 13: multimodal_resize — the last holdout —
    // graduated too (the fixture's text payloads all take the
    // deterministic stride-resample stub, which the oracle replays
    // byte-for-byte; only the IMAGE branch's codec bytes stay
    // spec-pinned, and no declared query emits them).
    val rowsOnlyByDesign = Set.empty[String]
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled == rowsOnlyByDesign,
      s"unexpected rows-only queries: ${unoracled -- rowsOnlyByDesign}; " +
        s"allowlisted but now oracled: ${rowsOnlyByDesign -- unoracled}")
  }
}
