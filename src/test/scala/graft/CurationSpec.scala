package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** Corpus-curation operators: connected-components clustering,
  * quality/repetition/PII metrics, deterministic sampling. The DuckDB
  * oracle pins exact values; these specs pin the semantic invariants
  * the oracle can't express (graph properties, determinism,
  * flag-vs-metric consistency). */
class CurationSpec extends SparkSpec {

  private def q(name: String) = Curation.queries(name)(spark, sf0001)

  test("contrastive pairs: positives share content, negatives don't") {
    val rows = q("contrastive_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.exists(_._3 == 1) && rows.exists(_._3 == 0),
      "need both classes in the mined set")
    // content check against the same augmented fixture the query uses:
    // base corpus + exact copies of 0-9, near-copies of 10-19
    val base = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def text(id: Long): String =
      if (id < 100000) base(id)
      else if (id < 100010) base(id - 100000)
      else base(id - 100000) + " extra suffix tokens"
    rows.foreach { case (a, b, label) =>
      assert(a < b, s"pair ($a, $b) not canonically ordered")
      if (label == 1) assert(text(a) == text(b), s"positive ($a,$b) differs")
      else assert(text(a) != text(b), s"negative ($a,$b) identical")
    }
    // every injected exact copy yields its positive pair
    (0L until 10L).foreach { id =>
      assert(rows.contains((id, id + 100000, 1)),
        s"missing positive ($id, ${id + 100000})")
    }
    // deterministic: the second run mines the identical set
    val again = q("contrastive_pairs").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.toSet == again.toSet, "mining not deterministic")
  }

  test("connectedComponents labels each node with its component minimum") {
    import spark.implicits._
    // two chains and an isolate: {1,2,3}, {5,6}, {4}
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val edges = Seq((2L, 1L), (2L, 3L), (6L, 5L)).toDF("src", "dst")
    val got = Curation.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L))
  }

  test("connectedComponents closes multi-hop chains (diameter > 1)") {
    import spark.implicits._
    // path graph 10-11-12-13-14: min label must travel 4 hops
    val nodes = (10L to 14L).toDF("id")
    val edges = (10L to 13L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Curation.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(10L))
  }

  test("connectedComponents refuses to return unconverged labels") {
    import spark.implicits._
    // path graph of diameter 5: min label cannot reach the far end in 2
    val nodes = (20L to 25L).toDF("id")
    val edges = (20L to 24L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Curation.connectedComponents(nodes, edges, maxIter = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("connectedComponents accepts a reliable checkpoint function") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val nodes = (30L to 33L).toDF("id")
    val edges = (30L to 32L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Curation.connectedComponents(nodes, edges,
        checkpoint = _.checkpoint())
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet == Set(30L))
  }

  test("clusterAndCanonicalize is corpus-generic (no fixture baked in)") {
    import spark.implicits._
    // tiny synthetic corpus: 1 and 2 exact dups; 3 and 4 near dups via a
    // candidate pair; 5 unrelated. No doc_id+100000 convention anywhere.
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "one two three four five six seven eight nine ten eleven"),
      (5L, "completely different text about something else entirely")
    ).toDF("id", "body")
    val pairs = Seq((3L, 4L), (3L, 5L)).toDF("src", "dst")
    val got = Curation.clusterAndCanonicalize(corpus, "id", "body", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val comp = got.map(t => t._1 -> t._2).toMap
    assert(comp(2L) == comp(1L))       // exact dup edge
    assert(comp(4L) == comp(3L))       // jaccard-verified candidate
    assert(comp(5L) == 5L)             // candidate pair failing jaccard
    got.foreach { case (id, c, canon) =>
      assert((canon == 1) == (id == c))
    }
  }

  test("dedup clusters: every injected copy joins its source's cluster") {
    val rows = q("dedup_cluster_canonical").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val comp = rows.map { case (id, c, _) => id -> c }.toMap
    // injected copies (exact 0-9, near 10-19) cluster with their source
    (0L until 20L).foreach { i =>
      assert(comp(i + 100000) == comp(i),
        s"copy ${i + 100000} not clustered with source $i")
    }
    // the component label is the minimum member, and exactly the label
    // holders are canonical
    rows.foreach { case (id, c, canon) =>
      assert(c <= id)
      assert((canon == 1) == (id == c))
    }
    // one canonical doc per cluster
    val canons = rows.filter(_._3 == 1).map(_._2).toSet
    assert(canons == rows.map(_._2).toSet)
  }

  test("gopher flag agrees with its own reported metrics") {
    val rows = q("text_gopher_filter").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val pass = r.getAs[Int]("word_cnt") >= 50 &&
        r.getAs[Int]("word_cnt") <= 100000 &&
        r.getAs[Double]("mean_word_len") >= 3.0 &&
        r.getAs[Double]("mean_word_len") <= 10.0 &&
        r.getAs[Double]("symbol_ratio") < 0.1 &&
        r.getAs[Int]("stop_hits") >= 2
      assert(r.getAs[Int]("gopher_pass") == (if (pass) 1 else 0))
    }
  }

  test("pii scrub: every injected footer is counted and redacted") {
    val rows = q("text_pii_scrub").collect()
    val injected = rows.filter(_.getAs[Long]("doc_id") % 7 == 0)
    assert(injected.nonEmpty)
    injected.foreach { r =>
      assert(r.getAs[Int]("n_email") >= 1)
      assert(r.getAs[Int]("n_phone") >= 1)
      assert(r.getAs[Int]("n_ip") >= 1)
    }
    // the corpus itself carries no PII: non-injected docs count zero
    rows.filterNot(_.getAs[Long]("doc_id") % 7 == 0).foreach { r =>
      assert(r.getAs[Int]("n_email") == 0 && r.getAs[Int]("n_phone") == 0 &&
        r.getAs[Int]("n_ip") == 0)
    }
  }

  test("hash sampling is deterministic and respects per-source rates") {
    val a = q("sample_hash_stratified").collect().map(_.toSeq).toSet
    val b = q("sample_hash_stratified").collect().map(_.toSeq).toSet
    assert(a == b) // content-hash, not rand(): identical across runs
    assert(a.nonEmpty)
    // every kept row's uniform is under its source's rate
    a.foreach { r =>
      val rate = (r(1).asInstanceOf[String].drop(3).toInt % 4 + 1) * 0.2
      assert(r(2).asInstanceOf[Double] < rate + 1e-6)
    }
  }

  test("mixture weighting: full epochs always kept, epochs bounded by ceil(w)") {
    val rows = q("sample_mixture_weighted").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val total = Tables.load(spark, sf0001, "documents")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def w(src: String): Double = (src.drop(3).toInt % 5) * 0.6 + 0.3
    // epoch 0 of any source with w >= 1 keeps every doc (u < 1 always)
    val kept0 = rows.filter(_._3 == 0).map(t => (t._1, t._2)).toSet
    total.filter(t => w(t._2) >= 1.0).foreach { t =>
      assert(kept0.contains(t), s"doc $t missing from its full epoch 0")
    }
    // no epoch at or beyond ceil(w)
    rows.foreach { case (id, src, e) =>
      assert(e < math.ceil(w(src)).toInt, s"epoch $e out of range for $src")
    }
    // up-sampling actually happened: some doc appears in >1 epoch
    assert(rows.groupBy(t => (t._1, t._2)).values.exists(_.size > 1))
  }

  test("snapshot diff: statuses partition both snapshots' id space") {
    import graft.operators.Curation
    val byStatus = Curation.queries("corpus_snapshot_diff")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val n = Tables.load(spark, sf0001, "documents").count()
    // fixture arithmetic over the real corpus ids
    val ids = Tables.load(spark, sf0001, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val removed = ids.filter(_ % 31 == 7)
    val changed = ids.filter(id => id % 23 == 5 && id % 31 != 7)
    assert(byStatus("removed") == removed)
    assert(byStatus("changed") == changed)
    assert(byStatus("added") == ids.filter(_ < 20).map(_ + 100000))
    assert(byStatus.values.map(_.size).sum == n + 20)
  }

  test("dsir resampling enriches target-like docs and stays deterministic") {
    val kept = Curation.queries("sample_importance_dsir")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(kept.nonEmpty)
    // normalized importance in (0, 1]
    kept.foreach { case (id, w) =>
      assert(w > 0.0 && w <= 1.0, s"doc $id importance $w out of range") }
    // the whole point: docs that LOOK like the target (the marked %3
    // family, most of which is NOT the declared %21 target) are
    // enriched in the kept set relative to the raw corpus
    val ids = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val rawMarked = ids.count(_ % 3 == 0).toDouble / ids.length
    val keptMarked = kept.count(_._1 % 3 == 0).toDouble / kept.length
    assert(keptMarked > rawMarked + 0.1,
      f"kept marked-fraction $keptMarked%.3f not above raw $rawMarked%.3f")
    // and marked docs carry systematically higher importance
    val (mw, uw) = (kept.filter(_._1 % 3 == 0).map(_._2),
      kept.filterNot(_._1 % 3 == 0).map(_._2))
    if (mw.nonEmpty && uw.nonEmpty)
      assert(mw.sum / mw.length > uw.sum / uw.length)
    // content-hash coin + fixed-order fold => bit-identical reruns
    val again = Curation.queries("sample_importance_dsir")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(kept.sortBy(_._1).sameElements(again.sortBy(_._1)))
  }

  test("group-aware split: no component straddles splits, ratios sane") {
    val rows = Curation.queries("split_group_aware")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // the leakage guard itself: one split per component
    rows.groupBy(_._2).foreach { case (compId, members) =>
      assert(members.map(_._3).distinct.size == 1,
        s"component $compId split across ${members.map(_._3).distinct}")
    }
    // every injected near-dup lands with its source document
    val bySplit = rows.map(t => t._1 -> t._3).toMap
    (0L until 20L).foreach { id =>
      assert(bySplit(id) == bySplit(id + 100000),
        s"doc $id and its copy split apart: leakage")
    }
    // determinism: a second evaluation is identical
    val again = Curation.queries("split_group_aware")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // hash-uniform 80/10/10 targets, loose at fixture size
    val frac = rows.groupBy(_._3).view.mapValues(
      _.size.toDouble / rows.length).toMap
    assert(frac("train") > 0.6 && frac("train") < 0.95, frac.toString)
    assert(frac.getOrElse("val", 0.0) < 0.25, frac.toString)
    assert(frac.getOrElse("test", 0.0) < 0.25, frac.toString)
  }

  test("span corruption: maximal disjoint spans, sane mask rate, faithful tokens") {
    import org.apache.spark.sql.functions._
    val spans = q("augment_span_corruption").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3),
        r.getString(4)))
    assert(spans.nonEmpty)
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), split(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", " "), "\\s+").as("tk"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1).filter(_.nonEmpty).toIndexedSeq).toMap
    spans.groupBy(_._1).foreach { case (docId, ss) =>
      val sorted = ss.sortBy(_._3)
      // ids are 1..n in start order
      assert(sorted.map(_._2).toSeq == (1 to sorted.length))
      // maximal islands: consecutive spans leave >= 1 unmasked token
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 > a._3 + a._4, s"doc $docId spans touch: $a $b")
        case _ =>
      }
      // tokens quoted in the span are the doc's tokens at those positions
      val tk = docs(docId)
      sorted.foreach { case (_, _, start, len, toks) =>
        val expect = tk.slice(start - 1, start - 1 + len.toInt)
          .mkString("|")
        assert(toks == expect, s"doc $docId span@$start: $toks != $expect")
      }
      // masked share within a loose envelope around 3x the 8% coin
      val maskedN = sorted.map(_._4).sum.toDouble
      assert(maskedN <= 0.6 * tk.length + 3,
        s"doc $docId over-masked: $maskedN of ${tk.length}")
    }
    // corpus-wide the rate concentrates near ~1-(1-.08)^3 ≈ 22%
    val total = spans.map(_._4).sum.toDouble
    val corpus = docs.values.map(_.length).sum.toDouble
    assert(total / corpus > 0.10 && total / corpus < 0.40,
      s"corpus mask rate ${total / corpus}")
  }

  test("temperature resample: rarest language kept whole, imbalance flattened") {
    import org.apache.spark.sql.functions._
    val raw = Tables.load(spark, sf0001, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("sample_lang_temperature").collect()
    val keptByLang = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    val rates = kept.map(r => r.getString(1) -> r.getDouble(2)).toMap
    val rarest = raw.minBy(_._2)._1
    assert(rates(rarest) == 1.0, s"rarest lang $rarest rate ${rates(rarest)}")
    assert(keptByLang(rarest).toLong == raw(rarest),
      "rate-1.0 language must survive in full")
    // α=0.5 flattens: the kept max/min language ratio must shrink
    // strictly below the raw corpus ratio
    def ratio(m: Map[String, _ <: AnyVal]) = {
      val v = m.values.map(_.toString.toDouble)
      v.max / v.min
    }
    assert(ratio(keptByLang.toMap) < ratio(raw),
      s"kept ${keptByLang} not flatter than raw ${raw}")
    // keep_rate is the closed form n^(α−1)/max — spot-check one lang
    val gmax = raw.values.map(n => math.pow(n.toDouble, -0.5)).max
    raw.foreach { case (l, n) =>
      val expect = math.floor(math.pow(n.toDouble, -0.5) / gmax * 1e6 + 0.5) / 1e6
      assert(math.abs(rates(l) - expect) < 1e-9, s"$l rate ${rates(l)} != $expect")
    }
  }

  test("priority sampling: deterministic, size-k, weight-biased") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("n_chars"))
    val k = 50
    val got = Curation.samplePriorityWeighted(docs, col("n_chars"),
      col("doc_id"), k)
    assert(got.count() == k)
    // deterministic: a second evaluation selects the identical set
    val ids = got.select("doc_id").collect().map(_.getLong(0)).toSet
    val ids2 = Curation.samplePriorityWeighted(docs, col("n_chars"),
      col("doc_id"), k).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == ids2)
    // weight bias: the sampled docs' mean length exceeds the corpus's
    // (length-proportional inclusion; on this fixed corpus the gap is
    // far above noise)
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = got.agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
    // priorities are the claimed closed form for a spot row: w / u
    // with u = (hash32+1)/2^32 -- recompute one driver-side
    val row = got.orderBy(col("doc_id")).limit(1)
      .select("doc_id", "priority").head()
    val (id, pri) = (row.getLong(0), row.getDouble(1))
    val w = docs.filter(col("doc_id") === id).head().getLong(1).toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"priority:$id".getBytes("UTF-8"))
      .map(b => "%02x".format(b & 0xff)).mkString.substring(0, 8)
    val u = (java.lang.Long.parseLong(md, 16) + 1L).toDouble / 4294967296.0
    assert(math.abs(pri - w / u) < 1e-9 * (w / u))
  }
}
