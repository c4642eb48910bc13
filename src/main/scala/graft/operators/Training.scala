package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.NormExprs.pround
import graft.queries.QueryPack

/** Training-set preparation operators: retrieval chunking, FIM
  * augmentation, and an IN-ENGINE quality-classifier trainer.
  *
  * The trainer is the novel piece: full-batch logistic regression by
  * gradient descent where each iteration is ONE map-side-combinable
  * aggregate over the corpus (the classic distributed-GD shape — at
  * 100 TB each epoch is a single scan + a 5-number shuffle, and the
  * weight vector broadcasts back as plain literals). Cross-engine
  * determinism, the hard part of distributed training, comes from
  * FIXED-POINT gradient accumulation: each per-row gradient term is
  * rounded to 1e-8 and summed as a BIGINT — integer addition is
  * associative, so Spark's partition-order-dependent sum and DuckDB's
  * sequential sum produce the SAME integer, and the weight trajectory
  * is bit-identical on both engines across every iteration.
  */
object Training extends QueryPack {

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** Chunk width / stride in tokens (overlap = C − S). */
  private val ChunkC = 32
  private val ChunkS = 24

  /** GD hyper-parameters and the fixed-point gradient scale. */
  private val LrIters = 3
  private val LrRate = 0.5
  private val GScale = 1e8

  /** Per-doc features (x0 bias, x1 chars, x2 tokens, x3 marker
    * density) and the language label, from any documents-shaped frame
    * (doc_id, text, n_chars, lang) — shared with the streaming trainer
    * ([[graft.streaming.TrainStream]]). x3 is the langid marker-word
    * rate, so the trained model genuinely predicts the label rather
    * than fitting noise — TrainingSpec asserts the loss curve drops. */
  def featuresOf(documents: DataFrame): DataFrame = {
    val tk = TextAnalysis.tokCol(col("text"))
    documents.select(
      col("doc_id"),
      lit(1.0).as("x0"),
      (col("n_chars") / lit(500.0)).as("x1"),
      (size(tk) / lit(100.0)).as("x2"),
      // zero-token guard (the classifierScore convention): without it
      // 0/0 NULL-poisons the whole gradient row on Spark while DuckDB
      // would compute NaN — silent bias here, hash break there
      when(size(tk) === 0, lit(0.0))
        .otherwise((size(filter(tk, t => t === lit("order"))) * lit(1.0)) /
          size(tk)).as("x3"),
      when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0)).as("y"))
  }

  private def features(s: SparkSession, d: String): DataFrame =
    featuresOf(docs(s, d))

  /** One full-batch GD step at weights `w` over a features frame
    * (x0..x3, y): returns (updated weights, ENTERING mean logloss,
    * row count). The gradient/loss sums are fixed-point BIGINTs
    * (floor(term·1e8 + 0.5)), so the step is one map-side-combinable
    * aggregate whose result — and therefore the whole weight
    * trajectory — is independent of partitioning and engine. */
  def gdStep(f: DataFrame, w: Array[Double],
             lr: Double = LrRate): (Array[Double], Double, Long) = {
    require(w.length == 4, "gdStep trains the 4-feature model")
    val xs = w.indices.map(j => s"x$j")
    val z = xs.zipWithIndex.map { case (x, j) => col(x) * lit(w(j)) }
      .reduce(_ + _)
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val err = p - col("y")
    val loss = -(col("y") * log(p) + (lit(1.0) - col("y")) * log(lit(1.0) - p))
    val aggs =
      xs.map(x => sum(floor(err * col(x) * lit(GScale) + lit(0.5)))
        .as(s"g_$x")) :+
      sum(floor(loss * lit(GScale) + lit(0.5))).as("l") :+
      count(lit(1)).as("n")
    val r = f.agg(aggs.head, aggs.tail: _*).head()
    val nRows = r.getLong(xs.size + 1)
    // empty frame: sums are NULL and n = 0 — a step over nothing is
    // the identity, not an NPE (streaming micro-batches can be empty)
    if (nRows == 0) return (w.clone(), 0.0, 0L)
    val n = nRows.toDouble
    val meanLoss = (r.getLong(xs.size) / GScale) / n
    val w2 = w.indices.map(j =>
      w(j) - lr * ((r.getLong(j) / GScale) / n)).toArray
    (w2, meanLoss, nRows)
  }

  def queries: Map[String, QFn] = Map(
    // Overlapping retrieval chunks (the RAG indexing unit): windows of
    // C tokens every S tokens, last window clamped to the document
    // end; every document yields ≥ 1 chunk. Entirely scan-side — the
    // chunk count, coordinates, and text are projections over the
    // staged token array plus one Generate; no shuffle at any size.
    "text_chunk_overlap" -> ((s, d) => {
      val (c, st) = (ChunkC, ChunkS)
      docs(s, d)
        .select(col("doc_id"), TextAnalysis.tokCol(col("text")).as("tk"))
        .select(col("doc_id"), col("tk"),
          floor(greatest(size(col("tk")) - c + (st - 1), lit(0))
            .cast("double") / st).cast("int").as("kmax"))
        .select(col("doc_id"), col("tk"),
          explode(sequence(lit(0), col("kmax"))).as("k"))
        .select(col("doc_id"), (col("k") + 1).as("chunk_id"),
          (col("k") * st + 1).as("start_pos"),
          least(col("k") * st + c, size(col("tk"))).as("end_pos"),
          col("tk"))
        .select(col("doc_id"), col("chunk_id"), col("start_pos"),
          col("end_pos"),
          (col("end_pos") - col("start_pos") + 1).as("n_chunk_tokens"),
          array_join(slice(col("tk"), col("start_pos"),
            col("end_pos") - col("start_pos") + 1), " ").as("chunk_text"))
    }),

    // Fill-in-the-middle augmentation (PSM order): two content-hash
    // cut points split the token stream into prefix/middle/suffix and
    // the example is re-serialized prefix→suffix→middle with sentinel
    // tags — the standard code-model augmentation. Deterministic from
    // (doc_id) alone; scan-side only.
    "augment_fim" -> ((s, d) => {
      val h = (tag: String) =>
        conv(substring(md5(concat(lit(tag), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long")
      val n = size(col("tk"))
      docs(s, d)
        .select(col("doc_id"), TextAnalysis.tokCol(col("text")).as("tk"))
        .filter(n >= 3)
        .select(col("doc_id"), col("tk"), n.as("n_tokens"),
          (h("fim1:") % (n - 1) + 1).cast("int").as("cut1"))
        .select(col("doc_id"), col("tk"), col("n_tokens"), col("cut1"),
          (col("cut1") + (h("fim2:") % (col("n_tokens") - col("cut1"))) + 1)
            .cast("int").as("cut2"))
        .select(col("doc_id"), col("n_tokens"), col("cut1"), col("cut2"),
          concat(lit("<PRE> "),
            array_join(slice(col("tk"), lit(1), col("cut1")), " "),
            lit(" <SUF> "),
            array_join(slice(col("tk"), col("cut2") + 1,
              col("n_tokens") - col("cut2")), " "),
            lit(" <MID> "),
            array_join(slice(col("tk"), col("cut1") + 1,
              col("cut2") - col("cut1")), " ")).as("fim_text"))
    }),

    // In-engine trainer: LrIters full-batch GD steps of logistic
    // regression on the language label. Each step = one aggregate
    // (4 fixed-point gradient sums + 1 loss sum + the count), then a
    // driver-side 4-double weight update — the pagerank/BPE bounded-
    // iteration pattern. Output: per-iteration entering loss and
    // updated weights. TrainingSpec asserts the loss strictly falls.
    "classifier_train_logreg" -> ((s, d) => {
      val f = features(s, d).localCheckpoint()
      var w = Array.fill(4)(0.0)
      val rows = (1 to LrIters).map { it =>
        val (w2, meanLoss, _) = gdStep(f, w)
        w = w2
        Row(it, meanLoss, w(0), w(1), w(2), w(3))
      }
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("iter",
          org.apache.spark.sql.types.IntegerType) +:
        ("loss" +: (0 to 3).map(j => s"w_x$j")).map(nm =>
          org.apache.spark.sql.types.StructField(nm,
            org.apache.spark.sql.types.DoubleType)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .select(col("iter"), pround(col("loss"), 6).as("loss"),
          pround(col("w_x0"), 6).as("w_x0"), pround(col("w_x1"), 6).as("w_x1"),
          pround(col("w_x2"), 6).as("w_x2"), pround(col("w_x3"), 6).as("w_x3"))
    })
  )

  /** Feature CTE shared by the trainer oracle. */
  private val featSql: String = s"""
        tok AS (${TextAnalysis.tokCteSql}),
        f AS (
          SELECT t.doc_id,
                 1.0 AS x0,
                 d.n_chars / 500.0 AS x1,
                 len(t.tk) / 100.0 AS x2,
                 CASE WHEN len(t.tk) = 0 THEN 0.0
                      ELSE (len(list_filter(t.tk, x -> x = 'order')) * 1.0)
                        / len(t.tk) END AS x3,
                 CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS y
          FROM tok t JOIN documents d ON t.doc_id = d.doc_id)"""

  /** One unrolled GD round as CTEs: `g$i` folds the fixed-point
    * gradient/loss sums under the entering weights `w${i-1}`, `w$i`
    * holds the updated weights plus the entering mean loss. */
  private def gdRoundSql(i: Int): String = {
    val wp = s"w${i - 1}"
    val z = (0 to 3).map(j => s"(SELECT w$j FROM $wp) * x$j").mkString(" + ")
    val gs = (0 to 3).map(j =>
      s"SUM(CAST(floor((1.0 / (1.0 + exp(-($z))) - y) * x$j * $GScale + 0.5) AS BIGINT)) AS s$j").mkString(",\n                 ")
    s"""
        g$i AS MATERIALIZED (
          SELECT $gs,
                 SUM(CAST(floor(-(y * ln(1.0 / (1.0 + exp(-($z)))) +
                   (1.0 - y) * ln(1.0 - 1.0 / (1.0 + exp(-($z))))) *
                   $GScale + 0.5) AS BIGINT)) AS l,
                 COUNT(*) AS n
          FROM f),
        w$i AS MATERIALIZED (
          SELECT ${(0 to 3).map(j =>
            s"(SELECT w$j FROM $wp) - $LrRate * ((s$j / $GScale) / n) AS w$j")
            .mkString(", ")},
                 (l / $GScale) / n AS loss
          FROM g$i)"""
  }

  def oracles: Map[String, String] = Map(
    "text_chunk_overlap" -> s"""
        WITH tok AS (${TextAnalysis.tokCteSql}),
        base AS (
          SELECT doc_id, tk,
                 CAST(floor(greatest(len(tk) - $ChunkC + ${ChunkS - 1}, 0)
                   / $ChunkS.0) AS INTEGER) AS kmax
          FROM tok),
        ch AS (
          SELECT doc_id, tk, CAST(k AS INTEGER) AS k
          FROM (SELECT doc_id, tk, unnest(range(0, kmax + 1)) AS k
                FROM base))
        SELECT doc_id, k + 1 AS chunk_id,
               k * $ChunkS + 1 AS start_pos,
               CAST(least(k * $ChunkS + $ChunkC, len(tk)) AS INTEGER)
                 AS end_pos,
               CAST(least(k * $ChunkS + $ChunkC, len(tk)) - (k * $ChunkS + 1)
                 + 1 AS INTEGER) AS n_chunk_tokens,
               coalesce(array_to_string(tk[(k * $ChunkS + 1):
                 CAST(least(k * $ChunkS + $ChunkC, len(tk)) AS INTEGER)],
                 ' '), '') AS chunk_text
        FROM ch""",

    "augment_fim" -> s"""
        WITH tok AS (${TextAnalysis.tokCteSql}),
        c1 AS (
          SELECT doc_id, tk, CAST(len(tk) AS INTEGER) AS n_tokens,
                 CAST(CAST(('0x' || substr(md5('fim1:' ||
                     CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % (len(tk) - 1) + 1 AS INTEGER) AS cut1
          FROM tok WHERE len(tk) >= 3),
        c2 AS (
          SELECT doc_id, tk, n_tokens, cut1,
                 CAST(cut1 + CAST(('0x' || substr(md5('fim2:' ||
                     CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   % (n_tokens - cut1) + 1 AS INTEGER) AS cut2
          FROM c1)
        SELECT doc_id, n_tokens, cut1, cut2,
               '<PRE> ' || coalesce(array_to_string(tk[1:cut1], ' '), '') ||
               ' <SUF> ' ||
                 coalesce(array_to_string(tk[(cut2 + 1):n_tokens], ' '), '') ||
               ' <MID> ' ||
                 coalesce(array_to_string(tk[(cut1 + 1):cut2], ' '), '')
                 AS fim_text
        FROM c2""",

    "classifier_train_logreg" -> {
      val rounds = (1 to LrIters).map(gdRoundSql).mkString(",")
      val rows = (1 to LrIters).map(i =>
        s"""SELECT $i AS iter,
               floor((SELECT loss FROM w$i) * 1000000.0 + 0.5) / 1000000.0
                 AS loss,
               ${(0 to 3).map(j =>
                 s"floor((SELECT w$j FROM w$i) * 1000000.0 + 0.5) / 1000000.0 AS w_x$j")
                 .mkString(", ")}""").mkString("\n        UNION ALL\n        ")
      s"""
        WITH $featSql,
        w0 AS MATERIALIZED (SELECT 0.0 AS w0, 0.0 AS w1,
                            0.0 AS w2, 0.0 AS w3),
        $rounds
        $rows"""
    }
  )
}
