package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.MediaIn

/** Training-prep operators (chunking / FIM / in-engine GD trainer) and
  * the real WAV audio codec seam. The DuckDB oracles pin exact values;
  * these specs pin the structural invariants that a hash can't express
  * (loss actually falls, FIM reassembles, chunks tile, codec
  * roundtrips). */
class TrainingSpec extends SparkSpec {

  /** The shared [[graft.operators.TextAnalysis.tokCol]] tokenizer,
    * restated (it is operators-private; drift would fail these specs
    * the same way it would fail the oracles). */
  private def tok(t: org.apache.spark.sql.Column) =
    filter(split(regexp_replace(lower(t), "[^a-z0-9 ]", " "), "\\s+"),
      v => length(v) > 0)

  test("logreg trainer: loss falls every iteration and the marker weight learns the label") {
    val rows = SparkEntry.queries("classifier_train_logreg")(spark, sf0001)
      .orderBy("iter").collect()
    assert(rows.length == 3)
    val losses = rows.map(_.getDouble(1))
    assert(losses.sliding(2).forall { case Array(a, b) => b < a },
      s"loss did not strictly fall: ${losses.mkString(", ")}")
    // entering loss of iteration 1 is exactly ln 2 (all-zero weights
    // ⇒ p = 0.5 for every row); by iteration 3 the model must be
    // measurably better than that chance floor
    assert(math.abs(losses.head - math.log(2.0)) < 1e-4)
    assert(losses.last < math.log(2.0) - 0.01,
      s"no learning signal: final loss ${losses.last}")
    // and the step must actually move the weights
    assert((2 to 5).exists(i => math.abs(rows.last.getDouble(i)) > 1e-3))
  }

  test("fim: prefix+middle+suffix reassemble the original token stream") {
    val fim = SparkEntry.queries("augment_fim")(spark, sf0001)
    val orig = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"),
        concat_ws(" ", tok(col("text"))).as("toks"))
    // re-split PSM order back to PMS and compare with the tokenized doc
    val rebuilt = fim.select(col("doc_id"),
      regexp_extract(col("fim_text"), "^<PRE> (.*) <SUF> (.*) <MID> (.*)$", 1)
        .as("p"),
      regexp_extract(col("fim_text"), "^<PRE> (.*) <SUF> (.*) <MID> (.*)$", 2)
        .as("s"),
      regexp_extract(col("fim_text"), "^<PRE> (.*) <SUF> (.*) <MID> (.*)$", 3)
        .as("m"))
      .select(col("doc_id"),
        concat_ws(" ", filter(array(col("p"), col("m"), col("s")),
          x => length(x) > 0)).as("re"))
    val bad = rebuilt.join(orig, "doc_id")
      .filter(col("re") =!= col("toks")).count()
    assert(bad == 0, s"$bad docs failed FIM reassembly")
  }

  test("chunks tile the document: stride starts, clamped tail, full coverage") {
    val ch = SparkEntry.queries("text_chunk_overlap")(spark, sf0001)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        min("start_pos").as("first_start"),
        max("end_pos").as("last_end"),
        max(col("start_pos") - (col("chunk_id") - 1) * 24).as("stride_chk"),
        min(col("end_pos") - col("start_pos") + 1).as("min_len"),
        max(col("end_pos") - col("start_pos") + 1).as("max_len"))
    val toks = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), size(tok(col("text"))).as("n"))
    val j = ch.join(toks, "doc_id")
    assert(j.filter(col("first_start") =!= 1).count() == 0)
    assert(j.filter(col("stride_chk") =!= 1).count() == 0,
      "start_pos != (chunk_id-1)*stride + 1 somewhere")
    assert(j.filter(col("last_end") =!= col("n")).count() == 0,
      "last chunk does not reach the document end")
    assert(j.filter(col("max_len") > 32).count() == 0)
  }

  test("wav codec roundtrip: decoded features equal the PCM recurrence") {
    val id = 8L // step = 8 % 7 + 1 = 2
    val f = Multimodal.decodeAudioOne(MediaIn(id, Multimodal.synthWav(id)))
    assert(f.sample_rate == 8000 && f.channels == 1 && f.n_frames == 800)
    assert(f.duration_ms == 100)
    // replay the recurrence directly
    val samples = (0 until 800).map(i => ((i.toLong * 2) % 201 - 100).toInt)
    assert(f.peak == samples.map(math.abs).max)
    val zc = samples.sliding(2).count { case Seq(a, b) => a.toLong * b < 0 }
    assert(f.zero_crossings == zc)
    val rms = math.floor(math.sqrt(
      samples.map(s => s.toLong * s).sum.toDouble / 800) * 1e4 + 0.5) / 1e4
    assert(f.rms == rms)
  }

  test("gif video codec roundtrip: sampled frames carry exact pixel stats") {
    val id = 13L
    val frames = Multimodal.decodeVideoFrames(
      MediaIn(id, Multimodal.synthVideo(id))).toVector
    // stride 2 over 4 container frames
    assert(frames.map(_.frame_id) == Vector(0, 2))
    frames.foreach { fr =>
      assert(fr.width == 8 && fr.height == 8)
      val px = for (y <- 0 until 8; x <- 0 until 8)
        yield ((x + 8 * y + 7L * fr.frame_id + id) % 256).toInt
      assert(fr.gray_sum == px.map(_.toLong).sum,
        s"frame ${fr.frame_id}: palette roundtrip changed pixels")
      assert(fr.min_gray == px.min && fr.max_gray == px.max)
    }
    // corrupt/non-gif payloads sample to nothing, not an exception
    assert(Multimodal.decodeVideoFrames(
      MediaIn(1L, "GIF8 but not really".getBytes("UTF-8"))).isEmpty)
    assert(Multimodal.decodeVideoFrames(
      MediaIn(1L, Array[Byte](1, 2, 3))).isEmpty)
  }

  test("stereo wav roundtrip: per-channel decode, not an interleaved mix") {
    val id = 12L // L step = 12%7+1 = 6; R step = 13%7+1 = 7
    val f = Multimodal.decodeAudioOne(
      MediaIn(id, Multimodal.synthWavStereo(id)))
    assert(f.sample_rate == 8000 && f.channels == 2 && f.n_frames == 800)
    assert(f.duration_ms == 100)
    def wave(seed: Long) =
      (0 until 800).map(i => ((i.toLong * (seed % 7 + 1)) % 201 - 100).toInt)
    val (l, r) = (wave(id), wave(id + 1))
    assert(f.peak == (l ++ r).map(math.abs).max)
    // crossings are per channel, summed — the interleaved stream's
    // sign flips between L and R must NOT count
    def zc(s: Seq[Int]) = s.sliding(2).count { case Seq(a, b) => a.toLong * b < 0 }
    assert(f.zero_crossings == zc(l) + zc(r),
      "zero crossings not de-interleaved per channel")
    val all = l ++ r
    val rms = math.floor(math.sqrt(
      all.map(s => s.toLong * s).sum.toDouble / 1600) * 1e4 + 0.5) / 1e4
    assert(f.rms == rms)
  }

  test("wav codec: truncated payload and non-wav payload fall to the stub, not a crash") {
    val good = Multimodal.synthWav(3L)
    val truncated = good.take(30) // RIFF/WAVE magic intact, body gone
    val t = Multimodal.decodeAudioOne(MediaIn(3L, truncated))
    assert(t.sample_rate == -1, "truncated WAV must take the stub path")
    val nonWav = Multimodal.decodeAudioOne(
      MediaIn(4L, "plain text bytes".getBytes("UTF-8")))
    assert(nonWav.sample_rate == -1)
  }
}
