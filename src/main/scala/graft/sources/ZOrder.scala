package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: cluster a table on TWO filter
  * dimensions at once so parquet min/max statistics prune files and
  * row groups for predicates on EITHER column.
  *
  * Why this exists at 100 TB: hive partitioning prunes on the
  * partition columns only, and a plain sort clusters the leading sort
  * key only — a table sorted by `state` answers `state = 'GA'` from
  * few files but scans everything for `code = '99213'`. Interleaving
  * the bits of both columns' 16-bit ranks gives every file a narrow
  * min/max envelope in BOTH dimensions (each file covers a small
  * square of the key space instead of a thin full-width stripe), so
  * data skipping works for both single-column predicates — the same
  * trade Delta/Iceberg `ZORDER BY` makes, built here from plain
  * column expressions (shifts/masks, fully codegen'd).
  *
  * The scale shape: one tiny min/max aggregate over the two columns
  * (scan-side, no shuffle), then ONE range shuffle on the z-key and a
  * per-partition sort — the same cost as any global sort-on-write.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` so a bit at position i lands at 2i
    * (the classic Morton magic-number cascade, as column arithmetic). */
  private def spread16(v: Column): Column = {
    val s0 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s1 = (s0.bitwiseOR(shiftleft(s0, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** Scale a numeric column to a 16-bit rank against fixed bounds.
    * Values outside [min, max] clamp to the edge cells. */
  private def rank16(v: Column, min: Double, max: Double): Column = {
    val span = if (max > min) max - min else 1.0
    least(greatest(
      ((v.cast("double") - min) / span * 65535.0).cast("long"), lit(0L)),
      lit(65535L))
  }

  /** The 32-bit Morton key interleaving two columns' 16-bit ranks.
    * Bounds are passed in (from a prior min/max aggregate) so the
    * expression stays a pure projection. */
  def zkey(a: Column, aMin: Double, aMax: Double,
           b: Column, bMin: Double, bMax: Double): Column =
    spread16(rank16(a, aMin, aMax))
      .bitwiseOR(shiftleft(spread16(rank16(b, bMin, bMax)), 1))

  /** THE Morton interleave, shared by every z-ordering in the repo:
    * rank j's bit i lands at z-bit i·k + j. Inputs are 0-based cell
    * ids < 2^bits (however derived — [[zkeyN]] scales against fixed
    * bounds, [[graft.operators.Layout]] buckets by quantiles). Plain
    * column arithmetic, fully codegen'd. */
  def interleave(ranks: Seq[Column], bits: Int): Column = {
    val k = ranks.size
    (for {
      i <- 0 until bits
      (r, j) <- ranks.zipWithIndex
    } yield shiftleft(
      shiftright(r.cast("long"), i).bitwiseAND(lit(1L)), i * k + j))
      .reduce(_.bitwiseOR(_))
  }

  /** N-column Morton key: column j's rank bit i lands at position
    * i·k + j, so for k = 2 this is bit-identical to [[zkey]] (pinned
    * by ZOrderSpec). Rank width shrinks to ⌊63 / k⌋ bits (≤ 16) so the
    * key stays in a positive long. */
  def zkeyN(cols: Seq[(Column, Double, Double)]): Column = {
    require(cols.size >= 2, "zkeyN needs at least 2 columns")
    val bits = math.min(16, 63 / cols.size)
    interleave(cols.map { case (c, mn, mx) =>
      val span = if (mx > mn) mx - mn else 1.0
      val maxCell = (1L << bits) - 1
      least(greatest(
        ((c.cast("double") - mn) / span * maxCell).cast("long"), lit(0L)),
        lit(maxCell))
    }, bits)
  }

  /** Cluster `df` on the Morton key of (`colA`, `colB`) into
    * `numFiles` range partitions, each internally sorted — the layout
    * a z-ordered write produces. Bounds come from one scan-side
    * min/max aggregate (collected scalars; no shuffle). Delegates to
    * [[clusterN]] — ZOrderSpec pins `zkeyN` at k = 2 bit-identical to
    * the specialized [[zkey]] cascade. */
  def cluster(df: DataFrame, colA: String, colB: String,
              numFiles: Int): DataFrame =
    clusterN(df, Seq(colA, colB), numFiles)

  /** N-column clustering via [[zkeyN]]. Null bounds (empty input, or
    * an all-null / non-castable column) degrade to [0, 0] — every row
    * lands in cell 0 for that dimension instead of throwing, so a
    * possibly-empty incremental delta clusters as a no-op. */
  def clusterN(df: DataFrame, cols: Seq[String],
               numFiles: Int): DataFrame = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    def bound(i: Int): Double = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
    df.withColumn("_zkey", zkeyN(cols.zipWithIndex.map { case (c, j) =>
        (col(c), bound(2 * j), bound(2 * j + 1))
      }))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
  }

  /** Z-ordered parquet write: `cluster` then write, one file per range
    * partition. Filters on either clustered column then prune files
    * and row groups via parquet min/max stats (asserted by
    * ZOrderSpec's per-file envelope measurement). */
  def write(df: DataFrame, colA: String, colB: String, numFiles: Int,
            outPath: String): Unit =
    cluster(df, colA, colB, numFiles)
      .write.mode("overwrite").option("compression", "zstd")
      .parquet(outPath)
}
