package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multidimensional data layout: Morton/z-order clustering of the
  * transcript store on (conversation, time) so BOTH predicate families —
  * per-conversation reads (sits_get_data's series assembly) and time-range
  * scans (the tier rollups) — skip files. A store range-partitioned on
  * conv_id alone answers conv lookups with one file but forces time-range
  * queries to touch every file (and vice versa for a pure time sort);
  * interleaving the bits of the two dimensions bounds BOTH spans per file
  * (the Iceberg/Delta `ZORDER BY` layout strategy, built here from plain
  * Catalyst bit expressions — no UDF, fully codegen).
  *
  * Scale shape: [[zValue]] is a pure per-row expression (a fixed sum of
  * `2·bits` shift/mask terms — whole-stage-codegen folds it into one
  * compiled method); [[clusterByZ]] is ONE range repartition by z (the
  * same shuffle any layout rewrite pays) + an intra-partition sort, so a
  * 100 TB compaction is a single total-order-free pass: range boundaries
  * come from Spark's reservoir sampling of z, never a global sort.
  */
object Layout {

  /** Morton z-value: interleave the low `bits` bits of `a` (odd positions)
    * and `b` (even positions) into a `2·bits`-bit key. Inputs are masked
    * to `bits` bits first, so any long-valued dimension cell index is
    * accepted. Pure integer bit arithmetic — deterministic cross-engine,
    * no rounding contract.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits in [1,31]")
    val mask = (1L << bits) - 1
    val am = a.cast("long").bitwiseAND(lit(mask))
    val bm = b.cast("long").bitwiseAND(lit(mask))
    (0 until bits).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i)
    }.reduce(_ + _)
  }

  /** Dimension cells for the transcript store: a stable conversation hash
    * cell (u32-md5 folded to `bits` bits — uniform regardless of conv_id
    * skew in the id space) and a time cell (hours since epoch, low `bits`
    * bits — adjacent hours stay adjacent within a 2^bits-hour wrap
    * window, which is what bounds a file's time span).
    */
  def transcriptZ(df: DataFrame, bits: Int = 16): DataFrame =
    df.withColumn("conv_cell",
        Accuracy.u32Md5(col("conv_id")).bitwiseAND(lit((1L << bits) - 1)))
      .withColumn("time_cell",
        floor(unix_millis(col("ts").cast("timestamp")) / lit(3600000L))
          .bitwiseAND(lit((1L << bits) - 1)))
      .withColumn("z", zValue(col("conv_cell"), col("time_cell"), bits))

  /** Cluster a DataFrame into `numFiles` z-ordered output partitions:
    * range-partition on the z key (reservoir-sampled boundaries — no
    * global sort) and sort within each partition, so every output file
    * covers one compact z range ⇒ a bounded rectangle set in
    * (conv, time) space ⇒ min/max file stats prune on EITHER dimension.
    */
  def clusterByZ(df: DataFrame, numFiles: Int, bits: Int = 16): DataFrame =
    transcriptZ(df, bits)
      .repartitionByRange(numFiles, col("z"))
      .sortWithinPartitions("z")
}
