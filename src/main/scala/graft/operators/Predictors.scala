package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML-support operators ≙ the reference's predictors machinery
  * (/root/reference/R/api_predictors.R:12-45 pivot,
  * api_predictors.R:124-132 + src/normalize_data.cpp quantile min-max).
  * The engine's contract with external trainers is this wide matrix.
  */
object Predictors {

  /** Pivot a (conv, bucket_ts, value) series to one wide row per conv with
    * columns `<prefix>0..<prefix>(k-1)` for the first k timeline positions —
    * conditional aggregation (deterministic, partially aggregable), not
    * `pivot()` whose column discovery would need an extra pass.
    * `indexOf` must map bucket_ts → 0-based timeline index.
    */
  def pivotWide(series: DataFrame, indexOf: Column, k: Int,
      prefix: String = "t"): DataFrame = {
    val idx = series.withColumn("__i", indexOf)
    idx.groupBy("conv_id")
      .agg(
        max(when(col("__i") === 0, col("value"))).as(s"${prefix}0"),
        (1 until k).map(i =>
          max(when(col("__i") === i, col("value"))).as(s"$prefix$i")): _*)
  }

  /** EXACT type-7 quantiles computed partition-parallel — no single reducer
    * ever buffers all values (Spark's `percentile` aggregate does: its final
    * merge holds the full value multiset on one task, a scale-killer at
    * 10^12 rows). Algorithm: global range-sort (RangePartitioning exchange =
    * the parallel sort), per-partition counts → driver-side offsets (one
    * long per partition), then the ≤2·|ps| boundary ranks are located by
    * (partition, local row_number) and only those rows are collected.
    * Interpolation is Spark `percentile`'s own formula
    * `(hi−pos)·v_lo + (pos−lo)·v_hi` — bit-identical to DuckDB
    * `quantile_cont`, so oracles need no tolerance.
    */
  def exactQuantiles(df: DataFrame, colName: String, ps: Seq[Double]): Seq[Double] = {
    import org.apache.spark.sql.expressions.Window
    val parts = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // cache the value projection BEFORE range partitioning: the range
    // sampler, the counts job, and the rank-fetch job each read the input —
    // uncached, that is three recomputations of the whole upstream pipeline
    val vals = df.select(col(colName).cast("double").as("v"))
      .filter(col("v").isNotNull).persist()
    val ranged = vals
      .repartitionByRange(parts, col("v"))
      .withColumn("pid", spark_partition_id())
      .persist()
    try {
      val counts = ranged.groupBy("pid").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      val n = counts.values.sum
      require(n > 0, s"exactQuantiles($colName): empty input")
      var cum = 0L
      val offsets = counts.keys.toSeq.sorted.map { p =>
        val o = p -> cum; cum += counts(p); o
      }.toMap
      val positions = ps.map(_ * (n - 1))
      val ranks = positions.flatMap(q =>
        Seq(math.floor(q).toLong, math.ceil(q).toLong)).distinct
      val offsetCol = offsets.foldLeft(lit(0L)) { case (acc, (p, o)) =>
        when(col("pid") === p, lit(o)).otherwise(acc)
      }
      // window partitioned by pid: a parallel per-partition scan, NOT a
      // global single-partition window
      val w = Window.partitionBy("pid").orderBy("v")
      val byRank = ranged
        .withColumn("gidx", row_number().over(w).cast("long") - 1 + offsetCol)
        .filter(col("gidx").isin(ranks: _*))
        .collect().map(r => r.getAs[Long]("gidx") -> r.getAs[Double]("v")).toMap
      positions.map { q =>
        val (lo, hi) = (math.floor(q).toLong, math.ceil(q).toLong)
        if (lo == hi) byRank(lo)
        else (hi - q) * byRank(lo) + (q - lo) * byRank(hi)
      }
    } finally { ranged.unpersist(); vals.unpersist(); () }
  }

  /** Quantile min-max normalization (api_predictors.R:124-132): per-column
    * Q02/Q98 stats job ([[exactQuantiles]] — partition-parallel exact, no
    * single-reducer percentile), then (v−q02)/(q98−q02) clamped to [1e-4, 1]
    * with the stats folded in as literals (no join at all on the data side).
    */
  def normalizeQ(series: DataFrame): DataFrame = {
    // exactQuantiles persists its own 1-column projection for the duration
    // of the stats pass (and releases it), so the stats jobs read upstream
    // once; the returned plan reads the ORIGINAL series — no cache handle
    // escapes this function, so repeated invocations leak nothing.
    val Seq(q02, q98) = exactQuantiles(series, "value", Seq(0.02, 0.98))
    series.select(col("conv_id"), col("bucket_ts"),
      round(greatest(lit(1e-4), least(lit(1.0),
        (col("value") - lit(q02)) / (lit(q98) - lit(q02)))) + lit(1e-9), 4)
        .as("v_norm"))
  }
}
