package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SeriesKernels
import graft.model.Tier

/** Fused regularize→gap-fill→rollup kernels — the 100 TB execution shape.
  *
  * Input is [[Regularize.firstValid]] output: one row per *observed*
  * (conv, fine-bucket), already shrunk by map-side partial aggregation. The
  * dense per-conversation grid (|timeline| slots, e.g. 43 200 for 30 d of 1m)
  * is materialized ONLY inside the group kernel as a primitive double array;
  * it never hits a shuffle. Output is one row per (conv, coarse bucket) —
  * 60-1440× smaller than the grid.
  *
  * Why not relational groupBy over the dense grid: at sf0.1 that plan turns
  * into a 62.9M-row ObjectHashAggregate with per-group percentile buffers
  * (sort-based fallback + spill ⇒ 409 s); this kernel computes identical
  * stats in-place per conversation (4-6 s). At 10^12 turns the difference is
  * the job existing or not: the only large shuffle left is the firstValid
  * partial agg, whose width is bounded by observed buckets, with hot-conv
  * skew absorbed map-side (SURVEY.md §2.3, §4-skew).
  *
  * Numeric contract: raw doubles are emitted by the kernel; rounding/null
  * guards are applied afterwards as Catalyst expressions IDENTICAL to
  * [[Rollup.rollup]]'s, so results match the declarative path bit-for-bit
  * (property-tested) and hence the DuckDB oracle.
  */
object SeriesRollup {

  /** Sort observations, build the dense fine grid, gap-fill
    * (impute_linear semantics). Returns (t0 epoch ms, filled values).
    */
  private[operators] def filledGrid(obs0: Array[(String, Long, Option[Double])],
      step: Long): (Long, Array[Double]) = {
    val obs = obs0
    scala.util.Sorting.stableSort(obs, (a: (String, Long, Option[Double]),
        b: (String, Long, Option[Double])) => a._2 < b._2)
    val t0 = obs.head._2
    val n = ((obs.last._2 - t0) / step + 1).toInt
    val vs = Array.fill(n)(Double.NaN)
    obs.foreach { o => vs(((o._2 - t0) / step).toInt) = o._3.getOrElse(Double.NaN) }
    (t0, SeriesKernels.imputeLinearInPlace(vs)) // vs is fresh — mutate, don't clone
  }

  /** Spark `percentile`-compatible linear interpolation (Hyndman-Fan 7,
    * weighted-endpoint operand order as in Catalyst's Percentile.getPercentile
    * — the same arithmetic DuckDB's quantile_cont performs, verified by the
    * oracle compare).
    */
  private def quantile7(sorted: Array[Double], p: Double): Double = {
    val n = sorted.length
    if (n == 1) return sorted(0)
    val pos = (n - 1) * p
    val lo = math.floor(pos).toInt
    val hi = math.ceil(pos).toInt
    if (lo == hi) sorted(lo)
    else sorted(lo) * (hi - pos) + sorted(hi) * (pos - lo)
  }

  private val statCols = Seq("n", "sum0", "mean0", "min0", "max0", "std0",
    "med0", "fqr0", "tqr0")

  /** Per-(conv, coarse bucket) raw stats from the fused kernel. */
  private def rawStats(spark: SparkSession, firstValid: DataFrame,
      fine: Tier, coarse: Tier): DataFrame = {
    import spark.implicits._
    val step = fine.millis
    val cs = coarse.millis
    firstValid
      .select(col("conv_id"), unix_millis(col("bucket_ts")).as("t"),
        col("value").cast("double").as("v"))
      .as[(String, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        val (t0, v) = filledGrid(it.toArray, step)
        val out = Vector.newBuilder[(String, Long, Long, Option[Double],
          Option[Double], Option[Double], Option[Double], Option[Double],
          Option[Double], Option[Double], Option[Double])]
        var i = 0
        while (i < v.length) {
          val t = t0 + i * step
          val b = t - t % cs // UTC fixed-width buckets ⇒ date_trunc equivalent
          var j = i
          while (j < v.length && t0 + j * step < b + cs) j += 1
          // non-NaN values of this bucket, in time order
          var c = 0
          var k = i
          while (k < j) { if (!v(k).isNaN) c += 1; k += 1 }
          if (c == 0) {
            out += ((conv, b, 0L, None, None, None, None, None, None, None, None))
          } else {
            val vals = new Array[Double](c)
            var m = 0; k = i
            while (k < j) { if (!v(k).isNaN) { vals(m) = v(k); m += 1 }; k += 1 }
            var sum = 0.0; var mn = vals(0); var mx = vals(0)
            k = 0
            while (k < c) {
              val x = vals(k); sum += x
              if (x < mn) mn = x; if (x > mx) mx = x
              k += 1
            }
            val mean = sum / c
            val std = if (c > 1) {
              var s2 = 0.0; k = 0
              while (k < c) { val d = vals(k) - mean; s2 += d * d; k += 1 }
              Some(math.sqrt(s2 / (c - 1)))
            } else None
            val sorted = vals.clone(); java.util.Arrays.sort(sorted)
            out += ((conv, b, c.toLong, Some(sum), Some(mean), Some(mn), Some(mx),
              std, Some(quantile7(sorted, 0.5)), Some(quantile7(sorted, 0.25)),
              Some(quantile7(sorted, 0.75))))
          }
          i = j
        }
        out.result().iterator
      }
      .toDF(("conv_id" +: "b" +: statCols): _*)
      .withColumn("bucket_ts", timestamp_millis(col("b"))).drop("b")
  }

  private def r4(c: org.apache.spark.sql.Column) = round(c + lit(1e-9), 4)

  /** Fused fill + full t_* rollup — same columns/semantics as
    * [[Rollup.rollup]] applied to [[GapFill.fillDense]] output.
    */
  def rollupDense(spark: SparkSession, firstValid: DataFrame,
      fine: Tier, coarse: Tier): DataFrame =
    rawStats(spark, firstValid, fine, coarse).select(
      col("conv_id"), col("bucket_ts"), col("n"),
      r4(col("sum0")).as("sum_v"),
      r4(col("mean0")).as("mean_v"),
      col("min0").as("min_v"), col("max0").as("max_v"),
      when(col("n") > 1, r4(col("std0"))).otherwise(lit(null).cast("double")).as("std_v"),
      col("med0").as("med_v"), col("fqr0").as("fqr_v"), col("tqr0").as("tqr_v"),
      r4(col("max0") - col("min0")).as("amp_v"),
      (col("tqr0") - col("fqr0")).as("iqr_v"))

  /** Fused fill + algebraic tier state — same columns as [[Rollup.tierState]]
    * applied to the dense filled grid; feeds [[Rollup.cascade]].
    */
  def stateDense(spark: SparkSession, firstValid: DataFrame,
      fine: Tier, coarse: Tier): DataFrame = {
    import spark.implicits._
    val step = fine.millis
    val cs = coarse.millis
    firstValid
      .select(col("conv_id"), unix_millis(col("bucket_ts")).as("t"),
        col("value").cast("double").as("v"))
      .as[(String, Long, Option[Double])]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        val (t0, v) = filledGrid(it.toArray, step)
        val out = Vector.newBuilder[(String, Long, Long, Option[Double],
          Option[Double], Option[Double], Option[Double])]
        var i = 0
        while (i < v.length) {
          val t = t0 + i * step
          val b = t - t % cs
          var j = i
          while (j < v.length && t0 + j * step < b + cs) j += 1
          var c = 0L; var sum = 0.0; var sum2 = 0.0
          var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
          var k = i
          while (k < j) {
            val x = v(k)
            if (!x.isNaN) {
              c += 1; sum += x; sum2 += x * x
              if (x < mn) mn = x; if (x > mx) mx = x
            }
            k += 1
          }
          out += ((conv, b, c,
            if (c > 0) Some(sum) else None, if (c > 0) Some(sum2) else None,
            if (c > 0) Some(mn) else None, if (c > 0) Some(mx) else None))
          i = j
        }
        out.result().iterator
      }
      .toDF("conv_id", "b", "n", "sum_v", "sum2_v", "min_v", "max_v")
      .withColumn("bucket_ts", timestamp_millis(col("b"))).drop("b")
      .select("conv_id", "bucket_ts", "n", "sum_v", "sum2_v", "min_v", "max_v")
  }

  /** [[stateDense]] plus the ≤64-cell power-of-two value histogram
    * ([[graft.model.HistCell]]) per (conv, coarse bucket) — the
    * quantile-bearing tier state. The histogram is built inside the same
    * group kernel (one extra O(1) bit-length per value, no extra shuffle)
    * using the exact integer contract of [[Summary.log2Bucket]]
    * (`v.toLong`, bucket −1 for v ≤ 0), so cascaded histograms merge
    * bit-identically with the batch/streaming log2 paths. Feeds
    * [[Rollup.cascadeHist]]/[[Rollup.histQuantiles]]: p50/p90/p99 upper
    * bounds remain answerable at 1d/1mo after raw/1m expiry.
    */
  def stateDenseHist(spark: SparkSession, firstValid: DataFrame,
      fine: Tier, coarse: Tier): DataFrame =
    stateDenseHistMulti(spark,
      firstValid.select(col("conv_id"), col("bucket_ts"),
        col("value").as("__m0")), fine, coarse, Seq("__m0"))
      .drop("metric")
      .select("conv_id", "bucket_ts", "n", "sum_v", "sum2_v", "min_v",
        "max_v", "hist")

  /** Multi-band [[stateDenseHist]]: every metric column of a
    * [[Regularize.firstValidAll]] relation is gap-filled and rolled in ONE
    * group pass — the raw turns are scanned and shuffled once total, like
    * the reference's one-read-serves-all-bands job list
    * (api_gdalcubes.R:506-513: tile×band×time jobs, one image read per
    * tile). Output carries a `metric` dimension column; downstream
    * [[Rollup.cascadeHist]]/[[Rollup.histQuantiles]] auto-include it in
    * their grouping keys.
    */
  def stateDenseHistMulti(spark: SparkSession, firstValid: DataFrame,
      fine: Tier, coarse: Tier, metrics: Seq[String]): DataFrame = {
    require(metrics.nonEmpty, "no metric columns")
    import spark.implicits._
    val step = fine.millis
    val cs = coarse.millis
    val names = metrics.toArray
    firstValid
      .select(col("conv_id"), unix_millis(col("bucket_ts")).as("t"),
        array(metrics.map(m => col(m).cast("double")): _*).as("vs"))
      .as[(String, Long, Seq[Option[Double]])]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        val rows = it.toArray
        val out = Vector.newBuilder[(String, String, Long, Long,
          Option[Double], Option[Double], Option[Double], Option[Double],
          Seq[graft.model.HistCell])]
        var mi = 0
        while (mi < names.length) {
          val obs = rows.map(r => (r._1, r._2, r._3(mi)))
          val (t0, v) = filledGrid(obs, step)
          var i = 0
          while (i < v.length) {
            val t = t0 + i * step
            val b = t - t % cs
            var j = i
            while (j < v.length && t0 + j * step < b + cs) j += 1
            var c = 0L; var sum = 0.0; var sum2 = 0.0
            var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
            val hist = new Array[Long](65) // slot 0 ↔ hb=−1, slot s ↔ hb=s−1
            var k = i
            while (k < j) {
              val x = v(k)
              if (!x.isNaN) {
                c += 1; sum += x; sum2 += x * x
                if (x < mn) mn = x; if (x > mx) mx = x
                val lv = x.toLong // cast contract of Summary.log2Bucket
                val hb = if (lv <= 0) -1
                         else 63 - java.lang.Long.numberOfLeadingZeros(lv)
                hist(hb + 1) += 1
              }
              k += 1
            }
            val cells = (0 until 65).iterator
              .filter(hist(_) > 0)
              .map(s => graft.model.HistCell(s - 1, hist(s)))
              .toSeq
            out += ((conv, names(mi), b, c,
              if (c > 0) Some(sum) else None, if (c > 0) Some(sum2) else None,
              if (c > 0) Some(mn) else None, if (c > 0) Some(mx) else None,
              cells))
            i = j
          }
          mi += 1
        }
        out.result().iterator
      }
      .toDF("conv_id", "metric", "b", "n", "sum_v", "sum2_v", "min_v",
        "max_v", "hist")
      .withColumn("bucket_ts", timestamp_millis(col("b"))).drop("b")
      .select("conv_id", "metric", "bucket_ts", "n", "sum_v", "sum2_v",
        "min_v", "max_v", "hist")
  }
}
