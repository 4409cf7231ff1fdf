package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-series mining kernels over the per-conversation DAY series —
  * quadratic-in-series-length algorithms that are only sane because the
  * series dimension is calendar-bounded (a conv's day-series length is
  * ≤ the retention horizon in days, a few hundred at most), while the
  * CONVERSATION dimension carries the corpus scale. Both operators are
  * one conv_id shuffle + an O(n²) typed fold per series: at 10^12 turns
  * the day-series relation is |convs|·days rows and each kernel touches
  * only its own ≤few-hundred-point array — embarrassingly parallel, no
  * cross-series traffic.
  *
  * Exactness contracts (so the DuckDB oracle can replay bit-for-bit):
  *  - [[discord]] scales the 4-dp day values to integer ten-thousandths
  *    (round(v·10⁴) as long) and does ALL distance math in integers.
  *  - [[theilSen]] quantizes every pairwise slope to 4 dp (with +0.0
  *    negative-zero normalization on both engines) BEFORE the sort, and
  *    defines the estimate as the LOWER MEDIAN (element ⌊(m−1)/2⌋ of the
  *    sorted slope list) — a deterministic pick, no midpoint averaging.
  */
object SeriesMining {

  private def r4d(v: Double): Double =
    new java.math.BigDecimal(v + 1e-9)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Top-1 discord (the matrix-profile argmax; Yeh et al. ICDM 2016) with
    * subsequence length `w` over the position-ordered day series: for each
    * of the m = n−w+1 subsequences, the nearest-neighbor distance² to any
    * NON-OVERLAPPING subsequence (|i−j| ≥ w); the discord is the
    * subsequence maximizing that distance (ties → smallest position).
    * Raw (unnormalized) Euclidean on integer ten-thousandths — the
    * anomaly-hunting face of the series battery: the discord is the most
    * isolated shape in the series. Series with n < 2w (no non-overlapping
    * pair) are excluded. Output: (conv_id, n_days, disc_pos, nn_dist2)
    * with nn_dist2 in integer (10⁻⁴ value units)².
    */
  def discord(daySeries: DataFrame, w: Int): DataFrame = {
    require(w >= 2, "w >= 2")
    val spark = daySeries.sparkSession
    import spark.implicits._
    daySeries
      .select(col("conv_id").cast("string"), col("idx").cast("int"),
        col("value").cast("double"))
      .as[(String, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        val rows = it.toArray.sortBy(_._2)
        val n = rows.length
        if (n < 2 * w) Iterator.empty
        else {
          val v = rows.map(r => math.round(r._3 * 10000.0))
          val m = n - w + 1
          var bestPos = -1; var bestNn = -1L
          var i = 0
          while (i < m) {
            var nn = Long.MaxValue
            var j = 0
            while (j < m) {
              if (math.abs(i - j) >= w) {
                var d = 0L; var k = 0
                while (k < w) {
                  val df = v(i + k) - v(j + k); d += df * df; k += 1
                }
                if (d < nn) nn = d
              }
              j += 1
            }
            if (nn > bestNn) { bestNn = nn; bestPos = i + 1 }
            i += 1
          }
          Iterator.single((conv, n.toLong, bestPos, bestNn))
        }
      }
      .toDF("conv_id", "n_days", "disc_pos", "nn_dist2")
  }

  /** Theil-Sen robust trend (Theil 1950, Sen 1968): the lower median of
    * all C(n,2) pairwise slopes (v_j − v_i)/(idx_j − idx_i) over the
    * CALENDAR day index (gaps count — a 3-day gap flattens the pair's
    * slope), plus the matching lower-median intercept of
    * (v_i − slope·idx_i). The breakdown-point-0.29 companion of the OLS
    * [[SeriesOps.olsTrend]]. Series need n ≥ 2 distinct days. Output:
    * (conv_id, n_days, n_pairs, slope, intercept).
    */
  def theilSen(daySeries: DataFrame): DataFrame = {
    val spark = daySeries.sparkSession
    import spark.implicits._
    daySeries
      .select(col("conv_id").cast("string"), col("idx").cast("int"),
        col("value").cast("double"))
      .as[(String, Int, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (conv, it) =>
        val rows = it.toArray.sortBy(_._2)
        val n = rows.length
        if (n < 2) Iterator.empty
        else {
          val slopes = scala.collection.mutable.ArrayBuffer[Double]()
          var i = 0
          while (i < n - 1) {
            var j = i + 1
            while (j < n) {
              slopes += r4d((rows(j)._3 - rows(i)._3) /
                (rows(j)._2 - rows(i)._2))
              j += 1
            }
            i += 1
          }
          val sorted = slopes.sorted
          val slope = sorted((sorted.length - 1) / 2)
          val resid = rows.map(r => r4d(r._3 - slope * r._2)).sorted
          val intercept = resid((n - 1) / 2)
          Iterator.single((conv, n.toLong, slopes.length.toLong, slope,
            intercept))
        }
      }
      .toDF("conv_id", "n_days", "n_pairs", "slope", "intercept")
  }
}
