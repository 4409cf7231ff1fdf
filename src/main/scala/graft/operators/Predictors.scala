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

  /** Quantile min-max normalization (api_predictors.R:124-132): per-column
    * Q02/Q98 stats job, then (v−q02)/(q98−q02) clamped to [1e-4, 1].
    * Stats frame is tiny → broadcast join (no shuffle of the data side).
    */
  def normalizeQ(series: DataFrame): DataFrame = {
    val stats = series.agg(
      percentile(col("value"), lit(0.02)).as("q02"),
      percentile(col("value"), lit(0.98)).as("q98"))
    series.crossJoin(broadcast(stats))
      .select(col("conv_id"), col("bucket_ts"),
        round(greatest(lit(1e-4), least(lit(1.0),
          (col("value") - col("q02")) / (col("q98") - col("q02")))) + lit(1e-9), 4)
          .as("v_norm"))
  }
}
