package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.SeriesKernels

/** Spectral mixture analysis ≙ `sits_mixture_model`
  * (/root/reference/R/sits_mixture_model.R:106, src/nnls_solver.cpp:16-124):
  * per observation, solve the non-negative least-squares unmixing of its
  * feature vector against a small endmember matrix → one fraction column
  * per endmember + rmse.
  *
  * The endmember matrix is tiny → closed over (broadcast with the task
  * closure); the NNLS solve runs batched per partition (no shuffle at all —
  * embarrassingly parallel like the reference's per-pixel loop).
  */
object Mixture {

  /** rows: (conv_id, bucket_ts, features array). endmembers: (name, column
    * of the mixing matrix). Emits fraction_<name> columns + rmse.
    */
  def unmix(spark: SparkSession, df: DataFrame, featureCols: Seq[String],
      endmembers: Seq[(String, Array[Double])]): DataFrame = {
    import spark.implicits._
    val m = featureCols.length
    val names = endmembers.map(_._1)
    val a = Array.tabulate(m, endmembers.length)((i, j) => endmembers(j)._2(i))
    val out = df
      .select(col("conv_id"), unix_millis(col("bucket_ts").cast("timestamp")).as("t"),
        array(featureCols.map(c => col(c).cast("double")): _*).as("f"))
      .as[(String, Long, Seq[Double])]
      .mapPartitions { it =>
        // per-partition: endmember Gram structures could be precomputed here
        it.map { case (conv, t, f) =>
          val b = f.toArray
          val x = SeriesKernels.nnls(a, b)
          var rss = 0.0
          var i = 0
          while (i < m) {
            var pred = 0.0
            var j = 0
            while (j < x.length) { pred += a(i)(j) * x(j); j += 1 }
            val d = b(i) - pred
            rss += d * d
            i += 1
          }
          (conv, t, x.toSeq, math.sqrt(rss / m))
        }
      }
      .toDF("conv_id", "t", "fractions", "rmse")
    names.zipWithIndex.foldLeft(
      out.select(col("conv_id"), timestamp_millis(col("t")).as("bucket_ts"),
        col("fractions"), round(col("rmse") + lit(1e-9), 4).as("rmse"))) {
      case (acc, (nm, j)) =>
        acc.withColumn(s"frac_$nm",
          round(element_at(col("fractions"), j + 1) + lit(1e-9), 4))
    }.drop("fractions")
  }
}
