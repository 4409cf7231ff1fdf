package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Minimal in-engine model training — the gradient-descent half of the
  * reference's training story (`sits_train` / `sits_machine_learning.R`
  * delegate to ranger/xgboost/torch, which remain out of scope as external
  * libraries; this closes the "engine can produce a usable model from the
  * predictors matrix" gap with a from-scratch trainer).
  *
  * Batch logistic regression by full-gradient descent: per iteration ONE
  * distributed aggregation job computes the gradient (sums of
  * (σ(w·x) − y)·x_j — partial-aggregated map-side), and the weight update
  * happens on the driver (weights are feature-dimension-sized, i.e.
  * metadata). Weights are QUANTIZED to 6 decimals after every update — the
  * same engine-replay contract as the k-means trainer: each iteration is a
  * deterministic function of the quantized state, so a DuckDB oracle can
  * replay training exactly (float drift from summation order and exp ulps
  * is ~1e-12, absorbed by the rounding).
  */
object Train {

  private def r6(x: Double): Double =
    new java.math.BigDecimal(x + 1e-9)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Returns (weights incl. bias at index 0, training accuracy). */
  def logisticGD(feats: DataFrame, featureCols: Seq[String], labelCol: String,
      eta: Double = 0.1, iters: Int = 3): (Array[Double], Double) = {
    var w = Array.fill(featureCols.length + 1)(0.0)
    def margin: Column = featureCols.zipWithIndex.foldLeft(lit(w(0))) {
      case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
    }
    def pred: Column = lit(1.0) / (lit(1.0) + exp(-margin))
    for (_ <- 1 to iters) {
      val err = pred - col(labelCol)
      val aggs = sum(err).as("g0") +:
        featureCols.zipWithIndex.map { case (c, j) =>
          sum(err * col(c)).as(s"g${j + 1}")
        } :+ count(lit(1)).as("n")
      val row = feats.agg(aggs.head, aggs.tail: _*).head()
      val n = row.getAs[Long]("n").toDouble
      w = Array.tabulate(w.length)(j =>
        r6(w(j) - eta * (row.getAs[Double](s"g$j") / n)))
    }
    val acc = feats.agg(
      round(avg(when((pred >= 0.5) === (col(labelCol) === 1.0), 1.0)
        .otherwise(0.0)) + lit(1e-9), 4)).head().getDouble(0)
    (w, acc)
  }

  /** Relation form of [[logisticGD]] for the driver contract: one row per
    * weight (bias first) with the shared training accuracy.
    */
  def logisticGDRelation(feats: DataFrame, featureCols: Seq[String],
      labelCol: String, eta: Double = 0.1, iters: Int = 3): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val (w, acc) = logisticGD(feats, featureCols, labelCol, eta, iters)
    ("bias" +: featureCols).zip(w).map { case (f, wj) => (f, wj, acc) }
      .toDF("feature", "w", "train_acc")
  }

  /** Hyperparameter grid search ≙ `sits_tuning`
    * (/root/reference/R/sits_tuning.R:66-134: sample hyperparam candidates,
    * train each, validate on a held split, order by accuracy). The
    * reference randomizes candidates and trains torch models; here the grid
    * is explicit (deterministic — the engine-replay contract) and the
    * trainer is [[logisticGD]]. The holdout is a CONTENT-HASH split
    * (u32(md5(conv_id)) % nFolds == 0 → validation), the same mechanism as
    * kfold — stable across engines, runs, and cluster sizes. Each candidate
    * costs iters+2 small aggregation jobs over the feature matrix (gradient
    * per iteration + two accuracy passes), all partial-aggregated; the
    * feature matrix is persisted once across the whole grid. Output: one
    * row per candidate with train/validation accuracy, ranked by
    * (val_acc desc, eta, iters).
    */
  def gridSearch(feats: DataFrame, featureCols: Seq[String], labelCol: String,
      candidates: Seq[(Double, Int)], nFolds: Int = 5): DataFrame = {
    val spark = feats.sparkSession
    import spark.implicits._
    val fold = Accuracy.kfoldAssign(col("conv_id"), nFolds)
    val withFold = feats.withColumn("__fold", fold).persist()
    try {
      val tr = withFold.filter(col("__fold") =!= 0)
      val va = withFold.filter(col("__fold") === 0)
      val rows = candidates.map { case (eta, iters) =>
        val (w, trainAcc) = logisticGD(tr, featureCols, labelCol, eta, iters)
        val margin = featureCols.zipWithIndex.foldLeft(lit(w(0))) {
          case (acc, (c, j)) => acc + lit(w(j + 1)) * col(c)
        }
        val pred = lit(1.0) / (lit(1.0) + exp(-margin))
        val vr = va.agg(
          round(avg(when((pred >= 0.5) === (col(labelCol) === 1.0), 1.0)
            .otherwise(0.0)) + lit(1e-9), 4)).head()
        require(!vr.isNullAt(0),
          s"gridSearch: validation fold (hash % $nFolds == 0) is empty — " +
            "too few conversations for a holdout; lower nFolds")
        (eta, iters, trainAcc, vr.getDouble(0))
      }
      rows.sortBy { case (e, i, _, v) => (-v, e, i) }.zipWithIndex
        .map { case ((e, i, t, v), r) => (e, i, t, v, r + 1) }
        .toDF("eta", "iters", "train_acc", "val_acc", "rank")
    } finally { withFold.unpersist(); () }
  }
}
