package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Evaluation & sampling-design operators ≙ the reference's
  * `sits_accuracy` (confusion matrix + per-class accuracies,
  * /root/reference/R/sits_accuracy.R:106) and
  * `sits_sampling_design`/`sits_stratified_sampling` (Cochran/Neyman
  * allocation over strata, R/sits_sample_functions.R:312,450).
  * All plain aggregations — partially aggregable, broadcast-friendly.
  */
object Accuracy {

  /** Confusion matrix with per-cell fraction and overall accuracy repeated
    * per row (single-result-table convention).
    */
  def confusion(df: DataFrame, actual: String, pred: String): DataFrame = {
    val r4 = (c: Column) => round(c + lit(1e-9), 4)
    val total = Window.partitionBy()
    df.groupBy(col(actual).as("actual"), col(pred).as("pred"))
      .agg(count(lit(1)).as("n"))
      .withColumn("frac", r4(col("n") / sum("n").over(total)))
      .withColumn("overall_acc",
        r4(sum(when(col("actual") === col("pred"), col("n")).otherwise(0L)).over(total)
          / sum("n").over(total)))
  }

  /** Stratified sample allocation over a stratum column: proportional and
    * Neyman (optimal) allocation of a total budget, using each stratum's
    * size and sample stddev of `valueCol` (Cochran ch. 5 formulas — what
    * the reference's sampling_design computes from class areas).
    */
  def samplingDesign(df: DataFrame, stratum: String, valueCol: String,
      budget: Int): DataFrame = {
    val r4 = (c: Column) => round(c + lit(1e-9), 4)
    val total = Window.partitionBy()
    df.groupBy(col(stratum).as("stratum"))
      .agg(count(lit(1)).as("n_h"), r4(stddev_samp(col(valueCol))).as("s_h"))
      .withColumn("alloc_prop",
        r4(lit(budget) * col("n_h") / sum("n_h").over(total)))
      .withColumn("alloc_neyman",
        r4(lit(budget) * (col("n_h") * col("s_h"))
          / sum(col("n_h") * col("s_h")).over(total)))
  }
}
