package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Class-imbalance reduction by SMOTE oversampling ≙ the oversampling half
  * of `sits_reduce_imbalance` (/root/reference/R/sits_reduce_imbalance.R,
  * `api_smote.R:23-67`: synthesize minority samples by interpolating
  * between a sample and one of its within-class nearest neighbors; Chawla
  * et al., JAIR 2002). The reference's SOM-based UNDERsampling half stays
  * excluded (2-D Kohonen training, see SURVEY §8).
  *
  * Determinism contract (the reference draws random neighbors/factors,
  * which no cross-engine oracle can reproduce): neighbor = the single
  * NEAREST within-class sample by rounded squared-L2 (ties by id), and the
  * interpolation factor is fixed at 0.5 (the midpoint). One synthetic row
  * per sample of every class smaller than the majority class.
  *
  * Scale shape: the neighbor search is a within-CLASS equi-join (label is
  * the join key — never a corpus cross join), distances via the codegen
  * [[graft.functions.ArrayL2]] expression, rank-1 window per sample. Class
  * sample sets are sample-tibble scale; the guard refuses classes larger
  * than `maxPerClass` (point it at samples, not a cube — same contract as
  * clusterDendro).
  */
object Imbalance {

  def smoteOversample(feats: DataFrame, featureCols: Seq[String],
      idCol: String = "conv_id", labelCol: String = "label",
      maxPerClass: Int = 4000): DataFrame = {
    require(featureCols.nonEmpty, "smote: no feature columns")
    graft.functions.GraftFunctions.register(feats.sparkSession)
    val counts = feats.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.get(0) -> r.getLong(1))
    require(counts.forall(_._2 <= maxPerClass),
      s"smote: a class exceeds maxPerClass=$maxPerClass — SMOTE runs on " +
        "SAMPLE sets; sample first")
    val maxCnt = counts.map(_._2).max
    val minority = counts.filter(_._2 < maxCnt).map(_._1)
    if (minority.isEmpty) return feats.limit(0)
      .select(col(idCol) +: lit("").as("nn_id") +: col(labelCol) +:
        featureCols.map(col): _*)

    val fv = array(featureCols.map(c => col(c).cast("double")): _*)
    val m = feats.filter(col(labelCol).isin(minority: _*))
      .select(col(idCol) +: col(labelCol) +: fv.as("qv") +:
        featureCols.map(c => col(c).as(s"__a_$c")): _*)
    val nbr = feats.filter(col(labelCol).isin(minority: _*))
      .select(col(idCol).as("nn_id") +: col(labelCol) +: fv.as("ev") +:
        featureCols.map(c => col(c).as(s"__b_$c")): _*)
    val joined = m.join(nbr, Seq(labelCol))
      .filter(col(idCol) =!= col("nn_id"))
      .withColumn("dist", round(expr("graft_l2(qv, ev)") + lit(1e-9), 6))
    val w = Window.partitionBy(labelCol, idCol)
      .orderBy(col("dist"), col("nn_id"))
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col(idCol) +: col("nn_id") +: col(labelCol) +:
        featureCols.map(c =>
          round((col(s"__a_$c") + col(s"__b_$c")) / 2.0 + lit(1e-9), 4).as(c)): _*)
  }
}
