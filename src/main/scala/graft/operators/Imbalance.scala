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

  /** Full class-rebalancing verb ≙ `sits_reduce_imbalance`
    * (/root/reference/R/sits_reduce_imbalance.R:71-187): classes with
    * ≥ nUnder samples are UNDERsampled by a per-class batch SOM (grid side
    * d = ceil(sqrt(nUnder/4)), keep ≤ `perNeuron` per neuron —
    * api_som.R:200-229); classes with ≤ nOver samples are OVERsampled to
    * exactly nOver rows with SMOTE synthetics (api_smote.R:15-52: originals
    * all kept, plus nOver−n interpolated rows); classes in between pass
    * through.
    *
    * Determinism contract (the reference random-samples neurons, neighbors
    * and gaps): the per-neuron keep is the sample-id-order slice; synthetic
    * rep r of a sample interpolates at the MIDPOINT toward its
    * ((r−1) mod K)+1-th within-class nearest neighbor, K = min(5, n−1)
    * (the reference's k=5 NN pool, cycled instead of drawn); the nOver−n
    * synthetics kept are the first by (rep, sample-id) per class. When
    * needed > n·K the cycle revisits pairs — duplicates, exactly like the
    * reference's replace=TRUE draw.
    *
    * Scale shape: class counts are one map-side-combined aggregate; SOM
    * training is one scan + one aggregate per epoch for ALL under-classes
    * together ([[Som.trainPerClass]]); the SMOTE neighbor search is a
    * within-CLASS equi-join over ≤ nOver-sized classes (never a corpus
    * cross join); everything downstream is ranked windows over per-class
    * partitions.
    *
    * Input: (sample_id, label:int, v:array&lt;double&gt;) with 4-decimal
    * quantized features. Output: (sample_id, label, src, f0..f_{dim−1})
    * where src ∈ under|orig|synth|keep and synthetic ids are
    * `origId:s&lt;rep&gt;`.
    */
  def reduceImbalance(pred0: DataFrame, nOver: Int, nUnder: Int,
      epochs: Int = 2, r0: Double = 1.5, r1: Double = 1.0,
      perNeuron: Int = 4): DataFrame = {
    require(nUnder >= nOver,
      "reduce_imbalance: nUnder must be >= nOver (reference pre-condition)")
    val spark = pred0.sparkSession
    graft.functions.GraftFunctions.register(spark)
    // sample-scale persist for the epoch loop only — the bounded result is
    // eagerly localCheckpoint-ed and the cache released before returning
    // (same no-escaping-handle contract as Predictors.normalizeQ)
    val pred = pred0.persist()
    try {
    val dim = pred.select(size(col("v"))).head().getInt(0)
    val d = math.ceil(math.sqrt(nUnder / 4.0)).toInt
    val grid = Som.Grid(d, d)
    val counts = pred.groupBy("label").agg(count(lit(1)).as("n"))
    val cl = counts.collect().map(r => r.getInt(0) -> r.getLong(1))
    val underL = cl.filter(_._2 >= nUnder).map(_._1).toSeq
    val overL = cl.filter(_._2 <= nOver).map(_._1).toSeq
    val okL = cl.filter(c => c._2 > nOver && c._2 < nUnder).map(_._1).toSeq

    def shape(df: DataFrame, src: String): DataFrame = df.select(
      col("sample_id") +: col("label") +: lit(src).as("src") +:
        (0 until dim).map(i => col("v").getItem(i).as(s"f$i")): _*)

    val parts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    if (underL.nonEmpty) {
      val up = pred.filter(col("label").isin(underL: _*))
      val codes = Som.trainPerClass(up, grid, epochs, r0, r1)
      val w = Window.partitionBy("label", "id_neuron").orderBy("sample_id")
      val kept = Som.assignPerClass(up, codes)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= perNeuron).select("sample_id")
      parts += shape(up.join(kept, "sample_id"), "under")
    }
    if (overL.nonEmpty) {
      val op = pred.filter(col("label").isin(overL: _*))
        .join(broadcast(counts), Seq("label"))
      parts += shape(op, "orig")
      val k = least(lit(5), col("n") - 1)
      val b = op.select(col("label"), col("sample_id").as("nn_id"),
        col("v").as("nv"))
      val kw = Window.partitionBy("label", "sample_id")
        .orderBy(col("dist"), col("nn_id"))
      val knn = op.select("label", "n", "sample_id", "v").join(b, Seq("label"))
        .filter(col("sample_id") =!= col("nn_id"))
        .withColumn("dist", round(sqrt(expr("graft_l2(v, nv)")) + lit(1e-9), 6))
        .withColumn("nidx", row_number().over(kw))
        .filter(col("nidx") <= k)
        .select("label", "sample_id", "nidx", "v", "nv")
      val reps = op.select(col("label"), col("n"), col("sample_id"),
          explode(sequence(lit(1),
            ceil(lit(nOver) / col("n")).cast("int"))).as("r"))
        .withColumn("nidx", (pmod(col("r") - 1, k) + 1).cast("int"))
      val sw = Window.partitionBy("label").orderBy(col("r"), col("sample_id"))
      parts += reps.join(knn, Seq("label", "sample_id", "nidx"))
        .withColumn("rk", row_number().over(sw))
        .filter(col("rk") <= lit(nOver) - col("n"))
        .select(concat(col("sample_id"), lit(":s"), col("r")).as("sample_id") +:
          col("label") +: lit("synth").as("src") +:
          (0 until dim).map(i => round(
            (col("v").getItem(i) + col("nv").getItem(i)) / 2.0 + lit(1e-9), 4)
            .as(s"f$i")): _*)
    }
    if (okL.nonEmpty) parts += shape(pred.filter(col("label").isin(okL: _*)), "keep")
    parts.reduce(_ unionByName _).localCheckpoint(true)
    } finally { pred.unpersist(); () }
  }

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
