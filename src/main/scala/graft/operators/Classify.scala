package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Model-scoring harness ≙ the reference's classification pipeline shape
  * (/root/reference/R/api_classify.R:435-505: chunked block read → feature
  * matrix → ml_model(values) → normalize → probs), with a deterministic
  * linear stub standing in for the ML model (trainers are out of scope per
  * SURVEY §2.9 — the engine's contract is the predictors matrix in and the
  * probs relation out, which the [[Probs]] operator family then consumes).
  *
  * Execution shape is the production one: `mapPartitions` with batched
  * blocks (≙ `.tile_chunks_create` block iteration) and broadcast model
  * state — one task per partition, no shuffle, no per-row UDF dispatch.
  */
object Classify {

  /** Numerically-stable softmax (src/softmax.cpp:15-37): subtract max, sum
    * exponentials, scale = max + log(sum), p_j = exp(x_j − scale). The
    * reference subtracts the global BLOCK max — algebraically it cancels,
    * so the per-row max used here computes the identical function while
    * staying stable under any partitioning of the rows into blocks.
    */
  def softmax(scores: Array[Double]): Array[Double] = {
    var m = scores(0)
    var i = 1
    while (i < scores.length) { if (scores(i) > m) m = scores(i); i += 1 }
    var sum = 0.0
    i = 0
    while (i < scores.length) { sum += math.exp(scores(i) - m); i += 1 }
    val scale = m + math.log(sum)
    scores.map(s => math.exp(s - scale))
  }

  /** Score a feature relation (conv_id, bucket_ts, featCols…) against a
    * linear model (weights[class][feature] + bias[class]) → probability
    * relation (conv_id, bucket_ts, p1…pk), softmax-normalized and rounded
    * at the output boundary.
    */
  def score(spark: SparkSession, features: DataFrame, featCols: Seq[String],
      weights: Array[Array[Double]], bias: Array[Double],
      batchSize: Int = 512): DataFrame = {
    import spark.implicits._
    require(weights.length == bias.length, "one bias per class")
    val bc = spark.sparkContext.broadcast((weights, bias))
    val nc = weights.length
    val ds = features.select(col("conv_id"), col("bucket_ts"),
        array(featCols.map(col): _*).as("f"))
      .as[(String, java.sql.Timestamp, Seq[Double])]
    val scored = ds.mapPartitions { it =>
      val (w, b) = bc.value
      // block-batched evaluation ≙ the reference's chunk loop: the model is
      // invoked once per block of rows, not once per row
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { case (cid, ts, f) =>
          val s = Array.tabulate(w.length) { c =>
            var acc = b(c)
            var i = 0
            while (i < f.length) { acc += w(c)(i) * f(i); i += 1 }
            acc
          }
          (cid, ts, softmax(s))
        }
      }
    }
    scored.toDF("conv_id", "bucket_ts", "probs")
      .select(Seq(col("conv_id"), col("bucket_ts")) ++
        (0 until nc).map(c =>
          round(col("probs")(c) + lit(1e-9), 4).as(s"p${c + 1}")): _*)
  }
}
