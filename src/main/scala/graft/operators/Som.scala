package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Self-organizing-map sample-quality analysis — the engine analog of the
  * reference's SOM family (`sits_som_map` / `sits_som_clean_samples` /
  * `sits_som_evaluate_cluster`, /root/reference/R/sits_som.R:100-213 +
  * R/api_som.R:16-135, kernel /root/reference/src/kohonen_som.cpp:398-580
  * RcppBatchSupersom, distance kohonen_distances.cpp:61-69).
  *
  * Training is the BATCH algorithm (the reference's "batch"/"pbatch" modes),
  * which is the one with a distributed factorization: per epoch,
  *   1. BMU assignment — a broadcast-codes scan (codes are numCodes×dim,
  *      metadata-sized even at a 25×25 grid over hundreds of features);
  *   2. per-BMU vector sums + counts — ONE partially-aggregated groupBy
  *      whose result is numCodes×dim values;
  *   3. the Gaussian neighborhood smear over the per-BMU sums — a
  *      numCodes² × dim dense product on the DRIVER (the neighborhood
  *      weight matrix depends only on grid geometry and epoch, never data).
  * So the data-sized work is exactly one scan + one map-side-combined
  * aggregation per epoch, regardless of grid size — the shape that holds at
  * 100 TB. The online mode (kohonen_som.cpp:245-392) is inherently
  * sequential (per-object code mutation) and is not reproduced.
  *
  * Engine-replay contract (same as the k-means / logistic-GD trainers):
  *  - input predictor values are 4-decimal quantized;
  *  - BMU distances are `round(sqrt(Σ(x−c)²) + 1e-9, 6)` with ties broken
  *    by LOWEST neuron id (the reference reservoir-samples ties at EPS
  *    tolerance, kohonen_som.cpp:96-107 — deterministic contract here);
  *  - per-BMU sums and the updated codes are rounded to 4 decimals, making
  *    every epoch a deterministic function of the assignment alone
  *    (invariant to float summation order across engines/partitionings);
  *  - the Gaussian weights exp(−d²/(2r²)) (kohonen_som.cpp:34-36) are
  *    computed ONCE here, quantized to 6 decimals, and shared verbatim with
  *    the DuckDB oracle as literals — no transcendental in either engine's
  *    replay path.
  * Codes are initialized from the first numCodes samples in sample-id order
  * (the reference draws a random sample; deterministic contract).
  * The euclidean distance path requires complete vectors (the reference's
  * euclidean op propagates NaN, kohonen_distances.cpp:61-69, which would
  * poison the argmin) — callers filter to fully-observed predictor rows.
  */
object Som {

  /** Rectangular grid, neurons 1..xdim*ydim, x fastest (kohonen somgrid). */
  final case class Grid(xdim: Int, ydim: Int) {
    val numCodes: Int = xdim * ydim
    def xOf(id: Int): Int = (id - 1) % xdim + 1
    def yOf(id: Int): Int = (id - 1) / xdim + 1
    /** Squared Euclidean grid distance — integer, exact. */
    def dist2(a: Int, b: Int): Int = {
      val dx = xOf(a) - xOf(b); val dy = yOf(a) - yOf(b)
      dx * dx + dy * dy
    }
  }

  private def r(x: Double, scale: Int): Double =
    new java.math.BigDecimal(x + 1e-9)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue

  /** Linear radius decay per epoch m=0..epochs-1 (kohonen_som.cpp:489-494). */
  def radius(m: Int, epochs: Int, r0: Double, r1: Double): Double = {
    val rr = r0 - (r0 - r1) * (m.toDouble / epochs.toDouble)
    if (rr < 1e-8) 1e-8 else rr
  }

  /** Quantized Gaussian neighborhood weights for epoch m: w(bmu, cd). */
  def weights(grid: Grid, m: Int, epochs: Int, r0: Double, r1: Double): Array[Array[Double]] = {
    val rr = radius(m, epochs, r0, r1)
    Array.tabulate(grid.numCodes, grid.numCodes) { (b, c) =>
      val d2 = grid.dist2(b + 1, c + 1).toDouble
      r(math.exp(-d2 / (2.0 * rr * rr)), 6)
    }
  }

  private def codesDf(spark: SparkSession, codes: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    codes.zipWithIndex.map { case (cv, i) => (i + 1, cv.toSeq) }.toSeq
      .toDF("cid", "cv")
  }

  /** BMU assignment of `pred(sample_id, label, v)` against literal codes:
    * (sample_id, label, id_neuron, dist). Broadcast-codes scan; the argmin
    * is a per-sample ranked window (WindowGroupLimit — per-partition top-1,
    * no global exchange).
    */
  def assign(pred: DataFrame, codes: Array[Array[Double]]): DataFrame = {
    val spark = pred.sparkSession
    graft.functions.GraftFunctions.register(spark)
    val scored = pred.crossJoin(broadcast(codesDf(spark, codes)))
      .withColumn("dist", round(sqrt(expr("graft_l2(v, cv)")) + lit(1e-9), 6))
    val w = Window.partitionBy("sample_id").orderBy(col("dist"), col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("sample_id"), col("label"), col("cid").as("id_neuron"),
        col("dist"))
  }

  /** Neighborhood smear (driver; numCodes² × dim): code_cd,j =
    * Σ_bmu w·S / Σ_bmu w·n, bmu-ascending fold (kohonen_som.cpp:540-564:
    * sums skip nothing here — complete vectors — weights count objects).
    * A starved code (weighted denominator 0) keeps its previous vector.
    */
  private def smear(grid: Grid, wm: Array[Array[Double]],
      s: Array[Array[Double]], n: Array[Long],
      old: Array[Array[Double]], dim: Int): Array[Array[Double]] =
    Array.tabulate(grid.numCodes) { c =>
      var den = 0.0
      var b = 0
      while (b < grid.numCodes) { if (n(b) > 0) den += wm(b)(c) * n(b); b += 1 }
      Array.tabulate(dim) { j =>
        var num = 0.0
        var bb = 0
        while (bb < grid.numCodes) {
          if (n(bb) > 0) num += wm(bb)(c) * s(bb)(j)
          bb += 1
        }
        if (den > 0.0) r(num / den, 4) else old(c)(j)
      }
    }

  /** Batch-train the map; returns the final quantized codes. */
  def train(pred: DataFrame, grid: Grid, epochs: Int,
      r0: Double, r1: Double): Array[Array[Double]] = {
    val dim = pred.select(size(col("v"))).head().getInt(0)
    // deterministic init: first numCodes complete samples in id order
    var codes: Array[Array[Double]] = pred.orderBy("sample_id")
      .select("v").limit(grid.numCodes).collect()
      .map(_.getSeq[Double](0).toArray)
    require(codes.length == grid.numCodes,
      s"SOM needs >= ${grid.numCodes} samples, got ${codes.length}")
    for (m <- 0 until epochs) {
      val wm = weights(grid, m, epochs, r0, r1)
      // one distributed job: per-BMU quantized sums + counts (numCodes×dim)
      val sums = assign(pred, codes)
        .join(pred.select("sample_id", "v"), "sample_id")
        .select(col("id_neuron"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("id_neuron", "pos")
        .agg(round(sum("x") + lit(1e-9), 4).as("sv"), count(lit(1)).as("n"))
        .collect()
      val s = Array.ofDim[Double](grid.numCodes, dim)
      val n = Array.ofDim[Long](grid.numCodes)
      sums.foreach { row =>
        val b = row.getInt(0) - 1
        s(b)(row.getInt(1)) = row.getDouble(2)
        n(b) = row.getLong(3)
      }
      codes = smear(grid, wm, s, n, codes, dim)
    }
    codes
  }

  /** BMU assignment against per-class code books: samples join their own
    * class's codes only (label is the join key — broadcast; the codes
    * relation is numClasses×numCodes rows, metadata-sized).
    */
  def assignPerClass(pred: DataFrame,
      codes: Map[Int, Array[Array[Double]]]): DataFrame = {
    val spark = pred.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cdf = codes.toSeq.flatMap { case (lbl, arr) =>
      arr.zipWithIndex.map { case (cv, i) => (lbl, i + 1, cv.toSeq) }
    }.toDF("label", "cid", "cv")
    val scored = pred.join(broadcast(cdf), Seq("label"))
      .withColumn("dist", round(sqrt(expr("graft_l2(v, cv)")) + lit(1e-9), 6))
    val w = Window.partitionBy("sample_id").orderBy(col("dist"), col("cid"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("sample_id"), col("label"), col("cid").as("id_neuron"),
        col("dist"))
  }

  /** Batch-train ONE map PER integer class in a single pipeline: every
    * epoch is still exactly one distributed scan + one map-side-combined
    * aggregation for ALL classes together (the class id just joins the
    * per-class grouping keys) — the `sits_reduce_imbalance` undersampling
    * shape without a per-class driver loop (R/api_som.R:200-229 trains one
    * SOM per class sequentially). Same quantized-iteration contract as
    * [[train]]; init codes are each class's first numCodes samples in id
    * order.
    */
  def trainPerClass(pred: DataFrame, grid: Grid, epochs: Int,
      r0: Double, r1: Double): Map[Int, Array[Array[Double]]] = {
    val dim = pred.select(size(col("v"))).head().getInt(0)
    val w0 = Window.partitionBy("label").orderBy("sample_id")
    var codes: Map[Int, Array[Array[Double]]] = pred
      .withColumn("cid", row_number().over(w0))
      .filter(col("cid") <= grid.numCodes)
      .select(col("label"), col("cid"), col("v")).collect()
      .groupBy(_.getInt(0))
      .map { case (lbl, rows) =>
        val arr = Array.ofDim[Array[Double]](grid.numCodes)
        rows.foreach(r => arr(r.getInt(1) - 1) = r.getSeq[Double](2).toArray)
        require(!arr.contains(null),
          s"SOM class $lbl needs >= ${grid.numCodes} samples")
        lbl -> arr
      }
    for (m <- 0 until epochs) {
      val wm = weights(grid, m, epochs, r0, r1)
      val sums = assignPerClass(pred, codes)
        .join(pred.select("sample_id", "v"), "sample_id")
        .select(col("label"), col("id_neuron"),
          posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("label", "id_neuron", "pos")
        .agg(round(sum("x") + lit(1e-9), 4).as("sv"), count(lit(1)).as("n"))
        .collect()
      codes = codes.map { case (lbl, old) =>
        val s = Array.ofDim[Double](grid.numCodes, dim)
        val n = Array.ofDim[Long](grid.numCodes)
        sums.filter(_.getInt(0) == lbl).foreach { row =>
          val b = row.getInt(1) - 1
          s(b)(row.getInt(2)) = row.getDouble(3)
          n(b) = row.getLong(4)
        }
        lbl -> smear(grid, wm, s, n, old, dim)
      }
    }
    codes
  }

  /** Per-neuron class frequencies — `.som_label_neurons` (api_som.R:16-49):
    * (id_neuron, label, cnt, prior_prob = cnt/total). Empty neurons are
    * simply absent (the reference's "No_Samples" placeholder rows carry
    * prior 0 and can never match a sample label — same fixpoint).
    */
  def labelNeurons(mapped: DataFrame): DataFrame = {
    val cnts = mapped.groupBy("id_neuron", "label").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("id_neuron")
    cnts.withColumn("prior_prob",
      col("cnt").cast("double") / sum("cnt").over(w).cast("double"))
  }

  /** Bayesian posterior per (neuron, label) — `.som_bayes_estimate`
    * (api_som.R:69-135): neighbors are the units at grid distance EXACTLY
    * `radius` (kohonen::unit.distances equality test as coded — axis-aligned
    * two-step units for radius 2); absent neighbor labels pad the prior
    * vector with zeros; var is the sample variance in sufficient-statistics
    * form (algebraically `stats::var`, identical expression both engines);
    * k<2 neighbors ⇒ posterior = prior (the reference's NA-var/NaN-mean
    * guard). eta = |0.9999999 − max prior of the neuron|.
    */
  def bayesPosterior(labelled: DataFrame, grid: Grid, radius: Int): DataFrame = {
    val spark = labelled.sparkSession
    import spark.implicits._
    val r2 = radius * radius
    val nbrs = (for {
      a <- 1 to grid.numCodes; b <- 1 to grid.numCodes
      if grid.dist2(a, b) == r2
    } yield (a, b)).toDF("id_neuron", "nbr")
    val k = nbrs.groupBy("id_neuron").agg(count(lit(1)).as("k"))
    val nbrPriors = nbrs.join(
      labelled.select(col("id_neuron").as("nbr"), col("label"),
        col("prior_prob").as("np")), Seq("nbr"))
      .groupBy("id_neuron", "label")
      .agg(sum("np").as("s1"), sum(col("np") * col("np")).as("s2"))
    val eta = labelled.groupBy("id_neuron")
      .agg(abs(lit(0.9999999) - max("prior_prob")).as("eta"))
    labelled
      .join(broadcast(k), Seq("id_neuron"), "left")
      .join(nbrPriors, Seq("id_neuron", "label"), "left")
      .join(eta, Seq("id_neuron"))
      .withColumn("s1", coalesce(col("s1"), lit(0.0)))
      .withColumn("s2", coalesce(col("s2"), lit(0.0)))
      .withColumn("post_prob", {
        val kD = col("k").cast("double")
        val mean = col("s1") / kD
        val vr = (col("s2") - col("s1") * col("s1") / kD) / (kD - lit(1.0))
        when(col("k").isNull || col("k") < 2, col("prior_prob"))
          .otherwise((vr / (col("eta") + vr)) * col("prior_prob") +
            (col("eta") / (col("eta") + vr)) * mean)
      })
      .select("id_neuron", "label", "cnt", "prior_prob", "post_prob")
  }

  /** Tag each sample — `sits_som_clean_samples` (sits_som.R:252-296):
    * clean / analyze / remove by prior/posterior thresholds.
    */
  def cleanSamples(mapped: DataFrame, posterior: DataFrame,
      priorT: Double, postT: Double): DataFrame =
    mapped.join(posterior, Seq("id_neuron", "label"))
      .withColumn("eval",
        when(col("prior_prob") >= priorT && col("post_prob") >= postT, "clean")
          .when(col("prior_prob") >= priorT && col("post_prob") < postT, "analyze")
          .otherwise("remove"))
      .select(col("sample_id"), col("id_neuron"), col("label"),
        round(col("prior_prob") + lit(1e-9), 6).as("prior_prob"),
        round(col("post_prob") + lit(1e-9), 6).as("post_prob"), col("eval"))

  /** Majority label per neuron — sits_som.R:165-199: argmax prior, ties by
    * max posterior, then smallest label (deterministic form of the
    * reference's first-index semantics).
    */
  def neuronLabel(posterior: DataFrame): DataFrame = {
    val w = Window.partitionBy("id_neuron")
      .orderBy(col("prior_prob").desc, col("post_prob").desc, col("label"))
    posterior.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("id_neuron"), col("label").as("neuron_label"))
  }

  /** Cluster mixture/purity — `sits_som_evaluate_cluster`
    * (sits_som.R:331-397): clusters are neuron-majority-label groups;
    * mixture% = class count / cluster total × 100 (exact int-ratio double).
    */
  def evaluateCluster(mapped: DataFrame, posterior: DataFrame): DataFrame = {
    val joined = mapped.join(broadcast(neuronLabel(posterior)), Seq("id_neuron"))
    val cnts = joined.groupBy(col("neuron_label").as("cluster"),
      col("label").as("class")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("cluster")
    cnts.withColumn("mixture_percentage",
      col("cnt").cast("double") / sum("cnt").over(w).cast("double") * lit(100.0))
      .select("cluster", "class", "cnt", "mixture_percentage")
  }

  /** SOM undersampling — `.som_undersample` (api_som.R:188-229): keep at
    * most `n` samples per neuron (deterministic id-order slice; the
    * reference `slice_sample`s randomly — same budget, stable contract).
    */
  def undersample(mapped: DataFrame, n: Int): DataFrame = {
    val w = Window.partitionBy("id_neuron").orderBy("sample_id")
    mapped.withColumn("rk", row_number().over(w)).filter(col("rk") <= n)
      .select("sample_id", "label", "id_neuron", "rk")
  }
}
