package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Projection / predicate operators ≙ the reference's metadata-pushdown
  * filter family (/root/reference/R/sits_select.R:38, R/api_select.R:6-140,
  * R/api_cube.R:953-1178) and sampling verbs
  * (R/sits_sample_functions.R:27, R/api_tibble.R:278-291).
  *
  * All pure Catalyst: band selection = column projection, date/interval
  * filters = range predicates, tile selection = key-range predicates — each
  * reaches the parquet scan as PushedFilters / pruned ReadSchema, which is
  * the Spark analog of sits filtering `file_info` before any raster I/O.
  */
object Select {

  /** Select metrics (≙ bands), a time interval, and a conversation range —
    * the composition .select_raster_cube performs (api_select.R:102-140).
    */
  def selectSeries(transcripts: DataFrame, metrics: Seq[String],
      from: Column, to: Column, convPred: Column): DataFrame =
    Regularize.withMetrics(transcripts)
      .filter(col("ts") >= from && col("ts") < to && convPred)
      .select((Seq("conv_id", "turn_idx", "ts").map(col) ++ metrics.map(col)): _*)

  /** Deterministic per-stratum sampling ≙ `sits_sample` per-label fraction
    * (sits_sample_functions.R:27). Deterministic arithmetic on the unique key
    * replaces RNG so runs are reproducible across engines and resumes
    * (Knuth multiplicative hash on turn_idx ⊕ conv suffix); per-role
    * fractions are expressed in percent.
    */
  def sampleByRole(transcripts: DataFrame, pctByRole: Map[String, Int]): DataFrame = {
    val key = (substring(col("conv_id"), 2, 6).cast("long") * 2654435761L
      + col("turn_idx")) % 100
    val frac = pctByRole.foldLeft(lit(-1)) { case (acc, (role, pct)) =>
      when(col("role") === role, lit(pct)).otherwise(acc)
    }
    transcripts.filter(key < frac)
  }

  /** Stratified train/validation split ≙ `.tibble_samples_split`
    * (api_tibble.R:278-291): per-role deterministic assignment flag.
    */
  def trainValSplit(transcripts: DataFrame, trainPct: Int): DataFrame =
    transcripts.withColumn("train",
      (substring(col("conv_id"), 2, 6).cast("long") * 48271L + col("turn_idx")) % 100 < trainPct)

  /** Interval selection ON THE NESTED series column ≙ `.ts_select_interval`
    * (api_ts.R:94-178, which filters rows of the nested time_series tibble
    * in place): a Catalyst `filter` over the array — no explode, the
    * |series|-element array is touched once inside its own row — with the
    * summary columns recomputed from the filtered array. Conversations left
    * empty by the interval are dropped (a sits tibble row without
    * time_series rows is pruned).
    */
  def tsSelectNested(assembled: DataFrame, fromTs: String, toTs: String): DataFrame = {
    val f = lit(fromTs).cast("timestamp")
    val t = lit(toTs).cast("timestamp")
    assembled
      .withColumn("series", filter(col("series"),
        p => p.getField("ts") >= f && p.getField("ts") < t))
      .filter(size(col("series")) > 0)
      .select(col("conv_id"),
        size(col("series")).as("n_points"),
        col("series")(0).getField("ts").as("start_ts"),
        element_at(col("series"), -1).getField("ts").as("end_ts"),
        col("series")(0).getField("v").as("first_v"),
        element_at(col("series"), -1).getField("v").as("last_v"),
        round(expr("aggregate(series, cast(0 as double), (s, p) -> s + p.v)")
          + lit(1e-9), 4).as("sum_v"))
  }

  /** Equal-length enforcement ≙ `.tibble_prune` (api_tibble.R:239-255):
    * keep only conversations whose point count equals the MEDIAN count
    * across conversations (R stats::median = type-7 quantile at 0.5 —
    * computed here via the partition-parallel [[Predictors.exactQuantiles]],
    * never a single-reducer percentile). A fractional median (even count of
    * distinct lengths) matches no series, exactly as in R.
    */
  def pruneMedianLength(metrics: DataFrame): DataFrame = {
    val counts = metrics.groupBy("conv_id").agg(count(lit(1)).as("n_pts"))
    val Seq(med) = Predictors.exactQuantiles(counts, "n_pts", Seq(0.5))
    val keep = counts.filter(col("n_pts").cast("double") === med).select("conv_id")
    metrics.join(keep, "conv_id")
  }

  /** First-tile-wins dedup ≙ `.data_get_ts` multi-tile point dedup
    * (api_data.R:214-222): keep one row per identity by stable preference
    * order.
    */
  def dedupFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Per-conversation majority role (deterministic mode: count desc, role
    * asc tie-break) — the conv-level label the cluster verbs consume.
    */
  def majorityRole(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id")
      .orderBy(col("n").desc, col("role"))
    turns.groupBy("conv_id", "role").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("conv_id"), col("role").as("label"))
  }

  /** Chat-format lint — structural validation of conversations before they
    * become training data (role-alternation checks are a standard
    * assistant-data curation stage; no sits analog). Per conversation:
    * whether it opens with a user turn, how many adjacent same-role turn
    * pairs occur, how many tool turns directly follow a user turn (a tool
    * result belongs to an assistant call), and the break fraction. One
    * conv-partitioned lag window + one partially-aggregated groupBy; all
    * ratios are int/int with the house 4-dp rounding.
    */
  def chatLint(turns: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turns.select(col("conv_id"), col("turn_idx"), col("role"))
      .withColumn("prev_role", lag("role", 1).over(w))
      .groupBy("conv_id")
      .agg(count(lit(1)).as("n_turns"),
        coalesce(max(when(col("turn_idx") === 0, col("role") === "user")),
          lit(false)).as("starts_user"),
        sum(when(col("role") === col("prev_role"), 1L).otherwise(0L))
          .as("n_same_adjacent"),
        sum(when(col("role") === "tool" && col("prev_role") === "user", 1L)
          .otherwise(0L)).as("n_tool_after_user"))
      .withColumn("frac_breaks",
        round(col("n_same_adjacent").cast("double") / col("n_turns") + lit(1e-9), 4))
  }

  /** Deterministic weighted priority sample — heavier keys sampled first,
    * no RNG (the A-ES idea with an integer key: priority = u32(md5(key))
    * div weight, selection = the k smallest (priority, key) pairs).
    * Monotone in weight for a fixed key hash, reproducible across resume
    * and retries, and planned as a partial per-partition top-k
    * (TakeOrderedAndProject) — no global sort at any scale; the rank
    * window runs on the k-row result only. Input: one row per key with a
    * positive integer weight. Output: (key, weight, h, priority, rank).
    */
  def weightedPrioritySample(weighted: DataFrame, keyCol: String,
      weightCol: String, k: Int): DataFrame = {
    val keyed = weighted
      .select(col(keyCol).cast("string").as("key"),
        col(weightCol).cast("long").as("weight"))
      .filter(col("weight") > 0)
      .withColumn("h", Accuracy.u32Md5(col("key")))
      .withColumn("priority", expr("h div weight"))
    keyed.orderBy("priority", "key").limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy("priority", "key")))
  }
}
