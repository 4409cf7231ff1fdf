package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Centered moving-window kernel statistics ≙ the reference's
  * `w_median/w_sum/w_mean/w_sd/w_min/w_max/w_var/w_modal` apply-kernels
  * (/root/reference/R/sits_apply.R:96-107, R/api_apply.R:284-330,
  * src/kernel.cpp:22-124), re-expressed on our 1-D per-conversation series.
  *
  * Reference semantics reproduced exactly:
  *  - edge handling is MIRRORED (`locus_mirror`, kernel.cpp:8-19: index p<0 →
  *    -p-1, p≥n → 2n-p-1), so every window holds exactly 2k+1 values — Spark's
  *    `rowsBetween` truncates at partition edges and CANNOT express this,
  *    which is why the window is materialized as an array expression;
  *  - `w_modal` ties break toward the smallest value (std::map iteration
  *    order + strict max_element, kernel.cpp:45-67);
  *  - sd/var are sample statistics (R sd/var, /(m-1)).
  *
  * Execution shape: ALL per-index stats are computed inside ONE expression
  * at the conversation-row level (`transform(sequence(0, n-1), pos -> …)`),
  * and only the small per-point result structs are exploded. Exploding the
  * series array first and computing per row would copy the whole
  * |timeline|-element array into every output row — O(n²) memory traffic
  * per conversation (measured ~25 GB of row copies at sf0.1).
  * One shuffle (the groupBy); no UDFs. Because windows are always full
  * (2k+1, no NaN on a gap-filled grid) the median needs no interpolation:
  * it is the (k+1)-th order statistic.
  */
object KernelWindows {

  /** grid (conv_id, bucket_ts, value non-null) → per-point window stats. */
  def apply(grid: DataFrame, k: Int): DataFrame = {
    val m = 2 * k + 1
    val r4 = (c: org.apache.spark.sql.Column) => round(c + lit(1e-9), 4)
    // first-longest-run over the ascending sorted window = modal value with
    // smallest-value tie-break (strict > keeps the earliest maximal run)
    // the reflected index is clamped to [0, n-1] exactly like
    // SeriesKernels.mirror — for n ≤ k a single reflection still lands
    // out of range (e.g. n=1, j=-2 → reflect 1 ≥ n) and unclamped
    // element_at would throw under ANSI mode
    val perPoint =
      s"""transform(sequence(0, n - 1), pos -> named_struct(
         |  'bucket_ts', element_at(ts, pos + 1),
         |  'win', transform(sequence(-$k, $k), j -> element_at(vals,
         |    greatest(0, least(n - 1,
         |      CASE WHEN pos + j < 0 THEN -(pos + j) - 1
         |           WHEN pos + j >= n THEN 2*n - (pos + j) - 1
         |           ELSE pos + j END)) + 1))))""".stripMargin
    val modal =
      """aggregate(array_sort(win),
        |  named_struct('best', cast(null as double), 'bc', 0,
        |               'cur', cast(null as double), 'cc', 0),
        |  (s, x) -> CASE WHEN s.cur IS NOT NULL AND x = s.cur THEN
        |      named_struct('best', IF(s.cc + 1 > s.bc, x, s.best),
        |                   'bc', IF(s.cc + 1 > s.bc, s.cc + 1, s.bc),
        |                   'cur', x, 'cc', s.cc + 1)
        |    ELSE
        |      named_struct('best', IF(1 > s.bc, x, s.best),
        |                   'bc', IF(1 > s.bc, 1, s.bc),
        |                   'cur', x, 'cc', 1) END,
        |  s -> s.best)""".stripMargin
    grid
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("bucket_ts"), col("value")))).as("pts"))
      .select(col("conv_id"),
        expr("transform(pts, p -> p.bucket_ts)").as("ts"),
        expr("transform(pts, p -> cast(p.value as double))").as("vals"))
      .withColumn("n", size(col("vals")))
      .select(col("conv_id"), explode(expr(perPoint)).as("pt"))
      .select(col("conv_id"), col("pt.bucket_ts").as("bucket_ts"),
        col("pt.win").as("win"))
      .withColumn("s1", expr("aggregate(win, cast(0 as double), (a, x) -> a + x)"))
      .withColumn("s2", expr("aggregate(win, cast(0 as double), (a, x) -> a + x * x)"))
      .select(
        col("conv_id"), col("bucket_ts"),
        r4(col("s1")).as("w_sum"),
        r4(col("s1") / lit(m)).as("w_mean"),
        expr(s"element_at(array_sort(win), ${k + 1})").as("w_median"),
        array_min(col("win")).as("w_min"),
        array_max(col("win")).as("w_max"),
        r4(sqrt(greatest(lit(0.0),
          (col("s2") - col("s1") * col("s1") / lit(m)) / lit(m - 1)))).as("w_sd"),
        r4((col("s2") - col("s1") * col("s1") / lit(m)) / lit(m - 1)).as("w_var"),
        expr(modal).as("w_modal"))
  }
}
