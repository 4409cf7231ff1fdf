package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Merge / set operators ≙ the reference's specialized join family
  * (/root/reference/R/sits_merge.R:61-104, R/api_merge.R:51-280).
  * sits has no general join; these three shapes cover its semantics, each a
  * standard Spark relational op (shuffle on the equi-keys; the interval
  * predicate rides on the conv equi-join so no unbounded range join).
  */
object Merge {

  /** Positional zip of two same-grid series (`sits_merge.sits`,
    * sits_merge.R:61-104): equal timelines joined 1:1, second value column
    * suffixed.
    */
  def zip(a: DataFrame, b: DataFrame, suffix: String): DataFrame =
    a.join(b.select(col("conv_id"), col("bucket_ts"),
        col("value").as(s"value_$suffix")),
      Seq("conv_id", "bucket_ts"))

  /** Union + dedup of two cube asset sets (`.merge_cube_strategy_union`,
    * api_merge.R:94-122: union of file_info, distinct on (band, date),
    * sorted).
    */
  def unionDedup(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b).dropDuplicates(keys)

  /** Interval-overlap merge (`.merge_strategy_intersects`,
    * api_merge.R:226-280): match each instant of timeline 2 (interval
    * `[t, t+p2)`) to the EARLIEST not-yet-used overlapping instant of
    * timeline 1 (`[t, t+p1)`), where each period is inferred from the first
    * two timeline points; keep only matched instants on both sides and
    * RE-DATE side 2's rows onto the matched timeline-1 instants.
    *
    * The timelines themselves are metadata-scale (bounded by the retention
    * window, like the reference's per-cube date vectors), so the greedy
    * sequential matching runs on the driver; the data-side work is two
    * pushed-down IN-filters plus one broadcast-joined re-dating — no
    * unbounded range join.
    */
  def intersectsAlign(t1: DataFrame, t2: DataFrame): DataFrame = {
    def tl(df: DataFrame): Array[java.sql.Timestamp] =
      df.select("bucket_ts").distinct().orderBy("bucket_ts")
        .collect().map(_.getTimestamp(0))
    val (tl1, tl2) = (tl(t1), tl(t2))
    require(tl1.length >= 2 && tl2.length >= 2,
      "intersectsAlign needs ≥2 timeline points per side to infer the period")
    val p1 = tl1(1).getTime - tl1(0).getTime
    val p2 = tl2(1).getTime - tl2(0).getTime
    // greedy over ascending t2 (api_merge.R:247-266): overlap of
    // [a, a+p2-1] with [b, b+p1-1], setdiff of already-matched t1 dates
    val used = scala.collection.mutable.Set[Long]()
    val pairs = tl2.flatMap { a =>
      val hit = tl1.find(b => a.getTime <= b.getTime + p1 - 1 &&
        b.getTime <= a.getTime + p2 - 1 && !used.contains(b.getTime))
      hit.foreach(b => used += b.getTime)
      hit.map(b => (a, b))
    }
    val spark = t1.sparkSession
    import spark.implicits._
    val mapping = broadcast(pairs.toSeq.toDF("t2_ts", "new_ts"))
    val keep1 = t1.filter(col("bucket_ts").isin(pairs.map(_._2): _*))
      .select(col("conv_id"), col("bucket_ts"), col("value"), lit("t1").as("src"))
    val redated2 = t2.join(mapping, col("bucket_ts") === col("t2_ts"))
      .select(col("conv_id"), col("new_ts").as("bucket_ts"), col("value"),
        lit("t2").as("src"))
    keep1.unionByName(redated2)
  }

  /** Temporal zipper alignment (`.merge_zipper_strategy`, api_merge.R:51-83):
    * for each consecutive pair of t1 instants per conv, admit the MINIMUM t2
    * instant falling inside `[t1_i, t1_{i+1})`.
    *
    * Executed as a sort-merge AS-OF SWEEP: union both sides tagged, one
    * per-conv ordered running window carries the most recent t1 instant onto
    * every t2 row, then min-per-interval is a plain aggregate. Work is
    * O(|t1|+|t2| · log) per conversation — the previous equi-join-on-conv +
    * interval filter materialized the per-conv intervals×points product,
    * which a hot conversation pays quadratically. Ties order t1 before t2 so
    * a t2 instant equal to a boundary lands in the interval that STARTS
    * there (the reference's `>= lo` / `< hi` bounds).
    */
  def zipperAlign(t1: DataFrame, t2: DataFrame): DataFrame = {
    val u = t1.select(col("conv_id"), col("ts"), lit(1).as("is_t1"))
      .unionByName(t2.select(col("conv_id"), col("ts"), lit(0).as("is_t1")))
    // running frame (unboundedPreceding..current): one forward pass per
    // partition — NOT the O(n²) re-scanned following frame
    val w = Window.partitionBy("conv_id").orderBy(col("ts"), col("is_t1").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("conv_id")
    u
      .withColumn("lo",
        last(when(col("is_t1") === 1, col("ts")), ignoreNulls = true).over(w))
      // rows at/after the LAST t1 instant have no closing boundary →
      // excluded (the reference's lead()-IS-NOT-NULL intervals)
      .withColumn("max_t1", max(when(col("is_t1") === 1, col("ts"))).over(wAll))
      .filter(col("is_t1") === 0 && col("lo").isNotNull && col("lo") < col("max_t1"))
      .groupBy(col("conv_id"), col("lo").as("ts_lo"))
      .agg(min(col("ts")).as("matched_ts"))
  }
}
