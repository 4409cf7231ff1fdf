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

  /** Temporal zipper alignment (`.merge_zipper_strategy`, api_merge.R:51-83):
    * for each consecutive pair of t1 instants per conv, admit the MINIMUM t2
    * instant falling inside `[t1_i, t1_{i+1})` — an as-of/interval join
    * realized as lead-window intervals + equi-join on conv + min_by.
    */
  def zipperAlign(t1: DataFrame, t2: DataFrame): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("ts")
    val intervals = t1
      .withColumn("ts_hi", lead(col("ts"), 1).over(w))
      .filter(col("ts_hi").isNotNull)
      .select(col("conv_id"), col("ts").as("ts_lo"), col("ts_hi"))
    intervals
      .join(t2.select(col("conv_id"), col("ts").as("t2_ts")), Seq("conv_id"))
      .filter(col("t2_ts") >= col("ts_lo") && col("t2_ts") < col("ts_hi"))
      .groupBy(col("conv_id"), col("ts_lo"))
      .agg(min(col("t2_ts")).as("matched_ts"))
  }
}
