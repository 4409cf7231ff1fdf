package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** CSV exports ≙ the reference's `sits_to_csv` (sample metadata,
  * /root/reference/R/sits_csv.R:25-50) and `sits_timeseries_to_csv`
  * (unnested per-point series, R/sits_csv.R). Plain `df.write.csv` with
  * header; `single = true` coalesces to one part file for the reference's
  * one-file convention — an explicit, bounded choice the caller makes for
  * sample-set exports, never the default (at cube scale you keep the
  * distributed multi-part layout).
  */
object Exports {

  /** Sample metadata export (`sits_to_csv`): identity + extent + label per
    * series — here (conv_id, start_ts, end_ts, n_points, label?).
    */
  def toCsv(df: DataFrame, path: String, single: Boolean = false): Unit =
    write(df, path, single)

  /** Per-point long-format series export (`sits_timeseries_to_csv`):
    * (conv_id, ts, metric, value) rows from a metric grid.
    */
  def timeseriesToCsv(grid: DataFrame, metric: String, path: String,
      single: Boolean = false): Unit =
    write(grid.select(col("conv_id"), col("bucket_ts").as("ts"),
      lit(metric).as("metric"), col("value")), path, single)

  private def write(df: DataFrame, path: String, single: Boolean): Unit =
    (if (single) df.coalesce(1) else df)
      .write.mode(SaveMode.Overwrite).option("header", "true")
      // ISO-8601 UTC timestamps so a round-trip re-read parses identically
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)

  /** Re-read a CSV export with an explicit schema (no inference — schemas
    * are fixed in this engine, SURVEY §1.3).
    */
  def readCsv(spark: org.apache.spark.sql.SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(path)
}
