package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** General user-facing expression API ≙ `sits_apply`
  * (/root/reference/R/sits_apply.R:89-248, R/api_apply.R:11-187): define a
  * new metric (≙ band) from an arbitrary expression over existing metrics,
  * including references to the `w_*` moving-window kernels
  * (R/api_apply.R:284-330 kernel-dispatch environment).
  *
  * Plain expressions compile straight to a Catalyst `withColumn` — zero
  * shuffle, fully codegen'd (the reference evaluates the R expression per
  * block; Catalyst is the same idea with a real optimizer). Kernel
  * references `w_<stat>(<metric>, <k>)` are rewritten to columns produced by
  * [[KernelWindows]] (mirrored edges, reference-exact) and joined back on
  * the grid key — one extra shuffle per distinct (metric, k) pair, each a
  * plain equi-join on (conv_id, bucket_ts).
  */
object Apply {

  private val KernelRef =
    """w_(sum|mean|median|min|max|sd|var|modal)\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*,\s*([0-9]+)\s*\)""".r

  /** Add metric `name` = `expression` to a regular grid keyed by
    * (conv_id, bucket_ts). `expression` is Spark SQL over the grid's metric
    * columns plus optional `w_<stat>(metric, k)` kernel calls.
    */
  def withMetric(grid: DataFrame, name: String, expression: String): DataFrame = {
    val refs = KernelRef.findAllMatchIn(expression)
      .map(m => (m.group(1), m.group(2), m.group(3).toInt)).toSeq.distinct
    val slot = refs.zipWithIndex.toMap
    val rewritten = KernelRef.replaceAllIn(expression, m =>
      s"__w${slot((m.group(1), m.group(2), m.group(3).toInt))}")
    // one KernelWindows pass per distinct (metric, k); distinct stats of the
    // same pass share it
    val df = refs.groupBy { case (_, metric, k) => (metric, k) }
      .foldLeft(grid) { case (acc, ((metric, k), group)) =>
        val kw = KernelWindows(
          grid.select(col("conv_id"), col("bucket_ts"), col(metric).as("value")), k)
        val picked = kw.select(
          Seq(col("conv_id"), col("bucket_ts")) ++
            group.map { case r @ (stat, _, _) => col(s"w_$stat").as(s"__w${slot(r)}") }: _*)
        acc.join(picked, Seq("conv_id", "bucket_ts"))
      }
    df.withColumn(name, expr(rewritten))
      .drop(refs.map(r => s"__w${slot(r)}"): _*)
  }
}
