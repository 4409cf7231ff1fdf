package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Turn

/** The engine's input table: `transcripts(conv_id, turn_idx, role, text,
  * tool, ts)` per BASELINE.json `input_hint`.
  *
  * Two constructors:
  *  - [[fromEvents]]: a deterministic, *oracle-reproducible* derivation from
  *    the driver's `events` parquet — both Spark and DuckDB compute the exact
  *    same rows, which lets every downstream time-series operator be
  *    hash-verified against a DuckDB oracle.
  *  - [[synthetic]]: the seeded generator of FIXTURES.md §1 (skewed turn
  *    counts, irregular gaps) used by unit tests and the scaling bench.
  */
object Transcripts {

  /** Derive transcripts from `events.parquet` — deterministic, total-order
    * reproducible (row_number over the unique key (ts, event_id)).
    * Mirrored 1:1 by [[oracleCte]] for DuckDB.
    */
  def fromEvents(spark: SparkSession, dir: String): DataFrame = {
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    ev.withColumn("conv_id", concat(lit("c"), lpad(col("user_id").cast("string"), 6, "0")))
      .withColumn("turn_idx", (row_number().over(w) - 1).cast("int"))
      .select(
        col("conv_id"),
        col("turn_idx"),
        when(pmod(col("event_id"), lit(3)) === 0, lit("user"))
          .when(pmod(col("event_id"), lit(3)) === 1, lit("assistant"))
          .otherwise(lit("tool")).as("role"),
        concat(col("conv_id"), lit(":"), col("turn_idx").cast("string"),
          lit(":"), col("props")).as("text"),
        when(col("event_type").isin("click", "view"), lit(null).cast("string"))
          .otherwise(col("event_type")).as("tool"),
        col("ts"))
  }

  /** DuckDB CTE computing the identical transcripts relation from
    * `events` — the shared prefix of every ts_* oracle query.
    */
  val oracleCte: String =
    """WITH t0 AS (
      |  SELECT 'c' || lpad(cast(user_id AS varchar), 6, '0') AS conv_id,
      |         cast(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS int) AS turn_idx,
      |         CASE cast(event_id % 3 AS int) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      |         props, event_type, ts
      |  FROM events
      |), transcripts AS (
      |  SELECT conv_id, turn_idx, role,
      |         conv_id || ':' || cast(turn_idx AS varchar) || ':' || props AS text,
      |         CASE WHEN event_type IN ('click','view') THEN NULL ELSE event_type END AS tool,
      |         ts
      |  FROM t0
      |)""".stripMargin

  /** Series assembly ≙ `sits_get_data` / `.ts_get_raster_data`
    * (/root/reference/R/sits_get_data.R:109, R/api_ts.R:224-333): group a
    * metric's turns into one nested, time-sorted series row per
    * conversation — the `sits` tibble shape. One shuffle;
    * `sort_array(collect_list(struct(...)))` gives deterministic order
    * regardless of ambient partitioning.
    */
  def assembleSeries(metrics: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    metrics
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("ts"), col(valueCol).as("v"))))
        .as("series"))
      .select(col("conv_id"),
        size(col("series")).as("n_points"),
        col("series")(0).getField("ts").as("start_ts"),
        element_at(col("series"), -1).getField("ts").as("end_ts"),
        col("series")(0).getField("v").as("first_v"),
        element_at(col("series"), -1).getField("v").as("last_v"),
        round(expr("aggregate(series, cast(0 as double), (s, p) -> s + p.v)")
          + lit(1e-9), 4).as("sum_v"),
        col("series"))
  }

  /** Deterministic seeded transcript generator (FIXTURES.md §1). Distributed:
    * one task per conversation-range; every turn derivable from (seed,
    * convIdx, turnIdx) alone, so output is invariant to partitioning —
    * required for resume/idempotence tests. Zipf-ish skew: ~1% of convs are
    * "hot" with ~100× median turns (exercises the skew path).
    */
  def synthetic(spark: SparkSession, nConv: Int, seed: Long = 42L,
      startEpochSec: Long = 1735689600L /* 2025-01-01T00:00:00Z */): Dataset[Turn] = {
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    spark.range(0, nConv.toLong, 1, math.min(nConv, parallelism * 4))
      .as[Long]
      .flatMap { convIdx =>
        val rnd = new java.util.Random(seed * 1000003L + convIdx)
        val convId = f"c${convIdx}%06d"
        val median = 24
        val hot = convIdx % 101 == 7 // deterministic ~1% hot conversations
        val nTurns = if (hot) median * 100 + rnd.nextInt(median * 30)
                     else 4 + rnd.nextInt(2 * median)
        var t = startEpochSec + (convIdx * 7919L) % (30L * 86400) // start offset in 30d window
        (0 until nTurns).map { i =>
          // irregular gaps: 1 s .. ~3 h, exp-like via squared uniform
          val u = rnd.nextDouble()
          t += 1 + (u * u * 10800).toLong
          val role = (i % 3) match {
            case 0 => "user"; case 1 => "assistant"; case 2 => "tool"
          }
          val tool = if (role == "tool" && rnd.nextInt(4) != 0) s"tool${rnd.nextInt(5)}" else null
          val pad = "x" * (math.abs((convIdx * 31 + i * 17) % 240)).toInt
          Turn(convId, i, role, s"$convId:$i:$pad", tool,
            new java.sql.Timestamp(t * 1000L))
        }
      }
  }
}
