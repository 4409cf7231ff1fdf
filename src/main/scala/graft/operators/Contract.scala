package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-contract validation battery — the ingestion gate a transcript
  * store runs before committing a batch (the dbt-test / Deequ shape,
  * specialized to the (conv_id, turn_idx, role, text, ts) contract the
  * whole engine assumes):
  *
  *   - `duplicate_turn_key`   rows sharing a (conv_id, turn_idx) key
  *   - `event_time_inversion` ts decreasing against arrival (turn) order
  *   - `null_or_empty_text`   turns with no payload
  *   - `role_out_of_vocab`    roles outside the protocol vocabulary
  *   - `turn_idx_gap`         holes in the per-conv 0..n−1 index range
  *
  * Scale shape: ONE conv-partitioned window pass (the lag for inversions)
  * + ONE per-conv hash agg carrying all six counters, then a 5-row
  * `stack` unpivot and a ≤5-group final agg — no second scan per check,
  * which is the difference between "run 5 dbt tests" (5 scans) and one
  * validation pass at 10¹² turns. All-integer output — no rounding
  * contract: (check_name, n_violations, n_convs).
  */
object Contract {

  val defaultRoleVocab: Seq[String] = Seq("user", "assistant", "tool", "system")

  def contractChecks(transcripts: DataFrame,
      roleVocab: Seq[String] = defaultRoleVocab): DataFrame = {
    val w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    val marked = transcripts
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("inv",
        when(col("ts") < col("prev_ts"), 1L).otherwise(0L))
      .withColumn("nulltext",
        when(col("text").isNull || length(col("text")) === 0, 1L)
          .otherwise(0L))
      .withColumn("badrole",
        when(col("role").isin(roleVocab: _*), 0L).otherwise(1L))
    marked.groupBy("conv_id")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("turn_idx").as("n_idx"),
        max("turn_idx").cast("long").as("max_idx"),
        sum("inv").as("inv"),
        sum("nulltext").as("nulls"),
        sum("badrole").as("badrole"))
      .selectExpr("""stack(5,
          'duplicate_turn_key',   n_rows - n_idx,
          'event_time_inversion', inv,
          'null_or_empty_text',   nulls,
          'role_out_of_vocab',    badrole,
          'turn_idx_gap',         max_idx + 1 - n_idx
        ) AS (check_name, v)""")
      .groupBy("check_name")
      .agg(sum("v").as("n_violations"),
        sum(when(col("v") > 0, 1L).otherwise(0L)).as("n_convs"))
  }
}
