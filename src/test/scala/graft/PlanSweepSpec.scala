package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide physical-plan sweep: every driver query's executed plan is
  * checked for the two unconditional scale-killers. Unlike PlanSpec's
  * per-query shape guards, this net catches a regression in ANY query —
  * including ones added later without their own guard.
  *
  *  - CartesianProduct is never acceptable: every pair-producing join in the
  *    engine is bucketed (LSH bands, SimHash segments, IVF cells) or
  *    broadcast; a cartesian fallback means a join key was lost.
  *  - Exchange SinglePartition is acceptable ONLY on label/bucket-bounded
  *    final aggregates (one-row totals, m-bounded sketches) — the explicit
  *    allowlist below; anywhere else it means a full relation is being
  *    funneled through one task.
  */
class PlanSweepSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries whose plans contain a single-partition exchange over a
    * BOUNDED relation (scalar totals over label-/bucket-bounded inputs):
    * confusion totals (overall + per-class kappa), Olofsson area totals,
    * the m-bounded occupied-bucket
    * count, label summaries, sampling-design totals, stratified-sampling
    * allocation totals, BM25 corpus stats, DSIR bucket-model totals.
    */
  private val boundedSinglePartition = Set(
    "ts_accuracy", "ts_accuracy_area", "ts_accuracy_class",
    "ts_approx_distinct",
    "ts_label_summary", "ts_sampling_design", "ts_strat_sample",
    "txt_bm25", "txt_dsir",
    "txt_budget") // corpus-word total over |langs|×|sources| cells

  test("no query plans a CartesianProduct; SinglePartition only on bounded aggregates") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val p = fn(spark, dir).queryExecution.executedPlan.toString
      if (p.contains("CartesianProduct"))
        offenders += s"$name: CartesianProduct"
      if (p.contains("Exchange SinglePartition") &&
          !boundedSinglePartition(name))
        offenders += s"$name: unallowlisted Exchange SinglePartition"
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
  }
}
