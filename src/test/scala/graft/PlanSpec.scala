package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-plan regression guards: the properties that make these queries
  * scale (pushdown, pruning, broadcast, partial aggregation, salting) must
  * stay visible in the executed plan — a silent planner regression here is
  * a 100× slowdown at 10^12 rows long before it's a correctness bug.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("parquet scans prune columns to what the query references") {
    // events has (event_id, ts, user_id, event_type, value, props); the
    // regularize path must not read `value`/`event_type`/`props`
    val p = plan("ts_regular_1m")
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("ts") && scanLine.contains("user_id"))
    assert(!scanLine.contains("value"), s"unpruned scan: $scanLine")
  }

  test("predicate pushdown reaches the parquet scan for plain filters") {
    val df = spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,10"),
      s"no pushed filter in:\n$p")
  }

  test("aggregations are two-phase (map-side partial combine)") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "no partial aggregation")
    // densify's quality-first agg is also partial (min_by)
    assert(plan("ts_regular_1m").contains("partial_min_by"))
  }

  test("small sides broadcast: densify grid join and base-covariate join") {
    assert(plan("ts_regular_1m").contains("BroadcastHashJoin"))
    assert(plan("ts_base_join").contains("BroadcastHashJoin"))
  }

  test("normalize has no single-reducer percentile and no join at all") {
    // exactQuantiles folds q02/q98 in as literals; the data-side plan must
    // carry neither a Percentile aggregate (whose final merge buffers every
    // value on one task) nor any join/single-partition exchange
    val p = plan("ts_normalize")
    assert(!p.contains("percentile"), s"percentile agg survived:\n$p")
    assert(!p.contains("Join"), s"unexpected join:\n$p")
    assert(!p.contains("SinglePartition"), s"single-partition exchange:\n$p")
  }

  test("global top-k plans as TakeOrderedAndProject, not a global window") {
    val p = plan("ts_topk_uncertain")
    assert(p.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject:\n$p")
    // the only window runs AFTER the limit over ≤20 rows, partitioned by a
    // constant — the unbounded relation itself must never hit a
    // single-partition exchange
    val beforeLimit = p.substring(p.indexOf("TakeOrderedAndProject"))
    assert(!beforeLimit.contains("SinglePartition"),
      s"single-partition exchange below the limit:\n$p")
  }

  test("period rollup: bucket arithmetic aggregates with partial combine, no timeline join") {
    val p = plan("ts_rollup_p16d")
    assert(p.contains("partial_count") || p.contains("partial_sum"), s"no partial agg:\n$p")
    // bucket assignment is pure arithmetic — the only join anywhere in this
    // plan would be a timeline join, which must not exist
    assert(!p.contains("Join"), s"unexpected timeline join:\n$p")
  }

  test("period regularize: timeline grid joins broadcast, firstValid is partial min_by") {
    val p = plan("ts_regular_p16d")
    assert(p.contains("partial_min_by"), s"no partial min_by:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"timeline grid not broadcast:\n$p")
  }

  test("salted rollup really is two aggregation phases keyed by __salt") {
    val p = plan("ts_rollup_salted")
    assert(p.contains("__salt"))
    // 4 HashAggregates: partial+final of the salted phase, then
    // partial+final of the merge phase
    assert(p.sliding("HashAggregate".length).count(_ == "HashAggregate") >= 4, p)
    // final phase keys must NOT include the salt
    val finalAgg = p.linesIterator.find(l =>
      l.contains("HashAggregate") && l.contains("functions=[sum(n#")).getOrElse("")
    assert(!finalAgg.contains("__salt"), s"salt leaked into final keys: $finalAgg")
  }

  test("LSH band self-join is an equi-join on the band key, never a cross join") {
    val p = graft.operators.Dedup.minhashPairs(
      spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cross join in LSH band join:\n$p")
    assert(p.contains("band_key"), "band key missing from join")
  }

  test("k-means / IVF centroid scoring broadcasts the centroid side") {
    val p = plan("ann_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid side not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      "centroid scoring fell back to a cartesian product")
    assert(!p.contains("SortMergeJoin"),
      "centroid scoring shuffled both sides")
  }

  test("per-domain cap plans as WindowGroupLimit (partial top-k before the shuffle)") {
    val p = plan("txt_domain_cap")
    assert(p.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$p")
    assert(p.contains("Partial") || p.contains("partial"),
      s"no partial phase — every row shuffles:\n$p")
  }

  test("decontamination broadcasts the benchmark gram vocabulary") {
    val p = plan("txt_decontam")
    assert(p.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      "training grams shuffled against the benchmark side")
  }

  test("bloom screen: occupied-position set broadcasts, probe never shuffles against history") {
    val p = plan("dd_bloom")
    assert(p.contains("BroadcastHashJoin"), s"position set not broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian in bloom probe:\n$p")
  }

  test("CMS probe joins the bounded sketch via broadcast") {
    val p = plan("txt_cms")
    assert(p.contains("BroadcastHashJoin"), s"sketch not broadcast:\n$p")
  }

  test("DSIR: log-ratio lookup broadcasts; selection is TakeOrderedAndProject") {
    val p = plan("txt_dsir")
    assert(p.contains("BroadcastHashJoin"), s"lr lookup not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"top-k became a global sort:\n$p")
  }

  test("model quality gate: scoring is map-only with literal weights + TakeOrderedAndProject") {
    val p = plan("txt_quality_model")
    assert(p.contains("TakeOrderedAndProject"), s"rank gate is a global sort:\n$p")
    // scoring embeds the trained weights as literals over one scan — no
    // join, no shuffle, no aggregation in the returned plan (training ran
    // as separate gradient jobs)
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"scoring pass is not map-only:\n$p")
  }
}
