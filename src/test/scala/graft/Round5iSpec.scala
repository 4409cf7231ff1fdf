package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Features

/** Round-5 additions, batch 9: feature-engineering block (lag features,
  * rolling discrete quantiles, one-shuffle ROLLUP granularities, histogram-
  * CDF percentiles, heavy-change movers, winsorized means, calendar
  * profile).
  */
class Round5iSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1704067200000L // 2024-01-01T00:00:00Z (a Monday)
  private def tsAt(sec: Long) = new java.sql.Timestamp(h0 + sec * 1000)

  /** texts of lengths 2,4,6,1,3 at 0,60,180,240,360 s */
  private def conv =
    Seq(("a", 0, "xx", tsAt(0)), ("a", 1, "xxxx", tsAt(60)),
      ("a", 2, "xxxxxx", tsAt(180)), ("a", 3, "x", tsAt(240)),
      ("a", 4, "xxx", tsAt(360)))
      .toDF("conv_id", "turn_idx", "text", "ts")

  test("lagFeatures: lags, leakage-free trailing mean, gaps") {
    val r = Features.lagFeatures(conv).orderBy("turn_idx").collect()
    // turn 0: no history at all
    assert(r(0).isNullAt(3) && r(0).isNullAt(4) && r(0).isNullAt(5) &&
      r(0).isNullAt(6))
    // turn 2: lag1=4, lag2=2, roll3 = mean(2,4) = 3.0 (current EXCLUDED)
    assert(r(2).getLong(3) == 4 && r(2).getLong(4) == 2 &&
      r(2).getDouble(5) == 3.0 && r(2).getLong(6) == 120000L)
    // turn 4: roll3 = mean(4,6,1) = 3.6667 — only the 3 preceding
    assert(r(4).getDouble(5) == 3.6667 && r(4).getLong(6) == 120000L)
  }

  test("rollingQuantile: sorted-position contract, window caps at k") {
    val r = Features.rollingQuantile(conv, k = 3).orderBy("turn_idx").collect()
    // n=1: p50=p90=first value
    assert(r(0).getLong(2) == 1 && r(0).getLong(3) == 2 && r(0).getLong(4) == 2)
    // n=2 win=[2,4]: p50 at ceil(1.0)=1 -> 2; p90 at ceil(1.8)=2 -> 4
    assert(r(1).getLong(3) == 2 && r(1).getLong(4) == 4)
    // n=3 win=[2,4,6]: p50 at ceil(1.5)=2 -> 4; p90 at ceil(2.7)=3 -> 6
    assert(r(2).getLong(3) == 4 && r(2).getLong(4) == 6)
    // turn 3: window slides to [4,6,1] sorted [1,4,6] -> p50=4, p90=6
    assert(r(3).getLong(2) == 3 && r(3).getLong(3) == 4 && r(3).getLong(4) == 6)
  }

  test("rollupSets: one Expand pass yields per-(day,role), per-day, grand rows") {
    val t = Seq(
      ("a", 0, "xx", tsAt(0), "user"), ("a", 1, "xxxx", tsAt(60), "assistant"),
      ("b", 0, "xxx", tsAt(86400), "user"))
      .toDF("conv_id", "turn_idx", "text", "ts", "role")
    val r = Features.rollupSets(t).orderBy("gid", "day_s", "role").collect()
    val gids = r.map(_.getInt(0)).toSeq
    assert(gids == Seq(0, 0, 0, 1, 1, 3), gids.toString)
    // grand total row
    val g = r.last
    assert(g.getString(1) == "ALL" && g.getString(2) == "ALL" &&
      g.getLong(3) == 3 && g.getLong(4) == 9)
    // day subtotal of 2024-01-01: n=2, sum=6
    val d1 = r.filter(x => x.getInt(0) == 1 && x.getString(1) == "2024-01-01")
    assert(d1.length == 1 && d1(0).getLong(3) == 2 && d1(0).getLong(4) == 6)
    // exactly ONE shuffle: the Expand feeds a single hash aggregate
    val plan = Features.rollupSets(t).queryExecution.executedPlan.toString
    assert(plan.contains("Expand"))
    assert(plan.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 1, plan)
  }

  test("convPercentile: CDF upper bounds by log2 cell, top cell reads 1.0") {
    // conv lengths 1, 2, 3, 8 turns -> cells 0, 1, 1, 3
    val rows = (Seq.fill(1)("a") ++ Seq.fill(2)("b") ++ Seq.fill(3)("c") ++
      Seq.fill(8)("d")).zipWithIndex.map { case (c, i) =>
      (c, i, "x", tsAt(i * 10))
    }.toDF("conv_id", "turn_idx", "text", "ts")
    val r = Features.convPercentile(rows).orderBy("conv_id").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getDouble(2))).toSeq
    // cell CDF: cell0 cum 1/4, cell1 cum 3/4, cell3 cum 4/4
    assert(r == Seq(("a", 1L, 0.25), ("b", 2L, 0.75), ("c", 3L, 0.75),
      ("d", 8L, 1.0)), r.toString)
  }

  test("heavyChange: censored-at-threshold contract with integer deltas") {
    // half A: x×6 y×4; half B: x×2 y×8 — k=2 keeps items above half-mass/2
    val a = (Seq.fill(6)("x") ++ Seq.fill(4)("y")).toDF("w")
    val b = (Seq.fill(2)("x") ++ Seq.fill(8)("y")).toDF("w")
    val r = Features.heavyChange(a, b, "w", k = 2, topN = 10)
      .orderBy("item").collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    // A-heavy: x (6*2>10); B-heavy: y (8*2>10); censored sides -> 0
    assert(r.toSeq == Seq(("x", 6L, 0L, -6L), ("y", 0L, 8L, 8L)), r.toSeq)
  }

  test("winsorize: clip counts and exact-operand-order means") {
    // lens 1..10 in one conv; p05/p95 (quantile_cont) = 1.45 / 9.55
    val t = (1 to 10).map(i => ("a", i, "x" * i, tsAt(i * 10)))
      .toDF("conv_id", "turn_idx", "text", "ts")
    val r = Features.winsorize(t, 0.05, 0.95).collect()(0)
    assert(r.getLong(1) == 10 && r.getDouble(2) == 5.5)
    // clipped: len 1 -> 1.45, len 10 -> 9.55; mean = (44 + 1.45 + 9.55)/10
    assert(r.getDouble(3) == 5.5 && r.getLong(4) == 2, r.toString)
  }

  test("dowHourProfile: pure-epoch dow (2024-01-01 = Monday = 1) and hours") {
    val t = Seq(
      ("a", 0, "xx", tsAt(0)), // Mon 00h
      ("a", 1, "xxxx", tsAt(3600)), // Mon 01h
      ("b", 0, "xxxxxx", tsAt(86400 * 6 + 3600))) // Sunday 01h
      .toDF("conv_id", "turn_idx", "text", "ts")
    val r = Features.dowHourProfile(t).orderBy("dow", "hod").collect()
      .map(x => (x.getInt(0), x.getInt(1), x.getLong(2), x.getLong(3),
        x.getDouble(4))).toSeq
    assert(r == Seq((0, 1, 1L, 1L, 6.0), (1, 0, 1L, 1L, 2.0),
      (1, 1, 1L, 1L, 4.0)), r.toString)
  }
}
