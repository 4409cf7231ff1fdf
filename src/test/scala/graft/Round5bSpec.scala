package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{ChangeDetect, Downsample, Forecast, SeriesMining, SeriesOps, Summary}

/** Round-5 series additions: Holt-Winters, forecast backtest, binseg
  * changepoint, PAA, deadband compression, dominant period, burstiness,
  * HLL registers — kernel-level oracles on hand-computed fixtures
  * (the driver's DuckDB replay covers the e2e relation).
  */
class Round5bSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def tsAt(sec: Long) = new java.sql.Timestamp(h0 + sec * 1000)

  private def series(vals: Seq[Double], stepSec: Long = 60) =
    vals.zipWithIndex.map { case (v, i) =>
      ("a", i, tsAt(i * stepSec), v)
    }.toDF("conv_id", "turn_idx", "ts", "value")

  test("holtWinters: hand-replayed three-state recursion, m=2") {
    // y = 10, 14, 11, 15 with period 2: l0 = 12, ring = (-2, 2)
    val out = Forecast.holtWinters(series(Seq(10, 14, 11, 15)),
      alpha = 0.5, beta = 0.5, gamma = 0.5, period = 2)
      .orderBy("idx").collect()
    assert(out.length == 2) // idx 3 and 4 only (warmup = first cycle)
    // i=3: sUsed=-2, fc = 12+0-2 = 10; l = .5*(11+2)+.5*12 = 12.5;
    //      b = .5*(12.5-12)+0 = 0.25; s = .5*(11-12.5)+.5*(-2) = -1.75
    val r3 = out(0)
    assert(r3.getInt(1) == 3 && r3.getDouble(3) == 12.5 &&
      r3.getDouble(4) == 0.25 && r3.getDouble(5) == -1.75 &&
      r3.getDouble(6) == 10.0, r3.toString)
    // i=4: sUsed=2, fc = 12.5+0.25+2 = 14.75;
    //      l = .5*(15-2)+.5*12.75 = 12.875; b = .5*0.375+.5*0.25 = 0.3125;
    //      s = .5*(15-12.875)+.5*2 = 2.0625
    val r4r = out(1)
    assert(r4r.getInt(1) == 4 && r4r.getDouble(3) == 12.875 &&
      r4r.getDouble(4) == 0.3125 && r4r.getDouble(5) == 2.0625 &&
      r4r.getDouble(6) == 14.75, r4r.toString)
  }

  test("holtWinters: series no longer than the period emit nothing") {
    assert(Forecast.holtWinters(series(Seq(1, 2, 3, 4)),
      0.5, 0.5, 0.5, period = 4).count() == 0)
  }

  test("forecastAccuracy: naive one-step backtest on a hand fixture; constant train → mase NULL") {
    // y = 2,4,6,8,20: n=5, h=4 → test = {idx5}: e = 20-8 = 12
    // mae = 12, rmse = 12, wape = 100*12/20 = 60,
    // mase = 12*3/(1*(2+2+2)) = 6
    val out = Forecast.forecastAccuracy(series(Seq(2, 4, 6, 8, 20)))
      .collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 5 && r.getLong(2) == 1)
    assert(r.getDouble(3) == 12.0 && r.getDouble(4) == 12.0 &&
      r.getDouble(5) == 60.0 && r.getDouble(6) == 6.0, r.toString)
    // constant train: scale 0 → mase NULL; say > 0 → wape present
    val c = Forecast.forecastAccuracy(series(Seq(5, 5, 5, 5, 7))).collect()(0)
    assert(c.isNullAt(6) && !c.isNullAt(5))
    // n < 5 excluded
    assert(Forecast.forecastAccuracy(series(Seq(1, 2, 3, 4))).count() == 0)
  }

  test("changepointBinseg: clean mean shift found at the boundary; constant series has zero gain") {
    val out = ChangeDetect.changepointBinseg(
      series(Seq(0, 0, 0, 10, 10, 10)), minSeg = 2).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getInt(2) == 3, s"cp_idx ${r.getInt(2)}") // split after idx 3
    // gain = score - S_n^2/n = (0 + 900/3) - 900/6 = 150
    assert(r.getDouble(4) == 150.0, r.toString)
    val const = ChangeDetect.changepointBinseg(
      series(Seq(7, 7, 7, 7)), minSeg = 2).collect()(0)
    assert(const.getDouble(4) == 0.0 && const.getInt(2) == 2) // tie → earliest
    // n < 2*minSeg excluded
    assert(ChangeDetect.changepointBinseg(series(Seq(1, 2, 3)), minSeg = 2)
      .count() == 0)
  }

  test("paa: balanced contiguous frames; short series pass through one-per-frame") {
    val out = Downsample.paa(series((1 to 10).map(_.toDouble)), segments = 5)
      .orderBy("frame").collect()
    assert(out.map(_.getInt(1)).toSeq == (0 until 5))
    assert(out.forall(_.getLong(2) == 2))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.5, 3.5, 5.5, 7.5, 9.5))
    val short = Downsample.paa(series(Seq(4, 8)), segments = 5)
      .orderBy("frame").collect()
    assert(short.length == 2 && short.forall(_.getLong(2) == 1))
  }

  test("deadband: keep rule (first, last, |Δ|>dev vs last KEPT) with drift accumulation") {
    // dev=2: 10(keep) 11 12 13(|13-10|=3 keep) 13 12 11 14(last, keep)
    val out = Downsample.deadband(
      series(Seq(10, 11, 12, 13, 13, 12, 11, 14)), deviation = 2.0)
      .orderBy("seq").collect()
    assert(out.map(r => (r.getInt(1), r.getInt(2), r.getDouble(4))).toSeq ==
      Seq((1, 1, 10.0), (2, 4, 13.0), (3, 8, 14.0)), out.mkString(","))
    assert(out.forall(_.getLong(5) == 8))
    // single point: kept once (first == last)
    assert(Downsample.deadband(series(Seq(5)), 2.0).count() == 1)
  }

  test("dominantPeriod: alternating series picks lag 2; constant series excluded") {
    val alt = series(Seq.tabulate(12)(i => if (i % 2 == 0) 1.0 else 9.0))
    val out = SeriesOps.dominantPeriod(alt, maxLag = 4).collect()
    assert(out.length == 1 && out(0).getInt(2) == 2, out.mkString(","))
    assert(out(0).getDouble(3) > 0.5)
    val const = series(Seq.fill(12)(3.0))
    assert(SeriesOps.dominantPeriod(const, maxLag = 4).count() == 0)
  }

  test("burstiness: one-per-minute is maximally regular (B = -1); clustered counts go overdispersed (fano > 1)") {
    val regular = SeriesOps.burstiness(series((1 to 10).map(_.toDouble)))
      .collect()(0)
    assert(regular.getLong(1) == 10 && regular.getLong(2) == 10)
    assert(regular.getDouble(3) == 0.0 && regular.getDouble(4) == 0.0 &&
      regular.getDouble(5) == -1.0, regular.toString)
    // 10 events in minute 0 of an 11-minute span (one sentinel at the end)
    val burst = (0 until 10).map(i => ("a", i, tsAt(i.toLong), 1.0)) :+
      (("a", 10, tsAt(600), 1.0))
    val b = SeriesOps.burstiness(
      burst.toDF("conv_id", "turn_idx", "ts", "value")).collect()(0)
    assert(b.getLong(1) == 11 && b.getLong(2) == 11)
    assert(b.getDouble(3) > 1.0 && b.getDouble(5) > 0.0, b.toString)
  }

  test("discord: the isolated shape wins; overlapping neighbors are excluded from the NN") {
    // day-series (conv_id, idx, value): flat zeros with a (9,9) bump at
    // positions 7-8; w=2 → the (9,9) subsequence's only non-overlapping
    // neighbors are (0,0)-shaped: nn = 2·(9·10⁴)² = 16.2e9
    val days = (1 to 12).map(i =>
      ("a", i, if (i == 7 || i == 8) 9.0 else 0.0))
      .toDF("conv_id", "idx", "value")
    val out = SeriesMining.discord(days, w = 2).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getInt(2) == 7 && r.getLong(3) == 16200000000L, r.toString)
    // series too short for a non-overlapping pair emit nothing
    val short = (1 to 3).map(i => ("a", i, 1.0)).toDF("conv_id", "idx", "value")
    assert(SeriesMining.discord(short, w = 2).count() == 0)
  }

  test("theilSen: breakdown resistance — one wild outlier moves neither median slope nor intercept") {
    val days = Seq(("a", 0, 1.0), ("a", 1, 3.0), ("a", 2, 5.0),
      ("a", 3, 7.0), ("a", 4, 100.0)).toDF("conv_id", "idx", "value")
    val r = SeriesMining.theilSen(days).collect()(0)
    assert(r.getLong(1) == 5 && r.getLong(2) == 10)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 1.0, r.toString)
  }

  test("drawdown: peak-to-trough of the cumulative with FIRST argmax index") {
    // values 1,-2,3,-1 → cum 1,-1,2,1; runmax 1,1,2,2; dd 0,2,0,1
    val m = Seq(1.0, -2.0, 3.0, -1.0).zipWithIndex.map { case (v, i) =>
      ("a", i, tsAt(i * 60L), v)
    }.toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.drawdown(m).collect()(0)
    assert(r.getLong(1) == 4 && r.getDouble(2) == 2.0 && r.getInt(3) == 2,
      r.toString)
  }

  test("roleDiversity: exact rational impurity and inverse Simpson") {
    val tr = Seq(("a", 0, "user"), ("a", 1, "user"), ("a", 2, "assistant"),
      ("a", 3, "tool"), ("b", 0, "user"))
      .toDF("conv_id", "turn_idx", "role")
    val out = SeriesOps.roleDiversity(tr).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = out("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 3 &&
      a.getDouble(3) == 0.625 && a.getDouble(4) == 2.6667, a.toString)
    val b = out("b") // single role: impurity 0, effective roles 1
    assert(b.getDouble(3) == 0.0 && b.getDouble(4) == 1.0)
  }

  test("topPerBucket: k heaviest keys per bucket, count-desc/key-asc ties; plan is WindowGroupLimit") {
    val df = (Seq.fill(3)("k1") ++ Seq.fill(2)("k2") ++ Seq.fill(2)("k3") ++
      Seq("k4")).map(k => (1, k)).toDF("b", "k")
    val top = Summary.topPerBucket(df, col("b"), col("k"), k = 3)
    val rows = top.orderBy("rank").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getLong(3))).toSeq
    assert(rows == Seq((1, "k1", 3L), (2, "k2", 2L), (3, "k3", 2L)), rows)
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(400))
  }

  test("hllRegisters: rho in [1, 33-p]; register in [0, 2^p); split-merge (max) equals whole-corpus sketch") {
    val docs = (0 until 500).map(i => Tuple1(s"key-$i")).toDF("k")
    val whole = Summary.hllRegisters(docs, "k", p = 8).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(whole.keys.forall(r => r >= 0 && r < 256))
    assert(whole.values.forall(v => v >= 1 && v <= 25))
    val half1 = Summary.hllRegisters(docs.filter(length(col("k")) % 2 === 0), "k", p = 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val half2 = Summary.hllRegisters(docs.filter(length(col("k")) % 2 === 1), "k", p = 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val merged = (half1.keySet ++ half2.keySet).map(k =>
      k -> math.max(half1.getOrElse(k, 0), half2.getOrElse(k, 0))).toMap
    assert(merged == whole)
    // duplicates do not move the sketch
    val dup = Summary.hllRegisters(docs.union(docs), "k", p = 8).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(dup == whole)
  }
}
