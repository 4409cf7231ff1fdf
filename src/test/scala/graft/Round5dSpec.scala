package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.model.Tier
import graft.operators.{Rollup, SeriesMining, SeriesOps, Summary}

/** Round-5 additions, batch 2: OHLC candlestick state + cascade,
  * heartbeat/uptime, top-share concentration, Kendall tau-b.
  */
class Round5dSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def tsAt(sec: Long) = new java.sql.Timestamp(h0 + sec * 1000)

  test("ohlc: open/close by (ts, turn_idx) order incl. a ts tie; cascade 1h->1d equals the direct daily state") {
    // hour 0: values 5 (t=10), 9 (t=20), 1 (t=30); two turns share t=40:
    // turn_idx 3 -> 7 then 4 -> 2, so close = 2. hour 1: single 8.
    val m = Seq(
      ("a", tsAt(10), 0, 5.0), ("a", tsAt(20), 1, 9.0),
      ("a", tsAt(30), 2, 1.0), ("a", tsAt(40), 3, 7.0),
      ("a", tsAt(40), 4, 2.0), ("a", tsAt(3700), 5, 8.0)
    ).toDF("conv_id", "ts", "turn_idx", "value")
    val hourly = Rollup.ohlcState(m, Tier.H1)
    val rows = Rollup.ohlcPresent(hourly).orderBy("bucket_ts").collect()
    assert(rows.length == 2)
    val h1 = rows(0)
    assert(h1.getLong(2) == 5 && h1.getDouble(3) == 5.0 &&
      h1.getDouble(4) == 9.0 && h1.getDouble(5) == 1.0 &&
      h1.getDouble(6) == 2.0, h1.toString)
    val h2 = rows(1)
    assert(h2.getLong(2) == 1 && h2.getDouble(3) == 8.0 &&
      h2.getDouble(6) == 8.0)
    // algebraic merge: cascading the hourly states to daily must equal
    // the daily state computed directly from raw
    val viaCascade = Rollup.ohlcPresent(Rollup.ohlcCascade(hourly, Tier.D1))
      .orderBy("conv_id", "bucket_ts").collect()
    val direct = Rollup.ohlcPresent(Rollup.ohlcState(m, Tier.D1))
      .orderBy("conv_id", "bucket_ts").collect()
    assert(viaCascade.toSeq == direct.toSeq)
    assert(viaCascade.length == 1 && viaCascade(0).getDouble(3) == 5.0 &&
      viaCascade(0).getDouble(6) == 8.0 && viaCascade(0).getLong(2) == 6)
  }

  test("heartbeat: interval-union live time, segment split at gap > W, trailing window") {
    // W = 100s. conv a beats at 0, 50, 80, 300 (s):
    // gaps 50, 30, 220 -> live = 50+30+100 + 100(trailing) = 280s;
    // segments = 2 (the 220s gap splits); span = 300+100 = 400s;
    // dead = 120s (the uncovered 180..300 stretch).
    // conv b: single beat -> live = W, dead = 0, one segment.
    val t = (Seq(0L, 50, 80, 300).zipWithIndex.map { case (sec, i) =>
      ("a", tsAt(sec), i) } :+ ("b", tsAt(7), 0))
      .toDF("conv_id", "ts", "turn_idx")
    val m = SeriesOps.heartbeat(t, windowMs = 100000L).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = m("a")
    assert(a.getLong(1) == 4 && a.getLong(2) == 2 &&
      a.getLong(3) == 280000L && a.getLong(4) == 120000L, a.toString)
    val b = m("b")
    assert(b.getLong(1) == 1 && b.getLong(2) == 1 &&
      b.getLong(3) == 100000L && b.getLong(4) == 0L, b.toString)
  }

  test("topShare: integer-ceiling k; boundary tie group contributes (k - above)*c for any tie-break") {
    // 7 keys, counts: one 10, three 4, three 1 -> total = 25.
    // 40% of 7 keys: k = ceil(2.8) = 3 -> top = 10 + 2 of the tied 4s
    // = 18; share = 0.72. Which two 4-keys is irrelevant to the sum.
    val df = (Seq.fill(10)("h") ++
      Seq("x", "y", "z").flatMap(k => Seq.fill(4)(k)) ++
      Seq("p", "q", "r")).toDF("k")
    val r = Summary.topShare(df, col("k"), num = 40, den = 100).collect()(0)
    assert(r.getLong(0) == 7 && r.getLong(1) == 25 && r.getLong(2) == 3 &&
      r.getLong(3) == 18 && r.getDouble(4) == 0.72, r.toString)
  }

  test("topShare: k never exceeds n_keys (num = den takes everything)") {
    val df = Seq("a", "a", "b").toDF("k")
    val r = Summary.topShare(df, col("k"), num = 1, den = 1).collect()(0)
    assert(r.getLong(2) == 2 && r.getLong(3) == 3 &&
      r.getDouble(4) == 1.0, r.toString)
  }

  test("kendallTau: tau-b with tie correction; all-tied series excluded") {
    // conv a day means 1, 2, 2, 3 (see Round5cSpec MK fixture):
    // S = 5, n0 = 6, T_y = 1 -> tau_b = 5/sqrt(6*5) = 0.9129
    // conv b: all means equal -> n0 = n_tie -> excluded
    val day = Seq(("a", 1, 2L, 2L), ("a", 2, 4L, 2L), ("a", 3, 6L, 3L),
      ("a", 4, 3L, 1L), ("b", 1, 2L, 1L), ("b", 2, 4L, 2L))
      .toDF("conv_id", "idx", "s", "c")
    val out = SeriesMining.kendallTau(day).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getString(0) == "a" && r.getLong(2) == 5 &&
      r.getLong(3) == 1 && r.getDouble(4) == 0.9129, r.toString)
  }
}
