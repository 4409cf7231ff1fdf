package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SeriesOps}

/** Round-5 additions, batch 6: Page–Hinkley drift, Allan variance, tool
  * transitions, novelty-rate timeline.
  */
class Round5hSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1704067200000L
  private def tsAt(sec: Long) = new java.sql.Timestamp(h0 + sec * 1000)

  test("pageHinkley: level shift fires the increase side; constant series never alarms") {
    // 10 at 10.0 then 10 at 14.0: running mean trails the shift, so
    // u accumulates ~ (14 - m - delta) per step and crosses lambda
    val vals = Seq.fill(10)(10.0) ++ Seq.fill(10)(14.0)
    val m = vals.zipWithIndex.map { case (v, i) => ("a", tsAt(i * 60), i, v) }
      .toDF("conv_id", "ts", "turn_idx", "value")
    val r = SeriesOps.pageHinkley(m, delta = 0.5, lambda = 3.0).collect()(0)
    assert(r.getLong(1) == 20 && r.getLong(2) >= 1, r.toString)
    // hand-replay to the first alarm: m_i tracks prefix means of the data
    var s = 0.0; var u = 0.0; var first = -1L
    def r4d(x: Double) = BigDecimal(x + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    vals.zipWithIndex.foreach { case (y, i) =>
      s += y
      val mm = r4d(s / (i + 1))
      u = math.max(0.0, r4d(u + y - mm - 0.5))
      if (u > 3.0 && first < 0) { first = h0 + i * 60000L; u = 0.0 }
    }
    assert(r.getLong(3) == first, s"${r.getLong(3)} vs $first")
    val const = (0 until 8).map(i => ("c", tsAt(i * 60), i, 5.0))
      .toDF("conv_id", "ts", "turn_idx", "value")
    val rc = SeriesOps.pageHinkley(const, 0.5, 3.0).collect()(0)
    assert(rc.getLong(2) == 0 && rc.getDouble(4) == 0.0)
  }

  test("allanVariance: regular cadence is zero; alternating 10s/20s gaps give 50/2=50 s^2") {
    val reg = (0 until 6).map(i => ("a", tsAt(i * 30), i))
      .toDF("conv_id", "ts", "turn_idx")
    val ra = SeriesOps.allanVariance(reg).collect()(0)
    assert(ra.getLong(1) == 5 && ra.getDouble(2) == 0.0)
    // beats at 0,10,30,40,60 -> gaps 10,20,10,20; diffs +10,-10,+10
    // AVAR = (100+100+100)/(2*3) = 50; ADEV = sqrt(50) = 7.0711
    val times = Seq(0L, 10, 30, 40, 60)
    val jit = times.zipWithIndex.map { case (t, i) => ("b", tsAt(t), i) }
      .toDF("conv_id", "ts", "turn_idx")
    val rb = SeriesOps.allanVariance(jit).collect()(0)
    assert(rb.getLong(1) == 4 && rb.getDouble(2) == 50.0 &&
      rb.getDouble(3) == 7.0711, rb.toString)
  }

  test("toolTransitions: counts over the tool-turn subsequence with exact shares") {
    val t = Seq(
      ("a", 0, tsAt(0), "s"), ("a", 1, tsAt(10), null),
      ("a", 2, tsAt(20), "g"), ("a", 3, tsAt(30), "s"),
      ("b", 0, tsAt(5), "s"), ("b", 1, tsAt(15), "g")
    ).toDF("conv_id", "turn_idx", "ts", "tool")
    val m = SeriesOps.toolTransitions(t).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // a: s->g (null skipped), g->s; b: s->g
    assert(m(("s", "g")) == (2L, 1.0) && m(("g", "s")) == (1L, 1.0))
    assert(m.size == 2)
  }

  test("noveltyRate: first-day fingerprints counted once; repeats lower the share") {
    def day(i: Int) = new java.sql.Timestamp(h0 + i * 86400000L)
    val t = Seq(
      ("x", day(0)), ("y", day(0)), // day 0: both new
      ("x", day(1)), ("z", day(1)), ("z", day(1)), // day 1: z new, x repeat
      ("x", day(2)), ("y", day(2)) // day 2: nothing new
    ).toDF("fp_src", "ts")
    val rows = Dedup.noveltyRate(t, col("fp_src")).orderBy("day").collect()
    assert(rows.length == 3)
    assert(rows(0).getLong(1) == 2 && rows(0).getLong(2) == 2 &&
      rows(0).getLong(3) == 2 && rows(0).getDouble(4) == 1.0)
    assert(rows(1).getLong(1) == 3 && rows(1).getLong(2) == 2 &&
      rows(1).getLong(3) == 1 && rows(1).getDouble(4) == 0.5)
    assert(rows(2).getLong(3) == 0 && rows(2).getDouble(4) == 0.0)
  }
}
