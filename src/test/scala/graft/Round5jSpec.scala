package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Features, SeriesMining, SeriesOps}

/** Round-5 additions, batch 10: Ljung–Box, seasonal strength, sample
  * entropy, week-over-week calendar anomaly.
  */
class Round5jSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1704067200000L // 2024-01-01T00:00:00Z (a Monday)
  private def tsAt(sec: Long) = new java.sql.Timestamp(h0 + sec * 1000)
  private def r4d(x: Double) = BigDecimal(x + 1e-9)
    .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("ljungBox: Q replays from the quantized ACF; monotone ramp rejects IID") {
    val ramp = (0 until 20).map(i => ("a", i, tsAt(i * 60), i * 10.0))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.ljungBox(ramp).collect()(0)
    val a = SeriesOps.acf(ramp).collect()(0)
    val n = 20.0
    val q = r4d(n * (n + 2) * (a.getDouble(2) * a.getDouble(2) / (n - 1) +
      a.getDouble(3) * a.getDouble(3) / (n - 2) +
      a.getDouble(4) * a.getDouble(4) / (n - 3)))
    assert(r.getDouble(2) == q && r.getInt(3) == 1, r.toString)
    // too-short series drop
    val short = (0 until 3).map(i => ("b", i, tsAt(i * 60), i * 1.0))
      .toDF("conv_id", "turn_idx", "ts", "value")
    assert(SeriesOps.ljungBox(short).count() == 0)
  }

  test("seasonalStrength: a pure hour-of-day cycle scores f_seasonal = 1.0") {
    // 4 days of hourly points: v = 100 + 10·sin-ish hod pattern, no noise,
    // no trend -> detrended residual is fully explained by the hod index
    val pat = (h: Int) => (h % 24 match {
      case x if x < 12 => x
      case x => 24 - x
    }) * 10.0
    val t = (0 until 96).map { h =>
      ("a", h, tsAt(h.toLong * 3600), 100.0 + pat(h))
    }.toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.seasonalStrength(t, date_trunc("hour", col("ts")))
      .collect()(0)
    assert(r.getLong(1) == 72 && r.getDouble(3) == 1.0, r.toString)
    // constant series has zero detrended variance -> drops
    val const = (0 until 96).map(h => ("c", h, tsAt(h.toLong * 3600), 5.0))
      .toDF("conv_id", "turn_idx", "ts", "value")
    assert(SeriesOps.seasonalStrength(const,
      date_trunc("hour", col("ts"))).count() == 0)
  }

  test("sampleEntropy: hand-computed counts; constant series scores 0") {
    val d = Seq(0L, 0L, 0L, 0L, 100L).zipWithIndex
      .map { case (v, i) => ("a", i, v) }.toDF("conv_id", "idx", "v")
    val r = SeriesMining.sampleEntropy(d, r = 10L).collect()(0)
    // pairs over i<j in [0,2]: B = 3 matches, A = 1 (only (0,1) extends)
    assert(r.getLong(1) == 5 && r.getLong(2) == 3 && r.getLong(3) == 1)
    assert(r.getDouble(4) == r4d(-math.log(1.0 / 3.0)), r.toString)
    val const = (0 until 6).map(i => ("c", i, 7L)).toDF("conv_id", "idx", "v")
    val rc = SeriesMining.sampleEntropy(const, r = 0L).collect()(0)
    assert(rc.getLong(2) == rc.getLong(3) && rc.getDouble(4) == 0.0)
    // n < 4 drops
    val tiny = (0 until 3).map(i => ("t", i, 1L)).toDF("conv_id", "idx", "v")
    assert(SeriesMining.sampleEntropy(tiny, 10L).count() == 0)
  }

  test("first-response and burn-rate primitives classify correctly") {
    import org.apache.spark.sql.expressions.Window
    // conv a: user@0, assistant@90s -> latency 90000, answered
    // conv b: assistant@0 (before the first user@60) -> unanswered
    val t = Seq(
      ("a", 0, "user", tsAt(0)), ("a", 1, "assistant", tsAt(90)),
      ("b", 0, "assistant", tsAt(0)), ("b", 1, "user", tsAt(60)))
      .toDF("conv_id", "turn_idx", "role", "ts")
    val tsMs = unix_millis(col("ts").cast("timestamp"))
    val fu = t.filter(col("role") === "user")
      .groupBy("conv_id").agg(min(tsMs).as("u_ms"))
    val asst = t.filter(col("role") === "assistant")
      .select(col("conv_id"), tsMs.as("a_ms"))
    val r = fu.join(asst, Seq("conv_id"), "left")
      .groupBy("conv_id")
      .agg(min("u_ms").as("u"),
        min(when(col("a_ms") >= col("u_ms"), col("a_ms"))).as("fa"))
      .orderBy("conv_id").collect()
    assert(r(0).getLong(2) - r(0).getLong(1) == 90000L)
    assert(r(1).isNullAt(2)) // assistant turn precedes the user -> no reply
    // burn rate: 2 slow of 4 gaps -> frac 0.5 / budget 0.2 = burn 2.5
    val gaps = Seq(1L, 90000000L, 5L, 90000000L).toDF("d")
    val burn = gaps.agg(
      round(sum(when(col("d") > 86400000L, 1L).otherwise(0L))
        .cast("double") / count(lit(1)) / 0.2 + lit(1e-9), 4)).collect()(0)
    assert(burn.getDouble(0) == 2.5)
  }

  test("calendarAnomaly: prior-week profile z-scores the latest week") {
    // cell (Mon, 00h): weeks 0..2 carry 1,2,3 turns; week 3 carries 5.
    // mu = 2, sd = sqrt(14/3 - 4) = 0.8165, z = 3/0.8165 = 3.6742 -> anom.
    // cell (Tue, 01h): constant 2 per week -> sd 0 -> dropped.
    def turns(week: Int, day: Int, hour: Int, n: Int, tag: String) =
      (0 until n).map(k => (s"c$tag$week", k, "xx",
        tsAt(week * 604800L + day * 86400L + hour * 3600L + k * 60L)))
    val rows =
      turns(0, 0, 0, 1, "a") ++ turns(1, 0, 0, 2, "a") ++
        turns(2, 0, 0, 3, "a") ++ turns(3, 0, 0, 5, "a") ++
        turns(0, 1, 1, 2, "b") ++ turns(1, 1, 1, 2, "b") ++
        turns(2, 1, 1, 2, "b") ++ turns(3, 1, 1, 2, "b")
    val t = rows.toDF("conv_id", "turn_idx", "text", "ts")
    val r = Features.calendarAnomaly(t, sigmas = 2.0, minWeeks = 3).collect()
    assert(r.length == 1, r.mkString(";"))
    val x = r(0)
    assert(x.getInt(0) == 1 && x.getInt(1) == 0) // Monday = 1, hour 0
    assert(x.getLong(2) == 3 && x.getLong(3) == 5 && x.getDouble(4) == 2.0)
    assert(x.getDouble(5) == 0.8165 && x.getDouble(6) == 3.6742 &&
      x.getInt(7) == 1, x.toString)
  }
}
