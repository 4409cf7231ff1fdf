package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SeriesOps

/** Token-bucket rate limiter and EWMA control chart. */
class Round5rSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("tokenBucket: hand-replayed burst/refill/deny sequence") {
    import spark.implicits._
    // capacity 14.4M micro, 1 micro/ms, cost 7.2M: burst 2, 1 per 2 h
    val tr = Seq(
      ("c", 0, ts(0L)),          // full bucket: allow, tokens 7.2M
      ("c", 1, ts(1000L)),       // +1000 -> 7.201M: allow, tokens 1000
      ("c", 2, ts(1000000L)),    // +999000 -> 1M < 7.2M: DENY
      ("c", 3, ts(20000000L))    // +19M -> capped 14.4M: allow
    ).toDF("conv_id", "turn_idx", "ts")
    val r = SeriesOps.tokenBucket(tr, 14400000L, 1L, 7200000L).head()
    assert(r.getLong(1) == 4L && r.getLong(2) == 3L && r.getLong(3) == 1L)
    assert(r.getLong(4) == 1000000L, "first denial at the starved arrival")
  }

  test("ar2Forecast: structure and guards (n_pts = n-2; degenerate acf drops)") {
    import spark.implicits._
    val hour = 3600000L
    // damped oscillation: well-defined acf, non-degenerate den
    val vs = Seq(100.0, 140.0, 90.0, 130.0, 95.0, 125.0, 100.0, 120.0,
      105.0, 115.0, 108.0, 112.0)
    // constant series: zero variance -> the acf gate drops it
    val const = Seq.fill(12)(42.0)
    val m = (vs.zipWithIndex.map { case (v, i) => ("osc", i, ts(i * hour), v) }
      ++ const.zipWithIndex.map { case (v, i) => ("const", i, ts(i * hour), v) })
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = graft.operators.Forecast.ar2Forecast(m).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.contains("osc"))
    assert(!out.contains("const"), "zero-variance series must drop")
    val o = out("osc")
    assert(o.getLong(1) == vs.length - 2L, "one prediction per lag-2 point")
    assert(o.getDouble(5) > 0, "naive rmse positive on a non-constant series")
    // oscillation is strongly negatively autocorrelated: AR(2) beats naive
    assert(o.getDouble(4) < o.getDouble(5) && o.getDouble(6) > 0)
  }

  test("dd_dup_sample: deterministic dedup-aware keep set over the planted corpus") {
    val r = SparkEntry.queries("dd_dup_sample")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(r.length == 16)
    assert(r.map(_.getInt(4)).toSeq == (1 to 16), "ranks are 1..16")
    assert(r.forall(row => row.getLong(1) >= 1L), "weights >= 1")
    assert(r.forall(row =>
      row.getLong(3) == row.getLong(2) / row.getLong(1)),
      "priority = h div weight")
  }

  test("ewmaChart: constant series never breaches (v stays 0); a spike after real variance does") {
    import spark.implicits._
    val hour = 3600000L
    val mk = (c: String, vs: Seq[Double]) => vs.zipWithIndex.map {
      case (v, i) => (c, i, ts(i * hour), v)
    }
    val m = (mk("const", Seq.fill(6)(50.0)) ++
      mk("spiky", Seq(100.0, 104.0, 96.0, 104.0, 96.0, 1000.0)))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.ewmaChart(m, alpha = 0.25, k = 3.0).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("const").getLong(2) == 0L, "zero variance -> no breach")
    assert(out("const").getLong(3) == -1L)
    assert(out("spiky").getLong(2) == 1L, "the spike breaches once")
    assert(out("spiky").getLong(3) == 5L * hour, "breach at the spike row")
  }
}
