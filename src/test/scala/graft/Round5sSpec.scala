package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Layout, Sliding, Summary}

/** Sliding/hopping-window family + compaction bin-packing planner. */
class Round5sSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("slidingAgg: each turn serves window/hop windows; exact n_convs; hand counts") {
    import spark.implicits._
    // hop 15m, window 1h: turn in hop cell k0 belongs to windows k0-3..k0
    val m = Seq(
      ("a", 0, ts(0L), 100.0),       // k0 = 0
      ("a", 1, ts(60000L), 50.0),    // k0 = 0 (same hop cell)
      ("b", 0, ts(950000L), 30.0)    // k0 = 1
    ).toDF("conv_id", "turn_idx", "ts", "text_len")
    val out = Sliding.slidingAgg(m).collect()
      .map(r => r.getTimestamp(0).getTime / 900000 -> r).toMap
    // windows touched: a -> -3..0, b -> -2..1
    assert(out.keySet == Set(-3L, -2L, -1L, 0L, 1L))
    val w0 = out(0L) // both convs
    assert(w0.getLong(2) == 3L && w0.getLong(3) == 180L && w0.getLong(4) == 2L)
    val w1 = out(1L) // b only
    assert(w1.getLong(2) == 1L && w1.getLong(3) == 30L && w1.getLong(4) == 1L)
    val wm3 = out(-3L) // a only, both turns
    assert(wm3.getLong(2) == 2L && wm3.getLong(3) == 150L && wm3.getLong(4) == 1L)
    // window_end - window_start = 1h on every row
    assert(out.values.forall(r =>
      r.getTimestamp(1).getTime - r.getTimestamp(0).getTime == 3600000L))
  }

  test("rollingSlope: exact ramp recovers its slope; constant gives 0.0; only full windows emit") {
    import spark.implicits._
    val hour = 3600000L
    val m = ((1 to 12).map(i => ("ramp", i, ts(i * hour), 5.0 + 3.0 * i))
      ++ (1 to 10).map(i => ("const", i, ts(i * hour), 42.0)))
      .toDF("conv_id", "turn_idx", "ts", "text_len")
    val out = Sliding.rollingSlope(m, k = 8).collect()
      .groupBy(_.getString(0))
    assert(out("ramp").length == 5, "idx 8..12 have full windows")
    assert(out("ramp").forall(_.getDouble(3) == 3.0), "OLS recovers the ramp slope exactly")
    assert(out("ramp").map(_.getLong(1)).sorted.toSeq == (8L to 12L))
    assert(out("const").forall(_.getDouble(3) == 0.0),
      "zero numerator quantizes to +0.0 (never -0.0)")
  }

  test("hllSliding: per-hour sliding value equals the direct register union of the trailing window") {
    import spark.implicits._
    val hour = 3600000L
    // 60 convs spread across hours 0..29 (conv i active at hour i % 30)
    val tr = (0 until 60).map { i =>
      (f"c$i%03d", 0, ts((i % 30) * hour))
    }.toDF("conv_id", "turn_idx", "ts")
    val slid = Sliding.hllSliding(tr, windowHours = 24).collect()
      .map(r => r.getTimestamp(0).getTime / hour -> r).toMap
    assert(slid.keySet == (0L until 30L).toSet)
    val c = (0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 * (1L << 25).toDouble
    for (h <- Seq(0L, 5L, 23L, 29L)) {
      // direct union: registers over every conv active in (h-23..h)
      val sub = tr.filter(
        expr(s"unix_millis(cast(ts AS timestamp)) DIV 3600000") between (h - 23, h))
      val regs = Summary.hllRegisters(sub, "conv_id").collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      val vZero = 256 - regs.size
      val sScaled = regs.values.map(rho => 1L << (25 - rho)).sum +
        vZero.toLong * (1L << 25)
      val est = BigDecimal(c / sScaled + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val row = slid(h)
      assert(row.getLong(1) == vZero.toLong, s"v_zero at hour $h")
      assert(row.getLong(2) == sScaled, s"s_scaled at hour $h")
      assert(row.getDouble(3) == est, s"est at hour $h")
    }
  }

  test("compactionPlan: cumulative-capacity bins, zero-byte files fold into the last bin, days independent") {
    import spark.implicits._
    val day2 = 86400000L
    val tr = Seq(
      ("f1", 0, ts(0L), "x" * 600),
      ("f2", 0, ts(1000L), "x" * 500),
      ("f3", 0, ts(2000L), "x" * 400),
      ("f4", 0, ts(3000L), "x" * 300),
      ("f5", 0, ts(4000L), ""),             // zero bytes -> rides the last bin
      ("g1", 0, ts(day2), "x" * 100)        // second day packs alone
    ).toDF("conv_id", "turn_idx", "ts", "text")
    val out = Layout.compactionPlan(tr, 1000L)
      .orderBy("day", "bin").collect()
    // day 1 sorted desc: 600 (cum 600 -> bin 0), 500/400/300 (cum 1100,
    // 1500, 1800 -> bin 1), 0-byte (cum 1800 -> bin 1)
    assert(out.length == 3)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 1L &&
      out(0).getLong(3) == 600L)
    assert(out(1).getLong(1) == 1L && out(1).getLong(2) == 4L &&
      out(1).getLong(3) == 1200L)
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 1L &&
      out(2).getLong(3) == 100L)
    // every bin except a day's last holds < target + its largest file
    assert(out.forall(_.getLong(3) < 1000L + 600L))
  }

  test("slidingStream == batch slidingAgg on shared columns, incl. late in-window arrivals") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = graft.streaming.StreamingRollup.slidingStream(
      mem.toDF().toDF("conv_id", "ts", "value"))
      .writeStream.format("memory").queryName("slides")
      .outputMode("complete")
      .start()
    try {
      def at(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
      val b1 = Seq(("a", at(10), 5.0), ("b", at(950), 9.0))
      val b2 = Seq(("a", at(20), 3.0)) // late-but-in-window: updates 4 windows
      def streamed() = spark.sql(
        "SELECT window_start, window_end, n_turns, total_len FROM slides")
        .collect().map(_.toString).sorted.toSeq
      def batch(rows: Seq[(String, java.sql.Timestamp, Double)]) =
        Sliding.slidingAgg(
          rows.toDF("conv_id", "ts", "value"), valueCol = "value")
          .select("window_start", "window_end", "n_turns", "total_len")
          .collect().map(_.toString).sorted.toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batch(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batch(b1 ++ b2))
    } finally q.stop()
  }

  test("contractChecks: each planted violation class is counted once, clean convs contribute nothing") {
    import spark.implicits._
    val hour = 3600000L
    val tr = Seq(
      // clean conv: contributes to no check
      ("ok", 0, "user", "hi", ts(0L)),
      ("ok", 1, "assistant", "hello", ts(hour)),
      // dup key on turn 1 (2 rows -> 1 violation), plus a gap (idx 3 with no 2)
      ("dup", 0, "user", "a", ts(0L)),
      ("dup", 1, "tool", "b", ts(hour)),
      ("dup", 1, "tool", "b", ts(hour)),
      ("dup", 3, "user", "c", ts(2 * hour)),
      // inversion: turn 1 earlier than turn 0; also empty text; bad role
      ("inv", 0, "user", "x", ts(5 * hour)),
      ("inv", 1, "bot", "", ts(hour))
    ).toDF("conv_id", "turn_idx", "role", "text", "ts")
    val out = graft.operators.Contract.contractChecks(tr).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("duplicate_turn_key") == ((1L, 1L)))
    assert(out("event_time_inversion") == ((1L, 1L)))
    assert(out("null_or_empty_text") == ((1L, 1L)))
    assert(out("role_out_of_vocab") == ((1L, 1L)))
    assert(out("turn_idx_gap") == ((1L, 1L)))
  }

  test("tierDispatch: total equals the direct range aggregate; regions partition the range") {
    import spark.implicits._
    val base = 1704067200000L // 2024-01-01T00:00Z
    // turns sprinkled across 3+ days incl. both sub-hour edges
    val m = (0 until 200).map { i =>
      ("c" + (i % 5), i, ts(base + i.toLong * 37 * 60000L), 10.0 + (i % 7))
    }.toDF("conv_id", "turn_idx", "ts", "text_len")
    val from = base + 5 * 3600000L + 1800000L  // day 1 05:30
    val to = base + 4 * 86400000L + 2 * 3600000L + 900000L // day 5 02:15
    val out = graft.operators.TierDispatch.rangeAggregate(m, from, to)
      .collect().map(r => r.getString(0) -> r).toMap
    val direct = m.filter(
      expr("unix_millis(cast(ts AS timestamp))").between(from, to - 1))
      .agg(count(lit(1)), sum(col("text_len").cast("long")),
        min(col("text_len").cast("long")), max(col("text_len").cast("long")))
      .head()
    val tot = out("6_total")
    assert(tot.getLong(2) == direct.getLong(0), "n_turns == direct")
    assert(tot.getLong(3) == direct.getLong(1), "sum == direct")
    assert(tot.getLong(4) == direct.getLong(2) &&
      tot.getLong(5) == direct.getLong(3), "min/max == direct")
    // regions partition: per-region counts sum to the total
    val regs = out.view.filterKeys(_ != "6_total").values
    assert(regs.map(_.getLong(2)).sum == tot.getLong(2))
    assert(out.contains("3_day_core") && out.contains("2_hour_head"))
  }

  test("ts_contract_checks: the corrupted twin plants every class non-vacuously at sf0.001") {
    val out = SparkEntry.queries("ts_contract_checks")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.length == 5)
    val m = out.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("duplicate_turn_key") > 0 && m("null_or_empty_text") > 0 &&
      m("role_out_of_vocab") > 0, "planted classes fire")
  }
}
