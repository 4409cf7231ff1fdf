package graft

import java.time.LocalDate
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Apply, Classify, Merge, PeriodTiers}
import graft.operators.PeriodTiers.{Day, Month, Period, Year}

/** Round-2 operator semantics: ISO period grids (snap + calendar stepping),
  * the general apply expression API, interval-overlap merge (greedy
  * contention case), the softmax scoring harness, and CSV round-trip.
  */
class Round2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("period parse accepts ^P[0-9]+[DMY]$ only (api_period.R:10-52)") {
    assert(PeriodTiers.parse("P16D") == Period(16, Day))
    assert(PeriodTiers.parse("P2M") == Period(2, Month))
    assert(PeriodTiers.parse("P1Y") == Period(1, Year))
    for (bad <- Seq("P1M10D", "16D", "P-1D", "PD", "p16d"))
      assertThrows[IllegalArgumentException](PeriodTiers.parse(bad))
  }

  test("timeline start snapping: month → first of month, year → Jan 1 (api_gdalcubes.R:339-352)") {
    val d = LocalDate.of(2013, 9, 14) // the reference fixture's MODIS start
    assert(PeriodTiers.snap(d, Period(16, Day)) == d)
    assert(PeriodTiers.snap(d, Period(1, Month)) == LocalDate.of(2013, 9, 1))
    assert(PeriodTiers.snap(d, Period(2, Year)) == LocalDate.of(2013, 1, 1))
  }

  test("timeline generation steps calendar-aware and stops at end (api_gdalcubes.R:354-361)") {
    // P16D from the MODIS fixture extent 2013-09-14..2014-08-29
    val tl = PeriodTiers.timeline(LocalDate.of(2013, 9, 14),
      LocalDate.of(2014, 8, 29), Period(16, Day))
    assert(tl.head == LocalDate.of(2013, 9, 14))
    assert(tl.forall(d => java.time.temporal.ChronoUnit.DAYS.between(tl.head, d) % 16 == 0))
    assert(!tl.last.isAfter(LocalDate.of(2014, 8, 29)))
    assert(PeriodTiers.step(tl.last, Period(16, Day)).isAfter(LocalDate.of(2014, 8, 29)))
    // month stepping with end-of-month rollback (lubridate %m+% semantics)
    assert(PeriodTiers.step(LocalDate.of(2024, 1, 31), Period(1, Month)) ==
      LocalDate.of(2024, 2, 29))
    // month timeline snaps first, so every point is a first-of-month
    val tlm = PeriodTiers.timeline(LocalDate.of(2013, 9, 14),
      LocalDate.of(2014, 3, 2), Period(1, Month))
    assert(tlm == (0 to 6).map(LocalDate.of(2013, 9, 1).plusMonths(_)))
  }

  test("period bucket expression assigns [t_i, t_i+P) for day and month units") {
    val o = LocalDate.of(2024, 1, 1)
    val rows = Seq("2024-01-01 00:00:00", "2024-01-16 23:59:59",
      "2024-01-17 00:00:00", "2024-02-01 12:00:00", "2024-03-31 00:00:00")
      .map(s => Tuple1(java.sql.Timestamp.valueOf(s))).toDF("ts")
    val d16 = rows.select(PeriodTiers.bucket(col("ts"), o, Period(16, Day)).as("b"))
      .collect().map(_.getTimestamp(0).toString.take(10))
    // 2024-02-01 is day 31 → floor(31/16)·16 = 16 → Jan 17;
    // 2024-03-31 is day 90 → floor(90/16)·16 = 80 → Mar 21 (leap Feb)
    assert(d16.toSeq == Seq("2024-01-01", "2024-01-01", "2024-01-17",
      "2024-01-17", "2024-03-21"))
    val m2 = rows.select(PeriodTiers.bucket(col("ts"), o, Period(2, Month)).as("b"))
      .collect().map(_.getTimestamp(0).toString.take(10))
    assert(m2.toSeq == Seq("2024-01-01", "2024-01-01", "2024-01-01",
      "2024-01-01", "2024-03-01"))
  }

  test("regularizeP: every conv gets exactly |timeline| slots, empty buckets null") {
    // two convs, shared extent [max-min, min-max] = [Jan 10, Feb 20] →
    // P16D timeline Jan 10, Jan 26, Feb 11 (Feb 27 > end)
    def row(c: String, day: String, q: Int, v: Double) =
      (c, java.sql.Timestamp.valueOf(s"2024-$day 12:00:00"), 1, q, v)
    val m = Seq(
      row("a", "01-01", 0, 1.0), row("a", "01-10", 0, 2.0),
      row("a", "01-30", 1, 3.0), row("a", "01-30", 0, 4.0), row("a", "02-20", 0, 5.0),
      row("b", "01-10", 0, 6.0), row("b", "02-25", 0, 7.0))
      .toDF("conv_id", "ts", "turn_idx", "quality_rank", "value")
    val out = PeriodTiers.regularizeP(m, "P16D")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString.take(10),
        Option(r.get(2)).map(_.asInstanceOf[Double])))
    val byConv = out.groupBy(_._1)
    assert(byConv("a").length == 3 && byConv("b").length == 3) // |timeline| slots each
    val a = byConv("a").map(t => t._2 -> t._3).toMap
    // Jan 1 is before the shared start → dropped (cut semantics); Jan 30 has
    // two observations → quality_rank 0 wins
    assert(a == Map("2024-01-10" -> Some(2.0), "2024-01-26" -> Some(4.0),
      "2024-02-11" -> Some(5.0)))
    val b = byConv("b").map(t => t._2 -> t._3).toMap
    // Feb 25 falls inside the LAST bucket [Feb 11, Feb 27) even though the
    // timeline end is Feb 20 — cut() extends the final interval one period
    assert(b == Map("2024-01-10" -> Some(6.0), "2024-01-26" -> None,
      "2024-02-11" -> Some(7.0)))
  }

  test("maskNa flags any-missing rows and fillNa replaces with the constant") {
    val df = Seq(("a", Some(1.0), Some(2.0)), ("b", None, Some(3.0)),
      ("c", Some(Double.NaN), Some(4.0)), ("d", Some(5.0), None))
      .toDF("id", "m1", "m2")
    val masked = graft.operators.GapFill.maskNa(df, Seq("m1", "m2"))
      .collect().map(r => r.getString(0) -> r.getAs[Int]("na_mask")).toMap
    assert(masked == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 1))
    val filled = graft.operators.GapFill.fillNa(df, Seq("m1", "m2"), -9999.0)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(filled.toSet == Set(("a", 1.0, 2.0), ("b", -9999.0, 3.0),
      ("c", -9999.0, 4.0), ("d", 5.0, -9999.0)))
  }

  test("timelineMatch chops model-length windows with the reference's start estimation") {
    import java.time.LocalDate
    // data timeline: P16D from 2013-09-14, 69 dates (~3 years)
    val tl = (0 until 69).map(i => LocalDate.of(2013, 9, 14).plusDays(16L * i))
    // model year starts 2013-09-14 with 23 samples → 3 exact windows
    val w = PeriodTiers.timelineMatch(tl, LocalDate.of(2013, 9, 14), 23)
    assert(w.length == 3)
    assert(w.head == (tl(0), tl(22)))
    assert(w(1) == (tl(23), tl(45)))
    assert(w(2) == (tl(46), tl(68)))
    // data starting BEFORE the model start: model (month, day) is projected
    // into the data's first year, nearest timeline date wins
    val w2 = PeriodTiers.timelineMatch(tl, LocalDate.of(2014, 9, 14), 23)
    assert(w2.head._1 == tl(0)) // est 2013-09-14 == tl(0) exactly
    // incomplete tail window is dropped
    assert(PeriodTiers.timelineMatch(tl, LocalDate.of(2013, 9, 14), 40).length == 1)
    assertThrows[IllegalArgumentException](
      PeriodTiers.timelineMatch(tl.take(5), LocalDate.of(2013, 9, 14), 23))
  }

  test("exactQuantiles equals Spark's percentile bit-for-bit on random and degenerate data") {
    import graft.operators.Predictors
    val rnd = new scala.util.Random(42)
    val shapes = Seq(
      Seq.fill(997)(rnd.nextDouble() * 1000 - 500),          // continuous
      Seq.fill(500)(rnd.nextInt(7).toDouble),                // heavy duplicates
      Seq(3.14),                                             // n = 1
      Seq(2.0, 1.0),                                         // n = 2
      (1 to 64).map(_.toDouble))                             // exact grid
    val ps = Seq(0.0, 0.02, 0.25, 0.5, 0.75, 0.98, 1.0)
    shapes.foreach { vs =>
      val df = vs.map(Tuple1(_)).toDF("value")
      val got = Predictors.exactQuantiles(df, "value", ps)
      val want = df.agg(percentile(col("value"), typedLit(ps))).head()
        .getSeq[Double](0)
      assert(got == want, s"n=${vs.length}: $got != $want")
    }
  }

  test("period bucket totality: every ts inside [t1, tlast+P) maps onto a timeline point") {
    import java.time.LocalDate
    val p = Period(16, Day)
    val tl = PeriodTiers.timeline(LocalDate.of(2024, 1, 3), LocalDate.of(2024, 4, 20), p)
    val tlSet = tl.map(_.toString).toSet
    val rnd = new scala.util.Random(7)
    val lo = LocalDate.of(2024, 1, 3).toEpochDay * 86400000L
    val hi = PeriodTiers.step(tl.last, p).toEpochDay * 86400000L
    val ts = Seq.fill(300)(lo + (rnd.nextDouble() * (hi - lo)).toLong)
      .map(ms => Tuple1(new java.sql.Timestamp(ms))).toDF("ts")
    val buckets = ts.select(
        PeriodTiers.bucket(col("ts"), LocalDate.of(2024, 1, 3), p).as("b"))
      .collect().map(_.getTimestamp(0).toString.take(10))
    buckets.foreach(b => assert(tlSet.contains(b), s"bucket $b not a timeline point"))
  }

  test("apply expression API: plain expr is a pure column; kernel refs match KernelWindows") {
    val t0 = 1735689600000L
    val grid = (0 until 8).map(i =>
      ("c1", new java.sql.Timestamp(t0 + i * 86400000L), (i * i).toDouble))
      .toDF("conv_id", "bucket_ts", "value")
    val plain = Apply.withMetric(grid, "double_v", "value * 2.0")
    assert(plain.select("double_v").as[Double].collect().sorted.toSeq ==
      (0 until 8).map(i => i * i * 2.0).sorted)
    // kernel ref: anomaly = value − w_mean(value, 2), checked against a
    // direct KernelWindows computation
    val viaApply = Apply.withMetric(grid, "anom", "value - w_mean(value, 2)")
      .select("conv_id", "bucket_ts", "anom")
    val kw = graft.operators.KernelWindows(grid, 2)
      .select(col("conv_id"), col("bucket_ts"), col("w_mean"))
    val joined = grid.join(kw, Seq("conv_id", "bucket_ts"))
      .select(col("conv_id"), col("bucket_ts"),
        (col("value") - col("w_mean")).as("exp"))
    val got = viaApply.collect().map(r => r.getTimestamp(1) -> r.getDouble(2)).toMap
    joined.collect().foreach(r =>
      assert(got(r.getTimestamp(1)) == r.getDouble(2)))
    // temp kernel columns must not leak
    assert(viaApply.columns.toSet == Set("conv_id", "bucket_ts", "anom"))
  }

  test("intersectsAlign greedy: contended t1 instant goes to the EARLIER t2 instant") {
    // p2 (30min) < p1 (1h): two consecutive t2 intervals overlap the same t1
    // hour — api_merge.R's setdiff gives the hour to the first t2, and the
    // second t2 matches the NEXT hour (a plain per-t2 min would match both
    // to the same hour)
    val h = 3600000L
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val t1 = Seq(("a", ts(0L), 1.0), ("a", ts(h), 2.0), ("a", ts(2 * h), 3.0))
      .toDF("conv_id", "bucket_ts", "value")
    val t2 = Seq(("a", ts(0L), 10.0), ("a", ts(h / 2), 20.0), ("a", ts(h), 30.0))
      .toDF("conv_id", "bucket_ts", "value")
    val out = Merge.intersectsAlign(t1, t2)
      .collect().map(r => (r.getString(3), r.getTimestamp(1).getTime, r.getDouble(2)))
      .toSet
    // greedy: t2@0 → t1@0; t2@30m overlaps hour 0 (used) → none left in its
    // window? [30m, 60m) overlaps only hour 0 → unmatched; t2@1h → t1@1h.
    assert(out == Set(("t1", 0L, 1.0), ("t1", h, 2.0),
      ("t2", 0L, 10.0), ("t2", h, 30.0)))
  }

  test("softmax kernel: stable, sums to 1, matches direct formula; Probs.label consumes score output") {
    val p = Classify.softmax(Array(1.0, 2.0, 3.0))
    assert(math.abs(p.sum - 1.0) < 1e-12)
    val z = math.exp(1.0) + math.exp(2.0) + math.exp(3.0)
    assert(math.abs(p(2) - math.exp(3.0) / z) < 1e-12)
    // huge scores: no overflow thanks to max subtraction
    val q = Classify.softmax(Array(1000.0, 1001.0))
    assert(!q.exists(_.isNaN) && math.abs(q.sum - 1.0) < 1e-12)
    // probs relation shape feeds the existing Probs operators unchanged
    val feats = Seq(("c1", new java.sql.Timestamp(0L), 1.0, 0.5, 2.0))
      .toDF("conv_id", "bucket_ts", "f1", "f2", "f3")
    val probs = Classify.score(spark, feats, Seq("f1", "f2", "f3"),
      Array(Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.0, 0.0, 1.0)),
      Array(0.0, 0.0, 0.0))
    val labeled = graft.operators.Probs.label(probs).collect()
    assert(labeled.length == 1 && labeled(0).getAs[Int]("label") == 3) // f3 largest
  }

  test("patterns with lambda > 0 smooth the per-label mean (penalized-spline GAM analog)") {
    val series = (for (c <- Seq("x", "y"); i <- 0 until 12)
      yield (c, i, i.toDouble + (if (i % 2 == 0) 2.0 else -2.0)))
      .toDF("conv_id", "idx", "value")
    val labels = Seq(("x", 1), ("y", 1)).toDF("conv_id", "label")
    def roughness(vs: Seq[Double]): Double =
      vs.sliding(3).map { case Seq(a, b, c) => math.pow(a - 2 * b + c, 2); case _ => 0.0 }.sum
    val raw = graft.operators.ChangeDetect.patterns(series, labels)
      .orderBy("idx").select("value").as[Double].collect().toSeq
    val sm = graft.operators.ChangeDetect.patterns(series, labels, lambda = 5.0)
      .orderBy("idx").select("value").as[Double].collect().toSeq
    assert(raw.length == 12 && sm.length == 12)
    assert(roughness(sm) < roughness(raw) / 10,
      s"smoothing did not reduce 2nd-difference roughness: ${roughness(sm)} vs ${roughness(raw)}")
  }

  test("winnowing fingerprints are robust to local edits (unlike whole-doc md5)") {
    val base = "the quick brown fox jumps over the lazy dog and keeps running far away"
    val edited = base.replace("jumps", "leaps") // one local edit
    val docs = Seq((1L, base), (2L, edited)).toDF("doc_id", "text")
    // recompute the selected sets directly to compare overlap
    def fpSet(s: String): Set[Long] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val norm = s.toLowerCase.replaceAll("\\s+", " ")
      val n = norm.length - 8 + 1
      val h = (0 until n).map { i =>
        val d = md.digest(norm.substring(i, i + 8).getBytes("UTF-8"))
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      }
      (0 to n - 4).map(i => (i until i + 4).map(h).min).toSet
    }
    val (f1, f2) = (fpSet(base), fpSet(edited))
    val overlap = (f1 & f2).size.toDouble / math.max(f1.size, f2.size)
    assert(overlap > 0.5, s"local edit destroyed fingerprint overlap: $overlap")
    // and the operator agrees with the direct computation
    val out = graft.operators.TextAnalysis.winnow(docs)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) == f1.size && out(2L) == f2.size)
  }

  test("int8 quantization: round-trip error bounded by scale/2, top-1 neighbor preserved") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 40L).map(i =>
      (i, Array.fill(16)((rnd.nextDouble() * 2 - 1).toFloat).toSeq))
    val df = vecs.toDF("vec_id", "embedding")
    val q = graft.operators.Similarity.quantizeInt8(df)
      .select("vec_id", "scale", "qvec")
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getSeq[Int](2).toArray)).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    vecs.foreach { case (id, v) =>
      val (scale, qv) = q(id)
      // reconstruction error per component ≤ scale/2 (+ the 9-dp display round)
      v.map(_.toDouble).zip(qv.map(_ * scale)).foreach { case (orig, rec) =>
        assert(math.abs(orig - rec) <= scale / 2 + 1e-6) }
      assert(qv.forall(x => x >= -127 && x <= 127))
    }
    // top-1 cosine neighbor of vec 0 is preserved under quantization
    val base = vecs.map { case (id, v) => id -> v.map(_.toDouble).toArray }.toMap
    def top1(space: Map[Long, Array[Double]]): Long =
      space.filter(_._1 != 0L).maxBy { case (_, v) => cos(base(0L), v) }._1
    val qSpace = q.map { case (id, (s, qv)) => id -> qv.map(_ * s) }
    assert(top1(base) == top1(qSpace))
  }

  test("csv export round-trips a metric grid exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val grid = (0 until 50).map(i =>
      (f"c$i%03d", new java.sql.Timestamp(1735689600000L + i * 60000L), i / 7.0))
      .toDF("conv_id", "bucket_ts", "value")
    graft.sources.Exports.timeseriesToCsv(grid, "text_len", s"$dir/ts.csv")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("conv_id", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("metric", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value", org.apache.spark.sql.types.DoubleType)))
    // metadata export verb writes and is re-readable too
    graft.sources.Exports.toCsv(
      grid.select(col("conv_id"), col("value")), s"$dir/meta.csv", single = true)
    assert(spark.read.option("header", "true").csv(s"$dir/meta.csv").count() == 50)
    val back = graft.sources.Exports.readCsv(spark, s"$dir/ts.csv", schema)
      .orderBy("conv_id").collect()
    val orig = grid.orderBy("conv_id").collect()
    assert(back.length == orig.length)
    back.zip(orig).foreach { case (b, o) =>
      assert(b.getString(0) == o.getString(0))
      assert(b.getTimestamp(1) == o.getTimestamp(1))
      assert(b.getString(2) == "text_len")
      assert(b.getDouble(3) == o.getDouble(2))
    }
  }
}
