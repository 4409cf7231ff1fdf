package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Select, TextAnalysis}

/** Round-4 fixes: code-point (not UTF-16) gram indexing in the winnowing
  * and substring-dedup kernels — non-BMP text (emoji, astral-plane chars)
  * must shingle identically to the relational length()/substr() columns and
  * the DuckDB oracle, both of which count code points.
  */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 26 distinct astral-plane code points (Deseret block, U+10400..) — each
  // is 2 UTF-16 units, so any kernel still indexing by String.length /
  // substring sees double the length and shifted gram boundaries.
  private def astral(seed: Char, n: Int): String = {
    val rnd = new scala.util.Random(seed.toInt)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach(_ => sb.appendCodePoint(0x10400 + rnd.nextInt(26)))
    sb.toString
  }

  test("winnow: astral-plane text grams by code point (k+w-1 cps = exactly one window)") {
    // 11 code points = k + w - 1 exactly: one gram window, one fingerprint.
    // A UTF-16 kernel would see length 22 → 15 grams → up to 12 fps.
    val s11 = astral('a', 11)
    val out = TextAnalysis.winnow(Seq((1L, s11)).toDF("doc_id", "text"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getInt(1) == 1, s"expected exactly 1 fingerprint, got ${out(0).getInt(1)}")
    // 10 code points: below threshold in BOTH the relational filter and the
    // kernel — no row (the filter and the kernel must agree on length).
    val none = TextAnalysis.winnow(Seq((2L, astral('b', 10))).toDF("doc_id", "text"))
      .count()
    assert(none == 0L)
  }

  test("winnow: mixed BMP+astral text is deterministic and window-count exact") {
    // 14 cps → n = 7 grams → 4 windows → n_fp in [1, 4]
    val s = "ab" + astral('c', 10) + "yz"
    val r = TextAnalysis.winnow(Seq((1L, s)).toDF("doc_id", "text")).collect()(0)
    assert(r.getInt(1) >= 1 && r.getInt(1) <= 4)
    // idempotent across runs (no UTF-16 truncation splitting surrogates)
    val r2 = TextAnalysis.winnow(Seq((1L, s)).toDF("doc_id", "text")).collect()(0)
    assert(r.getLong(2) == r2.getLong(2))
  }

  test("substringDups: astral twins — kernel gram count agrees with the relational n_grams column") {
    // 90 astral cps duplicated whole: n_grams = (90-20)/8+1 = 9 (code-point
    // math in the relational column); the kernel must sample the SAME 9
    // grams, so n_dup == n_grams and union = 8*8+20 = 84 code points.
    // A UTF-16 kernel would emit 21 grams (length 180) — n_dup > n_grams.
    val d = astral('m', 90)
    val twin = Seq((10L, d), (11L, d)).toDF("doc_id", "text")
    val t = Dedup.substringDups(twin, k = 20, stride = 8)
      .orderBy("doc_id").collect()
    assert(t.length == 2)
    t.foreach { r =>
      assert(r.getLong(1) == 9L, s"n_grams=${r.getLong(1)}")
      assert(r.getLong(2) == 9L, s"n_dup=${r.getLong(2)} != n_grams")
      assert(r.getLong(3) == 84L, s"dup_chars=${r.getLong(3)}")
    }
  }

  test("chatLint: conversation missing turn_idx 0 yields starts_user=false (bool_or semantics)") {
    val turns = Seq(
      (1L, 0, "user"), (1L, 1, "assistant"),
      (2L, 3, "assistant"), (2L, 4, "user") // gappy: no turn 0
    ).map { case (c, i, r) => (c.toString, i, r) }
      .toDF("conv_id", "turn_idx", "role")
    val out = Select.chatLint(turns).orderBy("conv_id").collect()
    assert(out(0).getBoolean(out(0).fieldIndex("starts_user")))
    assert(!out(1).isNullAt(out(1).fieldIndex("starts_user")),
      "gappy conversation must not yield NULL starts_user")
    assert(!out(1).getBoolean(out(1).fieldIndex("starts_user")))
  }

  test("componentsStars ≡ union-find on random graphs + planted hub/chain torture (one batch)") {
    val rnd = new scala.util.Random(42)
    val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    // 40 random graphs on disjoint id ranges: n ∈ [2, 30], e ∈ [1, 45]
    for (g <- 0 until 40) {
      val base = g * 1000L
      val n = 2 + rnd.nextInt(29)
      val e = 1 + rnd.nextInt(45)
      for (_ <- 0 until e) {
        val a = base + rnd.nextInt(n); val b = base + rnd.nextInt(n)
        if (a != b) edges += ((a, b))
      }
    }
    // torture 1: 64-chain (diameter 63 — label prop would need 63 rounds,
    // star contraction must close it within the default 20 = O(log²) budget)
    for (i <- 0 until 63) edges += ((100000L + i, 100000L + i + 1))
    // torture 2: 300-leaf star whose hub is the LARGEST id (worst case for
    // min-rooting: every leaf must end up labeled by the smallest leaf)
    for (i <- 0 until 300) edges += ((200300L, 200000L + i))
    // torture 3: chain of stars (hubs connected in a path, leaves hanging)
    for (h <- 0 until 8) {
      for (l <- 0 until 10) edges += ((300000L + h * 100, 300001L + h * 100 + l))
      if (h > 0) edges += ((300000L + (h - 1) * 100, 300000L + h * 100))
    }
    // ground truth: driver-side union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    val wantSizes = want.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }

    val out = Dedup.componentsStars(edges.toSeq.toDF("id1", "id2")).collect()
    assert(out.length == want.size, s"${out.length} nodes vs ${want.size}")
    out.foreach { r =>
      val (d, c, canon, sz) =
        (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))
      assert(c == want(d), s"doc $d: component $c != ${want(d)}")
      assert(canon == (d == c))
      assert(sz == wantSizes(c), s"doc $d: group_sz $sz != ${wantSizes(c)}")
    }
  }

  test("componentsStars ≡ componentsLabelProp on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 120).map { _ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
    }.filter(p => p._1 != p._2).toDF("id1", "id2")
    val a = Dedup.componentsStars(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
    val b = Dedup.componentsLabelProp(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2), r.getLong(3))).toSet
    assert(a == b)
  }

  test("componentsStars: 64-chain converges within 8 rounds (log² bound, not diameter)") {
    val chain = (0 until 63).map(i => (i.toLong, i + 1L)).toDF("id1", "id2")
    val out = Dedup.componentsStars(chain, maxIter = 8).collect()
    assert(out.length == 64 && out.forall(_.getLong(1) == 0L))
  }

  test("clone-storm stress: 10k byte-identical docs — capped LSH emits O(n) star edges, CC converges") {
    // 10k clones of one boilerplate text + a handful of normal docs: the
    // 100 TB failure mode where one band bucket holds the whole storm and
    // all-pairs would be ~50M candidate rows
    val clones = (0 until 10000).map(i =>
      (1000000L + i, "storm boilerplate clone body shared verbatim"))
    val normals = Seq((1L, "alpha bravo charlie delta"),
      (2L, "echo foxtrot golf hotel india"),
      (3L, "alpha bravo charlie delta")) // 1 & 3 are near-dups of each other
    val docs = (clones ++ normals).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairsCapped(docs, maxBucket = 64)
    val n = pairs.count()
    // the storm contributes exactly 9999 star edges (one hub), docs 1/3 one
    // pair — NOT ~50M all-pairs rows
    assert(n <= 10000L, s"capped LSH emitted $n candidate rows — cap failed")
    // star-contraction CC resolves the hub within the default round budget
    val groups = Dedup.componentsStars(pairs).collect()
    val storm = groups.filter(_.getLong(1) == 1000000L)
    assert(storm.length == 10000, s"storm group has ${storm.length} members")
    assert(storm.count(_.getBoolean(2)) == 1) // exactly one canonical
    assert(storm.forall(_.getLong(3) == 10000L))
  }

  test("bpeTrain: 256 merges over the sf0.01 corpus in bounded time (production merge-count path)") {
    // the sf0.01 synthetic vocab is ~90 words and exhausts after 89 merges
    // (every word fully merged); widen it with deterministic per-doc hex
    // words so 256 distinct merges exist — hex shards are exactly the
    // "unseen long-tail token" shape a real corpus has
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .selectExpr("doc_id",
        "concat(text, ' ', regexp_replace(md5(cast(doc_id AS string)), '(.{8})', '$1 ')) AS text")
    val t0 = System.nanoTime()
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 256).collect()
    val dt = (System.nanoTime() - t0) / 1e9
    assert(merges.length == 256, s"got ${merges.length} merges")
    // greedy invariant: the selected pair count never increases step-over-
    // step (new pairs created by a merge are bounded by that merge's count)
    val cnts = merges.sortBy(_.getInt(0)).map(_.getLong(3))
    cnts.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"merge counts not non-increasing: $a -> $b")
    }
    // all merged tokens distinct (each step merges a NEW pair)
    val toks = merges.map(_.getString(2))
    assert(toks.distinct.length == 256)
    // bounded wall time: periodic localCheckpoint keeps per-merge cost
    // constant; without it the chained-replace plan makes this O(n²) and
    // blows far past this generous shared-VM budget
    assert(dt < 300.0, f"256 merges took $dt%.1f s — plan growth is back")
  }

  test("M4 downsampling: per-bucket envelope is exactly min/max/first/last") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    val m = Seq(
      ("a", 0, ts(10), 5.0), ("a", 1, ts(20), 9.0),
      ("a", 2, ts(30), 1.0), ("a", 3, ts(50), 7.0), // hour 0: f=5 l=7 mn=1 mx=9
      ("a", 4, ts(3700), 4.0)                        // hour 1: singleton
    ).toDF("conv_id", "turn_idx", "ts", "value")
    val out = Downsample.m4(m, date_trunc("hour", col("ts")),
        ord = struct(col("ts"), col("turn_idx")))
      .orderBy("bucket_ts").collect()
    assert(out.length == 2)
    val h0 = out(0)
    assert(h0.getDouble(2) == 1.0 && h0.getDouble(3) == 9.0 &&
      h0.getDouble(4) == 5.0 && h0.getDouble(5) == 7.0 && h0.getLong(8) == 4L)
    val h1 = out(1)
    assert(h1.getDouble(4) == 4.0 && h1.getDouble(5) == 4.0 && h1.getLong(8) == 1L)
  }

  test("gapReport: threshold-strict gap count/max/idle; gapless series reports zeros") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    val m = Seq(
      ("a", 0, ts(0)), ("a", 1, ts(100)), ("a", 2, ts(800)), // gap 700s
      ("a", 3, ts(2000)),                                     // gap 1200s
      ("b", 0, ts(0)), ("b", 1, ts(300))                      // no gap > 600s
    ).toDF("conv_id", "turn_idx", "ts")
    val out = Downsample.gapReport(m, thresholdMs = 600000L)
      .orderBy("conv_id").collect()
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L &&
      out(0).getLong(3) == 1200000L && out(0).getLong(4) == 1900000L)
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L &&
      out(1).getLong(4) == 0L)
  }

  test("counterRate: per-bucket counter delta and per-second rate; singleton bucket rate 0") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    // monotone counter: 10 at t=0, 40 at t=60 (hour 0); 100 at t=3700
    val m = Seq(
      ("a", 0, ts(0), 10.0), ("a", 1, ts(60), 40.0), ("a", 2, ts(3700), 100.0)
    ).toDF("conv_id", "turn_idx", "ts", "cum")
    val out = Downsample.counterRate(m, date_trunc("hour", col("ts")), "cum",
        ord = struct(col("ts"), col("turn_idx")))
      .orderBy("bucket_ts").collect()
    assert(out(0).getDouble(2) == 30.0)          // delta
    assert(out(0).getLong(3) == 60000L)          // span_ms
    assert(out(0).getDouble(5) == 0.5)           // 30 / 60 s
    assert(out(1).getDouble(2) == 0.0 && out(1).getDouble(5) == 0.0)
  }

  test("SAX: symbols follow the quartile breakpoints; short and constant series drop") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    // 8 points alternating low/high → with 8 frames each point is a frame;
    // z of low < -0.6745 → 'a', z of high > 0.6745 → 'd'
    val series = (0 until 8).map(i =>
      ("a", i, ts(i * 60), if (i % 2 == 0) 0.0 else 10.0))
    val shorty = (0 until 3).map(i => ("s", i, ts(i * 60), i.toDouble))
    val const = (0 until 10).map(i => ("c", i, ts(i * 60), 5.0))
    val m = (series ++ shorty ++ const)
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = Downsample.sax(m, segments = 8).collect()
    assert(out.length == 1, "short/constant series must drop")
    assert(out(0).getString(0) == "a" && out(0).getString(2) == "adadadad")
  }

  test("EWMA: step-quantized recursion matches hand-rolled reference; order-invariant to input partitioning") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    val vals = Seq(10.0, 0.0, 20.0, 20.0, 5.0)
    val m = vals.zipWithIndex.map { case (v, i) => ("a", i, ts(i * 60), v) }
      .toDF("conv_id", "turn_idx", "ts", "value").repartition(4)
    val out = Downsample.ewma(m, alpha = 0.25).orderBy("idx").collect()
      .map(_.getDouble(3))
    def r4(v: Double) = new java.math.BigDecimal(v + 1e-9)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
    val want = vals.tail.scanLeft(r4(vals.head))((s, y) => r4(0.75 * s + 0.25 * y))
    assert(out.toSeq == want, s"${out.toSeq} != $want")
  }

  test("rollingAnomalies: spike flagged against trailing window, warmup rows unchecked") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    // 5 steady points (warmup), then a spike, then steady again
    val vals = Seq(10.0, 12.0, 11.0, 10.0, 12.0, 100.0, 11.0, 10.0)
    val m = vals.zipWithIndex.map { case (v, i) => ("a", i, ts(i * 60), v) }
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = Downsample.rollingAnomalies(m, lookback = 5, sigmas = 2.0)
      .collect()(0)
    assert(out.getLong(1) == 8L)   // n_obs
    assert(out.getLong(2) == 3L)   // checked: idx 5, 6, 7
    // idx 5 (the spike) is anomalous; idx 6/7 may or may not be (the spike
    // inflates the window std) — at minimum the spike itself fires first
    assert(out.getLong(3) >= 1L)
    assert(out.getLong(4) == 1735689600000L + 5 * 60000L) // first anomaly ts
  }

  test("seriesCorrelation: perfectly correlated metrics give r=1, anti-correlated r=-1, constants drop") {
    import graft.operators.Downsample
    def ts(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
    val rows = (0 until 6).flatMap { h =>
      // conv a: y = x (r=1); conv b: y = -x (r=-1); conv c: y constant
      Seq(("a", 0, ts(h * 3600), h.toDouble, h.toDouble),
        ("b", 0, ts(h * 3600), h.toDouble, -h.toDouble),
        ("c", 0, ts(h * 3600), h.toDouble, 5.0))
    }.toDF("conv_id", "turn_idx", "ts", "x", "y")
    val out = Downsample.seriesCorrelation(rows,
        date_trunc("hour", col("ts")), "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.size == 2, "constant-metric series must drop")
    assert(math.abs(out("a") - 1.0) < 1e-9)
    assert(math.abs(out("b") + 1.0) < 1e-9)
  }

  test("crossContaminated: holdout twins flagged, clean docs not; output covers every corpus doc") {
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo"),
      (2L, "foxtrot golf hotel india juliet"),
      (17L, "alpha bravo charlie delta echo"),   // holdout member (≡0 mod 17)
      (3L, "kilo lima mike november oscar")
    ).toDF("doc_id", "text")
    val out = Dedup.crossContaminated(docs,
        docs.filter(col("doc_id") % 17 === 0))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out.size == 4)
    assert(out(1L) && out(17L), "identical-text pair must both flag")
    assert(!out(2L) && !out(3L))
  }

  private def tsAt(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)

  test("sessionize: 30-min gap splits sessions, all-integer ledger") {
    import graft.operators.SeriesOps
    val m = Seq(
      ("a", 0, tsAt(0), 1.0), ("a", 1, tsAt(60), 2.0),
      ("a", 2, tsAt(4000), 3.0), ("a", 3, tsAt(4060), 4.0)
    ).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.sessionize(m, gapMs = 1800000L)
      .orderBy("sess_idx").collect()
    assert(out.length == 2)
    assert(out(0).getLong(2) == 2L && out(0).getLong(5) == 60000L)
    assert(out(1).getLong(2) == 2L && out(1).getLong(5) == 60000L)
    assert(out(1).getLong(3) == 1735689600000L + 4000000L) // session-2 start
  }

  test("timeWeightedAvg: LOCF hold weighting; single-ts bucket falls back to plain mean") {
    import graft.operators.SeriesOps
    val m = Seq(
      // bucket hour 0: 10 held 100s, 20 held 300s, 30 held 0 → 17.5
      ("a", 0, tsAt(0), 10.0), ("a", 1, tsAt(100), 20.0), ("a", 2, tsAt(400), 30.0),
      // bucket hour 1: both at same instant → span 0 → mean 6.0
      ("a", 3, tsAt(3600), 4.0), ("a", 4, tsAt(3600), 8.0)
    ).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.timeWeightedAvg(m, date_trunc("hour", col("ts")))
      .orderBy("bucket_ts").collect()
    assert(out(0).getDouble(3) == 17.5)
    assert(out(1).getDouble(3) == 6.0)
  }

  test("stateAgg: LOCF time-in-state + entry counting; last obs holds 0") {
    import graft.operators.SeriesOps
    val m = Seq(
      ("a", 0, "user", tsAt(0)), ("a", 1, "assistant", tsAt(10)),
      ("a", 2, "assistant", tsAt(20)), ("a", 3, "user", tsAt(50))
    ).toDF("conv_id", "turn_idx", "role", "ts")
    val out = SeriesOps.stateAgg(m, "role")
      .orderBy("state").collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("assistant") == ((2L, 1L, 40000L)))
    assert(out("user") == ((2L, 2L, 10000L)))
  }

  test("acf: alternating series gives exact rational lags; constant series drops") {
    import graft.operators.SeriesOps
    val alt = (0 until 8).map(i =>
      ("a", i, tsAt(i * 60), if (i % 2 == 0) 1.0 else -1.0))
    val const = (0 until 8).map(i => ("c", i, tsAt(i * 60), 5.0))
    val m = (alt ++ const).toDF("conv_id", "turn_idx", "ts", "value")
    val rows = SeriesOps.acf(m).collect()
    assert(rows.length == 1, "constant series must drop")
    val r = rows(0)
    assert(r.getDouble(2) == -0.875)  // -(n-1)/n
    assert(r.getDouble(3) == 0.75)    //  (n-2)/n
    assert(r.getDouble(4) == -0.625)  // -(n-3)/n
  }

  test("seasonalAnomalies: spike vs own hour-of-day profile; thin hours unchecked") {
    import graft.operators.SeriesOps
    val hour0 = (0 until 10).map(i =>
      ("a", i, tsAt(i * 60), if (i == 7) 100.0 else 10.0)) // mu=19 sd=27 z=3
    val hour1 = Seq(("a", 10, tsAt(3600), 50.0), ("a", 11, tsAt(3660), 60.0))
    val m = (hour0 ++ hour1).toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.seasonalAnomalies(m, sigmas = 2.0, minObs = 3).collect()(0)
    assert(r.getLong(1) == 12L && r.getLong(2) == 10L && r.getLong(3) == 1L)
  }

  test("cusum: step shift fires both sides with reset; constant series drops") {
    import graft.operators.SeriesOps
    // 10×10 then 10×20: mu=15 sd=5, z=∓1; k=0.5 → ramps of 0.5/step.
    // sn alarms at obs 9 (4.5>4), resets; sp alarms at obs 19.
    val vals = Seq.fill(10)(10.0) ++ Seq.fill(10)(20.0)
    val m = (vals.zipWithIndex.map { case (v, i) => ("a", i, tsAt(i * 60), v) } ++
      (0 until 5).map(i => ("c", i, tsAt(i * 60), 3.0)))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val rows = SeriesOps.cusum(m, k = 0.5, h = 4.0).collect()
    assert(rows.length == 1, "constant series must drop")
    val r = rows(0)
    assert(r.getLong(1) == 20L)
    assert(r.getLong(2) == 2L, s"expected 2 alarms, got ${r.getLong(2)}")
    assert(r.getLong(3) == 1735689600000L + 8 * 60000L)
    assert(r.getDouble(4) == 4.5)
  }

  test("holt: two-state recursion matches the hand-rolled 4-dp replay") {
    import graft.operators.SeriesOps
    val m = Seq(("a", 0, tsAt(0), 0.0), ("a", 1, tsAt(60), 4.0),
      ("a", 2, tsAt(120), 8.0)).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.holt(m, alpha = 0.25, beta = 0.125)
      .orderBy("idx").collect()
    assert(out(0).getDouble(3) == 0.0 && out(0).getDouble(4) == 0.0)
    assert(out(1).getDouble(3) == 1.0 && out(1).getDouble(4) == 0.125)
    assert(out(2).getDouble(3) == 2.8438 && out(2).getDouble(4) == 0.3399)
  }

  test("lttb: short series pass through; spikes dominate frame selection; endpoints kept") {
    import graft.operators.SeriesOps
    val short = (0 until 3).map(i => ("s", i, tsAt(i * 60), i.toDouble))
    val spiky = (1 to 20).map(i => ("b", i, tsAt(i * 60),
      if (i == 5) 500.0 else if (i == 15) 1000.0 else 0.0))
    val m = (short ++ spiky).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.lttb(m, buckets = 4)
      .collect().groupBy(_.getString(0))
    assert(out("s").length == 3, "n <= buckets passes through")
    val b = out("b").sortBy(_.getInt(1))
    assert(b.map(_.getInt(2)).toSeq == Seq(1, 5, 15, 20),
      s"selected ${b.map(_.getInt(2)).toSeq}")
  }

  test("responseLatency: only user→assistant adjacencies count; exact-ms stats") {
    import graft.operators.SeriesOps
    val t = Seq(
      ("a", 0, "user", tsAt(0)), ("a", 1, "assistant", tsAt(3)),     // 3000ms
      ("a", 2, "user", tsAt(10)), ("a", 3, "tool", tsAt(12)),        // broken pair
      ("a", 4, "assistant", tsAt(20)), ("a", 5, "user", tsAt(30)),
      ("a", 6, "assistant", tsAt(37))                                // 7000ms
    ).toDF("conv_id", "turn_idx", "role", "ts")
    val r = SeriesOps.responseLatency(t, "user", "assistant").collect()(0)
    assert(r.getLong(1) == 2L)
    assert(r.getDouble(2) == 5000.0)
    assert(r.getLong(3) == 3000L && r.getLong(4) == 7000L)
  }

  test("turnTaking: role-bigram counts over time order") {
    import graft.operators.SeriesOps
    val t = Seq(
      ("a", 0, "user", tsAt(0)), ("a", 1, "assistant", tsAt(1)),
      ("a", 2, "user", tsAt(2)), ("a", 3, "assistant", tsAt(3)),
      ("a", 4, "assistant", tsAt(4))
    ).toDF("conv_id", "turn_idx", "role", "ts")
    val out = SeriesOps.turnTaking(t).collect()
      .map(r => (r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(out == Map(("user", "assistant") -> 2L,
      ("assistant", "user") -> 1L, ("assistant", "assistant") -> 1L))
  }

  test("peaks: prominence gate and plateau/endpoint exclusion; peakless series gets -1 sentinels") {
    import graft.operators.SeriesOps
    // idx1=1,10,1: peak (prom 9); idx4=5 between 1s: prom 4 < 5 → no;
    // plateau 10,10: no (strict >); endpoints never peak
    val a = Seq(1.0, 10.0, 1.0, 5.0, 1.0, 10.0, 10.0, 1.0)
      .zipWithIndex.map { case (v, i) => ("a", i, tsAt(i * 60), v) }
    val c = (0 until 4).map(i => ("c", i, tsAt(i * 60), 2.0))
    val m = (a ++ c).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.peaks(m, delta = 5.0).orderBy("conv_id").collect()
    assert(out(0).getLong(2) == 1L, s"one peak, got ${out(0).getLong(2)}")
    assert(out(0).getLong(3) == 1735689600000L + 60000L)
    assert(out(0).getDouble(4) == 10.0)
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == -1L
      && out(1).getDouble(4) == -1.0)
  }

  test("counterIncrease: resets contribute restarted value, attributed to the later bucket") {
    import graft.operators.SeriesOps
    // counter 10,25 in hour 0; 5 (reset), 7 in hour 1; the 25→5 pair lands
    // in hour 1: inc = 5 + 2 = 7, one reset; hour 0 inc = 0 + 15
    val m = Seq(
      ("a", 0, tsAt(0), 10L), ("a", 1, tsAt(60), 25L),
      ("a", 2, tsAt(3600), 5L), ("a", 3, tsAt(3660), 7L)
    ).toDF("conv_id", "turn_idx", "ts", "counter")
    val out = SeriesOps.counterIncrease(m, date_trunc("hour", col("ts")), "counter")
      .orderBy("bucket_ts").collect()
    assert(out(0).getLong(3) == 0L && out(0).getLong(4) == 15L)
    assert(out(1).getLong(3) == 1L && out(1).getLong(4) == 7L)
  }

  test("olsTrend: exact line recovers slope/intercept with r2=1; constant drops") {
    import graft.operators.SeriesOps
    val line = (1 to 10).map(i => ("a", i, tsAt(i * 60), 2.0 * i + 1.0))
    val const = (1 to 10).map(i => ("c", i, tsAt(i * 60), 7.0))
    val m = (line ++ const).toDF("conv_id", "turn_idx", "ts", "value")
    val rows = SeriesOps.olsTrend(m).collect()
    assert(rows.length == 1, "constant series must drop")
    val r = rows(0)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0 && r.getDouble(4) == 1.0)
  }

  test("seasonalDecompose: pure period-24 signal yields exact centered indices") {
    import graft.operators.SeriesOps
    // one point per hour for 3 days; hod 5 spikes to 22, others 10 →
    // 2x24 MA trend = 10.5 everywhere defined, s_idx(5)=11.5, rest -0.5
    val m = (0 until 72).map(i =>
      ("a", i, tsAt(i.toLong * 3600), if (i % 24 == 5) 22.0 else 10.0))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.seasonalDecompose(m, date_trunc("hour", col("ts")))
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out.size == 24)
    assert(out(5) == 11.5)
    assert((0 until 24).filter(_ != 5).forall(h => out(h) == -0.5),
      s"got $out")
  }

  test("stratifiedSampling: empty allocation returns empty result, not NPE") {
    val classes = Seq(("a", 1L), ("a", 2L), ("b", 3L)).toDF("label", "key")
    val alloc = Seq.empty[(String, Long)].toDF("label", "alloc")
    val out = graft.operators.Accuracy.stratifiedSampling(
      classes, alloc, "label", "key")
    assert(out.count() == 0L)
    assert(out.columns.toSeq == Seq("key", "label", "rn"))
  }

  test("counterRate: irate uses the bucket's LAST pair; resets counted") {
    import graft.operators.SeriesOps
    // one hourly bucket; counter 10 → 30 → 5 (reset) → 25 at 0/60/120/180 s:
    // inc = 20 + 5 + 20 = 45, n_resets = 1, last pair contrib 20 over 60 s
    val m = Seq(("a", 0, tsAt(0), 10L), ("a", 1, tsAt(60), 30L),
      ("a", 2, tsAt(120), 5L), ("a", 3, tsAt(180), 25L))
      .toDF("conv_id", "turn_idx", "ts", "ctr")
    val r = SeriesOps.counterRate(m, date_trunc("hour", col("ts")), "ctr",
      bucketSec = 3600L).collect()(0)
    assert(r.getLong(2) == 4L && r.getLong(3) == 1L && r.getLong(4) == 45L)
    assert(r.getDouble(5) == 0.0125) // 45/3600
    assert(r.getDouble(6) == 0.3333) // last pair 20 over 60 s, 4-dp
  }

  test("coverage: distinct minutes and interior max gap are exact") {
    import graft.operators.SeriesOps
    // 3 obs in one day: minutes 0, 0, 10 → 2 distinct; max gap 570 s
    val m = Seq(("a", 0, tsAt(0), 1.0), ("a", 1, tsAt(30), 1.0),
      ("a", 2, tsAt(600), 1.0)).toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.coverage(m).collect()(0)
    assert(r.getLong(2) == 3L && r.getLong(3) == 2L)
    assert(r.getLong(5) == 570000L)
  }

  test("ccf: identical channels give r0 = 1, and lags stay in [-1, 1]") {
    import graft.operators.SeriesOps
    val xs = Seq(3.0, 9.0, 1.0, 7.0, 5.0, 8.0, 2.0, 6.0)
    val m = xs.indices.map { i =>
      ("a", i, tsAt(i.toLong * 60), xs(i), xs(i))
    }.toDF("conv_id", "turn_idx", "ts", "x", "y")
    val r = SeriesOps.ccf(m, "x", "y").collect()(0)
    assert(r.getDouble(2) == 1.0, s"r0 = ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3)) <= 1.0 && math.abs(r.getDouble(4)) <= 1.0)
  }

  test("hampel: planted spike flagged; clean series has zero outliers") {
    import graft.operators.SeriesOps
    val clean = (0 until 9).map(i => ("c", i, tsAt(i.toLong * 60), 10.0))
    val spiked = (0 until 9).map(i =>
      ("s", i, tsAt(i.toLong * 60), if (i == 4) 100.0 else 10.0 + (i % 3)))
    val m = (clean ++ spiked).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.hampel(m, k = 2, nsig = 3.0)
      .orderBy("conv_id").collect()
    assert(out(0).getLong(2) == 0L, "constant series: mad=0 → no outliers")
    assert(out(1).getLong(2) == 1L, s"spike must be the one outlier")
    assert(out(1).getLong(3) == tsAt(4 * 60).getTime)
  }

  test("bursts: a tight cluster inside sparse traffic enters the burst state") {
    import graft.operators.SeriesOps
    // 600-s ambient gaps with a 5-point cluster at 10-s spacing in the
    // middle: the cluster's normalized gaps are far below the ln-2
    // break-even, so the 2-state DP must spend >= 3 steps in burst
    val ts = Seq(0L, 600, 1200, 1800, 1810, 1820, 1830, 1840, 2440, 3040)
    val m = ts.zipWithIndex.map { case (t, i) => ("a", i, tsAt(t), 1.0) }
      .toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.bursts(m).collect()(0)
    assert(r.getLong(1) == 9L)
    assert(r.getLong(3) >= 3L, s"n_burst = ${r.getLong(3)}")
    // the burst path pays the entry cost tau=1, so the state flips on the
    // cluster's SECOND tight gap (t=1820), not its first
    assert(r.getLong(4) >= 3L && r.getLong(5) == tsAt(1820).getTime,
      s"run=${r.getLong(4)} first=${r.getLong(5)}")
    // short series: no output
    assert(SeriesOps.bursts(m.filter(col("turn_idx") < 2)).count() == 0L)
  }

  test("realtimeState: mid-bucket watermark drops the sealed edge bucket and recomputes it") {
    import graft.operators.Rollup
    import graft.model.Tier
    // raw spans 3 hours; watermark lands MID hour 1 — the router must
    // discard the sealed (partial) hour-1 bucket and recompute hours 1-2
    // from raw, matching the full recompute exactly
    val raw = (0 until 9).map(i =>
      ("a", i, tsAt(i.toLong * 1200), (i * 7 % 13).toDouble))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val wm = tsAt(3600 + 1200) // 20 min into hour 1
    val sealedSt = Rollup.tierState(
      raw.filter(col("ts") < lit(wm)), Tier.H1, tsCol = "ts")
    val routed = Rollup.presentState(
      Rollup.realtimeState(raw, sealedSt, Tier.H1, wm, tsCol = "ts"))
      .orderBy("bucket_ts").collect()
    val full = Rollup.presentState(Rollup.tierState(raw, Tier.H1, tsCol = "ts"))
      .orderBy("bucket_ts").collect()
    assert(routed.toSeq == full.toSeq)
  }

  test("funnel: strict stage order, sentinels, and the conversion window gate") {
    import graft.operators.SeriesOps
    // conv a: user@0, tool@60, assistant@120 → reached 3, converts in 120 s
    // conv b: tool@0, user@60, assistant@120 → tool BEFORE user doesn't
    //   count; no tool after user → reached 1
    // conv c: user@0, tool@60, assistant@7200 → reached 3 but span > window
    val rows = Seq(
      ("a", 0, tsAt(0), "user"), ("a", 1, tsAt(60), "tool"),
      ("a", 2, tsAt(120), "assistant"),
      ("b", 0, tsAt(0), "tool"), ("b", 1, tsAt(60), "user"),
      ("b", 2, tsAt(120), "user"),
      ("c", 0, tsAt(0), "user"), ("c", 1, tsAt(60), "tool"),
      ("c", 2, tsAt(7200), "assistant"))
      .toDF("conv_id", "turn_idx", "ts", "role")
    val out = SeriesOps.funnel(rows, Seq("user", "tool", "assistant"),
      windowMs = 3600000L).orderBy("conv_id").collect()
    assert(out(0).getInt(1) == 3 && out(0).getBoolean(6))
    assert(out(1).getInt(1) == 1 && out(1).getLong(3) == -1L &&
      !out(1).getBoolean(6))
    assert(out(2).getInt(1) == 3 && out(2).getLong(5) == 7200000L &&
      !out(2).getBoolean(6), "reached but outside the window")
  }

  test("cohortRetention: day-0 fraction is 1, later ages divide by cohort size") {
    import graft.operators.SeriesOps
    // cohort 2 convs on day 0; one returns on day 1 → retention 0.5
    val d = 86400L
    val m = Seq(("a", 0, tsAt(0), 1.0), ("b", 0, tsAt(10), 1.0),
      ("a", 1, tsAt(d), 1.0))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.cohortRetention(m).orderBy("age_d").collect()
    assert(out(0).getInt(1) == 0 && out(0).getLong(2) == 2L &&
      out(0).getDouble(3) == 1.0)
    assert(out(1).getInt(1) == 1 && out(1).getLong(2) == 1L &&
      out(1).getDouble(3) == 0.5)
  }

  test("logHistQuantiles: power-of-two buckets and quantile upper bounds are integer-exact") {
    import graft.operators.Summary
    // values 1,2,3,4,1000 → buckets 0,1,1,2,9; n=5
    // p50: ceil(2.5)=3 → first cum≥3 is bucket 1 → ub = 2^2-1 = 3
    // p99: ceil(4.95)=5 → bucket 9 → ub = 2^10-1 = 1023
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 1000L),
      ("z", 0L)).toDF("k", "v")
    val out = Summary.logHistQuantiles(df, "k", "v", Seq(0.5, 0.99))
      .orderBy("k").collect()
    assert(out(0).getLong(1) == 5L)
    assert(out(0).getLong(2) == 3L && out(0).getLong(3) == 1023L)
    // non-positive values land in bucket -1 with upper bound 0
    assert(out(1).getLong(2) == 0L && out(1).getLong(3) == 0L)
  }

  test("KMV bottom-k: exhaustive under k, estimate within 25% over k") {
    import graft.operators.Summary
    val small = (1 to 10).map(i => s"key$i").toDF("k")
    val s = Summary.kmvDistinct(small, "k", k = 64).collect()(0)
    assert(s.getLong(0) == 10L && s.getDouble(2) == 10.0)
    val big = (1 to 5000).map(i => s"key$i").toDF("k")
    val b = Summary.kmvDistinct(big, "k", k = 256).collect()(0)
    assert(b.getLong(0) == 256L)
    assert(math.abs(b.getDouble(2) - 5000) / 5000 < 0.25,
      s"est = ${b.getDouble(2)}")
    // the sample itself is deterministic and rank-ordered
    val r = Summary.bottomKSample(big, "k", k = 5).collect()
    assert(r.map(_.getInt(2)).toSeq == Seq(1, 2, 3, 4, 5))
    assert(r.map(_.getLong(1)).toSeq.sorted.sameElements(r.map(_.getLong(1))))
  }

  test("minhashSignatureDistinct ≡ minhashSignature on a clone-heavy corpus") {
    // 40 docs over only 6 distinct texts (incl. <3-token drops): the
    // once-per-distinct-text path must emit byte-identical signatures
    val texts = Seq(
      "the quick brown fox jumps", "lorem ipsum dolor sit amet",
      "pack my box with five dozen jugs", "short one", // <3 tokens drops
      "a b c d e f g", "x y z")
    val docs = (0 until 40).map(i => (i.toLong, texts(i % texts.length)))
      .toDF("doc_id", "text").repartition(8)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val a = canon(graft.operators.Dedup.minhashSignature(docs, 8))
    val b = canon(graft.operators.Dedup.minhashSignatureDistinct(docs, 8))
    assert(a == b)
    // "short one" (residue 3 → 7 copies) drops in both paths; 40-7 = 33
    assert(a.size == 33,
      s"docs with <3 tokens must drop in both paths (got ${a.size})")
  }

  test("heavyHitters: exact equality with the full groupBy at every k") {
    import graft.operators.Summary
    // Zipf-ish corpus spread over 8 partitions: MG candidates + recount
    // must equal the brute-force frequency filter EXACTLY (no false
    // negatives from partition summaries, no sketch false positives)
    val words = (0 until 2000).map { i =>
      if (i % 2 == 0) "alpha" else if (i % 3 == 0) "beta"
      else if (i % 5 == 0) "gamma" else s"rare$i"
    }
    val df = spark.createDataset(words).repartition(8).toDF("w")
    for (k <- Seq(3, 10, 50)) {
      val got = Summary.heavyHitters(df, "w", k)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val total = words.size
      val want = words.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > total }.toMap
      assert(got == want, s"k=$k got=$got want=$want")
    }
  }
}
