package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.model.{Tier, Turn}
import graft.operators.{ChangeDetect, Regularize}
import graft.streaming.StreamingRollup

/** Streaming ≡ batch: the incremental 1m rollup over a stream (including a
  * late-but-within-watermark turn) must equal the batch firstValid over the
  * same data — the reference's "re-derive affected buckets" contract.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def turn(conv: String, idx: Int, role: String, sec: Long, pad: Int) =
    Turn(conv, idx, role, s"$conv:$idx:" + ("x" * pad), null,
      new java.sql.Timestamp(1735689600000L + sec * 1000))

  test("incremental 1m stream == batch firstValid (incl. late arrival)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamingRollup.incremental1m(mem.toDF(), watermark = "10 minutes")
      .writeStream.format("memory").queryName("agg1m")
      .outputMode("complete") // test-friendly: full result table each batch
      .start()
    try {
      val batch1 = Seq(
        turn("a", 0, "tool", 5, 10), turn("a", 1, "user", 20, 3), // same minute
        turn("a", 2, "assistant", 70, 7),
        turn("b", 0, "assistant", 10, 4))
      val batch2 = Seq(
        turn("a", 3, "user", 65, 9),  // late for minute 1 but within watermark
        turn("b", 1, "user", 130, 6))
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()

      val streamed = spark.sql(
        "SELECT conv_id, bucket_ts, value FROM agg1m ORDER BY conv_id, bucket_ts")
        .collect().map(_.toString).toSeq
      val batch = Regularize.firstValid(
        (batch1 ++ batch2).toDS().toDF(), Tier.M1)
        .orderBy("conv_id", "bucket_ts")
        .select("conv_id", "bucket_ts", "value")
        .collect().map(_.toString).toSeq
      assert(streamed == batch)
      // the late user turn (quality 0) must have displaced the earlier
      // assistant value in a's minute-1 bucket
      val aMin1 = spark.sql(
        "SELECT value FROM agg1m WHERE conv_id = 'a' AND bucket_ts = timestamp '2025-01-01 00:01:00'")
        .head().getDouble(0)
      assert(aMin1 == ("a:3:" + "x" * 9).length.toDouble)
    } finally q.stop()
  }

  test("streaming CMS sketch equals the batch sketch after every prefix; state stays d*w-bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docsStream = mem.toDF().toDF("doc_id", "text")
    val d = 2; val w = 8
    val q = StreamingRollup.cmsStream(docsStream, d, w)
      .writeStream.format("memory").queryName("cms")
      .outputMode("complete").start()
    try {
      val b1 = Seq((1L, "aa bb aa cc"), (2L, "dd aa ee"))
      val b2 = Seq((3L, "bb bb ff gg hh ii"))
      def streamedSketch() = spark.sql("SELECT r, pos, cnt FROM cms")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      def batchSketch(rows: Seq[(Long, String)]) =
        graft.operators.Summary.cmsCells(rows.toDF("doc_id", "text"), d, w)
          .groupBy("r", "pos").agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamedSketch() == batchSketch(b1), "prefix-1 sketch mismatch")
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamedSketch() == batchSketch(b1 ++ b2), "prefix-2 sketch mismatch")
      // bounded state: the sketch relation can never exceed d*w rows
      assert(streamedSketch().size <= d * w)
    } finally q.stop()
  }

  test("streaming log2 histogram equals batch cells after every prefix; quantile read-off agrees") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long)]
    val q = StreamingRollup.logHistStream(mem.toDF().toDF("k", "v"), "k", "v")
      .writeStream.format("memory").queryName("loghist")
      .outputMode("complete").start()
    try {
      val b1 = Seq(("a", 1L), ("a", 3L), ("a", 900L), ("b", 0L))
      val b2 = Seq(("a", 2L), ("b", 70L), ("b", 80L))
      def streamed() = spark.sql("SELECT k, bucket, cnt FROM loghist")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      def batchCells(rows: Seq[(String, Long)]) =
        rows.toDF("k", "v")
          .groupBy(col("k"), graft.operators.Summary.log2Bucket(col("v")).as("bucket"))
          .agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batchCells(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batchCells(b1 ++ b2))
      // the quantile read-off over the streamed sketch equals the batch
      // operator run over all raw values
      val cells = spark.sql("SELECT k, bucket, cnt FROM loghist")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("k")
      val wc = org.apache.spark.sql.expressions.Window
        .partitionBy("k").orderBy("bucket")
      val fromSketch = cells
        .withColumn("cum", sum("cnt").over(wc))
        .withColumn("n", sum("cnt").over(w))
        .withColumn("ub", when(col("bucket") < 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bucket + 1) - 1")))
        .groupBy(col("k"), col("n").as("n_obs"))
        .agg(min(when(col("cum") >= ceil(lit(0.5) * col("n")), col("ub")))
          .as("p50_ub"))
        .orderBy("k").collect().toSeq
      val fromBatch = graft.operators.Summary.logHistQuantiles(
        (b1 ++ b2).toDF("k", "v"), "k", "v", Seq(0.5))
        .orderBy("k").collect().toSeq
      assert(fromSketch == fromBatch)
    } finally q.stop()
  }

  test("streaming LSH screen fires exactly the batch band-join candidates against the corpus") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mkText = (salt: String) =>
      s"the quick brown fox jumps over the lazy dog again and again $salt"
    val corpus = Seq(
      (1L, mkText("")), (2L, "completely different content about spark shuffles and joins here"))
      .toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)]
    val q = StreamingRollup.lshScreenStream(
        mem.toDF().toDF("doc_id", "text"), corpus)
      .writeStream.format("memory").queryName("lsh").outputMode("append").start()
    try {
      val newDocs = Seq(
        (100L, mkText("")),          // exact copy of corpus doc 1 → must fire
        (101L, "novel text that shares no shingles with anything at all"))
      mem.addData(newDocs: _*); q.processAllAvailable()
      val streamed = spark.sql("SELECT DISTINCT new_id, hist_id FROM lsh")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = graft.operators.Dedup.bandedSignatures(newDocs.toDF("doc_id", "text"))
        .select(col("band_idx"), col("band_key"), col("doc_id").as("new_id"))
        .join(graft.operators.Dedup.bandedSignatures(corpus)
          .select(col("band_idx"), col("band_key"), col("doc_id").as("hist_id")),
          Seq("band_idx", "band_key"))
        .select("new_id", "hist_id").distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.contains((100L, 1L)), "exact copy must fire the screen")
      assert(!streamed.exists(_._1 == 101L), "novel doc must not fire")
    } finally q.stop()
  }

  test("streaming exact dedup drops redelivered turns within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamingRollup.dedupTurns(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      val b1 = Seq(turn("a", 0, "user", 5, 3), turn("a", 1, "tool", 20, 4))
      // batch 2 redelivers (a, 0) — at-least-once duplicate — plus one new turn
      val b2 = Seq(turn("a", 0, "user", 5, 3), turn("b", 0, "user", 30, 2))
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT conv_id, turn_idx FROM dedup ORDER BY conv_id, turn_idx")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      val batch = (b1 ++ b2).toDS().dropDuplicates("conv_id", "turn_idx")
        .orderBy("conv_id", "turn_idx")
        .collect().map(t => (t.conv_id, t.turn_idx)).toSeq
      assert(streamed == batch)
      assert(streamed == Seq(("a", 0), ("a", 1), ("b", 0)))
    } finally q.stop()
  }

  test("flatMapGroupsWithState carries per-conv running state across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamingRollup.convState(spark, mem.toDS())
      .writeStream.format("memory").queryName("cstate")
      .outputMode("append").start()
    try {
      mem.addData(turn("a", 0, "user", 0, 5), turn("a", 1, "tool", 100, 8))
      q.processAllAvailable()
      mem.addData(turn("a", 2, "user", 400, 2))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT n_turns, max_gap_sec FROM cstate ORDER BY n_turns")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      // batch1 emit: 2 turns, max gap 100; batch2 emit: 3 turns, gap 300
      assert(rows == Seq((2L, 100L), (3L, 300L)))
    } finally q.stop()
  }

  test("streaming sessionization == batch ledger minus each conv's open session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Turn]
    val q = StreamingRollup.sessionizeStream(spark, mem.toDS(), gapMs = 60000L)
      .writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // conv a: session 1 (0s, 10s), closed by 100s; session 2 (100s, 130s)
      // stays open. conv b: single open session. The split across batches
      // lands MID-session (130s arrives later) — state must carry it.
      mem.addData(turn("a", 0, "user", 0, 3), turn("a", 1, "assistant", 10, 3),
        turn("b", 0, "user", 5, 3))
      q.processAllAvailable()
      mem.addData(turn("a", 2, "user", 100, 3), turn("a", 3, "assistant", 130, 3))
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT conv_id, sess_idx, n_turns, start_ms, end_ms, dur_ms FROM sess ORDER BY conv_id, sess_idx")
        .collect().map(_.toString).toSeq
      val all = Seq(turn("a", 0, "user", 0, 3), turn("a", 1, "assistant", 10, 3),
        turn("b", 0, "user", 5, 3), turn("a", 2, "user", 100, 3),
        turn("a", 3, "assistant", 130, 3))
      val batchLedger = graft.operators.SeriesOps.sessionize(
          all.toDS().toDF(), gapMs = 60000L)
      // closed sessions = batch ledger minus each conv's last session
      val lastIdx = batchLedger.groupBy("conv_id")
        .agg(max("sess_idx").as("sess_idx"))
      val expected = batchLedger.join(lastIdx, Seq("conv_id", "sess_idx"), "left_anti")
        .orderBy("conv_id", "sess_idx")
        .collect().map(_.toString).toSeq
      assert(streamed == expected)
      assert(streamed.size == 1) // only a's first session is closed
    } finally q.stop()
  }

  test("online bayts stream == batch kernel (incl. gap slots and mid-series split)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stats = Array((130.0, 40.0, 210.0, 40.0), (0.2, 0.2, 0.8, 0.2))
    // conv "chg": forest-like regime then a change at idx 5; idx 7 missing
    // (NaN step). conv "no": stable regime throughout.
    def obs(c: String, i: Int, va: Double, vb: Double) =
      StreamingRollup.BaytsObs(c, i, va, vb)
    val series = (0 to 9).filter(_ != 7).map { i =>
      obs("chg", i, if (i < 5) 130.0 else 210.0, if (i < 5) 0.2 else 0.8)
    } ++ (0 to 9).map(i => obs("no", i, 131.0, 0.21))
    val (b1, b2) = series.partition(_.idx < 6) // split mid-detection-run

    val mem = MemoryStream[StreamingRollup.BaytsObs]
    val q = StreamingRollup.baytsOnline(spark, mem.toDS(), stats)
      .writeStream.format("memory").queryName("bayts_live")
      .outputMode("append").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      // last emitted verdict per conv (memory sink accumulates per-batch rows)
      val streamed = spark.sql("SELECT conv_id, change_idx, changed FROM bayts_live")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))
        .zipWithIndex.groupBy(_._1._1).map { case (c, rs) => c -> rs.maxBy(_._2)._1 }
      val a = series.map(o => (o.conv_id, o.idx, o.va)).toDF("conv_id", "idx", "value")
      val b = series.map(o => (o.conv_id, o.idx, o.vb)).toDF("conv_id", "idx", "value")
      val batch = ChangeDetect.bayts(spark, a, b, stats)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))
        .map(t => t._1 -> t).toMap
      assert(streamed.keySet == batch.keySet)
      streamed.foreach { case (c, v) => assert(v == batch(c), s"conv $c") }
      // the changed conv must actually confirm
      assert(streamed("chg")._3, "change not confirmed")
      assert(!streamed("no")._3, "false positive on stable conv")
    } finally q.stop()
  }

  test("streaming ingest commits finalized 1m buckets into the tier store; compaction merges them") {
    import spark.implicits._
    import graft.runtime.TierPipeline
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("stream-ingest").toString
    val snap = 11L
    val mem = MemoryStream[Turn]
    val q = StreamingRollup.ingestStream(mem.toDF(), out, snap, nBuckets = 4,
        watermark = "10 minutes")
      .option("checkpointLocation", s"$out/_ckpt")
      .start()
    try {
      // two waves of real turns; each wave's windows are finalized by a
      // later batch advancing the watermark (append emission lags one
      // batch — watermark at batch N is prior-batch max event time − delay)
      val wave1 = Seq(
        turn("a", 0, "tool", 5, 10), turn("a", 1, "user", 20, 3),
        turn("a", 2, "assistant", 70, 7), turn("b", 0, "assistant", 10, 4))
      val wave2 = Seq(
        turn("b", 1, "user", 1210, 6), turn("c", 0, "user", 1330, 2))
      val real = wave1 ++ wave2
      mem.addData(wave1: _*); q.processAllAvailable()
      mem.addData(wave2: _*); q.processAllAvailable()
      // sentinel s1: watermark → 1330−600 = 730s → wave-1 windows commit
      mem.addData(turn("zz", 0, "tool", 7200, 1)); q.processAllAvailable()
      // sentinel s2: watermark → 7200−600 = 6600s → wave-2 windows commit
      // (both sentinels' own windows stay open and never reach the tier)
      mem.addData(turn("zz", 1, "tool", 14400, 1)); q.processAllAvailable()

      // real convs: stream-ingested tier ≡ batch firstValid. (The sentinels
      // are real data too — s1's window also closes once s2 advances the
      // watermark — so the comparison scopes to the a/b/c convs; the final
      // still-open window must NOT have reached the tier.)
      val tierDf = TierPipeline.readTier(spark, out, "1m-stream", snap)
      val tiered = tierDf.filter(col("conv_id") =!= "zz")
        .select("conv_id", "bucket_ts", "value")
        .collect().map(_.toString).sorted
      val batch = Regularize.firstValid(real.toDS().toDF(), Tier.M1)
        .select("conv_id", "bucket_ts", "value")
        .collect().map(_.toString).sorted
      assert(tiered.sameElements(batch),
        s"stream-ingested tier != batch firstValid:\n${tiered.mkString("\n")}\nvs\n${batch.mkString("\n")}")
      assert(tierDf.filter(col("conv_id") === "zz").count() == 1,
        "the final open window leaked into the tier")

      // the commits are windowed by micro-batch id → several small batches;
      // compaction (the designed companion of streaming ingest) merges them
      // without changing the row set
      assert(TierPipeline.committedPaths(out, "1m-stream", snap).size > 1)
      val target = TierPipeline.compactTier(spark, out, "1m-stream", snap)
      assert(target.nonEmpty)
      assert(TierPipeline.committedPaths(out, "1m-stream", snap) == Seq(target.get))
      val after = TierPipeline.readTier(spark, out, "1m-stream", snap)
        .filter(col("conv_id") =!= "zz")
        .select("conv_id", "bucket_ts", "value")
        .collect().map(_.toString).sorted
      assert(after.sameElements(batch))
    } finally q.stop()
  }

  test("streaming OHLC == batch candle after every prefix (shared agg exprs; late in-window arrival reopens the candle)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Int, Double)]
    val q = StreamingRollup.ohlcStream(
      mem.toDF().toDF("conv_id", "ts", "turn_idx", "value"))
      .writeStream.format("memory").queryName("ohlcs")
      .outputMode("complete")
      .start()
    try {
      def at(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
      val b1 = Seq(("a", at(10), 0, 5.0), ("a", at(30), 1, 9.0),
        ("b", at(3700), 0, 4.0))
      // late-but-in-window turn 2 arrives in batch 2 and, being EARLIER
      // than turn 0, must take over conv a's OPEN; turn 3 extends close
      val b2 = Seq(("a", at(5), 2, 1.0), ("a", at(50), 3, 7.0))
      def streamed() = spark.sql(
        "SELECT conv_id, bucket_ts, n, open, high, low, close FROM ohlcs")
        .collect().map(_.toString).sorted.toSeq
      def batch(rows: Seq[(String, java.sql.Timestamp, Int, Double)]) =
        graft.operators.Rollup.ohlcPresent(graft.operators.Rollup.ohlcState(
          rows.toDF("conv_id", "ts", "turn_idx", "value"), Tier.H1))
          .collect().map(_.toString).sorted.toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batch(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batch(b1 ++ b2))
      val a = spark.sql("SELECT open, close FROM ohlcs WHERE conv_id = 'a'")
        .head()
      assert(a.getDouble(0) == 1.0 && a.getDouble(1) == 7.0)
    } finally q.stop()
  }

  test("streaming global rollup == batch tierStateGlobal moments, incl. late in-window arrivals") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = StreamingRollup.globalStream(
      mem.toDF().toDF("conv_id", "ts", "value"))
      .writeStream.format("memory").queryName("globals")
      .outputMode("complete")
      .start()
    try {
      def at(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
      val b1 = Seq(("a", at(10), 5.0), ("b", at(30), 9.0), ("b", at(3700), 4.0))
      val b2 = Seq(("c", at(5), 1.0), ("a", at(50), 7.0)) // late, same hour
      def streamed() = spark.sql(
        "SELECT bucket_ts, n, sum_v, sum2_v, min_v, max_v FROM globals")
        .collect().map(_.toString).sorted.toSeq
      def batch(rows: Seq[(String, java.sql.Timestamp, Double)]) =
        graft.operators.Rollup.tierStateGlobal(
          rows.toDF("conv_id", "ts", "value"), graft.model.Tier.H1,
          saltWidth = 4, tsCol = "ts").drop("n_convs")
          .collect().map(_.toString).sorted.toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batch(b1))
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batch(b1 ++ b2))
    } finally q.stop()
  }

  test("streaming HLL registers equal the batch sketch after every prefix; state bounded by 2^p") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[String]
    val p = 4
    val q = StreamingRollup.hllStream(mem.toDF().toDF("k"), "k", p)
      .writeStream.format("memory").queryName("hllregs")
      .outputMode("complete").start()
    try {
      val b1 = (1 to 40).map(i => s"key$i")
      val b2 = (30 to 70).map(i => s"key$i") // overlap: idempotent max
      def streamed() = spark.sql("SELECT register, rho FROM hllregs")
        .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      def batch(rows: Seq[String]) =
        graft.operators.Summary.hllRegisters(rows.toDF("k"), "k", p)
          .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batch(b1), "prefix-1 register mismatch")
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batch(b1 ++ b2), "prefix-2 register mismatch")
      assert(streamed().size <= (1 << p))
    } finally q.stop()
  }
}
