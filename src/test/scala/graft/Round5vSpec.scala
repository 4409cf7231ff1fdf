package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Tier
import graft.operators.{Downsample, GapFill, Regularize}
import graft.runtime.TierPipeline
import graft.sources.Transcripts

/** Committed M4 downsample tier (`m4-1h`): built from the committed
  * 1m-chunk store (never raw), equal to a direct M4 over the filled grid,
  * resumable at bucket granularity, erasable through eraseCascade's
  * extraPerConvTiers hook.
  */
class Round5vSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val nBuckets = 4

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def writeInput(df: DataFrame, tag: String): String = {
    val dir = freshDir(tag)
    df.write.mode("overwrite").parquet(s"$dir/transcripts.parquet")
    dir
  }

  private def readInput(dir: String): DataFrame =
    spark.read.parquet(s"$dir/transcripts.parquet")

  private def rows(df: DataFrame): Seq[String] =
    df.drop("bucket").collect().map(_.toString).sorted.toSeq

  /** The downsample's ground truth: M4 per (conv, hour) over the same
    * gap-filled 1m grid the chunk tier encodes.
    */
  private def directM4(tr: DataFrame): DataFrame = {
    val grid = GapFill.fillDense(spark,
        Regularize.firstValid(tr, Tier.M1), Tier.M1)
      .filter(col("value").isNotNull)
      .select(col("conv_id"), col("bucket_ts").as("ts"), col("value"))
    Downsample.m4(grid, date_trunc("hour", col("ts")))
  }

  test("downsampleTier: equals direct M4 over the filled grid; reads only the chunk store (raw input deleted); resume is byte-identical") {
    val full = Transcripts.synthetic(spark, nConv = 30).toDF()
    val in = writeInput(full, "m4_in")
    val out = freshDir("m4_out")
    val snap = TierPipeline.snapshotId(in)
    TierPipeline.runAll(spark, readInput(in), in, out, nBuckets)
    val oracle = rows(directM4(full))

    // raw input gone: the downsample must not need it
    val inPath = java.nio.file.Paths.get(in, "transcripts.parquet")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(inPath).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    assert(!java.nio.file.Files.exists(inPath))

    // resume: first run commits ONE bucket, second completes the rest
    val r1 = TierPipeline.downsampleTier(spark, out, snap, nBuckets,
      limitBuckets = Some(1))
    assert(r1.processed.size == 1 && r1.skipped.isEmpty)
    val r2 = TierPipeline.downsampleTier(spark, out, snap, nBuckets)
    assert(r2.processed.size == nBuckets - 1 &&
      r2.skipped == r1.processed.sorted)
    // third run: nothing to do
    val r3 = TierPipeline.downsampleTier(spark, out, snap, nBuckets)
    assert(r3.processed.isEmpty && r3.skipped.size == nBuckets)

    val stored = TierPipeline.readTier(spark, out, "m4-1h", snap)
    assert(rows(stored) == oracle,
      "m4-1h tier differs from direct M4 over the filled grid")
  }

  test("renderGranularity: coarsest granularity that fills the pixel budget; renderDispatch M4 envelope with deterministic cross-conv ties") {
    import spark.implicits._
    val day = 86400000L
    // 400 days / 96 px: day grid (400 >= 96) is enough
    assert(Downsample.renderGranularity(0L, 400 * day, 96) == "day")
    // 7 days / 96 px: 7 day-buckets too few, 168 hours enough
    assert(Downsample.renderGranularity(0L, 7 * day, 96) == "hour")
    // 2 hours / 96 px: 2 hour-buckets too few -> minute
    assert(Downsample.renderGranularity(0L, 7200000L, 96) == "minute")
    // boundary: exactly widthPx day-buckets chooses day
    assert(Downsample.renderGranularity(0L, 96 * day, 96) == "day")

    def at(ms: Long) = new java.sql.Timestamp(ms)
    // two convs share the hour; ties on ts broken by (conv_id, turn_idx)
    val m = Seq(
      ("a", 0, at(60000L), 5.0), ("b", 0, at(60000L), 9.0),
      ("a", 1, at(120000L), 1.0), ("b", 1, at(3000000L), 7.0))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val r = Downsample.renderDispatch(m, 0L, 7200000L, widthPx = 2).head()
    // 2h/2px -> hour granularity; single populated hour bucket
    assert(r.getString(0) == "hour")
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 9.0, "min/max")
    assert(r.getDouble(4) == 5.0, "first: ts tie at 60s -> conv a before b")
    assert(r.getDouble(5) == 7.0, "last: latest ts wins")
    assert(r.getLong(6) == 4L)
  }

  test("m4Stream == batch m4 after every prefix, incl. a late in-hour arrival updating all four stats") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val q = graft.streaming.StreamingRollup.m4Stream(
      mem.toDF().toDF("conv_id", "ts", "value"))
      .writeStream.format("memory").queryName("m4s")
      .outputMode("complete").start()
    try {
      def at(sec: Long) = new java.sql.Timestamp(1735689600000L + sec * 1000)
      val b1 = Seq(("a", at(600), 5.0), ("a", at(1200), 9.0),
        ("b", at(30), 2.0), ("a", at(4000), 7.0))
      // late but inside the watermark AND earlier than a's current first:
      // rewrites v_first/t_first, v_min, and n of the open hour
      val b2 = Seq(("a", at(60), 1.0))
      def streamed() = spark.sql("SELECT * FROM m4s")
        .collect().map(_.toString).sorted.toSeq
      def batch(rows: Seq[(String, java.sql.Timestamp, Double)]) =
        Downsample.m4(rows.toDF("conv_id", "ts", "value"),
            date_trunc("hour", col("ts")))
          .collect().map(_.toString).sorted.toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      assert(streamed() == batch(b1), "prefix-1 M4 mismatch")
      mem.addData(b2: _*); q.processAllAvailable()
      assert(streamed() == batch(b1 ++ b2), "late-arrival M4 mismatch")
    } finally q.stop()
  }

  test("eraseCascade covers m4-1h via extraPerConvTiers: victims gone, equal to filtered recompute") {
    val full = Transcripts.synthetic(spark, nConv = 30).toDF()
    val in = writeInput(full, "m4e_in")
    val out = freshDir("m4e_out")
    val snap0 = TierPipeline.snapshotId(in)
    TierPipeline.runAll(spark, readInput(in), in, out, nBuckets)
    TierPipeline.downsampleTier(spark, out, snap0, nBuckets)

    val victims = Seq("c000003", "c000011")
    val snap1 = snap0 + 1
    val runs = TierPipeline.eraseCascade(spark, out, nBuckets, snap0, snap1,
      victims, extraPerConvTiers = Seq("m4-1h"))
    assert(runs.map(_.tier).contains("m4-1h"))

    val erased = TierPipeline.readTierExact(spark, out, "m4-1h", snap1)
    assert(erased.filter(col("conv_id").isin(victims: _*)).count() == 0)
    val oracle = rows(
      directM4(full.filter(!col("conv_id").isin(victims: _*))))
    assert(rows(erased) == oracle,
      "erased m4-1h differs from filtered recompute")
  }
}
