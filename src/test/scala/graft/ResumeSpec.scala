package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.runtime.TierPipeline
import graft.sources.Transcripts

/** Resume/lineage contract (north rule; reference precedent
  * api_gdalcubes.R:713-768): a run interrupted after a partial tier commit,
  * then resumed, must produce byte-identical tier tables to an uninterrupted
  * run, and the manifests must be the only source of truth for what to skip.
  */
class ResumeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val nBuckets = 4

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"tier_$tag").toString
    d
  }

  private def sortedRows(outRoot: String, tier: String, snap: Long,
      cols: Seq[String]): Seq[String] =
    TierPipeline.readTier(spark, outRoot, tier, snap).select(cols.map(col): _*)
      .collect().map(_.toString).sorted.toSeq

  test("interrupted run + resume == uninterrupted run (byte-identical tiers)") {
    val input = freshDir("in")
    Transcripts.synthetic(spark, nConv = 60).write.mode("overwrite")
      .parquet(s"$input/transcripts.parquet")
    val tr = spark.read.parquet(s"$input/transcripts.parquet")

    // uninterrupted reference run
    val full = freshDir("full")
    val runsA = TierPipeline.runAll(spark, tr, input, full, nBuckets)
    assert(runsA.map(_.processed.size) ==
      Seq(nBuckets, nBuckets, nBuckets, nBuckets, nBuckets))
    assert(runsA.forall(_.rowsOut > 0))

    // interrupted: each tier only commits 2 of 4 buckets; 1d and 1mo must
    // refuse to run on an incomplete lower tier
    val part = freshDir("part")
    val runsB1 = TierPipeline.runAll(spark, tr, input, part, nBuckets, Some(2))
    assert(runsB1.take(2).map(_.processed.size) == Seq(2, 2))
    assert(runsB1(2).processed.isEmpty, "1d must be gated on complete 1h")
    assert(runsB1(3).processed.isEmpty, "1mo must be gated on complete 1d")
    assert(runsB1(4).processed.isEmpty, "global tier gated on complete 1h")

    // resume: only the missing buckets run, then everything matches
    val runsB2 = TierPipeline.runAll(spark, tr, input, part, nBuckets)
    assert(runsB2.take(2).map(_.processed.size) == Seq(2, 2))
    assert(runsB2.take(2).map(_.skipped.size) == Seq(2, 2))
    assert(runsB2(2).processed.size == nBuckets)
    assert(runsB2(3).processed.size == nBuckets)
    assert(runsB2(4).processed.size == nBuckets)

    val snap = TierPipeline.snapshotId(input)
    val stateCols = Seq("conv_id", "bucket_ts", "n", "sum_v", "sum2_v", "min_v", "max_v")
    for ((tier, cols) <- Seq(
        "1m-chunks" -> Seq("conv_id", "tier", "n", "codec"),
        "1h-state" -> stateCols, "1d-state" -> stateCols,
        "1mo-state" -> stateCols)) {
      assert(sortedRows(full, tier, snap, cols) == sortedRows(part, tier, snap, cols),
        s"tier $tier differs after resume")
    }

    // global tier: the conv-merge sums FRACTIONAL gap-filled values with
    // run-dependent partial-agg merge order, so (like the multi-metric
    // canonState) doubles are canonicalized at 10 significant digits —
    // far beyond the 4-dp output contract; n/min/max stay exact. Checked
    // both full-vs-resumed and stored-vs-direct-conv-merge.
    def canonGh(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select(col("bucket_ts"), col("n"),
        format_string("%.10g", col("sum_v")).as("sum_v"),
        format_string("%.10g", col("sum2_v")).as("sum2_v"),
        format_string("%.10g", col("min_v")).as("min_v"),
        format_string("%.10g", col("max_v")).as("max_v"))
      .collect().map(_.toString).sorted.toSeq
    val ghFull = canonGh(TierPipeline.readTier(spark, full, "gh-state", snap))
    val ghPart = canonGh(TierPipeline.readTier(spark, part, "gh-state", snap))
    assert(ghFull == ghPart && ghFull.nonEmpty,
      "global tier differs after resume")
    val ghDirect = canonGh(graft.operators.Rollup.cascadeHist(
      TierPipeline.readTier(spark, part, "1h-state", snap)
        .drop("bucket").drop("conv_id"), graft.model.Tier.H1))
    assert(ghPart == ghDirect,
      "stored global tier differs from the conv-merge of 1h state")

    // third run: everything already committed → all skipped, nothing re-runs
    val runsB3 = TierPipeline.runAll(spark, tr, input, part, nBuckets)
    assert(runsB3.forall(_.processed.isEmpty))
    assert(runsB3.map(_.skipped.size) ==
      Seq(nBuckets, nBuckets, nBuckets, nBuckets, nBuckets))

    // file_info relation: the manifest is queryable as a catalog table —
    // every bucket appears committed with real lineage stats
    val fi = TierPipeline.fileInfo(spark, part, "1h-state", snap)
    assert(fi.select("bucket").distinct().count() == nBuckets)
    assert(fi.agg(min("rowsOut")).head().getLong(0) > 0)

    // cube_copy / CTAS: materialize the committed tier elsewhere; the copy
    // reads back identically through the same manifest contract, and a
    // second copy is a no-op (resumable)
    val copied = freshDir("copy")
    val cr = TierPipeline.copyTier(spark, part, "1h-state", snap, copied, nBuckets)
    assert(cr.processed.size == nBuckets)
    assert(sortedRows(copied, "1h-state", snap, stateCols) ==
      sortedRows(part, "1h-state", snap, stateCols))
    assert(TierPipeline.copyTier(spark, part, "1h-state", snap, copied, nBuckets)
      .processed.isEmpty)

    // mosaic (sits_mosaic analog): single sorted artifact from committed
    // batches; the mosaic of the resumed run must be BYTE-identical to the
    // uninterrupted run's (same rows, same global order, one writer task),
    // and a re-run is an idempotent no-op returning the committed artifact
    def mosaicBytes(root: String): (String, Array[Byte]) = {
      val dir = TierPipeline.mosaicTier(spark, root, "1h-state", snap,
        s"$root/final", nBuckets)
      val parts = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path]).sortBy(_.toString)
      assert(parts.length == 1, "mosaic must be one artifact file")
      (dir, java.nio.file.Files.readAllBytes(parts.head))
    }
    val (dirFull, bytesFull) = mosaicBytes(full)
    val (dirPart, bytesPart) = mosaicBytes(part)
    assert(java.util.Arrays.equals(bytesFull, bytesPart),
      "mosaic of resumed run differs from uninterrupted run")
    assert(TierPipeline.mosaicTier(spark, part, "1h-state", snap,
      s"$part/final", nBuckets) == dirPart, "mosaic re-run must be a no-op")

    // a partially-committed source must be refused
    val partial = freshDir("partial")
    TierPipeline.runAll(spark, tr, input, partial, nBuckets, Some(2))
    assertThrows[IllegalArgumentException] {
      TierPipeline.mosaicTier(spark, partial, "1h-state", snap,
        s"$partial/final", nBuckets)
    }
  }

  test("multi-metric runAll: one raw pass serves both bands; per-band tiers equal the single-metric runs; resume intact") {
    import graft.operators.Rollup
    val input = freshDir("mm_in")
    Transcripts.synthetic(spark, nConv = 30).write.mode("overwrite")
      .parquet(s"$input/transcripts.parquet")
    val tr = spark.read.parquet(s"$input/transcripts.parquet")
    val snap = TierPipeline.snapshotId(input)
    val ms = Seq("text_len", "is_tool")

    // interrupted multi-metric run resumes exactly like single-metric
    val out = freshDir("mm")
    val r1 = TierPipeline.runAll(spark, tr, input, out, nBuckets, Some(2),
      metrics = ms)
    assert(r1.take(2).map(_.processed.size) == Seq(2, 2))
    val r2 = TierPipeline.runAll(spark, tr, input, out, nBuckets, metrics = ms)
    assert(r2(2).processed.size == nBuckets && r2(3).processed.size == nBuckets)

    // per-band slices of every tier equal the dedicated single-metric runs
    val singles = ms.map { m =>
      val o = freshDir(s"mm_$m")
      TierPipeline.runAll(spark, tr, input, o, nBuckets, metrics = Seq(m))
      m -> o
    }.toMap
    // sum_v/sum2_v are UNROUNDED internal state (the engine rounds only at
    // output boundaries); the multi run's extra `metric` grouping key hash-
    // partitions differently, so partial-agg merge ORDER differs and the
    // last ~2 ULPs of the double sums can too — canonicalize at 10
    // significant digits (way beyond the 4-dp output contract), keep
    // n/min/max exact.
    def canonState(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select(col("conv_id"), col("bucket_ts"), col("n"),
        format_string("%.10g", col("sum_v")).as("sum_v"),
        format_string("%.10g", col("sum2_v")).as("sum2_v"),
        col("min_v"), col("max_v"))
      .collect().map(_.toString).sorted.toSeq
    for (tier <- Seq("1h-state", "1d-state", "1mo-state"); m <- ms) {
      val multi = canonState(TierPipeline.readTier(spark, out, tier, snap)
        .filter(col("metric") === m))
      val single = canonState(TierPipeline.readTier(spark, singles(m), tier, snap))
      assert(multi == single, s"tier $tier band $m differs from single run")
    }
    // chunk tier: per-band chunk payloads byte-identical to single runs
    // (md5 the binary columns — Row.toString prints array identity)
    def canonChunks(df: org.apache.spark.sql.DataFrame): Seq[String] = df
      .select(col("conv_id"), col("n"), col("codec"),
        md5(col("ts_payload")).as("tp"), md5(col("value_payload")).as("vp"))
      .collect().map(_.toString).sorted.toSeq
    for (m <- ms) {
      val multi = canonChunks(TierPipeline.readTier(spark, out, "1m-chunks", snap)
        .filter(col("metric") === m))
      val single = canonChunks(
        TierPipeline.readTier(spark, singles(m), "1m-chunks", snap))
      assert(multi == single, s"chunks band $m differ from single run")
    }
    // quantile reads stay per-band (metric in the key)
    val q = Rollup.histQuantiles(
      TierPipeline.readTier(spark, out, "1d-state", snap).drop("bucket"),
      Seq(0.5, 0.99))
    assert(q.columns.contains("metric"))
    assert(q.select("metric").distinct().count() == 2)
  }

  test("snapshot id matching is exact, not prefix (123 must not match 1234)") {
    val out = freshDir("snap")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/1h-state.manifest.jsonl"),
      """{"jobId":"j","tier":"1h-state","bucket":0,"snapshotId":1234,"path":"/x","window":"-","minTs":-1,"maxTs":-1,"rowsIn":1,"rowsOut":1,"wallMs":1,"status":"committed"}""" + "\n")
    assert(TierPipeline.committedBuckets(out, "1h-state", 1234L) == Set(0))
    assert(TierPipeline.committedBuckets(out, "1h-state", 123L).isEmpty,
      "decimal-prefix snapshot id wrongly matched")
    assert(TierPipeline.committedPaths(out, "1h-state", 123L).isEmpty)
  }

  test("changed input snapshot invalidates resume") {
    val input = freshDir("in2")
    Transcripts.synthetic(spark, nConv = 10).write.mode("overwrite")
      .parquet(s"$input/transcripts.parquet")
    val tr = spark.read.parquet(s"$input/transcripts.parquet")
    val out = freshDir("out2")
    TierPipeline.runAll(spark, tr, input, out, nBuckets)
    // rewrite input (new snapshot id) → nothing is considered committed
    Thread.sleep(1100) // mtime granularity
    Transcripts.synthetic(spark, nConv = 12).write.mode("overwrite")
      .parquet(s"$input/transcripts.parquet")
    val tr2 = spark.read.parquet(s"$input/transcripts.parquet")
    val runs = TierPipeline.runAll(spark, tr2, input, out, nBuckets)
    assert(runs.head.processed.size == nBuckets, "new snapshot must re-run all buckets")
  }
}
