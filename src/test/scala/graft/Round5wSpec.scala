package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType}
import graft.runtime.TierPipeline
import graft.sources.Transcripts

/** Band backfill ([[TierPipeline.addMetricBand]]): adding a metric band to
  * a committed banded store leaves every tier equal to a from-scratch
  * two-band runAll, rewrites no base-band dir, and resumes per bucket.
  */
class Round5wSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val nBuckets = 4
  private val tiers =
    Seq("1m-chunks", "1h-state", "1d-state", "1mo-state", "gh-state")

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Layout-stable canonicalization (Round5uSpec convention): binary
    * payloads hexed; double state sums quantized to 9 significant digits
    * (band merge order differs from the fused two-band kernel's).
    */
  private def canon(df: DataFrame): Seq[String] = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case BinaryType => hex(col(f.name)).as(f.name)
        case DoubleType => format_string("%.9e", col(f.name)).as(f.name)
        case _          => col(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*).collect().map(_.toString).sorted.toSeq
  }

  test("addMetricBand == from-scratch two-band runAll at every tier; base dirs untouched; bucket-granular resume") {
    val full = Transcripts.synthetic(spark, nConv = 30).toDF()
    val in = freshDir("band_in")
    full.write.mode("overwrite").parquet(s"$in/transcripts.parquet")
    val tr = spark.read.parquet(s"$in/transcripts.parquet")
    val snap = TierPipeline.snapshotId(in)

    // base store: ONE band, banded schema
    val out = freshDir("band_out")
    TierPipeline.runAll(spark, tr, in, out, nBuckets,
      metrics = Seq("text_len"), asBands = true)
    val baseDirs = tiers.flatMap(t =>
      TierPipeline.committedPaths(out, t, snap)).toSet

    // backfill is_tool, exercising resume on the way (first call capped)
    val rs0 = TierPipeline.addMetricBand(spark, tr, in, out, nBuckets,
      "is_tool", limitBuckets = Some(1))
    assert(rs0.head.processed.size == 1)
    // 1d/1mo/gh gated on the band's 1h being fully committed
    assert(rs0.drop(2).forall(_.processed.isEmpty), "gates must hold")
    val rs1 = TierPipeline.addMetricBand(spark, tr, in, out, nBuckets,
      "is_tool")
    assert(rs1.map(_.tier) == tiers)
    assert(rs1.forall(r => r.processed.nonEmpty || r.skipped.nonEmpty))

    // no base dir rewritten or retired — backfill only ADDS windowed dirs
    val afterDirs = tiers.flatMap(t =>
      TierPipeline.committedPaths(out, t, snap)).toSet
    assert(baseDirs.subsetOf(afterDirs), "base-band dirs must survive")
    assert((afterDirs diff baseDirs).nonEmpty, "band dirs must be new")

    // oracle: from-scratch TWO-band cascade
    val out2 = freshDir("band_out2")
    TierPipeline.runAll(spark, tr, in, out2, nBuckets,
      metrics = Seq("text_len", "is_tool"))
    for (tier <- tiers) {
      assert(canon(TierPipeline.readTier(spark, out, tier, snap)) ==
        canon(TierPipeline.readTier(spark, out2, tier, snap)),
        s"$tier: backfilled store differs from two-band recompute")
    }

    // idempotence: a third call finds everything committed and no-ops
    val rs2 = TierPipeline.addMetricBand(spark, tr, in, out, nBuckets,
      "is_tool")
    assert(rs2.forall(_.processed.isEmpty), "backfill must be idempotent")

    // compaction folds base + band dirs into one batch per tier without
    // changing reads; band resume still sees its buckets as committed
    for (tier <- tiers) {
      val before = canon(TierPipeline.readTier(spark, out, tier, snap))
      TierPipeline.compactTier(spark, out, tier, snap)
      TierPipeline.vacuumTier(out, tier)
      assert(canon(TierPipeline.readTier(spark, out, tier, snap)) == before,
        s"$tier: compaction changed the banded read")
    }
    val rs3 = TierPipeline.addMetricBand(spark, tr, in, out, nBuckets,
      "is_tool")
    assert(rs3.forall(_.processed.isEmpty),
      "compaction must not un-commit the band")
  }

  test("eraseCascade on a banded store: every tier equals a filtered two-band recompute") {
    val full = Transcripts.synthetic(spark, nConv = 30).toDF()
    val in = freshDir("bande_in")
    full.write.mode("overwrite").parquet(s"$in/transcripts.parquet")
    val tr = spark.read.parquet(s"$in/transcripts.parquet")
    val snap0 = TierPipeline.snapshotId(in)
    val out = freshDir("bande_out")
    TierPipeline.runAll(spark, tr, in, out, nBuckets,
      metrics = Seq("text_len", "is_tool"))

    val victims = Seq("c000004", "c000017")
    val snap1 = snap0 + 1
    TierPipeline.eraseCascade(spark, out, nBuckets, snap0, snap1, victims)

    val inB = freshDir("bande_in_f")
    full.filter(!col("conv_id").isin(victims: _*))
      .write.mode("overwrite").parquet(s"$inB/transcripts.parquet")
    val out2 = freshDir("bande_out2")
    TierPipeline.runAll(spark,
      spark.read.parquet(s"$inB/transcripts.parquet"), inB, out2, nBuckets,
      metrics = Seq("text_len", "is_tool"))
    val snapB = TierPipeline.snapshotId(inB)
    for (tier <- tiers) {
      assert(canon(TierPipeline.readTierExact(spark, out, tier, snap1)) ==
        canon(TierPipeline.readTier(spark, out2, tier, snapB)),
        s"$tier: banded erasure differs from filtered two-band recompute")
    }
  }
}
