package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.model.Tier
import graft.operators.{Regularize, SeriesRollup}
import graft.runtime.TierPipeline
import graft.sources.Transcripts

/** Conversation erasure (right-to-be-forgotten) through the tier store:
  * eraseConvs rewrites ONLY the victim buckets (patch semantics), readers
  * of the new snapshot see no victim rows, retireSuperseded + vacuum then
  * make the erasure PHYSICAL — no surviving parquet byte under the tier
  * root contains a victim conversation — while adopted clean-bucket dirs
  * and the new snapshot's reads stay intact.
  */
class Round5tSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val nBuckets = 4

  private def freshDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def state(tr: DataFrame): DataFrame = {
    val fv = Regularize.firstValid(tr, Tier.M1)
    SeriesRollup.stateDenseHist(spark, fv, Tier.M1, Tier.H1)
      .withColumn("bucket", TierPipeline.bucketCol(nBuckets))
  }

  private def rows(df: DataFrame): Seq[String] = df
    .select("conv_id", "bucket_ts", "n", "sum_v", "sum2_v", "min_v",
      "max_v", "bucket")
    .collect().map(_.toString).sorted.toSeq

  test("eraseConvs: victim buckets rewritten without victims; retire + vacuum makes erasure physical; clean buckets untouched") {
    val in = freshDir("erase_in")
    Transcripts.synthetic(spark, nConv = 40).toDF().write.mode("overwrite")
      .parquet(s"$in/transcripts.parquet")
    val t0 = spark.read.parquet(s"$in/transcripts.parquet")
    val out = freshDir("erase_out")
    val snap0 = TierPipeline.snapshotId(in)
    assert(TierPipeline.runTier(spark, out, "1h-state", snap0, nBuckets,
      state(t0)).processed.size == nBuckets)

    import spark.implicits._
    val victims = Seq("c000003", "c000017")
    val dirtyExpected = victims.toDF("conv_id")
      .select(TierPipeline.bucketCol(nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    assert(dirtyExpected.size < nBuckets, "fixture must leave clean buckets")

    // the erasure "snapshot" is a new catalog version of the SAME input
    // (content unchanged on disk — the erasure is a policy event, not an
    // ingest), so just pick a distinct id
    val snap1 = snap0 + 1
    val r = TierPipeline.eraseConvs(spark, out, "1h-state", snap0, snap1,
      nBuckets, victims, state(t0))
    assert(r.processed.toSet == dirtyExpected,
      s"rewrote ${r.processed}, wanted only victim buckets $dirtyExpected")

    // logical erasure: new snapshot has zero victim rows and equals a
    // full recompute over the filtered input
    val erased = TierPipeline.readTierExact(spark, out, "1h-state", snap1)
    assert(erased.filter(col("conv_id").isin(victims: _*)).count() == 0)
    val tFiltered = t0.filter(!col("conv_id").isin(victims: _*))
    assert(rows(erased) == rows(state(tFiltered)),
      "erased snapshot differs from recompute over filtered input")

    // time travel still shows the victims (physical bytes not yet gone)
    assert(TierPipeline.readTier(spark, out, "1h-state", snap0)
      .filter(col("conv_id").isin(victims: _*)).count() > 0)

    // the adopted dir still PHYSICALLY carries the victims (shared-file
    // problem): compaction under the new snapshot is the rewrite that
    // sheds them — its read is (path, bucket)-exact, so superseded rows
    // are neither double-counted nor carried forward
    val pb0 = TierPipeline.committedPathBuckets(out, "1h-state", snap0)
    val compacted = TierPipeline.compactTier(spark, out, "1h-state", snap1)
    assert(compacted.nonEmpty)
    assert(rows(TierPipeline.readTierExact(spark, out, "1h-state", snap1))
      == rows(state(tFiltered)),
      "compacted erased snapshot differs from filtered recompute " +
        "(dead adopted rows double-counted or dropped)")

    // retire the old snapshot's superseded dirs, then vacuum: every
    // pre-compaction dir is now tombstoned by ALL referencing snapshots
    val retired = TierPipeline.retireSuperseded(out, "1h-state", snap0, snap1)
    assert(retired.toSet == pb0.keySet, retired.toString)
    val gone = TierPipeline.vacuumTier(out, "1h-state")
    assert(gone.forall(pa =>
      !java.nio.file.Files.exists(java.nio.file.Paths.get(pa))))

    // idempotent: nothing further to retire or vacuum
    assert(TierPipeline.retireSuperseded(out, "1h-state", snap0, snap1).isEmpty)
    assert(TierPipeline.vacuumTier(out, "1h-state").isEmpty)

    // PHYSICAL erasure proof: scan every surviving parquet byte under the
    // tier root — no victim conversation id remains anywhere
    val survivors = spark.read.parquet(s"$out/1h-state/*")
    assert(survivors.filter(col("conv_id").isin(victims: _*)).count() == 0,
      "victim rows survive on disk after vacuum")

    // the new snapshot is unharmed by the cleanup
    assert(rows(TierPipeline.readTierExact(spark, out, "1h-state", snap1))
      == rows(state(tFiltered)), "erased snapshot broken after vacuum")
  }
}
