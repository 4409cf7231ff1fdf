package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.runtime.TierPipeline

/** Retention layer (north rule: "rollup + downsample + RETENTION system"):
  * windowed ingestion commits carry their batch time range in the
  * manifest; expireBatches tombstones whole batches entirely before the
  * cutoff (metadata-only, guarded on the coarser tier); vacuumTier
  * physically deletes tombstoned dirs. Expiry must never un-commit: a
  * resumed ingest of an expired window is a no-op, not a rewrite.
  */
class RetentionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val day1Ms = 1704067200000L // 2024-01-01T00:00:00Z
  private val day2Ms = day1Ms + 86400000L

  private def dayDf(startMs: Long) =
    (0 until 24).flatMap(h => Seq("ca", "cb").map(c =>
      (c, new java.sql.Timestamp(startMs + h * 3600000L), h.toDouble)))
      .toDF("conv_id", "bucket_ts", "value")
      .withColumn("bucket", TierPipeline.bucketCol(4))

  test("windowed ingest → guarded expiry → vacuum; expiry never re-ingests") {
    val out = java.nio.file.Files.createTempDirectory("retention").toString
    val snap = 7L

    // two daily ingest windows into the same tier
    val r1 = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day1Ms), window = Some("d1"))
    val r2 = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day2Ms), window = Some("d2"))
    assert(r1.processed.nonEmpty && r2.processed.nonEmpty)
    assert(TierPipeline.readTier(spark, out, "1h-state", snap).count() == 96)

    // windowed resume: each window's buckets are committed independently
    val r1b = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day1Ms), window = Some("d1"))
    assert(r1b.processed.isEmpty && r1b.skipped.sorted == Seq(0, 1, 2, 3))

    // guard: refuse to expire while the coarser tier is missing
    intercept[IllegalArgumentException] {
      TierPipeline.expireBatches(out, "1h-state", snap, day2Ms,
        guardTier = Some("1d-state"), nBuckets = 4)
    }

    // commit the coarser tier (roll-up of everything), then expire day 1
    TierPipeline.runTier(spark, out, "1d-state", snap, 4,
      dayDf(day1Ms), window = None)
    val expired = TierPipeline.expireBatches(out, "1h-state", snap, day2Ms,
      guardTier = Some("1d-state"), nBuckets = 4)
    assert(expired.size == 1 && expired.head.contains("wd1"))

    // readers + catalog see only the live window; day-2 batch straddles
    // nothing (maxTs >= cutoff) and stays
    val live = TierPipeline.readTier(spark, out, "1h-state", snap)
    assert(live.count() == 48)
    assert(live.agg(min(unix_millis(col("bucket_ts")))).head.getLong(0) == day2Ms)
    val cat = TierPipeline.fileInfo(spark, out, "1h-state", snap)
      .select("path").distinct().as[String].collect()
    assert(cat.length == 1 && cat.head.contains("wd2"))

    // idempotent sweep
    assert(TierPipeline.expireBatches(out, "1h-state", snap, day2Ms,
      guardTier = Some("1d-state"), nBuckets = 4).isEmpty)

    // expiry is not un-commitment: re-running window d1 is STILL a no-op
    val r1c = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day1Ms), window = Some("d1"))
    assert(r1c.processed.isEmpty, "expired window was re-ingested")

    // physical vacuum removes exactly the tombstoned dir, idempotently
    val deleted = TierPipeline.vacuumTier(out, "1h-state")
    assert(deleted == expired)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(deleted.head)))
    assert(TierPipeline.vacuumTier(out, "1h-state").isEmpty)
    assert(TierPipeline.readTier(spark, out, "1h-state", snap).count() == 48)
  }

  test("compaction: many windowed batches → one batch; rows identical, resume intact, vacuum reclaims") {
    val out = java.nio.file.Files.createTempDirectory("compact").toString
    val snap = 9L
    // five windowed ingest commits = five small batch dirs
    (0 until 5).foreach { d =>
      TierPipeline.runTier(spark, out, "1h-state", snap, 4,
        dayDf(day1Ms + d * 86400000L), window = Some(s"d$d"))
    }
    val before = TierPipeline.readTier(spark, out, "1h-state", snap)
      .collect().map(_.toString).sorted
    assert(before.length == 5 * 48)
    assert(TierPipeline.committedPaths(out, "1h-state", snap).size == 5)

    // compact → exactly one live path, same rows
    val target = TierPipeline.compactTier(spark, out, "1h-state", snap)
    assert(target.exists(_.contains("compact_9")))
    val livePaths = TierPipeline.committedPaths(out, "1h-state", snap)
    assert(livePaths == Seq(target.get), s"live paths after compact: $livePaths")
    val after = TierPipeline.readTier(spark, out, "1h-state", snap)
      .collect().map(_.toString).sorted
    assert(after.sameElements(before), "compaction changed the row set")

    // catalog shows only the consolidated batch
    val cat = TierPipeline.fileInfo(spark, out, "1h-state", snap)
      .select("path").distinct().as[String].collect()
    assert(cat.toSeq == Seq(target.get))

    // resume diff still sees every (bucket, window) as done — rewrite ≠ missing
    (0 until 5).foreach { d =>
      val r = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
        dayDf(day1Ms + d * 86400000L), window = Some(s"d$d"))
      assert(r.processed.isEmpty, s"window d$d was re-ingested after compaction")
    }

    // single live batch → nothing further to merge
    assert(TierPipeline.compactTier(spark, out, "1h-state", snap).isEmpty)

    // batches committed AFTER a compaction must be compactable again
    // (generation 2) — the live-stream companion case
    TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day1Ms + 5 * 86400000L), window = Some("d5"))
    assert(TierPipeline.committedPaths(out, "1h-state", snap).size == 2)
    val target2 = TierPipeline.compactTier(spark, out, "1h-state", snap)
    assert(target2.exists(_.contains("_g2")), s"no second generation: $target2")
    assert(TierPipeline.committedPaths(out, "1h-state", snap) == Seq(target2.get))
    assert(TierPipeline.readTier(spark, out, "1h-state", snap).count() == 6 * 48)

    // vacuum reclaims the five original dirs AND the replaced generation-1
    // compact dir, keeps only the live generation-2 one
    val deleted = TierPipeline.vacuumTier(out, "1h-state")
    assert(deleted.size == 7 && deleted.contains(target.get) &&
      !deleted.contains(target2.get), s"vacuumed: $deleted")
    deleted.foreach(p =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    assert(TierPipeline.readTier(spark, out, "1h-state", snap).count() == 6 * 48)

    // retention after compaction: whole-batch granularity — the global
    // [minTs,maxTs] spans all six days, so a mid-range cutoff expires
    // nothing, and a past-the-end cutoff expires the whole batch
    TierPipeline.runTier(spark, out, "1d-state", snap, 4, dayDf(day1Ms))
    assert(TierPipeline.expireBatches(out, "1h-state", snap,
      day1Ms + 3 * 86400000L, Some("1d-state"), 4).isEmpty)
    val all = TierPipeline.expireBatches(out, "1h-state", snap,
      day1Ms + 10 * 86400000L, Some("1d-state"), 4)
    assert(all == Seq(target2.get))
  }

  test("quantiles survive retention: p50/p90/p99 at 1d answerable AFTER raw+1m+1h expiry, identical to pre-expiry") {
    import graft.operators.Rollup
    val input = java.nio.file.Files.createTempDirectory("qret_in").toString
    graft.sources.Transcripts.synthetic(spark, nConv = 40)
      .write.mode("overwrite").parquet(s"$input/transcripts.parquet")
    val tr = spark.read.parquet(s"$input/transcripts.parquet")
    val out = java.nio.file.Files.createTempDirectory("qret").toString
    TierPipeline.runAll(spark, tr, input, out, nBuckets = 4)
    val snap = TierPipeline.snapshotId(input)

    def q1d() = Rollup.histQuantiles(
      TierPipeline.readTier(spark, out, "1d-state", snap).drop("bucket"),
      Seq(0.5, 0.9, 0.99)).collect().map(_.toString).sorted.toSeq
    val pre = q1d()
    assert(pre.nonEmpty, "no 1d quantile rows before expiry")

    // expire + vacuum EVERYTHING below 1d (cutoff far in the future)
    val far = Long.MaxValue / 2
    assert(TierPipeline.expireBatches(out, "1m-chunks", snap, far,
      guardTier = Some("1h-state"), nBuckets = 4).nonEmpty)
    assert(TierPipeline.expireBatches(out, "1h-state", snap, far,
      guardTier = Some("1d-state"), nBuckets = 4).nonEmpty)
    TierPipeline.vacuumTier(out, "1m-chunks")
    TierPipeline.vacuumTier(out, "1h-state")
    // fine tiers truly gone: no live batches remain (readTier now refuses)
    assert(TierPipeline.committedPaths(out, "1h-state", snap).isEmpty,
      "1h tier still live after expiry")
    assert(TierPipeline.committedPaths(out, "1m-chunks", snap).isEmpty,
      "1m tier still live after expiry")

    // the carried histogram still answers — and answers identically
    assert(q1d() == pre, "1d quantiles changed after expiring finer tiers")
  }

  test("compaction mid-swap vs concurrent ingest: new window stays live, no (bucket,window) dropped or double-counted") {
    val out = java.nio.file.Files.createTempDirectory("interleave").toString
    val snap = 13L
    TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day1Ms), window = Some("d0"))
    TierPipeline.runTier(spark, out, "1h-state", snap, 4,
      dayDf(day2Ms), window = Some("d1"))

    // a third window commits INSIDE compaction's swap window (after the
    // consolidated dir is written, before the single manifest append)
    val target = TierPipeline.compactTier(spark, out, "1h-state", snap,
      () => {
        val r = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
          dayDf(day2Ms + 86400000L), window = Some("d2"))
        assert(r.processed.nonEmpty)
      })
    assert(target.nonEmpty)

    // live paths: the consolidated batch AND the interleaved d2 batch —
    // d2 was not tombstoned by a swap planned before it existed
    val live = TierPipeline.committedPaths(out, "1h-state", snap)
    assert(live.size == 2 && live.contains(target.get), s"live: $live")

    // row multiset = exactly three days, nothing dropped, nothing doubled
    val rows = TierPipeline.readTier(spark, out, "1h-state", snap)
    assert(rows.count() == 3 * 48)
    assert(rows.select("conv_id", "bucket_ts").distinct().count() == 3 * 48)

    // resume diff: every (bucket, window) still done
    Seq("d0", "d1", "d2").zipWithIndex.foreach { case (w, d) =>
      val r = TierPipeline.runTier(spark, out, "1h-state", snap, 4,
        dayDf(day1Ms + d * 86400000L), window = Some(w))
      assert(r.processed.isEmpty, s"window $w re-ingested")
    }

    // the next compaction folds the interleaved batch in; rows preserved
    val target2 = TierPipeline.compactTier(spark, out, "1h-state", snap)
    assert(target2.nonEmpty && target2 != target)
    assert(TierPipeline.committedPaths(out, "1h-state", snap) == Seq(target2.get))
    assert(TierPipeline.readTier(spark, out, "1h-state", snap).count() == 3 * 48)
  }

  test("vacuum refuses manifest paths that escape the tier root") {
    val out = java.nio.file.Files.createTempDirectory("retention2").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/x.manifest.jsonl"),
      s"""{"jobId":"j","tier":"x","bucket":0,"snapshotId":1,"path":"/etc/passwd","window":"-","minTs":0,"maxTs":1,"rowsIn":1,"rowsOut":1,"wallMs":1,"status":"committed"}
         |{"jobId":"r","tier":"x","bucket":-1,"snapshotId":1,"path":"/etc/passwd","window":"-","cutoffMs":2,"status":"expired"}
         |""".stripMargin)
    intercept[IllegalArgumentException] {
      TierPipeline.vacuumTier(out, "x")
    }
  }

  test("streaming ingest closes the retention loop: old waves expire+vacuum as the watermark advances, redelivery still no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.Turn
    implicit val sqlCtx = spark.sqlContext
    def turn(conv: String, idx: Int, sec: Long) =
      Turn(conv, idx, "user", s"$conv:$idx", null,
        new java.sql.Timestamp(1735689600000L + sec * 1000))
    val base = 1735689600000L
    val out = java.nio.file.Files.createTempDirectory("streamret").toString
    val snap = 11L
    val mem = MemoryStream[Turn]
    // retention horizon 1h behind the committed event-time high-water mark
    val q = graft.streaming.StreamingRollup.ingestStreamWithRetention(mem.toDF(), out, snap,
        nBuckets = 4, watermark = "10 minutes", retentionMs = 3600000L)
      .option("checkpointLocation", s"$out/_ckpt")
      .start()
    try {
      // wave at minutes 0-2, then sentinels that advance the watermark far
      // enough to (a) finalize earlier windows, (b) push the committed
      // high-water mark past wave+1h so the wave's batches expire
      mem.addData(turn("a", 0, 5), turn("a", 1, 70), turn("b", 0, 130))
      q.processAllAvailable()
      mem.addData(turn("zz", 0, 7200)); q.processAllAvailable()   // finalizes the wave
      mem.addData(turn("zz", 1, 14400)); q.processAllAvailable()  // finalizes 7200; hwm=7200s → cutoff 3600s → wave expires
      mem.addData(turn("zz", 2, 100000)); q.processAllAvailable() // finalizes 14400; cutoff 10800s → 7200-batch expires

      val manifest = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(s"$out/1m-stream.manifest.jsonl"))
      import scala.jdk.CollectionConverters._
      val lines = manifest.asScala
      assert(lines.exists(_.contains("\"status\":\"expired\"")), "no expiry ran")
      assert(lines.exists(_.contains("\"status\":\"vacuumed\"")), "no vacuum ran")

      // live tier = only buckets within the horizon of the final hwm
      // (14400s): the wave (≤130s) and the 7200s sentinel are gone
      val live = TierPipeline.readTier(spark, out, "1m-stream", snap)
        .select("conv_id", "bucket_ts").collect()
      assert(live.length == 1, s"live rows: ${live.mkString(";")}")
      assert(live(0).getString(0) == "zz" &&
        live(0).getTimestamp(1).getTime == base + 14400000L)

      // tombstoned dirs are physically deleted
      val vacuumed = lines.filter(_.contains("\"status\":\"vacuumed\""))
        .flatMap(l => """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
      assert(vacuumed.nonEmpty)
      vacuumed.foreach(p => assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(p)), s"$p still on disk"))

      // expiry never un-commits: every expired batch's (window, bucket)
      // resume view is intact, so a redelivered micro-batch would no-op
      val expiredWindows = lines
        .filter(l => l.contains("\"status\":\"committed\""))
        .flatMap(l => """"window":"(mb\d+)"""".r.findFirstMatchIn(l).map(_.group(1)))
        .distinct
      expiredWindows.foreach { w =>
        assert(TierPipeline.committedBuckets(out, "1m-stream", snap,
          Some(w)).nonEmpty, s"window $w lost its committed buckets")
      }
    } finally q.stop()
  }
}
