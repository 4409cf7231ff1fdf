package graft.runtime

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Tier
import graft.operators.{ChunkStore, Downsample, GapFill, Regularize, Rollup, SeriesRollup}
import graft.model.ChunkStruct

/** Resumable tier-rollup pipeline with per-partition lineage manifests —
  * the north-rule runtime, mirroring the reference's missing-jobs recovery
  * (/root/reference/R/api_gdalcubes.R:506-513,713-768: re-scan produced
  * outputs, diff against wanted (tile×band×time), re-enqueue only the
  * missing) and resume-from-existing-files convention
  * (R/api_regularize.R:134-145).
  *
  * Work unit = (tier, conv-hash bucket). Each bucket is written as one
  * partition directory (`bucket=<n>`) via dynamic partition overwrite — the
  * sandbox stand-in for an Iceberg partition-level commit: re-running a
  * bucket atomically replaces exactly that partition, so retries are
  * idempotent. After each bucket set commits, one manifest line per bucket
  * is appended to `<tier>.manifest.jsonl` recording (job, tier, bucket,
  * input snapshot id, rows in/out, wall ms, status).
  *
  * Resume = diff wanted buckets against committed manifest lines (the
  * manifest is the only truth — reference precedent: re-derive, don't trust
  * in-flight state) and process only the missing ones. A crash between data
  * commit and manifest append re-runs that bucket; the dynamic overwrite
  * makes that safe.
  *
  * At cluster scale: buckets = Iceberg `bucket(conv_id)` partitions; the
  * manifest carries the snapshot id so a changed input invalidates resume.
  */
object TierPipeline {

  final case class TierRun(tier: String, processed: Seq[Int], skipped: Seq[Int],
      rowsIn: Long, rowsOut: Long)

  def bucketCol(nBuckets: Int) = pmod(hash(col("conv_id")), lit(nBuckets))

  private def manifestPath(outRoot: String, tier: String) =
    Paths.get(s"$outRoot/${tier}.manifest.jsonl")

  /** Buckets with a committed manifest line for this snapshot (and ingest
    * window, when the tier is fed by windowed appends). Expiry tombstones do
    * NOT uncommit a bucket: retention must never cause re-ingestion, so the
    * resume diff keeps seeing expired windows as done.
    */
  def committedBuckets(outRoot: String, tier: String, snapshotId: Long,
      window: Option[String] = None): Set[Int] = {
    val p = manifestPath(outRoot, tier)
    if (!Files.exists(p)) return Set.empty
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala
      .filter(l => l.contains("\"status\":\"committed\"") &&
        // trailing comma included: a bare substring match would let snapshot
        // 123 falsely match a line for snapshot 1234
        l.contains(s""""snapshotId":$snapshotId,""") &&
        l.contains(s""""window":"${window.getOrElse("-")}""""))
      .flatMap { l =>
        """"bucket":(\d+)""".r.findFirstMatchIn(l).map(_.group(1).toInt)
      }.toSet
  }

  private def appendLines(outRoot: String, tier: String,
      lines: Seq[String]): Unit = {
    if (lines.isEmpty) return
    Files.createDirectories(Paths.get(outRoot))
    Files.write(manifestPath(outRoot, tier),
      (lines.mkString("", "\n", "\n")).getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  private def appendManifests(outRoot: String, tier: String, jobId: String,
      snapshotId: Long, buckets: Seq[Int], path: String, rowsIn: Long,
      rowsOut: Long, wallMs: Long, window: Option[String] = None,
      minTs: Long = -1L, maxTs: Long = -1L): Unit = {
    val lines = buckets.map { b =>
      s"""{"jobId":"$jobId","tier":"$tier","bucket":$b,"snapshotId":$snapshotId,""" +
        s""""path":"$path","window":"${window.getOrElse("-")}",""" +
        s""""minTs":$minTs,"maxTs":$maxTs,""" +
        s""""rowsIn":$rowsIn,"rowsOut":$rowsOut,"wallMs":$wallMs,"status":"committed"}"""
    }
    appendLines(outRoot, tier, lines)
  }

  /** Batch directories committed for this snapshot (manifest = table of
    * contents, exactly an Iceberg manifest-list in miniature). A tier's data
    * is the union of its committed batch dirs; in-flight or stale-snapshot
    * dirs are invisible to readers.
    */
  def committedPaths(outRoot: String, tier: String, snapshotId: Long): Seq[String] = {
    val p = manifestPath(outRoot, tier)
    if (!Files.exists(p)) return Nil
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(p).asScala
    def paths(status: String) = lines
      .filter(l => l.contains(s""""status":"$status"""") &&
        l.contains(s""""snapshotId":$snapshotId,"""))
      .flatMap(l => """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
      .distinct
    // retention/compaction tombstones hide a batch from readers WITHOUT
    // uncommitting it (the resume diff must still see it as done —
    // expiry/rewrite ≠ missing)
    (paths("committed") diff (paths("expired") ++ paths("compacted"))).toSeq
  }

  /** Newest committed event-time high-water mark of a tier for this
    * snapshot (max over committed lines' maxTs; -1 if none carry one). The
    * streaming retention hook derives its cutoff from this instead of
    * re-aggregating the micro-batch — the manifest already carries the
    * range metrics the write job observed.
    */
  def latestCommittedMaxTs(outRoot: String, tier: String,
      snapshotId: Long): Long = {
    val p = manifestPath(outRoot, tier)
    if (!Files.exists(p)) return -1L
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala
      .filter(l => l.contains("\"status\":\"committed\"") &&
        l.contains(s""""snapshotId":$snapshotId,"""))
      .flatMap(l => """"maxTs":(-?\d+)""".r.findFirstMatchIn(l)
        .map(_.group(1).toLong))
      .foldLeft(-1L)(math.max)
  }

  /** Paths tombstoned by [[expireBatches]]/[[compactTier]], not yet
    * physically removed, AND not live under ANY other snapshot — the GC
    * contract [[patchTier]] relies on (exactly Iceberg's: a data file
    * shared by several snapshots may only be deleted once no retained
    * snapshot references it). Tombstones are per-snapshot (a retention
    * sweep of snapshot A must not take down batch dirs snapshot B adopted
    * by manifest reference), so a path is vacuumable only when EVERY
    * snapshot that committed it has also tombstoned it.
    */
  private def expiredLivePaths(outRoot: String, tier: String): Seq[String] = {
    val p = manifestPath(outRoot, tier)
    if (!Files.exists(p)) return Nil
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(p).asScala
    def snapPath(l: String): Option[(Long, String)] = for {
      s <- """"snapshotId":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
      pa <- """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
    } yield (s, pa)
    def pairs(statuses: String*) = lines
      .filter(l => statuses.exists(s => l.contains(s""""status":"$s"""")))
      .flatMap(snapPath).toSet
    val committed = pairs("committed")
    val tombstoned = pairs("expired", "compacted")
    val vacuumed = lines.filter(_.contains(""""status":"vacuumed""""))
      .flatMap(l => """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    val stillLive = (committed diff tombstoned).map(_._2)
    tombstoned.map(_._2).toSeq.distinct
      .filterNot(pa => vacuumed(pa) || stillLive(pa)).sorted
  }

  /** Logical retention sweep ≙ TimescaleDB `drop_chunks` / Iceberg
    * partition expiry, metadata-only: tombstone every committed batch of
    * `tier` whose ENTIRE time range lies before `cutoffMs` (batches
    * straddling the cutoff stay — retention is batch-aligned, so the drop
    * is always a whole-partition delete, never a rewrite; at cluster scale
    * this is an Iceberg metadata commit touching zero data files).
    *
    * `guardTier` is the coarser tier that must be FULLY committed first —
    * fine data may only expire once it has been rolled up (the same
    * stage-dependency gate the cascade uses); pass None only for terminal
    * tiers with no downstream consumer.
    *
    * Returns the newly tombstoned paths. Idempotent: already-expired
    * batches are skipped, so a crashed sweep just re-runs.
    */
  def expireBatches(outRoot: String, tier: String, snapshotId: Long,
      cutoffMs: Long, guardTier: Option[String], nBuckets: Int): Seq[String] = {
    guardTier.foreach { g =>
      val done = committedBuckets(outRoot, g, snapshotId)
      require((0 until nBuckets).forall(done.contains),
        s"retention: guard tier $g is not fully committed for snapshot " +
          s"$snapshotId (${done.size}/$nBuckets buckets) — refusing to " +
          "expire un-rolled-up data")
    }
    val p = manifestPath(outRoot, tier)
    if (!Files.exists(p)) return Nil
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(p).asScala
    // a path already tombstoned UNDER THIS SNAPSHOT — by retention OR by
    // compaction (whose replaced dirs are dead to readers and must not
    // re-enter the sweep) — is not a fresh victim. The filter is
    // per-snapshot on purpose: a dir shared across snapshots (patchTier
    // adoption) needs its own tombstone from EACH referencing snapshot
    // before the vacuum GC may touch it, mirroring committedPaths' reader
    // view.
    val already = lines.filter(l => (l.contains(""""status":"expired"""") ||
        l.contains(""""status":"compacted"""")) &&
        l.contains(s""""snapshotId":$snapshotId,"""))
      .flatMap(l => """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
      .toSet
    val victims = lines
      .filter(l => l.contains(""""status":"committed"""") &&
        l.contains(s""""snapshotId":$snapshotId,"""))
      .flatMap { l =>
        for {
          path <- """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
          maxTs <- """"maxTs":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
          if maxTs >= 0 && maxTs < cutoffMs && !already(path)
        } yield path
      }.distinct.toSeq
    appendLines(outRoot, tier, victims.map { path =>
      s"""{"jobId":"retention-$tier-$snapshotId","tier":"$tier","bucket":-1,""" +
        s""""snapshotId":$snapshotId,"path":"$path","window":"-",""" +
        s""""cutoffMs":$cutoffMs,"status":"expired"}"""
    })
    victims
  }

  /** Physical retention sweep: delete batch directories tombstoned by
    * [[expireBatches]] (two-phase, ≙ Iceberg `expire_snapshots` then
    * `remove_orphan_files`) and record the deletion. Idempotent; refuses
    * paths outside `outRoot` (a corrupted manifest must never become an
    * arbitrary recursive delete).
    */
  def vacuumTier(outRoot: String, tier: String): Seq[String] = {
    val rootAbs = Paths.get(outRoot).toAbsolutePath.normalize
    val deleted = expiredLivePaths(outRoot, tier).flatMap { path =>
      val dir = Paths.get(path).toAbsolutePath.normalize
      require(dir.startsWith(rootAbs),
        s"vacuum: $path escapes tier root $outRoot — refusing")
      if (Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        val s = Files.walk(dir)
        try s.sorted(java.util.Comparator.reverseOrder())
          .iterator.asScala.foreach(Files.delete)
        finally s.close()
        Some(path)
      } else Some(path) // dir already gone (crashed vacuum) — just record
    }
    appendLines(outRoot, tier, deleted.map { path =>
      s"""{"jobId":"vacuum-$tier","tier":"$tier","bucket":-1,"snapshotId":-1,""" +
        s""""path":"$path","window":"-","status":"vacuumed"}"""
    })
    deleted
  }

  /** Compact a tier's committed batch dirs into ONE consolidated batch ≙
    * Iceberg `rewrite_data_files` (bin-packing compaction). The small-file
    * problem is the operational failure mode of long-lived windowed ingest:
    * at 10^12 turns a per-window commit cadence leaves thousands of small
    * batch dirs per tier and tier scans become file-open bound. The rewrite
    * reads only manifest-committed live batches of the snapshot, writes one
    * new batch dir, and swaps the manifest in a SINGLE append — replayed
    * `committed` lines (one per source (bucket, window), now pointing at
    * the consolidated path) plus one `compacted` tombstone per source path,
    * the miniature of Iceberg's atomic manifest-list pointer swap: readers
    * see the old set or the new set, never both, and the resume diff keeps
    * seeing every (bucket, window) as done. [[vacuumTier]] physically
    * removes the replaced dirs exactly like retention tombstones.
    *
    * The consolidated lines carry the batch's GLOBAL [minTs,maxTs], so
    * retention keeps its whole-batch-only delete invariant: a compacted
    * batch expires only when ALL of it is past the cutoff (compaction
    * deliberately coarsens retention granularity — compact tiers whose
    * retention horizon is far away, the same guidance Iceberg gives).
    *
    * Idempotent/crash-safe: the consolidated dir name is deterministic; a
    * crash before the manifest append leaves it invisible and the re-run
    * overwrites it; a re-run after the append sees it live and no-ops.
    * Returns the consolidated path, or None when ≤1 live batch (nothing to
    * merge).
    */
  def compactTier(spark: SparkSession, outRoot: String, tier: String,
      snapshotId: Long): Option[String] =
    compactTier(spark, outRoot, tier, snapshotId, () => ())

  /** Test seam: `midSwap` runs after the consolidated dir is written but
    * BEFORE the single manifest append (the swap point) — the window in
    * which a concurrent ingest can commit a new batch. The swap replays
    * only the (bucket, window) lines captured at planning time and
    * tombstones only the planned source paths, so a batch committed inside
    * the window stays live and un-tombstoned (RetentionSpec proves it).
    */
  private[graft] def compactTier(spark: SparkSession, outRoot: String,
      tier: String, snapshotId: Long, midSwap: () => Unit): Option[String] = {
    val live = committedPaths(outRoot, tier, snapshotId)
    if (live.size <= 1) return None // nothing to merge (incl. fresh post-compact)
    // GENERATIONAL target name: batches committed after a compaction (a
    // live stream keeps appending) must be compactable again, so each pass
    // gets the next generation number derived from the manifest — a crash
    // before the manifest append recomputes the same name and overwrites
    // (idempotent); after the append the merged result is the single live
    // path and the next call no-ops until new batches arrive.
    val genRe = (java.util.regex.Pattern.quote(s"$outRoot/$tier/compact_${snapshotId}_g") + "(\\d+)").r
    val gen = {
      import scala.jdk.CollectionConverters._
      val p = manifestPath(outRoot, tier)
      val prior = if (!Files.exists(p)) Nil
        else Files.readAllLines(p).asScala
          .flatMap(l => """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1)))
          .flatMap { case genRe(g) => Some(g.toInt); case _ => None }
      if (prior.isEmpty) 1 else prior.max + 1
    }
    val target = s"$outRoot/$tier/compact_${snapshotId}_g$gen"
    val t0 = System.nanoTime()
    // the (bucket, window) commits being replayed onto the consolidated path
    import scala.jdk.CollectionConverters._
    val srcLines = Files.readAllLines(manifestPath(outRoot, tier)).asScala
      .filter(l => l.contains(""""status":"committed"""") &&
        l.contains(s""""snapshotId":$snapshotId,"""))
    val liveSet = live.toSet
    val commits = srcLines.flatMap { l =>
      for {
        path <- """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
        if liveSet(path)
        bucket <- """"bucket":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toInt)
        window <- """"window":"([^"]*)"""".r.findFirstMatchIn(l).map(_.group(1))
      } yield (bucket, window)
    }.distinct
    // EXACT (path, bucket) read, not a raw union of the live dirs: a dir
    // adopted by patchTier/eraseConvs may physically carry superseded rows
    // for buckets this snapshot committed elsewhere — an unfiltered union
    // would both double-count those buckets and keep erased bytes alive.
    // The bucket-filtered rewrite is what makes compaction the PHYSICAL
    // completer of an erasure (Iceberg's rewrite_data_files role).
    val pb = committedPathBuckets(outRoot, tier, snapshotId)
    val src = live.map { pa =>
      val df = spark.read.parquet(pa)
      pb.get(pa) match {
        case Some(bs) if df.columns.contains("bucket") =>
          df.filter(col("bucket").isin(bs.toSeq: _*))
        case _ => df
      }
    }.reduce(_ unionByName _)
    val timeCol = Seq("bucket_ts", "start_ts").find(src.columns.contains)
    val (mntAgg, mxtAgg) = timeCol match {
      case Some(tc) => (min(unix_millis(col(tc))), max(unix_millis(col(tc))))
      case None     => (min(lit(-1L)), max(lit(-1L)))
    }
    val obs = org.apache.spark.sql.Observation(s"compact-$tier")
    src.observe(obs, count(lit(1)).as("out"), mntAgg.as("mnt"), mxtAgg.as("mxt"))
      .write.mode(SaveMode.Overwrite).parquet(target)
    val rows = obs.get("out").asInstanceOf[Long]
    def ts(k: String): Long =
      Option(obs.get(k)).map(_.asInstanceOf[Long]).getOrElse(-1L)
    val wallMs = (System.nanoTime() - t0) / 1000000
    // ONE append = the atomic swap: replayed commits + source tombstones
    val newLines = commits.map { case (b, w) =>
      s"""{"jobId":"compact-$tier-$snapshotId","tier":"$tier","bucket":$b,""" +
        s""""snapshotId":$snapshotId,"path":"$target","window":"$w",""" +
        s""""minTs":${ts("mnt")},"maxTs":${ts("mxt")},""" +
        s""""rowsIn":$rows,"rowsOut":$rows,"wallMs":$wallMs,"status":"committed"}"""
    } ++ live.map { path =>
      s"""{"jobId":"compact-$tier-$snapshotId","tier":"$tier","bucket":-1,""" +
        s""""snapshotId":$snapshotId,"path":"$path","window":"-",""" +
        s""""status":"compacted"}"""
    }
    midSwap()
    appendLines(outRoot, tier, newLines.toSeq)
    Some(target)
  }

  /** The tier's file_info relation ≙ the reference's per-cube `file_info`
    * tibble (api_file_info.R:67-85 — the queryable table of data files):
    * one row per committed manifest entry for the snapshot, with lineage
    * stats (bucket, path, rows in/out, wall ms). Reads the jsonl manifest
    * directly — the manifest IS the catalog.
    */
  def fileInfo(spark: SparkSession, outRoot: String, tier: String,
      snapshotId: Long): DataFrame = {
    val p = manifestPath(outRoot, tier)
    require(Files.exists(p), s"tier $tier has no manifest at $p")
    val all = spark.read.json(p.toString)
    // the catalog lists LIVE files: committed minus retention/compaction
    // tombstones
    val hidden = all.filter(col("status").isin("expired", "compacted")).select("path")
    all.filter(col("status") === "committed" && col("snapshotId") === snapshotId)
      .join(hidden, Seq("path"), "left_anti")
  }

  /** Read a tier as of a snapshot: only manifest-committed batches. */
  def readTier(spark: SparkSession, outRoot: String, tier: String,
      snapshotId: Long): DataFrame = {
    val paths = committedPaths(outRoot, tier, snapshotId)
    require(paths.nonEmpty, s"tier $tier has no committed batches for snapshot $snapshotId")
    spark.read.parquet(paths: _*)
  }

  /** Live (path → committed buckets) map of a snapshot — the row-level
    * table of contents [[readTierExact]] and bucket adoption work from.
    */
  def committedPathBuckets(outRoot: String, tier: String,
      snapshotId: Long): Map[String, Set[Int]] = {
    val p = manifestPath(outRoot, tier)
    if (!Files.exists(p)) return Map.empty
    import scala.jdk.CollectionConverters._
    val lines = Files.readAllLines(p).asScala
    val live = committedPaths(outRoot, tier, snapshotId).toSet
    lines
      .filter(l => l.contains("\"status\":\"committed\"") &&
        l.contains(s""""snapshotId":$snapshotId,"""))
      .flatMap { l =>
        for {
          pa <- """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
          if live(pa)
          b <- """"bucket":(\d+)""".r.findFirstMatchIn(l).map(_.group(1).toInt)
        } yield (pa, b)
      }
      .groupBy(_._1).map { case (pa, bs) => pa -> bs.map(_._2).toSet }
  }

  /** [[readTier]] with EXACT (path, bucket) semantics: each batch dir
    * contributes only the buckets the manifest commits it for under this
    * snapshot. For batches written by [[runTier]] this is identical to
    * [[readTier]] (a batch dir contains exactly its committed bucket set);
    * it differs only for batches ADOPTED from an earlier snapshot by
    * [[patchTier]], where a dir may carry stale rows for re-written
    * buckets that this snapshot committed elsewhere. The bucket predicate
    * is a plain int filter — parquet row-group stats prune it, no shuffle.
    */
  def readTierExact(spark: SparkSession, outRoot: String, tier: String,
      snapshotId: Long): DataFrame = {
    val pb = committedPathBuckets(outRoot, tier, snapshotId)
    require(pb.nonEmpty, s"tier $tier has no committed batches for snapshot $snapshotId")
    pb.toSeq.sortBy(_._1).map { case (pa, bs) =>
      spark.read.parquet(pa).filter(col("bucket").isin(bs.toSeq: _*))
    }.reduce(_ unionByName _)
  }

  /** Late-data invalidation patch — the continuous-aggregate hard case
    * the realtime router's watermark rule cannot cover (rows arriving
    * BEHIND the seal). Instead of recomputing the tier, commit a NEW
    * snapshot that (a) ADOPTS every clean bucket's existing batch dirs by
    * manifest reference — zero data movement, exactly Iceberg's
    * snapshot-to-snapshot file reuse — and (b) rewrites only the dirty
    * buckets from `freshState` via the ordinary [[runTier]] commit. At
    * 10^12-turn scale a late trickle touching 0.1% of conversations
    * re-aggregates 0.1% of the store; the other 99.9% is a metadata
    * append. Readers of the new snapshot must use [[readTierExact]]
    * (adopted dirs may carry superseded rows for the rewritten buckets);
    * the OLD snapshot remains fully readable — time travel is free.
    *
    * GC contract (the standard Iceberg caveat): adopted paths are shared
    * between snapshots, and [[vacuumTier]] ENFORCES it — a tombstoned path
    * stays on disk while any snapshot still holds a live committed line
    * for it (see [[expiredLivePaths]]); it is physically removed only once
    * every referencing snapshot has expired it.
    */
  def patchTier(spark: SparkSession, outRoot: String, tier: String,
      snapOld: Long, snapNew: Long, nBuckets: Int,
      dirtyBuckets: Set[Int], freshState: DataFrame): TierRun = {
    require(snapNew != snapOld, "patch needs a distinct new snapshot id")
    val oldDone = committedBuckets(outRoot, tier, snapOld)
    require((0 until nBuckets).forall(oldDone.contains),
      s"patchTier: old snapshot $snapOld is not fully committed")
    // adopt clean buckets: one manifest line per (old path, kept bucket),
    // carrying the source lines' [minTs,maxTs] forward so retention under
    // the NEW snapshot keeps its whole-batch expiry power over adopted dirs
    val already = committedBuckets(outRoot, tier, snapNew)
    val ranges: Map[String, (Long, Long)] = {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(manifestPath(outRoot, tier)).asScala
        .filter(l => l.contains("\"status\":\"committed\"") &&
          l.contains(s""""snapshotId":$snapOld,"""))
        .flatMap { l =>
          for {
            pa <- """"path":"([^"]+)"""".r.findFirstMatchIn(l).map(_.group(1))
            mn <- """"minTs":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
            mx <- """"maxTs":(-?\d+)""".r.findFirstMatchIn(l).map(_.group(1).toLong)
          } yield (pa, (mn, mx))
        }
        .groupBy(_._1)
        .map { case (pa, xs) =>
          val mns = xs.map(_._2._1).filter(_ >= 0)
          val mxs = xs.map(_._2._2).filter(_ >= 0)
          pa -> (if (mns.isEmpty) -1L else mns.min,
            if (mxs.isEmpty) -1L else mxs.max)
        }
    }
    committedPathBuckets(outRoot, tier, snapOld).toSeq.sortBy(_._1)
      .foreach { case (pa, bs) =>
        val kept = (bs -- dirtyBuckets -- already).toSeq.sorted
        val (mn, mx) = ranges.getOrElse(pa, (-1L, -1L))
        if (kept.nonEmpty)
          appendManifests(outRoot, tier, s"adopt-$tier-$snapNew", snapNew,
            kept, pa, rowsIn = -1L, rowsOut = -1L, wallMs = 0L,
            minTs = mn, maxTs = mx)
      }
    // rewrite the dirty buckets only (runTier's resume diff now sees every
    // clean bucket as committed and filters freshState to the dirty set)
    runTier(spark, outRoot, tier, snapNew, nBuckets, freshState)
  }

  /** Conversation erasure (right-to-be-forgotten) propagated through a
    * tier with [[patchTier]]'s minimal-rewrite semantics: only the buckets
    * that HOLD an erased conversation are re-aggregated (from `stateAll`
    * with the victims filtered out — erasure is by construction, the
    * deleted ids never reach the write path); every clean bucket is
    * adopted into the new snapshot by manifest reference. At 10^12 turns
    * an erasure request touching k conversations rewrites ≤k of the
    * nBuckets hash buckets — a metadata commit plus a sliver re-aggregate,
    * never a store rebuild. `stateAll` is the SAME state relation the tier
    * was originally built from (it may still contain the victims).
    *
    * Logical erasure is immediate (readers of `snapNew` see no victim
    * rows); PHYSICAL erasure completes when [[retireSuperseded]] +
    * [[vacuumTier]] remove the replaced dirty-bucket dirs — the same
    * two-phase contract GDPR deletes have on Iceberg (rewrite data files,
    * then expire the old snapshot and remove orphans).
    */
  def eraseConvs(spark: SparkSession, outRoot: String, tier: String,
      snapOld: Long, snapNew: Long, nBuckets: Int,
      convIds: Seq[String], stateAll: DataFrame): TierRun = {
    require(convIds.nonEmpty, "eraseConvs: empty victim list")
    import spark.implicits._
    // victim buckets via the SAME hash expression the pipeline buckets
    // with — never re-derived arithmetic that could drift from bucketCol
    val dirty = convIds.toDF("conv_id")
      .select(bucketCol(nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val fresh = stateAll.filter(!col("conv_id").isin(convIds: _*))
    patchTier(spark, outRoot, tier, snapOld, snapNew, nBuckets, dirty, fresh)
  }

  /** Tombstone (under `snapOld`) every batch dir committed for `snapOld`
    * that `snapNew` did NOT adopt — the targeted, path-based retirement
    * that completes an erasure/patch: adopted dirs stay live (the new
    * snapshot references them), only the superseded dirty-bucket dirs
    * become vacuumable. Unlike [[expireBatches]] this is snapshot-diff
    * driven, not time-cutoff driven, so it works mid-retention-horizon.
    * Time travel to `snapOld` ends for the retired dirs once
    * [[vacuumTier]] runs — that is the point (the victims' bytes go away).
    */
  def retireSuperseded(outRoot: String, tier: String, snapOld: Long,
      snapNew: Long): Seq[String] = {
    val oldPaths = committedPaths(outRoot, tier, snapOld)
    val keep = committedPaths(outRoot, tier, snapNew).toSet
    val victims = oldPaths.filterNot(keep).sorted
    appendLines(outRoot, tier, victims.map { path =>
      s"""{"jobId":"retire-$tier-$snapOld-$snapNew","tier":"$tier","bucket":-1,""" +
        s""""snapshotId":$snapOld,"path":"$path","window":"-",""" +
        s""""supersededBy":$snapNew,"status":"expired"}"""
    })
    victims
  }

  private val cascadeTiers: Seq[(String, Tier)] = Seq(
    "1m-chunks" -> Tier.M1, "1h-state" -> Tier.H1,
    "1d-state" -> Tier.D1, "1mo-state" -> Tier.Mo1)

  private def ghBucketCol(nBuckets: Int) =
    pmod(hash(col("bucket_ts")), lit(nBuckets))

  /** Conversation erasure propagated through EVERY tier of a committed
    * [[runAll]] cascade — without a single raw scan. Per-conv tiers
    * (1m-chunks, 1h/1d/1mo state) are separable by conversation, so the
    * erased bucket's fresh content is the stored bucket with the victims'
    * rows filtered out: the rewrite reads ≤|dirty buckets| of each tier's
    * own (ratio-smaller) store, never the 10^12-turn raw table. The global
    * gh-state tier DOES merge victims into shared hour rows, so the hours
    * the victims participated in (taken from the OLD 1h state — that set
    * also covers hours that exist only because of a victim and must
    * disappear) are re-merged from the already-erased 1h state. Everything
    * clean is adopted by manifest reference ([[patchTier]] semantics);
    * physical erasure then follows the standard two-phase close:
    * [[compactTier]] under `snapNew` (its (path,bucket)-exact read drops
    * dead adopted rows), [[retireSuperseded]], [[vacuumTier]].
    */
  def eraseCascade(spark: SparkSession, outRoot: String, nBuckets: Int,
      snapOld: Long, snapNew: Long, convIds: Seq[String],
      extraPerConvTiers: Seq[String] = Nil): Seq[TierRun] = {
    require(convIds.nonEmpty, "eraseCascade: empty victim list")
    import spark.implicits._
    val dirty = convIds.toDF("conv_id")
      .select(bucketCol(nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val victim = col("conv_id").isin(convIds: _*)
    // any conv-hash-bucketed tier erases by the same filter-and-patch
    // shape — the m4-1h downsample tier rides along via extraPerConvTiers
    val perConv =
      (cascadeTiers.map(_._1) ++ extraPerConvTiers).map { tier =>
        val fresh = readTierExact(spark, outRoot, tier, snapOld)
          .filter(col("bucket").isin(dirty.toSeq: _*) && !victim)
        patchTier(spark, outRoot, tier, snapOld, snapNew, nBuckets, dirty,
          fresh)
      }
    val ghB = ghBucketCol(nBuckets)
    val dirtyGh = readTierExact(spark, outRoot, "1h-state", snapOld)
      .filter(victim).select(ghB.as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    perConv :+ ghPatch(spark, outRoot, nBuckets, snapOld, snapNew, dirtyGh)
  }

  /** Late-data invalidation through the WHOLE cascade — the multi-tier
    * composition of [[patchTier]]: rows arriving behind the seal for
    * `convIds` re-aggregate only the conv-hash buckets those conversations
    * live in, at every tier. The raw scan is predicate-pruned to the dirty
    * buckets (`transcripts` is the NEW full input; at cluster scale the
    * raw table is bucketed by the same conv hash, so this prunes to
    * |dirty|/nBuckets of the files); 1d/1mo re-cascade from the freshly
    * committed 1h/1d state of `snapNew` restricted to the same buckets;
    * the global tier re-merges exactly the hour buckets whose content
    * changed (hours of the dirty conv buckets under EITHER snapshot).
    * Equality with a from-scratch [[runAll]] over the new input is the
    * test contract (Round5uSpec).
    */
  def patchCascade(spark: SparkSession, transcripts: DataFrame,
      inputPath: String, outRoot: String, nBuckets: Int, snapOld: Long,
      convIds: Seq[String],
      metrics: Seq[String] = Seq("text_len")): Seq[TierRun] = {
    require(convIds.nonEmpty, "patchCascade: empty late-conversation list")
    require(metrics.nonEmpty, "no metrics")
    import spark.implicits._
    val single = metrics.size == 1
    val snapNew = snapshotId(inputPath)
    require(snapNew != snapOld,
      "patchCascade: input snapshot unchanged — nothing arrived late")
    val dirty = convIds.toDF("conv_id")
      .select(bucketCol(nBuckets).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val inDirty = col("bucket").isin(dirty.toSeq: _*)
    val b = bucketCol(nBuckets)

    // fresh raw-derived state for the dirty buckets only: the bucket is a
    // pure function of conv_id, so filtering the raw scan by it yields
    // exactly the conversations whose buckets get rewritten (every conv in
    // a dirty bucket, not just the late ones — runTier commits whole
    // buckets). Same one-scan-serves-all-bands shape as runAll.
    val sub = transcripts.filter(b.isin(dirty.toSeq: _*))
    val fv = (if (single) Regularize.firstValid(sub, Tier.M1, metrics.head)
              else Regularize.firstValidAll(sub, Tier.M1, metrics))
      .persist()
    fv.count()
    val chunksDf =
      if (single) ChunkStore.encodeFilled(spark, fv, Tier.M1).toDF()
      else metrics.map { m =>
        ChunkStore.encodeFilled(spark,
          fv.select(col("conv_id"), col("bucket_ts"), col(m).as("value")),
          Tier.M1).toDF().withColumn("metric", lit(m))
      }.reduce(_ unionByName _)
    val r1 = patchTier(spark, outRoot, "1m-chunks", snapOld, snapNew,
      nBuckets, dirty, chunksDf.withColumn("bucket", b))
    val st1h0 =
      if (single) SeriesRollup.stateDenseHist(spark, fv, Tier.M1, Tier.H1)
      else SeriesRollup.stateDenseHistMulti(spark, fv, Tier.M1, Tier.H1,
        metrics)
    val r2 = patchTier(spark, outRoot, "1h-state", snapOld, snapNew,
      nBuckets, dirty, st1h0.withColumn("bucket", b))
    fv.unpersist()

    // upper tiers re-cascade from the committed lower tier of snapNew,
    // restricted to the dirty buckets (bucket is conv-keyed at all three)
    val r3 = patchTier(spark, outRoot, "1d-state", snapOld, snapNew,
      nBuckets, dirty,
      Rollup.cascadeHist(
        readTierExact(spark, outRoot, "1h-state", snapNew).filter(inDirty)
          .drop("bucket"), Tier.D1)
        .withColumn("bucket", b))
    val r4 = patchTier(spark, outRoot, "1mo-state", snapOld, snapNew,
      nBuckets, dirty,
      Rollup.cascadeHist(
        readTierExact(spark, outRoot, "1d-state", snapNew).filter(inDirty)
          .drop("bucket"), Tier.Mo1)
        .withColumn("bucket", b))

    val ghB = ghBucketCol(nBuckets)
    val dirtyGh = (readTierExact(spark, outRoot, "1h-state", snapOld)
        .filter(inDirty).select(ghB.as("b")) unionByName
      readTierExact(spark, outRoot, "1h-state", snapNew)
        .filter(inDirty).select(ghB.as("b")))
      .distinct().collect().map(_.getInt(0)).toSet
    Seq(r1, r2, r3, r4,
      ghPatch(spark, outRoot, nBuckets, snapOld, snapNew, dirtyGh))
  }

  /** Re-merge the global gh-state tier for `dirtyGh` time-hash buckets
    * from the committed (new-snapshot) 1h state, adopting every clean
    * bucket. The fresh merge filters 1h rows by the same time-hash
    * expression the tier is bucketed on — a whole-bucket rewrite needs
    * every hour landing in the bucket, for all conversations.
    */
  private def ghPatch(spark: SparkSession, outRoot: String, nBuckets: Int,
      snapOld: Long, snapNew: Long, dirtyGh: Set[Int]): TierRun = {
    val ghB = ghBucketCol(nBuckets)
    val fresh =
      if (dirtyGh.isEmpty)
        spark.emptyDataFrame.withColumn("bucket", lit(0))
      else Rollup.cascadeHist(
          readTierExact(spark, outRoot, "1h-state", snapNew)
            .filter(ghB.isin(dirtyGh.toSeq: _*))
            .drop("bucket").drop("conv_id"), Tier.H1)
        .withColumn("bucket", ghB)
    patchTier(spark, outRoot, "gh-state", snapOld, snapNew, nBuckets,
      dirtyGh, fresh)
  }

  /** Materialize a committed tier into a new root ≙ `sits_cube_copy`
    * (sits_cube_copy.R:89: copy a cube's assets to a local dir and return a
    * re-rooted cube) / CTAS: reads ONLY manifest-committed batches of the
    * snapshot, writes them as one batch under the destination, and commits
    * a manifest there — so the copy is itself resumable/readable through
    * the same catalog contract.
    */
  def copyTier(spark: SparkSession, srcRoot: String, tier: String,
      snapshotId: Long, dstRoot: String, nBuckets: Int): TierRun = {
    // a partially-committed source would let the copy claim buckets it
    // never saw rows for — refuse, like the cascade's full-lower-tier gate
    val srcDone = committedBuckets(srcRoot, tier, snapshotId)
    require((0 until nBuckets).forall(srcDone.contains),
      s"copyTier: source tier $tier is not fully committed for snapshot " +
        s"$snapshotId (${srcDone.size}/$nBuckets buckets)")
    val done = committedBuckets(dstRoot, tier, snapshotId)
    val wanted = (0 until nBuckets).filterNot(done.contains)
    if (wanted.isEmpty) return TierRun(tier, Nil, done.toSeq.sorted, 0, 0)
    val t0 = System.nanoTime()
    val src = readTier(spark, srcRoot, tier, snapshotId)
    val batchDir = s"$dstRoot/$tier/copy_${snapshotId}_${wanted.min}_${wanted.size}"
    val obs = org.apache.spark.sql.Observation(s"copy-$tier")
    src.filter(col("bucket").isin(wanted: _*))
      .observe(obs, count(lit(1)).as("out"))
      .write.mode(SaveMode.Overwrite).parquet(batchDir)
    val rows = obs.get("out").asInstanceOf[Long]
    appendManifests(dstRoot, tier, s"copy-$tier-$snapshotId", snapshotId,
      wanted, batchDir, rowsIn = rows, rowsOut = rows,
      wallMs = (System.nanoTime() - t0) / 1000000)
    TierRun(tier, wanted, done.toSeq.sorted, rows, rows)
  }

  /** Merge a committed tier's batch dirs into ONE final sorted artifact ≙
    * `sits_mosaic` (/root/reference/R/sits_mosaic.R:85: gdalwarp the
    * per-tile classified rasters into a single mosaic file). The verb's
    * contract IS a single artifact, so the terminal coalesce(1) is the
    * point, not an accident: the heavy work (scan + global range sort)
    * stays distributed, and only the final merge-write is one task —
    * orderBy's range partitions are concatenated in partition-index order,
    * which preserves the global sort. Refuses partially-committed sources
    * (same gate as [[copyTier]]) and commits the mosaic through its own
    * manifest, so a resumed run's mosaic is byte-identical to an
    * uninterrupted one (ResumeSpec).
    */
  def mosaicTier(spark: SparkSession, srcRoot: String, tier: String,
      snapshotId: Long, dstRoot: String, nBuckets: Int): String = {
    val srcDone = committedBuckets(srcRoot, tier, snapshotId)
    require((0 until nBuckets).forall(srcDone.contains),
      s"mosaicTier: source tier $tier is not fully committed for snapshot " +
        s"$snapshotId (${srcDone.size}/$nBuckets buckets)")
    val mosaicDir = s"$dstRoot/$tier/mosaic_$snapshotId"
    val already = committedPaths(dstRoot, s"$tier-mosaic", snapshotId)
    if (already.nonEmpty) return already.head // idempotent re-run
    val t0 = System.nanoTime()
    val src = readTier(spark, srcRoot, tier, snapshotId).drop("bucket")
    val timeCol = Seq("bucket_ts", "start_ts").find(src.columns.contains)
    val keys = col("conv_id") +: timeCol.map(col).toSeq
    val obs = org.apache.spark.sql.Observation(s"mosaic-$tier")
    src.orderBy(keys: _*).coalesce(1)
      .observe(obs, count(lit(1)).as("out"))
      .write.mode(SaveMode.Overwrite).parquet(mosaicDir)
    val rows = obs.get("out").asInstanceOf[Long]
    appendManifests(dstRoot, s"$tier-mosaic", s"mosaic-$tier-$snapshotId",
      snapshotId, Seq(0), mosaicDir, rowsIn = rows, rowsOut = rows,
      wallMs = (System.nanoTime() - t0) / 1000000)
    mosaicDir
  }

  /** Deterministic input-snapshot identity (Iceberg snapshot-id stand-in):
    * sum of (size, mtime) over the input files.
    */
  def snapshotId(inputPath: String): Long = {
    val root = Paths.get(inputPath)
    if (!Files.exists(root)) return 0L
    val s = Files.walk(root)
    try {
      s.filter(p => Files.isRegularFile(p)).mapToLong(p =>
        Files.size(p) + Files.getLastModifiedTime(p).toMillis).sum()
    } finally s.close()
  }

  /** Run one tier: compute `df` (which must carry a `bucket` column)
    * restricted to non-committed buckets, commit those partitions, append
    * manifests. Returns what ran vs was skipped.
    */
  def runTier(spark: SparkSession, outRoot: String, tier: String,
      snapshot: Long, nBuckets: Int, df: DataFrame,
      limitBuckets: Option[Int] = None,
      window: Option[String] = None): TierRun = {
    window.foreach(w => require(w.matches("[A-Za-z0-9_-]+"),
      s"runTier: window tag '$w' must be [A-Za-z0-9_-]+ (it names a dir " +
        "and a manifest field)"))
    val done = committedBuckets(outRoot, tier, snapshot, window)
    val wanted = (0 until nBuckets).filterNot(done.contains)
    val todo = limitBuckets.map(wanted.take).getOrElse(wanted)
    if (todo.isEmpty) return TierRun(tier, Nil, done.toSeq.sorted, 0, 0)
    val t0 = System.nanoTime()
    // one BATCH DIRECTORY per (snapshot, window, bucket-set) commit, plain
    // parquet with `bucket` as an ordinary column. NOT partitionBy(bucket):
    // Spark's dynamic-partitioned write sorts every task's rows by partition
    // key and opens tasks×buckets tiny files — measured 2.5× the plain write
    // and it got WORSE with more cores. The deterministic dir name makes
    // retries idempotent (a re-run of the same bucket set overwrites the
    // same dir); readers only see batches listed in the manifest.
    val wTag = window.map(w => s"w${w}_").getOrElse("")
    val batchDir = s"$outRoot/$tier/b_${snapshot}_$wTag${todo.min}_${todo.size}"
    // row + time-range metrics ride ON the write job (Observation API — no
    // second scan); the batch's [minTs,maxTs] feeds the retention sweep
    val obs = org.apache.spark.sql.Observation(s"tier-$tier")
    val hasN = df.columns.contains("n")
    val timeCol = Seq("bucket_ts", "start_ts").find(df.columns.contains)
    val (mntAgg, mxtAgg) = timeCol match {
      case Some(tc) => (min(unix_millis(col(tc))), max(unix_millis(col(tc))))
      case None     => (min(lit(-1L)), max(lit(-1L)))
    }
    val part = df.filter(col("bucket").isin(todo: _*))
      .observe(obs, count(lit(1)).as("out"),
        (if (hasN) sum(col("n")) else max(lit(-1L))).as("in"),
        mntAgg.as("mnt"), mxtAgg.as("mxt"))
    part.write.mode(SaveMode.Overwrite).parquet(batchDir)
    val rowsOut = obs.get("out").asInstanceOf[Long]
    // empty bucket-set write → null aggregates (min/max/sum over 0 rows)
    def ts(k: String): Long =
      Option(obs.get(k)).map(_.asInstanceOf[Long]).getOrElse(-1L)
    val rowsIn = ts("in")
    val wallMs = (System.nanoTime() - t0) / 1000000
    appendManifests(outRoot, tier, s"job-$tier-$snapshot", snapshot, todo,
      batchDir, rowsIn = rowsIn, rowsOut = rowsOut, wallMs = wallMs,
      window = window, minTs = ts("mnt"), maxTs = ts("mxt"))
    TierRun(tier, todo, done.toSeq.sorted, rowsIn, rowsOut)
  }

  /** Full cascade raw→1m(fill+chunks)→1h(state)→1d(state), resumable at
    * bucket granularity per tier. `limitBuckets` caps how many missing
    * buckets each tier processes this run (used to exercise resume).
    */
  def runAll(spark: SparkSession, transcripts: DataFrame, inputPath: String,
      outRoot: String, nBuckets: Int = 8,
      limitBuckets: Option[Int] = None,
      metrics: Seq[String] = Seq("text_len"),
      asBands: Boolean = false): Seq[TierRun] = {
    require(metrics.nonEmpty, "no metrics")
    // asBands forces the banded schema (metric dimension column) even for
    // a one-band run — the store shape [[addMetricBand]] can extend later
    val single = metrics.size == 1 && !asBands
    val snap = snapshotId(inputPath)
    val b = bucketCol(nBuckets)

    // firstValid feeds BOTH the 1m-chunk and 1h-state tiers → persist once
    // (observed-bucket cardinality, bounded; ≙ materializing the regular
    // cube the reference writes to disk between stages). Multi-band runs
    // aggregate EVERY metric in this one raw scan+shuffle
    // (firstValidAll ≙ the reference's one-read-serves-all-bands job,
    // api_gdalcubes.R:506-513) — the raw-data pass is paid once, not
    // once per band; everything downstream reads the ratio-smaller fv.
    val fv = (if (single) Regularize.firstValid(transcripts, Tier.M1, metrics.head)
              else Regularize.firstValidAll(transcripts, Tier.M1, metrics))
      .persist()
    fv.count() // materialize before forking the two independent tier jobs

    // tiers 1m and 1h are independent given fv → submit CONCURRENTLY; the
    // scheduler interleaves their tasks, filling each other's stage-tail
    // idle slots (straggling hot-conv kernels no longer idle the cluster)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future {
      val chunksDf =
        if (single) ChunkStore.encodeFilled(spark, fv, Tier.M1).toDF()
        else metrics.map { m =>
          ChunkStore.encodeFilled(spark,
            fv.select(col("conv_id"), col("bucket_ts"), col(m).as("value")),
            Tier.M1).toDF().withColumn("metric", lit(m))
        }.reduce(_ unionByName _)
      val chunks = chunksDf.withColumn("bucket", bucketCol(nBuckets))
      runTier(spark, outRoot, "1m-chunks", snap, nBuckets, chunks, limitBuckets)
    }
    val f2 = Future {
      // quantile-bearing state: the ≤64-cell log2 histogram rides in the
      // same kernel pass, so p50/p90/p99 stay answerable at 1h/1d/1mo
      // after raw and 1m-chunks are expired (SURVEY §7.4); multi-band
      // state carries a `metric` dimension column that cascadeHist and
      // histQuantiles auto-include in their keys
      val st1h0 =
        if (single) SeriesRollup.stateDenseHist(spark, fv, Tier.M1, Tier.H1)
        else SeriesRollup.stateDenseHistMulti(spark, fv, Tier.M1, Tier.H1,
          metrics)
      val st1h = st1h0.withColumn("bucket", b)
      runTier(spark, outRoot, "1h-state", snap, nBuckets, st1h, limitBuckets)
    }
    val r1 = Await.result(f1, Duration.Inf)
    val r2 = Await.result(f2, Duration.Inf)
    fv.unpersist()

    // tier 1d: cascaded from committed 1h partitions (never from raw) —
    // gated on 1h being FULLY committed, else a 1d bucket would aggregate an
    // incomplete lower tier and be wrongly marked done (stage dependency,
    // as the reference's per-stage job diff enforces)
    val r3 =
      if (committedBuckets(outRoot, "1h-state", snap).size < nBuckets)
        TierRun("1d-state", Nil, Nil, 0, 0)
      else {
        val st1hStored = readTier(spark, outRoot, "1h-state", snap)
        val st1d = Rollup.cascadeHist(st1hStored.drop("bucket"), Tier.D1)
          .withColumn("bucket", b)
        runTier(spark, outRoot, "1d-state", snap, nBuckets, st1d, limitBuckets)
      }

    // tier 1mo (calendar month ≙ the reference's P1M period): cascaded from
    // committed 1d state under the same full-lower-tier gate
    val r4 =
      if (committedBuckets(outRoot, "1d-state", snap).size < nBuckets)
        TierRun("1mo-state", Nil, Nil, 0, 0)
      else {
        val st1dStored = readTier(spark, outRoot, "1d-state", snap)
        val stMo = Rollup.cascadeHist(st1dStored.drop("bucket"), Tier.Mo1)
          .withColumn("bucket", b)
        runTier(spark, outRoot, "1mo-state", snap, nBuckets, stMo, limitBuckets)
      }

    // GLOBAL hourly tier (the corpus dashboard): derived from the
    // COMMITTED per-conv 1h state by merging the conversation dimension
    // away — cascadeHist with the conv key dropped and the SAME tier as
    // target (hour-truncating hour buckets is the identity, so only the
    // conv merge happens). Never a raw pass; partitioned/resumed by
    // TIME-hash buckets (a global row has no conv to bucket on), same
    // manifest machinery as every other tier.
    val r5 =
      if (committedBuckets(outRoot, "1h-state", snap).size < nBuckets)
        TierRun("gh-state", Nil, Nil, 0, 0)
      else {
        val st1hStored = readTier(spark, outRoot, "1h-state", snap)
        val gh = Rollup.cascadeHist(
            st1hStored.drop("bucket").drop("conv_id"), Tier.H1)
          .withColumn("bucket", pmod(hash(col("bucket_ts")), lit(nBuckets)))
        runTier(spark, outRoot, "gh-state", snap, nBuckets, gh, limitBuckets)
      }

    Seq(r1, r2, r3, r4, r5)
  }

  /** Committed DOWNSAMPLE tier — the render store of the north rule's
    * "rollup + downsample + retention" triad, materialized with the same
    * manifest/resume machinery as the aggregate tiers. Per (conv, hour)
    * the M4 quad (min/max/first/last + count, Jugel et al. VLDB'14 — the
    * four points a pixel column of any line chart needs for error-free
    * rendering) is computed FROM THE COMMITTED 1m-chunk store, never from
    * raw: a dashboard backfill decodes the ratio-smaller chunk tier, and
    * the downsample survives raw-input expiry by construction. Multi-band
    * chunk stores carry a `metric` column; each band decodes through the
    * same typed codec path and keeps its `metric` key in the output.
    * Resumable at bucket granularity (`limitBuckets`), conv-hash
    * bucketed — so [[eraseConvs]] applies to it directly, and
    * [[eraseCascade]] covers it via `extraPerConvTiers`.
    */
  def downsampleTier(spark: SparkSession, outRoot: String, snap: Long,
      nBuckets: Int, limitBuckets: Option[Int] = None,
      metrics: Seq[String] = Seq("text_len")): TierRun = {
    require(metrics.nonEmpty, "no metrics")
    import spark.implicits._
    if (committedBuckets(outRoot, "1m-chunks", snap).size < nBuckets)
      return TierRun("m4-1h", Nil, Nil, 0, 0)
    val stored = readTier(spark, outRoot, "1m-chunks", snap)
    val single = !stored.columns.contains("metric")
    if (!single) require(metrics.nonEmpty, "no metrics")
    val chunkCols = Seq("conv_id", "tier", "start_ts", "n", "codec",
      "ts_payload", "value_payload")
    def m4Of(chunksDf: DataFrame): DataFrame = {
      val dec = ChunkStore.decode(spark,
        chunksDf.select(chunkCols.map(col): _*).as[ChunkStruct])
        .filter(col("value").isNotNull)
        .select(col("conv_id"), col("bucket_ts").as("ts"), col("value"))
      // grid timestamps are unique within (conv, hour) → ts is total
      Downsample.m4(dec, date_trunc("hour", col("ts")))
    }
    val out =
      if (single) m4Of(stored)
      else metrics.map { m =>
        m4Of(stored.filter(col("metric") === m)).withColumn("metric", lit(m))
      }.reduce(_ unionByName _)
    runTier(spark, outRoot, "m4-1h", snap, nBuckets,
      out.withColumn("bucket", bucketCol(nBuckets)), limitBuckets)
  }

  /** Band BACKFILL — add one metric band to an already-committed banded
    * store without touching the existing bands (the tier store's
    * ALTER TABLE ADD COLUMN): every tier's new-band rows are committed as
    * window-tagged batch dirs (`band-<metric>`), so the resume diff,
    * retention, and readers treat them exactly like any other windowed
    * append — the base run's dirs are never rewritten, and re-running the
    * backfill resumes at bucket granularity per tier. One raw scan total
    * for the new band (1m chunks + 1h state share the persisted
    * first-valid relation, like [[runAll]]); 1d/1mo/gh-state cascade from
    * the committed 1h rows of the new band only. Requires the store to
    * carry the banded schema ([[runAll]] with several metrics or
    * `asBands = true`).
    */
  def addMetricBand(spark: SparkSession, transcripts: DataFrame,
      inputPath: String, outRoot: String, nBuckets: Int, metric: String,
      limitBuckets: Option[Int] = None): Seq[TierRun] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    import scala.concurrent.ExecutionContext.Implicits.global
    val snap = snapshotId(inputPath)
    require(readTier(spark, outRoot, "1m-chunks", snap).columns
        .contains("metric"),
      s"addMetricBand: store at $outRoot is not banded (runAll with " +
        "several metrics or asBands = true)")
    val w = Some(s"band-$metric")
    val b = bucketCol(nBuckets)
    val fv = Regularize.firstValid(transcripts, Tier.M1, metric).persist()
    fv.count()
    val f1 = Future {
      val chunks = ChunkStore.encodeFilled(spark, fv, Tier.M1).toDF()
        .withColumn("metric", lit(metric)).withColumn("bucket", b)
      runTier(spark, outRoot, "1m-chunks", snap, nBuckets, chunks,
        limitBuckets, window = w)
    }
    val f2 = Future {
      val st1h = SeriesRollup.stateDenseHistMulti(spark,
          fv.select(col("conv_id"), col("bucket_ts"),
            col("value").as(metric)), Tier.M1, Tier.H1, Seq(metric))
        .withColumn("bucket", b)
      runTier(spark, outRoot, "1h-state", snap, nBuckets, st1h,
        limitBuckets, window = w)
    }
    val r1 = Await.result(f1, Duration.Inf)
    val r2 = Await.result(f2, Duration.Inf)
    fv.unpersist()
    val bandRows = col("metric") === metric
    val r3 =
      if (committedBuckets(outRoot, "1h-state", snap, w).size < nBuckets)
        TierRun("1d-state", Nil, Nil, 0, 0)
      else runTier(spark, outRoot, "1d-state", snap, nBuckets,
        Rollup.cascadeHist(readTier(spark, outRoot, "1h-state", snap)
            .filter(bandRows).drop("bucket"), Tier.D1)
          .withColumn("bucket", b), limitBuckets, window = w)
    val r4 =
      if (committedBuckets(outRoot, "1d-state", snap, w).size < nBuckets)
        TierRun("1mo-state", Nil, Nil, 0, 0)
      else runTier(spark, outRoot, "1mo-state", snap, nBuckets,
        Rollup.cascadeHist(readTier(spark, outRoot, "1d-state", snap)
            .filter(bandRows).drop("bucket"), Tier.Mo1)
          .withColumn("bucket", b), limitBuckets, window = w)
    val r5 =
      if (committedBuckets(outRoot, "1h-state", snap, w).size < nBuckets)
        TierRun("gh-state", Nil, Nil, 0, 0)
      else runTier(spark, outRoot, "gh-state", snap, nBuckets,
        Rollup.cascadeHist(readTier(spark, outRoot, "1h-state", snap)
            .filter(bandRows).drop("bucket").drop("conv_id"), Tier.H1)
          .withColumn("bucket", ghBucketCol(nBuckets)), limitBuckets,
        window = w)
    Seq(r1, r2, r3, r4, r5)
  }
}
