package graft

import org.apache.spark.sql.SparkSession
import graft.runtime.TierPipeline
import graft.sources.Transcripts

/** North-rule scaling evidence: the full raw→1m(chunks)→1h→1d tier pipeline
  * (TierPipeline.runAll — real parquet tier commits + lineage manifests) run
  * at two parallelism levels (local[N] vs local[4N], the sandbox proxy for
  * N vs 4N executors) over the SAME input, each level in its OWN JVM
  * (same-JVM back-to-back runs inherit a dirtied heap and measure GC, not
  * scaling). Orchestrated by tools/scalebench.sh, which combines the two
  * JSON lines into BENCH/BASELINE.md.
  *
  * Modes:
  *   gen <dir> <nConv>           — write the shared synthetic input
  *   run <dir> <cpus> <buckets>  — one timed pipeline run, prints JSON
  */
object ScaleBench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"scalebench-$cpus")
      .config("spark.sql.shuffle.partitions", cpus * 2)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args(0) match {
    case "gen" =>
      val dir = args(1); val nConv = args(2).toInt
      val s = session(Runtime.getRuntime.availableProcessors())
      Transcripts.synthetic(s, nConv).write.mode("overwrite")
        .parquet(s"$dir/transcripts.parquet")
      println(s"""{"mode":"gen","turns":${
        s.read.parquet(s"$dir/transcripts.parquet").count()}}""")
      s.stop()

    case "run" =>
      val dir = args(1); val cpus = args(2).toInt; val nBuckets = args(3).toInt
      val reps = if (args.length > 4) args(4).toInt else 2
      val s = session(cpus)
      val tr = s.read.parquet(s"$dir/transcripts.parquet")
      val turns = tr.count() // warm page cache equally at every level
      // warmup run (JIT + page cache + shuffle dirs) + `reps` measured runs;
      // report the steady-state minimum
      var best = Double.MaxValue
      for (r <- 0 to reps) {
        val out = java.nio.file.Files.createTempDirectory(s"tiers-$cpus").toString
        val t0 = System.nanoTime()
        val runs = TierPipeline.runAll(s, tr, dir, out, nBuckets)
        val wall = (System.nanoTime() - t0) / 1e9
        require(runs.forall(_.processed.nonEmpty), s"pipeline incomplete at local[$cpus]")
        if (r > 0) best = math.min(best, wall)
        // clean up so repeated runs don't fill the disk (a 60%-full ext4
        // with strict reservation throttled writers into the kernel)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      }
      println(f"""{"mode":"run","cpus":$cpus,"turns":$turns,"wall":$best%.2f,""" +
        f""""turns_per_sec":${turns / best}%.0f}""")
      s.stop()

    case other => sys.error(s"unknown mode $other (gen|run)")
  }
}
