package graft
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (q <- Seq("ts_regular_p16d", "ts_merge_intersects", "ts_softmax",
        "dd_simhash_h3", "ann_ivf2", "ts_prune", "ts_topk_confident", "mm_frames")) {
      val p = SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString
      val lines = p.linesIterator.filter(l =>
        l.contains("Exchange") || l.contains("Join") || l.contains("Cartesian")
          || l.contains("Window") || l.contains("TakeOrdered")).map(_.trim.take(140))
      println(s"=== $q")
      lines.foreach(l => println("  " + l))
    }
    spark.stop()
  }
}
