package graft
import org.apache.spark.sql.SparkSession
/** Dev aid: dump exchange/sort/window/scan counts for named queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args(0).split(",").toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val p = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      def c(s: String) = p.sliding(s.length).count(_ == s)
      println(f"$name%-18s exch=${c("Exchange hashpartitioning")}%2d " +
        f"sort=${c("Sort [")}%2d win=${c("Window")}%2d " +
        f"scan=${c("Scan parquet")}%2d agg=${c("HashAggregate")}%2d " +
        f"obj=${c("MapGroups")}%2d")
    }
    spark.stop()
  }
}
