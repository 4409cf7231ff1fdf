package graft
import org.apache.spark.sql.SparkSession
/** Dev aid: sweep every query's executed plan for scale-killer shapes. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, dir).queryExecution.executedPlan.toString
        val cart = p.contains("CartesianProduct")
        val bnlj = p.contains("BroadcastNestedLoopJoin")
        // NOTE: no separate partitionless-window detector — a Window with an
        // empty partition spec always plans an Exchange SinglePartition
        // beneath it, so the sp check below subsumes that scale-killer.
        val sp = p.contains("Exchange SinglePartition")
        if (cart || bnlj || sp) println(s"$name cart=$cart bnlj=$bnlj singlePart=$sp")
      } catch { case e: Throwable => println(s"$name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
