package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Contingency, Dedup, SeriesOps, TextAnalysis}

/** Round-5 categorical/privacy/near-dup batch: l-diversity, role×tool
  * contingency (MI/chi²/Cramér's V), tool association rules, feature-hash
  * near-dup pairs, seasonal-residual anomalies.
  */
class Round5ySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def tdf(rows: Seq[(String, Int, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  test("lDiversity: constant sensitive -> l=1/H=0/not diverse; 50-50 -> l=2/H=ln2") {
    val t = tdf(Seq(
      // QI (user, bucket 0): sensitive always 'x' -> l = 1
      ("c1", 0, "user", "t", "x", "2024-01-01 00:00:00"),
      ("c1", 1, "user", "t", "x", "2024-01-01 00:01:00"),
      // QI (assistant, bucket 0): sensitive x and none, 1 each -> l = 2
      ("c2", 0, "assistant", "t", "x", "2024-01-01 00:02:00"),
      ("c2", 1, "assistant", "t", null, "2024-01-01 00:03:00")))
    val r = TextAnalysis.lDiversity(t).orderBy("role").collect()
    val a = r(0); val u = r(1)
    assert(u.getString(0) == "user" && u.getLong(3) == 1 &&
      u.getDouble(4) == 0.0 && !u.getBoolean(5))
    assert(a.getString(0) == "assistant" && a.getLong(3) == 2 &&
      a.getDouble(4) == 0.6931 && a.getBoolean(5))
  }

  test("roleToolStats: exact independence -> mi=0, chi2=0; perfect association -> V=1") {
    val ind = tdf(Seq(
      ("c1", 0, "user", "t", "x", "2024-01-01 00:00:00"),
      ("c1", 1, "user", "t", "y", "2024-01-01 00:01:00"),
      ("c1", 2, "assistant", "t", "x", "2024-01-01 00:02:00"),
      ("c1", 3, "assistant", "t", "y", "2024-01-01 00:03:00")))
    val ri = Contingency.roleToolStats(ind).collect().head
    assert(ri.getAs[Double]("mi") == 0.0 && ri.getAs[Double]("chi2") == 0.0)
    val per = tdf(Seq(
      ("c1", 0, "user", "t", "x", "2024-01-01 00:00:00"),
      ("c1", 1, "user", "t", "x", "2024-01-01 00:01:00"),
      ("c1", 2, "assistant", "t", "y", "2024-01-01 00:02:00"),
      ("c1", 3, "assistant", "t", "y", "2024-01-01 00:03:00")))
    val rp = Contingency.roleToolStats(per).collect().head
    assert(rp.getAs[Double]("cramers_v") == 1.0)
    assert(rp.getAs[Double]("mi") == 0.6931) // ln 2
  }

  test("toolAssocRules: hand baskets give exact support/confidence/lift") {
    val t = tdf(Seq(
      ("c1", 0, "user", "t", "A", "2024-01-01 00:00:00"),
      ("c1", 1, "user", "t", "B", "2024-01-01 00:01:00"),
      ("c2", 0, "user", "t", "A", "2024-01-01 00:02:00"),
      ("c2", 1, "user", "t", "B", "2024-01-01 00:03:00"),
      ("c3", 0, "user", "t", "A", "2024-01-01 00:04:00"),
      ("c4", 0, "user", "t", "B", "2024-01-01 00:05:00")))
    val r = Contingency.toolAssocRules(t).collect().head
    assert(r.getAs[String]("tool_a") == "A" && r.getAs[String]("tool_b") == "B")
    assert(r.getAs[Long]("n_xy") == 2 && r.getAs[Long]("n_a") == 3 &&
      r.getAs[Long]("n_b") == 3 && r.getAs[Long]("n_baskets") == 4)
    assert(r.getAs[Double]("support") == 0.5)
    assert(r.getAs[Double]("conf_ab") == 0.6667 &&
      r.getAs[Double]("conf_ba") == 0.6667)
    assert(r.getAs[Double]("lift") == 0.8889) // 2*4/(3*3)
  }

  test("featureHashPairs: clones pair at cos 1.0; disjoint-vocab docs never pair") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma alpha"),
      (2L, "alpha beta gamma alpha"),          // clone of 1
      (3L, "totally different words here now") // disjoint vocabulary
    ).toDF("doc_id", "text")
    val pairs = Dedup.featureHashPairs(docs).collect()
    assert(pairs.length == 1)
    val p = pairs.head
    assert(p.getLong(0) == 1L && p.getLong(1) == 2L &&
      p.getAs[Double]("cos") == 1.0)
  }

  test("stlAnomaly: constant series -> zero anomalies; planted spike is flagged") {
    import spark.implicits._
    def series(spike: Boolean) = (0 until 72).map { h =>
      val v = if (spike && h == 36) 1000.0 else 100.0
      ("c1", f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:00:00", v)
    }
    def run(spike: Boolean) = {
      val df = series(spike).toDF("conv_id", "ts_s", "value")
        .withColumn("ts", col("ts_s").cast("timestamp"))
      SeriesOps.stlAnomaly(df, date_trunc("hour", col("ts"))).collect()
    }
    val flat = run(false)
    assert(flat.length == 1 && flat.head.getAs[Long]("n_anom") == 0 &&
      flat.head.getAs[Double]("max_abs_resid") == 0.0)
    val spiked = run(true)
    assert(spiked.head.getAs[Long]("n_anom") >= 1)
    assert(spiked.head.getAs[Double]("max_abs_resid") > 100.0)
  }
}
