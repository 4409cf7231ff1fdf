package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Evaluation, SeriesOps, Similarity, Summary, TextAnalysis}

/** Round-5 batch 3: temperature scaling, KS test, Good-Turing, tool
  * trigrams, Kalman local-level filter, Matryoshka truncated recall.
  */
class Round5zSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def tdf(rows: Seq[(String, Int, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  private lazy val calib = tdf(Seq(
    ("c1", 0, "assistant", "t", null, "2024-01-01 10:00:00"),
    ("c1", 1, "user", "t", null, "2024-01-01 10:01:00"),
    ("c1", 2, "assistant", "t", null, "2024-01-01 10:02:00"),
    ("c1", 3, "assistant", "t", null, "2024-01-01 10:03:00"),
    ("c2", 0, "user", "t", null, "2024-01-01 11:00:00"),
    ("c2", 1, "user", "t", null, "2024-01-01 11:01:00"),
    ("c2", 2, "user", "t", null, "2024-01-01 11:02:00"),
    ("c2", 3, "user", "t", null, "2024-01-01 11:03:00"),
    ("c2", 4, "user", "t", null, "2024-01-01 11:04:00"),
    ("c2", 5, "assistant", "t", null, "2024-01-01 11:05:00")))

  test("temperatureScaling: T=1 row reproduces hand NLL and the brierEce ECE; chosen marks the NLL argmin") {
    val rows = Evaluation.temperatureScaling(calib).collect()
    assert(rows.length == 5)
    val t1 = rows.find(_.getDouble(0) == 1.0).get
    // cells: ln(1/0.4)=0.9163, ln(2)=0.6931 -> mean 0.8047; ECE as brierEce
    assert(t1.getAs[Double]("mean_nll") == 0.8047, t1)
    assert(t1.getAs[Double]("ece") == 0.45, t1)
    val chosen = rows.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.nonEmpty)
    val minNll = rows.map(_.getAs[Double]("mean_nll")).min
    assert(chosen.forall(_.getAs[Double]("mean_nll") == minNll))
  }

  test("ksTest: identical cohorts -> D=0 no reject; disjoint cohorts -> D=1, Smirnov crit from shared literal") {
    import spark.implicits._
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "in_a")
    val r0 = Summary.ksTest(same, "v", "in_a").collect().head
    assert(r0.getAs[Double]("d_stat") == 0.0 && !r0.getAs[Boolean]("reject"))
    val disj = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "in_a")
    val r1 = Summary.ksTest(disj, "v", "in_a").collect().head
    assert(r1.getAs[Double]("d_stat") == 1.0)
    assert(r1.getAs[Double]("crit_05") == 1.358) // 1.358*sqrt(4/4)
    assert(!r1.getAs[Boolean]("reject")) // n too small for significance
  }

  test("goodTuring: hand corpus N=4,V=3,f1=2,f2=1 -> p0=0.5, chao1=5; f2=0 -> NULL chao1") {
    import spark.implicits._
    val docs = Seq((1L, "a a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.goodTuring(docs).collect().head
    assert(r.getLong(0) == 4 && r.getLong(1) == 3 &&
      r.getLong(2) == 2 && r.getLong(3) == 1)
    assert(r.getAs[Double]("p_unseen") == 0.5)
    assert(r.getAs[Double]("chao1") == 5.0)
    val noF2 = Seq((1L, "a b c")).toDF("doc_id", "text")
    assert(TextAnalysis.goodTuring(noF2).collect().head.isNullAt(5))
  }

  test("toolTrigrams: ABAB tool chain yields the two interior trigrams") {
    val t = tdf(Seq(
      ("c1", 0, "user", "t", "A", "2024-01-01 00:00:00"),
      ("c1", 1, "user", "t", "B", "2024-01-01 00:01:00"),
      ("c1", 2, "user", "t", "A", "2024-01-01 00:02:00"),
      ("c1", 3, "user", "t", "B", "2024-01-01 00:03:00")))
    val r = SeriesOps.toolTrigrams(t).collect()
      .map(x => (x.getString(0), x.getString(1), x.getString(2), x.getLong(3)))
    assert(r.toSet == Set(("A", "B", "A", 1L), ("B", "A", "B", 1L)))
  }

  test("kalmanLevel: hand 3-step replay of the quantized recursion") {
    import spark.implicits._
    val m = Seq(("c1", 0, "2024-01-01 00:00:00", 10.0),
      ("c1", 1, "2024-01-01 00:01:00", 12.0),
      ("c1", 2, "2024-01-01 00:02:00", 11.0))
      .toDF("conv_id", "turn_idx", "ts_s", "value")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val r = SeriesOps.kalmanLevel(m, qVar = 0.01, rVar = 1.0)
      .orderBy("idx").collect()
    assert(r(0).getDouble(4) == 10.0 && r(0).getDouble(5) == 1.0)
    assert(r(1).getDouble(3) == 0.5 && r(1).getDouble(4) == 11.0 &&
      r(1).getDouble(5) == 0.51)
    assert(r(2).getDouble(3) == 0.3377 && r(2).getDouble(4) == 11.0 &&
      r(2).getDouble(5) == 0.3478)
  }

  test("mrlRecall: prefix truncation loses the true neighbor, full-width slice recovers it") {
    import spark.implicits._
    val emb = Seq(
      (2L, Array(1.0, 0.0, 1.0, 0.0)),  // B: shares only the prefix
      (5L, Array(1.0, 0.0, 0.0, 1.0)),  // A: the true nearest
      (9L, Array(1.0, 0.0, 0.0, 0.9))   // query
    ).toDF("vec_id", "embedding")
    val r = Similarity.mrlRecall(emb, col("vec_id") === 9, Seq(2, 4), 1)
      .orderBy("dim").collect()
    // d=2: prefixes identical -> tie broken to eid 2 (wrong neighbor)
    assert(r(0).getInt(0) == 2 && r(0).getAs[Double]("recall") == 0.0)
    // d=4: full information -> true neighbor 5 recovered
    assert(r(1).getInt(0) == 4 && r(1).getAs[Double]("recall") == 1.0)
  }
}
