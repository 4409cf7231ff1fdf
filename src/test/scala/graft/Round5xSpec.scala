package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Evaluation, Graph, Similarity, Summary, TextAnalysis}
import graft.sources.Transcripts

/** Round-5 evaluation/graph/distance batch: calibration (reliability,
  * Brier+ECE, isotonic PAV), Kaplan-Meier survival, centroid silhouette,
  * PageRank, Markov entropy rate, Wasserstein-1, decayed top-k, JS drift.
  */
class Round5xSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import org.apache.spark.sql.DataFrame

  private def tdf(rows: Seq[(String, Int, String, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
  }

  // -- calibration fixture: two (conv, day) cells with hand-computable
  //    halves (odd turns = model, even turns = truth) --
  private lazy val calib = tdf(Seq(
    // c1: odd turns user, assistant -> p=(0.4, 0.4, 0.2), pred 1, conf 0.4
    //     even turns assistant x2   -> truth 2 (incorrect)
    ("c1", 0, "assistant", "t", null, "2024-01-01 10:00:00"),
    ("c1", 1, "user", "t", null, "2024-01-01 10:01:00"),
    ("c1", 2, "assistant", "t", null, "2024-01-01 10:02:00"),
    ("c1", 3, "assistant", "t", null, "2024-01-01 10:03:00"),
    // c2: odd turns user, user, assistant -> p=(0.5, 1/3, 1/6), pred 1,
    //     conf 0.5; even turns user x3 -> truth 1 (correct)
    ("c2", 0, "user", "t", null, "2024-01-01 11:00:00"),
    ("c2", 1, "user", "t", null, "2024-01-01 11:01:00"),
    ("c2", 2, "user", "t", null, "2024-01-01 11:02:00"),
    ("c2", 3, "user", "t", null, "2024-01-01 11:03:00"),
    ("c2", 4, "user", "t", null, "2024-01-01 11:04:00"),
    ("c2", 5, "assistant", "t", null, "2024-01-01 11:05:00")))

  test("reliabilityBins: hand cells land in the right deciles with exact acc/conf/gap") {
    val bins = Evaluation.reliabilityBins(calib).orderBy("bin").collect()
    assert(bins.map(_.getInt(0)).toSeq == Seq(4, 5))
    val b4 = bins(0); val b5 = bins(1)
    assert(b4.getLong(1) == 1 && b4.getLong(2) == 0) // n, correct
    assert(b4.getDouble(3) == 0.0 && b4.getDouble(4) == 0.4 &&
      b4.getDouble(5) == 0.4)
    assert(b5.getLong(1) == 1 && b5.getLong(2) == 1)
    assert(b5.getDouble(3) == 1.0 && b5.getDouble(4) == 0.5 &&
      b5.getDouble(5) == 0.5)
  }

  test("brierEce: hand Brier (0.4745) and ECE (0.45) exactly") {
    val r = Evaluation.brierEce(calib).collect().head
    assert(r.getLong(0) == 2)
    // c1: 0.4^2 + 0.6^2 + 0.2^2 = 0.56; c2: 0.25 + (1/3)^2 + (1/6)^2
    assert(r.getDouble(1) == 0.4745, s"brier ${r.getDouble(1)}")
    assert(r.getDouble(2) == 0.45, s"ece ${r.getDouble(2)}")
  }

  test("isotonicCalibration == classic stack PAV on the same bins (synthetic corpus)") {
    val tr = Transcripts.synthetic(spark, nConv = 40).toDF()
    val bins = Evaluation.reliabilityBins(tr)
      .select("bin", "n_cells", "n_correct").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(bins.nonEmpty)
    // reference PAV: merge while prev mean >= last mean (cross-multiplied)
    val st = scala.collection.mutable.ArrayBuffer[(Long, Long, List[Int])]()
    bins.foreach { case (b, n, c) =>
      st += ((c, n, List(b)))
      while (st.length >= 2 && {
        val p = st(st.length - 2); val l = st.last
        p._1 * l._2 >= l._1 * p._2
      }) {
        val l = st.remove(st.length - 1)
        val p = st.remove(st.length - 1)
        st += ((p._1 + l._1, p._2 + l._2, p._3 ++ l._3))
      }
    }
    val expect = st.flatMap { case (c, n, bs) =>
      val m = BigDecimal(c.toDouble / n.toDouble + 1e-9)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      bs.map(_ -> m)
    }.toMap
    val iso = Evaluation.isotonicCalibration(tr)
      .select("bin", "iso_acc").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(iso == expect, s"iso=$iso expect=$expect")
    // and the result is monotone non-decreasing in bin order
    val ordered = iso.toSeq.sortBy(_._1).map(_._2)
    assert(ordered == ordered.sorted)
  }

  test("kaplanMeier: hand 4-conv fixture with a censored lifetime") {
    val t = tdf(Seq(
      ("c1", 0, "user", "t", null, "2024-01-01 00:00:00"),
      ("c1", 1, "user", "t", null, "2024-01-01 01:00:00"),
      ("c2", 0, "user", "t", null, "2024-01-01 00:00:00"),
      ("c2", 1, "user", "t", null, "2024-01-01 01:00:00"),
      ("c3", 0, "user", "t", null, "2024-01-01 00:00:00"),
      ("c3", 1, "user", "t", null, "2024-01-01 02:00:00"),
      ("c4", 0, "user", "t", null, "2024-01-01 00:00:00"),
      ("c4", 1, "user", "t", null, "2024-01-01 03:00:00")))
    // watermark = 03:00; censor horizon 1h -> only c4 (3h) is censored
    val km = Evaluation.kaplanMeier(t, censorMs = 3600000L)
      .orderBy("t_h").collect()
    assert(km.length == 2)
    assert(km(0).getLong(0) == 1 && km(0).getLong(1) == 4 &&
      km(0).getLong(2) == 2 && km(0).getDouble(3) == 0.5)
    assert(km(1).getLong(0) == 2 && km(1).getLong(1) == 2 &&
      km(1).getLong(2) == 1 && km(1).getDouble(3) == 0.25)
  }

  test("silhouetteCentroid: tight clusters score high, equidistant vector scores 0") {
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0, 0.0)), // == centroid 1 -> s = 1
      (2L, Array(1.0, 1.0)), // equidistant -> tie to cell 1, s = 0
      (3L, Array(0.0, 1.0))  // == centroid 2 -> s = 1
    ).toDF("vec_id", "embedding")
    val cents = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 1.0)))
      .toDF("cid", "cv")
    val s = Similarity.silhouetteCentroid(emb, cents)
      .orderBy("cell").collect()
    assert(s.length == 2)
    assert(s(0).getLong(0) == 1L && s(0).getLong(1) == 2)
    assert(s(0).getAs[Double]("mean_sil") == 0.5 &&
      s(0).getAs[Double]("min_sil") == 0.0 &&
      s(0).getAs[Double]("max_sil") == 1.0)
    assert(s(1).getLong(0) == 2L && s(1).getAs[Double]("mean_sil") == 1.0)
  }

  /** Independent scala replay of the quantized PageRank recursion. */
  private def prReplay(nodes: Seq[String], edges: Seq[(String, String, Long)],
      iters: Int): Map[String, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val pq = edges.map { case (f, t, n) =>
      (f, t) -> Math.round(n * 1000000.0 / out(f))
    }.toMap
    val nN = nodes.length
    var r = nodes.map(_ -> Math.round(10000.0 / nN)).toMap
    for (_ <- 1 to iters) {
      val dq = nodes.filterNot(out.contains).map(r).sum
      r = nodes.map { j =>
        val csum = edges.filter(_._2 == j).map { case (f, _, _) =>
          Math.round(r(f) * pq((f, j)) / 1000000.0)
        }.sum
        val v = BigDecimal((1.0 - 0.85) / nN +
          0.85 * (csum + Math.round(dq.toDouble / nN)) / 10000.0 + 1e-9)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        j -> Math.round(v * 10000.0)
      }.toMap
    }
    r.map { case (k, v) => k -> v / 10000.0 }
  }

  test("pageRank: engine == independent quantized replay (incl. a dangling node)") {
    import spark.implicits._
    // A -> B (B dangling), plus C <-> A
    val trans = Seq(("A", "B", 5L), ("C", "A", 2L), ("A", "C", 3L))
      .toDF("from_tool", "to_tool", "n")
    val got = Graph.pageRank(trans).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val expect = prReplay(Seq("A", "B", "C"),
      Seq(("A", "B", 5L), ("C", "A", 2L), ("A", "C", 3L)), 10)
    assert(got == expect, s"got=$got expect=$expect")
    // mass approximately conserved under quantization
    assert(math.abs(got.values.sum - 1.0) < 0.01)
  }

  test("entropyRate: deterministic chain -> 0; uniform 2-way fanout -> ln 2") {
    import spark.implicits._
    val det = Seq(("A", "B", 7L), ("B", "A", 7L))
      .toDF("from_tool", "to_tool", "n")
    assert(Graph.entropyRate(det).collect().head.getDouble(3) == 0.0)
    val uni = Seq(("A", "A", 1L), ("A", "B", 1L))
      .toDF("from_tool", "to_tool", "n")
    val h = Graph.entropyRate(uni).collect().head
    assert(h.getLong(0) == 2 && h.getLong(1) == 1 && h.getLong(2) == 2)
    assert(h.getDouble(3) == 0.6931) // round(ln 2 * 1e4)/1e4
  }

  test("wasserstein1: identical cohorts -> 0; cohort shifted by +2 -> 2.0") {
    import spark.implicits._
    val same = Seq((1L, true), (2L, true), (1L, false), (2L, false))
      .toDF("v", "in_a")
    val r0 = Summary.wasserstein1(same, "v", "in_a").collect().head
    assert(r0.getAs[Double]("w1") == 0.0)
    val shifted = Seq((1L, true), (2L, true), (3L, false), (4L, false))
      .toDF("v", "in_a")
    val r2 = Summary.wasserstein1(shifted, "v", "in_a").collect().head
    assert(r2.getLong(0) == 2 && r2.getLong(1) == 2 && r2.getLong(2) == 4)
    assert(r2.getAs[Double]("w1") == 2.0)
  }

  test("decayedTopK: weekly halving reorders the leaderboard; >=14 weeks decays to zero") {
    import spark.implicits._
    val rows =
      (1 to 3).map(i => ("X", s"2024-04-01 0$i:00:00")) ++ // age 0 -> w 1.0
      (1 to 10).map(_ => ("Y", "2024-03-24 01:00:00")) ++  // age 8d -> w 0.5
      (1 to 99).map(_ => ("Z", "2023-01-01 01:00:00"))     // >14 wk -> w 0
    val df = rows.toDF("tool", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))
    val top = Summary.decayedTopK(df, "tool", "ts", 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(top.toSeq == Seq(("Y", 10L, 5.0), ("X", 3L, 3.0), ("Z", 99L, 0.0)))
  }

  test("jsVocabDrift: identical shards -> all-zero terms; asymmetric corpus is shard-symmetric") {
    import spark.implicits._
    val docs = Seq((0L, "a b c d"), (1L, "a b c d"),
      (2L, "a a x y"), (3L, "a a x z")).toDF("doc_id", "text")
    val same = TextAnalysis.jsVocabDrift(
      docs.filter(col("doc_id") < 2), pmod(col("doc_id"), lit(2)) === 0, 8)
      .collect()
    assert(same.forall(_.getAs[Double]("js_term") == 0.0))
    def tot(shardEven: Boolean) = TextAnalysis.jsVocabDrift(docs,
        if (shardEven) pmod(col("doc_id"), lit(2)) === 0
        else pmod(col("doc_id"), lit(2)) === 1, 8)
      .agg(sum("js_term")).collect().head.getDouble(0)
    assert(math.abs(tot(true) - tot(false)) < 1e-3)
    // JS is bounded by ln 2 per term
    assert(TextAnalysis.jsVocabDrift(docs, pmod(col("doc_id"), lit(2)) === 0, 8)
      .collect().forall(r => r.getAs[Double]("js_term") <= 0.6932))
  }
}
