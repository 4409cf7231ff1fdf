package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Forecast, TextAnalysis}

/** Retrieval eval (MRR/NDCG), LSH recall grading, seasonal-naive backtest. */
class Round5qSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val hour = 3600000L

  test("retrievalEval: all-relevant top ranks score MRR 1 and NDCG 1; partial relevance degrades") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma gamma gamma"),
      (2L, "alpha beta delta delta"),
      (3L, "alpha only here no second term"),
      (4L, "nothing matching at all whatsoever")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.retrievalEval(docs, Seq((1, "alpha beta")), k = 10)
      .head()
    // docs 1 and 2 contain BOTH terms -> n_rel = 2; bm25 ranks both in
    // the top anyway (only 2 scoring docs for both terms)
    assert(r.getLong(1) == 2L, "n_rel")
    assert(r.getLong(2) == 2L, "both relevant docs retrieved")
    assert(r.getLong(3) == 1L, "first relevant at rank 1")
    assert(r.getDouble(4) == 1.0, "MRR")
    // dcg == idcg when the relevant set fills the top ranks exactly
    assert(r.getDouble(5) == r.getDouble(6) && r.getDouble(7) == 1.0)
  }

  test("lshRecall: exact clones are always found -> recall 1.0 on a clone-only truth set") {
    import spark.implicits._
    val base = (1 to 30).map(i =>
      (i.toLong, s"totally distinct document number $i with unique words w${i}a w${i}b w${i}c w${i}d"))
    val clones = Seq((101L, base.head._2), (102L, base(1)._2))
    val docs = (base ++ clones).toDF("doc_id", "text")
    val r = Dedup.lshRecall(docs, threshold = 0.5).head()
    val (nTruth, nHit) = (r.getLong(0), r.getLong(2))
    assert(nTruth >= 2L, "clone pairs are in the truth set")
    assert(nHit == nTruth, "minhash banding finds every J=1 pair")
    assert(r.getDouble(3) == 1.0, "recall")
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
  }

  test("lshRecall prefix filter: truth set identical to brute-force all-pairs Jaccard, incl. partial-overlap pairs") {
    import spark.implicits._
    // overlapping chains: doc i and i+1 share a sliding word window, so
    // the fixture is dense in partial Jaccard values straddling τ = 0.5
    val words = (0 until 60).map(i => s"w$i")
    val docs = (0 until 24).map { i =>
      (i.toLong, words.slice(i * 2, i * 2 + 12).mkString(" "))
    }.toDF("doc_id", "text")
    // brute force: every pair, exact quantized Jaccard
    val ids = docs.select(col("doc_id").as("id1"))
    val all = ids.crossJoin(docs.select(col("doc_id").as("id2")))
      .filter(col("id1") < col("id2"))
    val brute = Dedup.ngramJaccard(docs, all)
      .filter(col("jaccard") >= 0.5).count()
    assert(brute >= 20, "fixture must produce partial-overlap truth pairs")
    val r = Dedup.lshRecall(docs, threshold = 0.5).head()
    assert(r.getLong(0) == brute,
      s"prefix-filtered truth ${r.getLong(0)} != brute-force $brute")
  }

  test("seasonalNaiveAccuracy: a perfectly 4-periodic series backtests to zero error (and NULL MASE)") {
    import spark.implicits._
    val cycle = Seq(10.0, 20.0, 30.0, 40.0)
    val m = (0 until 16).map(i => ("c", i, ts(i * hour), cycle(i % 4)))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val r = Forecast.seasonalNaiveAccuracy(m, m = 4).head()
    assert(r.getLong(1) == 16L && r.getLong(2) == 4L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    assert(r.getDouble(5) == 0.0, "wape 0")
    assert(r.isNullAt(6), "train scale 0 -> MASE undefined")
    // short series (< 3m) excluded
    val short = (0 until 11).map(i => ("s", i, ts(i * hour), cycle(i % 4)))
      .toDF("conv_id", "turn_idx", "ts", "value")
    assert(Forecast.seasonalNaiveAccuracy(short, m = 4).isEmpty)
  }
}
