package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Forecast, Multimodal, SeriesOps, TextAnalysis}

/** Theta forecaster, SMA cross, perceptual hash near-dup, readability,
  * chunk-level dedup.
  */
class Round5pSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val hour = 3600000L

  test("theta: exact linear series — trend recovered, theta2 line equals the series") {
    import spark.implicits._
    val m = (0 until 10).map(t => ("c", t, ts(t * hour), 3.0 * t + 7))
      .toDF("conv_id", "turn_idx", "ts", "value")
    val r = Forecast.theta(m, alpha = 0.25).orderBy("idx").collect()
    assert(r.length == 10)
    // b4 = 3, a4 = 7 exactly -> theta2 = 2y - y = y at every point
    r.foreach(row => assert(row.getDouble(3) == row.getDouble(2),
      "theta2 must equal the series on an exact line"))
    // first step: ses = d_1 = y_1 = 7; forecast = .5*(7 + (7 + 3*1)) = 8.5
    assert(r(0).getDouble(4) == 7.0 && r(0).getDouble(5) == 8.5)
    // short series (< 8) excluded
    val short = (0 until 5).map(t => ("s", t, ts(t * hour), t.toDouble))
      .toDF("conv_id", "turn_idx", "ts", "value")
    assert(Forecast.theta(short, 0.25).isEmpty)
  }

  test("smaCross: planted spike produces exactly one golden cross at the spike") {
    import spark.implicits._
    val vals = Seq.fill(20)(10.0) ++ Seq(100.0, 100.0, 10.0)
    val m = vals.zipWithIndex.map { case (v, i) =>
      ("c", i, ts(i * hour), v)
    }.toDF("conv_id", "turn_idx", "ts", "value")
    val r = SeriesOps.smaCross(m, fast = 5, slow = 20).head()
    // constant prefix: sf*20 == ss*5 (not >) -> state false until the spike
    assert(r.getLong(1) == 4L, "4 evaluated states (rows 20..23)")
    assert(r.getLong(2) == 1L, "one golden cross")
    assert(r.getLong(4) == 20L * hour, "cross fires at the spike row")
  }

  test("phash: clones hash identically; near-dup pairs surface at hamming 0; empty payloads drop") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact clone
      (3L, "completely different payload bytes entirely unrelated content"),
      (4L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val h = Multimodal.phash(spark, docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!h.contains(4L), "empty payload dropped")
    assert(h(1L) == h(2L), "clones hash identically")
    h.values.foreach { case (hi, lo) =>
      assert(hi >= 0 && hi < (1L << 32) && lo >= 0 && lo < (1L << 32))
    }
    val dups = Multimodal.phashDups(Multimodal.phash(spark, docs), 3)
      .collect()
    assert(dups.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L &&
      r.getInt(2) == 0), "clone pair found at hamming 0")
  }

  test("readability: hand-counted Flesch score") {
    import spark.implicits._
    val docs = Seq((1L, "The cat sat. The dog ran.")).toDF("doc_id", "text")
    val r = TextAnalysis.readability(docs).head()
    // 6 words (split keeps no empties here), 2 sentences, 6 vowel groups
    assert(r.getLong(1) == 6L && r.getLong(2) == 2L && r.getLong(3) == 6L)
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(r.getDouble(4) == 119.19)
  }

  test("payloadEntropy: constant payload scores 0; two equal-frequency bytes score ln 2") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),  // one symbol -> H = 0 exactly
      (2L, "abababab"),  // two equal symbols -> H = ln 2 = 0.6931
      (3L, "")
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val h = Multimodal.payloadEntropy(spark, docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!h.contains(3L), "empty payload dropped")
    assert(h(1L).getLong(2) == 1L && h(1L).getDouble(3) == 0.0)
    assert(h(2L).getLong(2) == 2L && h(2L).getDouble(3) == 0.6931)
  }

  test("phash clone families: a clone triangle contracts to one component of 3") {
    import spark.implicits._
    val payload = "identical media payload shared by all three copies"
    val docs = Seq((1L, payload), (2L, payload), (3L, payload),
      (4L, "completely different unrelated lonely payload"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val pairs = Multimodal.phashDups(Multimodal.phash(spark, docs), 3)
      .select("id1", "id2")
    val comp = graft.operators.Dedup.components(pairs).collect()
    val family = comp.filter(_.getLong(1) == 1L)
    assert(family.length == 3, "all three clones in the min-id-1 family")
    assert(family.forall(_.getLong(3) == 3L), "group_sz 3")
    assert(!comp.exists(_.getLong(0) == 4L), "isolated doc stays out")
  }

  test("context budget: prefix-sum fit count and first overflow index") {
    import spark.implicits._
    val m = Seq(("c", 0, ts(0L), 4000.0), ("c", 1, ts(hour), 4000.0),
      ("c", 2, ts(2 * hour), 4000.0))
      .toDF("conv_id", "turn_idx", "ts", "text_len")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("conv_id").orderBy("ts", "turn_idx")
    val r = m.withColumn("idx", row_number().over(w))
      .withColumn("cum", sum("text_len").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy("conv_id")
      .agg(sum(when(col("cum") <= 8192, 1L).otherwise(0L)).as("within"),
        min(when(col("cum") > 8192, col("idx"))).as("first_over"))
      .head()
    assert(r.getLong(1) == 2L && r.getInt(2) == 3)
  }

  test("chunk-level dedup: identical docs share every chunk fingerprint") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, text), (2L, text), (3L, "unrelated short doc"))
      .toDF("doc_id", "text")
    val shared = TextAnalysis.chunkDocs(docs, 32, 8)
      .groupBy("chunk_md5")
      .agg(count(lit(1)).as("copies"),
        count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("copies") > 1).collect()
    // the 40-token doc chunks into 2 windows; both shared by docs 1 and 2
    assert(shared.length == 2)
    assert(shared.forall(r => r.getLong(1) == 2L && r.getLong(2) == 2L))
  }
}
