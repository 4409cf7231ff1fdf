package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Summary, TextAnalysis}

/** Round-5 additions, batch 4: corpus quality/drift screens (TTR, Zipf,
  * PSI, Benford).
  */
class Round5fSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typeTokenRatio: counts, hapax, exact-rational shares; all-empty doc drops out") {
    val docs = Seq(
      (1L, "a a b"), // 3 tokens, 2 types, 1 hapax
      (2L, "x y  z"), // double space -> empty token filtered; 3 tokens all hapax
      (3L, "  ") // only empty tokens -> no output row
    ).toDF("doc_id", "text")
    val m = TextAnalysis.typeTokenRatio(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m.keySet == Set(1L, 2L))
    val d1 = m(1L)
    assert(d1.getLong(1) == 3 && d1.getLong(2) == 2 &&
      d1.getDouble(3) == 0.6667 && d1.getLong(4) == 1 &&
      d1.getDouble(5) == 0.3333, d1.toString)
    val d2 = m(2L)
    assert(d2.getLong(1) == 3 && d2.getLong(2) == 3 &&
      d2.getDouble(3) == 1.0 && d2.getLong(4) == 3)
  }

  test("zipfFit: an exact 1/rank corpus fits slope -1 with r2 ~ 1") {
    // counts 24/rank for ranks 1..4: ln(cnt) = ln 24 - ln(rank)
    val words = Seq("w1" -> 24, "w2" -> 12, "w3" -> 8, "w4" -> 6)
    val docs = words.zipWithIndex.flatMap { case ((w, n), i) =>
      Seq.fill(n)(w) }.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }
      .toDF("doc_id", "text")
    val r = TextAnalysis.zipfFit(docs, 64).collect()(0)
    assert(r.getLong(0) == 4)
    assert(math.abs(r.getDouble(1) + 1.0) <= 2e-3, s"slope=${r.getDouble(1)}")
    assert(r.getDouble(3) >= 0.9999, s"r2=${r.getDouble(3)}")
  }

  test("psiDrift: identical shards give zero psi terms; a shifted shard goes positive") {
    // same length profile on both parities (pairs (2k, 2k+1) share a
    // bucket) -> pa == pb -> psi_term 0
    val same = (0 until 40).map(i => (i.toLong, "t", 1L << (i / 2 % 3 + 2)))
      .toDF("doc_id", "text", "n_chars")
    val z = TextAnalysis.psiDrift(same, pmod(col("doc_id"), lit(2)) === 0)
      .collect()
    assert(z.length == 3 && z.forall(_.getDouble(5) == 0.0))
    // all of shard A in bucket 2, all of shard B in bucket 5 -> drift > 0
    val drift = (0 until 40).map(i =>
      (i.toLong, "t", if (i % 2 == 0) 4L else 32L))
      .toDF("doc_id", "text", "n_chars")
    val d = TextAnalysis.psiDrift(drift, pmod(col("doc_id"), lit(2)) === 0)
      .collect()
    assert(d.length == 2 && d.map(_.getDouble(5)).sum > 1.0)
  }

  test("benfordDigits: digit census, zero/negative filtered, chi term vs planted skew") {
    // ten values with digit 1, two with digit 2; a zero and a negative drop
    val vals = (10 to 19).map(_.toDouble) ++ Seq(2.0, 25.0, 0.0, -7.0)
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    val rows = Summary.benfordDigits(df, "v").orderBy("digit").collect()
    assert(rows.length == 2)
    val d1 = rows(0)
    assert(d1.getString(0) == "1" && d1.getLong(1) == 10 &&
      d1.getDouble(2) == 0.8333 && d1.getDouble(3) == 0.301, d1.toString)
    val d2 = rows(1)
    assert(d2.getString(0) == "2" && d2.getLong(1) == 2)
    // chi contribution for digit 1: (10 - 12*0.30103)^2 / (12*0.30103)
    val e = 12 * 0.3010299956639812
    val exp = BigDecimal((10 - e) * (10 - e) / e + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(d1.getDouble(4) == exp, s"${d1.getDouble(4)} vs $exp")
  }
}
