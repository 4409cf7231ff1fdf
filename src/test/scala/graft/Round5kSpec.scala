package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, SeriesMining, TextAnalysis}

/** Round-5 additions, batch 11: dedup cluster report, KMV source overlap,
  * rescaled-range Hurst exponent.
  */
class Round5kSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clusterStats: size histogram plus singleton mass") {
    val docs = (1L to 6L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val comp = Seq(
      (1L, 1L, true, 2L), (2L, 1L, false, 2L),
      (3L, 3L, true, 3L), (4L, 3L, false, 3L), (5L, 3L, false, 3L))
      .toDF("doc_id", "component", "is_canonical", "group_sz")
    val r = Dedup.clusterStats(docs, comp).orderBy("group_sz").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    assert(r == Seq((1L, 1L, 1L), (2L, 1L, 2L), (3L, 1L, 3L)), r.toString)
    // no singletons -> no size-1 row
    val docs2 = (1L to 5L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val r2 = Dedup.clusterStats(docs2, comp).orderBy("group_sz").collect()
    assert(r2.map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("sourceOverlap: identical vocabularies estimate 1.0, disjoint 0.0") {
    val docs = Seq(
      (1L, "a b c d e f g h", "s1"),
      (2L, "a b c d e f g h", "s2"),
      (3L, "p q r s t u v w", "s3"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceOverlap(docs, n = 3, k = 8)
      .orderBy("sa", "sb").collect()
      .map(x => (x.getString(0), x.getString(1), x.getLong(3), x.getDouble(4)))
    // s1 = s2 (6 shared grams); s3 disjoint from both
    assert(r.toSeq == Seq(("s1", "s2", 6L, 1.0), ("s1", "s3", 0L, 0.0),
      ("s2", "s3", 0L, 0.0)), r.toSeq)
  }

  test("hurst: integer R/S replay at sz=4; persistent > anti-persistent; short series drop") {
    // hand replay of one 4-segment of the alternating series 0,10,0,10:
    // C = 0,10,10,20; S = 20; D_j = 4C_j - (j+1)20 = -20,0,-20,0
    // I = 4*(0+100+0+100) - 400 = 400 -> RS = 20/20 = 1.0
    val alt = (0 until 16).map(i => ("a", i, if (i % 2 == 0) 0L else 10L))
      .toDF("conv_id", "idx", "v")
    val ra = SeriesMining.hurst(alt).collect()(0)
    assert(ra.getLong(1) == 16 && ra.getDouble(2) == 1.0, ra.toString)
    val ramp = (0 until 16).map(i => ("b", i, i.toLong * 10))
      .toDF("conv_id", "idx", "v")
    val rb = SeriesMining.hurst(ramp).collect()(0)
    // a drifting walk rescales faster with segment size than the oscillator
    assert(rb.getDouble(5) > ra.getDouble(5), s"$rb vs $ra")
    // anti-persistent H stays low, trending H high
    assert(ra.getDouble(5) < 0.5 && rb.getDouble(5) > 0.8)
    // fewer than 16 points -> sz16 has no complete segment -> conv drops
    val short = (0 until 12).map(i => ("c", i, i.toLong))
      .toDF("conv_id", "idx", "v")
    assert(SeriesMining.hurst(short).count() == 0)
  }
}
