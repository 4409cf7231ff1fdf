package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Forecast, Layout, SeriesOps, TextAnalysis}
import graft.sources.Transcripts

/** ADF unit-root screen, Croston intermittent demand, weekday ANOVA,
  * RAG chunking, duplication inflation, z-order layout.
  */
class Round5oSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(ms: Long) = new java.sql.Timestamp(ms)
  private val hour = 3600000L

  /** (conv, values at hourly cadence) → metrics frame. */
  private def series(rows: (String, Seq[Double])*): DataFrame = {
    import spark.implicits._
    rows.flatMap { case (c, vs) =>
      vs.zipWithIndex.map { case (v, i) => (c, i, ts(i * hour), v) }
    }.toDF("conv_id", "turn_idx", "ts", "value")
  }

  test("adfScreen: alternating series is stationary (beta = -2); a pure ramp has zero SSE and drops") {
    val m = series(
      "alt"  -> Seq(10, 14, 10, 14, 10, 14, 10, 14, 10, 14).map(_.toDouble),
      "ramp" -> (1 to 10).map(_.toDouble))
    val out = SeriesOps.adfScreen(m).collect().map(r =>
      r.getString(0) -> r).toMap
    assert(out.keySet == Set("alt"))
    val alt = out("alt")
    // x alternates 10/14, d = -2(x - 12): exact regression beta = -2
    assert(alt.getDouble(2) == -2.0)
    assert(alt.getBoolean(4), "alternating series must flag stationary")
  }

  test("adfScreen: an explosive (near-doubling) series has beta ~ +1 and is NOT stationary") {
    val vs = Seq(1, 2, 4, 9, 17, 34, 70, 141, 280, 561).map(_.toDouble)
    val out = SeriesOps.adfScreen(series("w" -> vs)).collect()
    assert(out.length == 1)
    assert(out.head.getDouble(2) > 0.9, "delta tracks the level: beta ~ 1")
    assert(!out.head.getBoolean(4))
  }

  test("croston: hand-replayed two-state recursion") {
    import spark.implicits._
    val dem = Seq(("c", 0L, 2.0), ("c", 2L, 1.0), ("c", 5L, 3.0))
      .toDF("conv_id", "period_idx", "qty")
    val r = Forecast.croston(dem, alpha = 0.25)
      .orderBy("i").collect()
    assert(r.length == 3)
    // i=1: init z=q1, p=1, tau NULL
    assert(r(0).isNullAt(4) && r(0).getDouble(5) == 2.0 &&
      r(0).getDouble(6) == 1.0 && r(0).getDouble(7) == 2.0)
    // i=2: tau=2, z=.25*1+.75*2=1.75, p=.25*2+.75*1=1.25, rate=1.4
    assert(r(1).getLong(4) == 2L && r(1).getDouble(5) == 1.75 &&
      r(1).getDouble(6) == 1.25 && r(1).getDouble(7) == 1.4)
    // i=3: tau=3, z=.25*3+.75*1.75=2.0625, p=.25*3+.75*1.25=1.6875
    assert(r(2).getLong(4) == 3L && r(2).getDouble(5) == 2.0625 &&
      r(2).getDouble(6) == 1.6875 && r(2).getDouble(7) == 1.2222)
  }

  test("dowAnova: planted weekday effect scores F > 0; within-constant groups drop (exact zero SSW)") {
    import spark.implicits._
    val day = 86400000L
    // conv "eff": Thursday (epoch day 0, dow 4) values {10,20}, Friday {30,40}
    // conv "const": each dow internally constant -> SSW exactly 0 -> dropped
    val m = Seq(
      ("eff", 0, ts(0L), 10.0), ("eff", 1, ts(hour), 20.0),
      ("eff", 2, ts(day), 30.0), ("eff", 3, ts(day + hour), 40.0),
      ("const", 0, ts(0L), 5.0), ("const", 1, ts(hour), 5.0),
      ("const", 2, ts(day), 9.0), ("const", 3, ts(day + hour), 9.0)
    ).toDF("conv_id", "turn_idx", "ts", "value")
    val out = SeriesOps.dowAnova(m).collect().map(r =>
      r.getString(0) -> r).toMap
    assert(out.keySet == Set("eff"))
    val e = out("eff")
    // SSB = 2*(15-25)^2 + 2*(35-25)^2 = 400, SSW = 2*25+2*25 = 100
    // F = (400/1)/(100/2) = 8, eta2 = 400/500 = 0.8
    assert(e.getLong(1) == 4L && e.getLong(2) == 2L)
    assert(e.getDouble(3) == 8.0 && e.getDouble(4) == 0.8)
  }

  test("chunkDocs: coverage, overlap, and fingerprint faithfulness") {
    import spark.implicits._
    val text40 = (1 to 40).map(i => s"w$i").mkString(" ")
    val text5 = "a b c d e"
    val docs = Seq((1L, text40), (2L, text5)).toDF("doc_id", "text")
    val ch = TextAnalysis.chunkDocs(docs, chunkSize = 32, overlap = 8)
      .orderBy("doc_id", "chunk_idx").collect()
    val d1 = ch.filter(_.getLong(0) == 1L)
    val d2 = ch.filter(_.getLong(0) == 2L)
    // 40 tokens, size 32 stride 24 -> chunks [1,32] and [25,40]
    assert(d1.length == 2)
    assert(d1(0).getLong(2) == 1L && d1(0).getLong(3) == 32L)
    assert(d1(1).getLong(2) == 25L && d1(1).getLong(3) == 40L)
    // the overlap region [25,32] is shared: 8 tokens
    assert(d1(0).getLong(3) - d1(1).getLong(2) + 1 == 8L)
    // short doc: one chunk covering everything, md5 == md5(text)
    assert(d2.length == 1 && d2(0).getLong(2) == 1L && d2(0).getLong(3) == 5L)
    val wholeMd5 = docs.filter(col("doc_id") === 2L)
      .select(md5(col("text").cast("binary"))).head.getString(0)
    assert(d2(0).getString(5) == wholeMd5)
    // last chunk always reaches the end
    val last = TextAnalysis.chunkDocs(docs, 32, 8)
      .groupBy("doc_id").agg(max("tok_end").as("e")).collect()
    assert(last.forall(r => r.getLong(1) == (if (r.getLong(0) == 1L) 40L else 5L)))
  }

  test("dupInflation: planted duplicate accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z"),   // 3 tokens, duplicated twice
      (2L, "x y z"),
      (3L, "p q")      // 2 tokens, unique
    ).toDF("doc_id", "text")
    val r = TextAnalysis.dupInflation(docs).head()
    assert(r.getLong(0) == 3L, "n_docs")
    assert(r.getLong(1) == 2L, "n_unique_texts")
    assert(r.getLong(2) == 1L, "n_dup_docs")
    assert(r.getLong(3) == 8L, "total_tokens 3+3+2")
    assert(r.getLong(4) == 5L, "canonical_tokens 3+2")
    assert(r.getLong(5) == 3L, "wasted_tokens")
    assert(r.getDouble(6) == 1.6, "inflation 8/5")
  }

  test("zValue: interleave correctness and inverse round-trip on real cells") {
    import spark.implicits._
    // hand case: a=5 (101 -> odd bits), b=3 (011 -> even bits) = 39
    val z0 = Seq((5L, 3L)).toDF("a", "b")
      .select(Layout.zValue(col("a"), col("b"), 16)).head.getLong(0)
    assert(z0 == 39L)
    val tr = Transcripts.synthetic(spark, nConv = 20).toDF()
    val cells = Layout.transcriptZ(tr, bits = 16)
      .select("conv_cell", "time_cell", "z").distinct().collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      val (a, b, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
      var da = 0L; var db = 0L
      (0 until 16).foreach { i =>
        da |= ((z >> (2 * i + 1)) & 1L) << i
        db |= ((z >> (2 * i)) & 1L) << i
      }
      assert(da == a && db == b, s"deinterleave($z) != ($a,$b)")
      assert(z >= 0 && z < (1L << 32))
    }
  }

  test("clusterByZ: output partitions cover disjoint z ranges (file-skipping layout)") {
    val tr = Transcripts.synthetic(spark, nConv = 40).toDF()
    val parts = Layout.clusterByZ(tr, numFiles = 8)
      .select("z").rdd
      .mapPartitionsWithIndex { (pid, it) =>
        val zs = it.map(_.getLong(0)).toArray
        if (zs.isEmpty) Iterator.empty
        else Iterator((pid, zs.min, zs.max, zs.sameElements(zs.sorted)))
      }.collect().sortBy(_._2)
    assert(parts.nonEmpty)
    assert(parts.forall(_._4), "rows sorted by z within every partition")
    parts.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._2,
        s"z ranges overlap: ${a} vs ${b}")
      case _ =>
    }
  }
}
