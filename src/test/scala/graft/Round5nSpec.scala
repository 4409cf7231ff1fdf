package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{Intervals, SeriesOps, Similarity, TextAnalysis}
import graft.sources.Transcripts

/** Interval joins, concurrency, Haar energy, Granger screen, k-anonymity. */
class Round5nSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val tr: DataFrame = {
    import spark.implicits._
    Transcripts.synthetic(spark, nConv = 30).toDF()
  }
  private val gap = 1800000L

  test("intervalJoin: every tool event lands in exactly one session; counts conserve") {
    val sessions = SeriesOps.sessionize(tr, gap)
    val ledger = Intervals.intervalJoin(tr, gap).cache()
    // sessions partition the conversation: ledger rows == session rows
    assert(ledger.count() == sessions.count())
    // conservation: joined tool events == raw tool events (1:1, no loss,
    // no amplification from the range predicate)
    val total = ledger.agg(sum("n_tool_events")).head.getLong(0)
    assert(total == tr.filter(col("tool").isNotNull).count())
    // first_tool is the (ts, turn_idx)-earliest tool of the session
    val brute = tr.filter(col("tool").isNotNull)
      .withColumn("sess_probe", lit(1))
    assert(ledger.filter(col("n_tool_events") > 0 && col("first_tool").isNull)
      .isEmpty)
    assert(ledger.filter(col("n_tools") > col("n_tool_events")).isEmpty)
  }

  test("concurrency: started and ended both sum to the session count; active bounded by it") {
    val nSess = SeriesOps.sessionize(tr, gap).count()
    val c = Intervals.concurrency(tr, gap).cache()
    val agg = c.agg(sum("started"), sum("ended"), max("active")).head
    assert(agg.getLong(0) == nSess, "every session starts exactly once")
    assert(agg.getLong(1) == nSess, "every session ends exactly once")
    assert(agg.getLong(2) <= nSess)
    // coverage telescopes: Σ active = Σ per-session bucket span
    val spans = SeriesOps.sessionize(tr, gap)
      .select((floor(col("end_ms") / 3600000L) -
        floor(col("start_ms") / 3600000L) + 1).as("nb"))
      .agg(sum("nb")).head.getLong(0)
    assert(c.agg(sum("active")).head.getLong(0) == spans)
  }

  test("haarEnergy: Parseval holds exactly; shorter-than-8 series are skipped") {
    val m = tr.withColumn("text_len", length(col("text")).cast("double"))
    val h = SeriesOps.haarEnergy(m, "text_len").cache()
    val eligible = m.groupBy("conv_id").count().filter(col("count") >= 8).count()
    assert(h.count() == eligible)
    // exact: all quantities are integer/2^k — no tolerance needed
    assert(h.filter(col("ea") + col("e3") + col("e2") + col("e1")
      =!= col("total_sq")).isEmpty, "Parseval violated")
    assert(h.filter(col("ea") < 0 || col("e1") < 0 || col("e2") < 0 ||
      col("e3") < 0).isEmpty)
  }

  test("grangerScreen: a planted user→assistant dependency scores near-total r2 gain") {
    import spark.implicits._
    // y_t (assistant) = x_{t-1} (preceding user turn length), u useless
    val rows = (0 until 40).flatMap { i =>
      val userLen = 10 + (i * 37) % 90
      Seq(
        ("planted", 2 * i, "user", "u" * userLen, null: String,
          java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 3}%02d:${(i * 7) % 60}%02d")),
        ("planted", 2 * i + 1, "assistant", "a" * (userLen + i % 3), null: String,
          java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 3}%02d:${(i * 7) % 60 + 1}%02d")))
    }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val g = SeriesOps.grangerScreen(rows).collect()
    assert(g.length == 1)
    val r = g.head
    assert(r.getAs[Double]("r2_gain") > 0.95,
      s"planted dependency scored ${r.getAs[Double]("r2_gain")}")
    assert(r.getAs[Double]("f_stat") > 10.0)
  }

  test("embDrift: identical halves score cosine 1; opposite halves score -1") {
    import spark.implicits._
    val base = (0 until 64).map(i => ((i % 7) - 3) * 0.01f).toArray
    val neg = base.map(-_)
    val rows = (0 until 20).map { i =>
      // label 0: both parities share `base` → drift 1.0
      // label 1: odd parity is the negation → drift -1.0
      val lab = (i / 2) % 2
      val v = if (lab == 0 || i % 2 == 0) base else neg
      (i.toLong, v, lab)
    }.toDF("vec_id", "embedding", "label")
    val d = Similarity.embDrift(rows).collect()
      .map(r => r.getInt(0) -> r.getAs[Double]("drift_cos")).toMap
    assert(d(0) == 1.0 && d(1) == -1.0, d.toString)
  }

  test("kAnonymity: suppress flag is exactly k < kMin; group sizes conserve rows") {
    val ka = TextAnalysis.kAnonymity(tr, kMin = 5L).cache()
    assert(ka.agg(sum("k")).head.getLong(0) == tr.count())
    assert(ka.filter((col("k") < 5) =!= col("suppress")).isEmpty)
    assert(ka.filter(col("len_bucket") > 15 || col("len_bucket") < 0).isEmpty)
  }
}
