package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{SeriesMining, SeriesOps, Summary}

/** Round-5 series-mining additions: top-1 motif, Mann-Kendall trend,
  * gaps-and-islands streaks, Spearman rank trend, ordinal patterns,
  * role-transition matrix, grouped-count Gini — kernel oracles on
  * hand-computed fixtures (the driver's DuckDB replay covers the e2e
  * relation at sf scale).
  */
class Round5cSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val h0 = 1704067200000L // 2024-01-01T00:00:00Z
  private def tsAt(sec: Long) = new java.sql.Timestamp(h0 + sec * 1000)

  private def metricSeries(vals: Seq[Double]) =
    vals.zipWithIndex.map { case (v, i) =>
      ("a", tsAt(i * 60L), i, v)
    }.toDF("conv_id", "ts", "turn_idx", "value")

  test("motif: the repeated shape wins at dist2 = 0; overlap excluded; first pair on ties") {
    // idx 1..8, values 1,2,1,9,1,2,1,5; w = 2. Windows (1,2) at pos 1
    // and pos 5 are identical -> dist2 = 0, and (1,3)/(5,7) share value
    // 1 but differ in the second step. Smallest (pos_a, pos_b) first.
    val day = Seq(1.0, 2, 1, 9, 1, 2, 1, 5).zipWithIndex
      .map { case (v, i) => ("a", i + 1, v) }
      .toDF("conv_id", "idx", "value")
    val r = SeriesMining.motif(day, w = 2).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 8 && row.getInt(2) == 1 &&
      row.getInt(3) == 5 && row.getLong(4) == 0L, row.toString)
  }

  test("motif: series shorter than 2w emit nothing") {
    val day = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0))
      .toDF("conv_id", "idx", "value")
    assert(SeriesMining.motif(day, w = 2).count() == 0)
  }

  test("mannKendall: exact rational day means — integer cross-multiplication catches a tie a float mean could miss") {
    // day means 1, 2, 2, 3 as (s, c) pairs with different denominators:
    // (2,2), (4,2), (6,3), (3,1). Pairs i<j: 5 increasing, 1 tie
    // ((4,2) vs (6,3): 6*2 == 4*3). S = 5, direction increasing.
    val day = Seq(("a", 1, 2L, 2L), ("a", 2, 4L, 2L), ("a", 3, 6L, 3L),
      ("a", 4, 3L, 1L)).toDF("conv_id", "idx", "s", "c")
    val r = SeriesMining.mannKendall(day).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getLong(1) == 4 && row.getLong(2) == 5 &&
      row.getLong(3) == 0 && row.getLong(4) == 1 &&
      row.getLong(5) == 5 && row.getString(6) == "increasing",
      row.toString)
  }

  test("mannKendall: strictly falling means -> decreasing; single day emits nothing") {
    val day = Seq(("a", 1, 9L, 3L), ("a", 2, 4L, 2L), ("a", 3, 1L, 1L),
      ("b", 1, 5L, 1L)).toDF("conv_id", "idx", "s", "c")
    val out = SeriesMining.mannKendall(day).collect()
    assert(out.length == 1 && out(0).getString(0) == "a")
    assert(out(0).getLong(5) == -3 && out(0).getString(6) == "decreasing")
  }

  test("streaks: islands by idx - row_number; longest tie -> earliest start") {
    // conv a: days 1,2,3 | 5,6 | 9  -> 3 streaks, longest 3 @ 1
    // conv b: days 1,2 | 5,6        -> tie of 2s, earliest start 1
    val day = (Seq(1, 2, 3, 5, 6, 9).map(("a", _)) ++
      Seq(1, 2, 5, 6).map(("b", _))).toDF("conv_id", "idx")
    val m = SeriesOps.streaks(day).collect()
      .map(r => r.getString(0) -> r).toMap
    val a = m("a")
    assert(a.getLong(1) == 6 && a.getLong(2) == 3 && a.getLong(3) == 3 &&
      a.getInt(4) == 1, a.toString)
    val b = m("b")
    assert(b.getLong(1) == 4 && b.getLong(2) == 2 && b.getLong(3) == 2 &&
      b.getInt(4) == 1, b.toString)
  }

  test("spearmanTrend: monotone series hit ±1; doubled average ranks keep ties exact") {
    // values 1,2,3 -> rho 1; 3,1,2 -> Pearson((3,1,2),(1,2,3)) = -0.5;
    // ties 1,1,2 -> doubled ranks (3,3,6) vs (2,4,6): 6/sqrt(6*8) = .866
    val df = (Seq(1.0, 2, 3).zipWithIndex.map { case (v, i) =>
      ("up", tsAt(i * 60L), i, v) } ++
      Seq(3.0, 1, 2).zipWithIndex.map { case (v, i) =>
        ("mix", tsAt(i * 60L), i, v) } ++
      Seq(1.0, 1, 2).zipWithIndex.map { case (v, i) =>
        ("tie", tsAt(i * 60L), i, v) })
      .toDF("conv_id", "ts", "turn_idx", "value")
    val m = SeriesOps.spearmanTrend(df).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("up") == 1.0 && m("mix") == -0.5 && m("tie") == 0.866, m)
  }

  test("spearmanTrend: constant series (zero rank variance) and n<3 are excluded") {
    val df = (Seq(5.0, 5, 5).zipWithIndex.map { case (v, i) =>
      ("const", tsAt(i * 60L), i, v) } ++
      Seq(1.0, 2).zipWithIndex.map { case (v, i) =>
        ("short", tsAt(i * 60L), i, v) })
      .toDF("conv_id", "ts", "turn_idx", "value")
    assert(SeriesOps.spearmanTrend(df).count() == 0)
  }

  test("ordinalPatterns: rank-vector classification of all strict triples; any tie -> n_tied") {
    // values 1,2,3,1,5,1,2: triples
    //  (1,2,3) p123 | (2,3,1) p231 | (3,1,5) p213 | (1,5,1) tie (a==c)
    //  (5,1,2) p312
    val out = SeriesOps.ordinalPatterns(
      metricSeries(Seq(1, 2, 3, 1, 5, 1, 2))).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 5, r.toString) // n_triples
    assert(r.getLong(2) == 1 && r.getLong(3) == 0 && r.getLong(4) == 1 &&
      r.getLong(5) == 1 && r.getLong(6) == 1 && r.getLong(7) == 0 &&
      r.getLong(8) == 1, r.toString)
  }

  test("ordinalPatterns: p132 and p321 fixtures") {
    // (1,3,2): v1 rank 1, v2 rank 3, v3 rank 2 -> p132
    // (3,2,1): strictly decreasing -> p321
    val out = SeriesOps.ordinalPatterns(metricSeries(Seq(1, 3, 2)))
      .union(SeriesOps.ordinalPatterns(
        metricSeries(Seq(3, 2, 1)))).collect()
    assert(out.map(_.getLong(3)).sum == 1) // one p132
    assert(out.map(_.getLong(7)).sum == 1) // one p321
  }

  test("roleTransitions: per-from-role exact rational shares over adjacent pairs") {
    // conv a: u,a,u,a -> u->a, a->u, u->a ; conv b: u,u,a -> u->u, u->a
    // from u: u->a 3 (0.75), u->u 1 (0.25); from a: a->u 1 (1.0)
    val t = (Seq("u", "a", "u", "a").zipWithIndex.map { case (r, i) =>
      ("a", tsAt(i * 60L), i, r) } ++
      Seq("u", "u", "a").zipWithIndex.map { case (r, i) =>
        ("b", tsAt(i * 60L), i, r) })
      .toDF("conv_id", "ts", "turn_idx", "role")
    val m = SeriesOps.roleTransitions(t).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(m(("u", "a")) == ((3L, 0.75)) && m(("u", "u")) == ((1L, 0.25))
      && m(("a", "u")) == ((1L, 1.0)), m)
  }

  test("giniCounts: grouped-by-count reconstruction equals the classic rank formula; equal counts -> 0") {
    // counts 1,1,2 sorted: sum rank*x = 1+2+6 = 9;
    // G = (2*9 - 4*4)/(3*4) = 2/12 = 0.1667
    val df = Seq("x", "y", "z", "z").toDF("k")
    val r = Summary.giniCounts(df, col("k")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 4 &&
      r.getDouble(2) == 0.1667, r.toString)
    val eq = Seq("x", "x", "y", "y").toDF("k")
    assert(Summary.giniCounts(eq, col("k")).collect()(0)
      .getDouble(2) == 0.0)
  }
}
