package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Som

/** Batch-SOM kernel semantics (operators/Som.scala; reference
  * src/kohonen_som.cpp RcppBatchSupersom + R/api_som.R Bayes estimate):
  * hand-worked one-epoch update, BMU determinism, both Bayes posterior
  * paths (k≥2 smoothing vs k<2 prior passthrough), clean-sample tags,
  * and the undersample budget.
  */
class SomSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val grid2 = Som.Grid(2, 1) // two neurons, grid distance 1

  test("grid geometry: x-fastest ids, integer squared distances") {
    val g = Som.Grid(3, 3)
    assert(g.xOf(1) == 1 && g.yOf(1) == 1)
    assert(g.xOf(4) == 1 && g.yOf(4) == 2) // id 4 starts row 2
    assert(g.dist2(1, 3) == 4 && g.dist2(1, 9) == 8 && g.dist2(5, 5) == 0)
  }

  test("radius decays linearly and weights are quantized symmetric gaussians") {
    assert(Som.radius(0, 2, 1.5, 1.0) == 1.5)
    assert(Som.radius(1, 2, 1.5, 1.0) == 1.25)
    val w = Som.weights(Som.Grid(3, 3), 0, 2, 1.5, 1.0)
    assert(w(0)(0) == 1.0)
    // symmetric, decreasing in distance, 6-decimal quantized
    assert(w(0)(2) == w(2)(0) && w(0)(2) < w(0)(1))
    assert(w(0)(1) == math.rint(math.exp(-1.0 / (2 * 1.5 * 1.5)) * 1e6 + 1e-3) / 1e6)
  }

  test("one batch epoch on 2 neurons matches the hand-worked update") {
    // samples: two tight groups around 0 and 10; init codes = first two ids
    val pred = Seq(
      ("s1", 1, Seq(0.0)), ("s2", 1, Seq(10.0)),
      ("s3", 1, Seq(1.0)), ("s4", 2, Seq(11.0))
    ).toDF("sample_id", "label", "v")
    val codes = Som.train(pred, grid2, epochs = 1, r0 = 1.0, r1 = 1.0)
    // BMU: {s1,s3}→code1 (0.0), {s2,s4}→code2 (10.0); sums S1=1, n1=2,
    // S2=21, n2=2; w = [[1, g],[g, 1]] with g = exp(-1/2) quantized
    val g = Som.weights(grid2, 0, 1, 1.0, 1.0)(0)(1)
    val c1 = (1.0 * 1.0 + g * 21.0) / (2.0 + 2.0 * g)
    val c2 = (g * 1.0 + 1.0 * 21.0) / (2.0 * g + 2.0)
    def q4(x: Double) = new java.math.BigDecimal(x + 1e-9)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue
    assert(codes(0)(0) == q4(c1) && codes(1)(0) == q4(c2))
  }

  test("assign: lowest-id tie break, equidistant sample") {
    val pred = Seq(("s1", 1, Seq(5.0))).toDF("sample_id", "label", "v")
    val codes = Array(Array(0.0), Array(10.0)) // both at distance 5
    val got = Som.assign(pred, codes).select("id_neuron").head().getInt(0)
    assert(got == 1)
  }

  test("bayes posterior: k>=2 shrinks toward neighborhood mean, k<2 keeps prior") {
    // 3x3 grid, radius 2: neuron 1 has neighbors {3, 7}; neuron 5 has none
    val g = Som.Grid(3, 3)
    val labelled = Seq(
      (1, 1, 8L, 0.8), (1, 2, 2L, 0.2),
      (3, 1, 5L, 0.5), (3, 2, 5L, 0.5),
      (7, 1, 9L, 0.9), (7, 2, 1L, 0.1),
      (5, 1, 4L, 1.0)
    ).toDF("id_neuron", "label", "cnt", "prior_prob")
    val post = Som.bayesPosterior(labelled, g, radius = 2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4)).toMap
    // neuron 5: no neighbors at dist^2=4 → posterior == prior
    assert(post((5, 1)) == 1.0)
    // neuron 1 label 1: neighbors' priors {0.5, 0.9} → mean .7, var .08,
    // eta = |0.9999999 - 0.8|; post = v/(eta+v)*.8 + eta/(eta+v)*.7
    val eta = math.abs(0.9999999 - 0.8)
    val v = 0.08
    val expect = v / (eta + v) * 0.8 + eta / (eta + v) * 0.7
    assert(math.abs(post((1, 1)) - expect) < 1e-12)
  }

  test("cleanSamples tags and undersample budget") {
    val mapped = Seq(
      ("a", 1, 1, 0.0), ("b", 1, 1, 0.0), ("c", 2, 1, 0.0), ("d", 1, 2, 0.0)
    ).toDF("sample_id", "label", "id_neuron", "dist")
    val post = Seq(
      (1, 1, 2L, 0.7, 0.65), // clean
      (1, 2, 1L, 0.7, 0.40), // analyze (prior>=T, post<T)
      (2, 1, 1L, 0.3, 0.90)  // remove (prior<T)
    ).toDF("id_neuron", "label", "cnt", "prior_prob", "post_prob")
    val tags = Som.cleanSamples(mapped, post, 0.6, 0.6)
      .collect().map(r => r.getString(0) -> r.getString(5)).toMap
    assert(tags == Map("a" -> "clean", "b" -> "clean", "c" -> "analyze", "d" -> "remove"))
    val under = Som.undersample(mapped, n = 1).collect()
    assert(under.length == 2) // one per neuron, smallest sample_id first
    assert(under.map(_.getString(0)).toSet == Set("a", "d"))
  }

  test("reduceImbalance: under-classes SOM-capped, over-classes filled to target, mid kept") {
    // class 1: 40 samples in two tight value groups (≥ nUnder=30 → SOM);
    // class 2: 3 samples (≤ nOver=6 → SMOTE to 6); class 3: 8 (pass-through)
    val rows =
      (0 until 40).map(i => (f"a$i%02d", 1, Seq((i % 2) * 100.0 + i / 2.0))) ++
        Seq(("b0", 2, Seq(0.0)), ("b1", 2, Seq(4.0)), ("b2", 2, Seq(10.0))) ++
        (0 until 8).map(i => (f"c$i%01d", 3, Seq(50.0 + i)))
    val pred = rows.toDF("sample_id", "label", "v")
    val out = graft.operators.Imbalance.reduceImbalance(pred,
      nOver = 6, nUnder = 30).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getString(0), r.getDouble(3)))
    val bySrc = out.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    // d = ceil(sqrt(30/4)) = 3 → 9 neurons × 4 ≤ 36; 40 samples in 2 value
    // clusters land on few neurons → a real cap well below 40
    assert(bySrc((1, "under")) <= 36 && bySrc((1, "under")) < 40)
    assert(bySrc((2, "orig")) == 3 && bySrc((2, "synth")) == 3)
    assert(bySrc((3, "keep")) == 8)
    assert(!bySrc.contains((1, "orig")) && !bySrc.contains((3, "synth")))
    // synthetic rep 1: midpoints toward each sample's nearest in-class
    // neighbor — b0↔b1 midpoint 2.0 (both directions), b2→b1 midpoint 7.0
    val synth = out.filter(t => t._2 == "synth").map(t => t._3 -> t._4).toMap
    assert(synth == Map("b0:s1" -> 2.0, "b1:s1" -> 2.0, "b2:s1" -> 7.0))
  }
}
