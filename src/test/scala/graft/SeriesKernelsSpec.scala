package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SeriesKernels._

class SeriesKernelsSpec extends AnyFunSuite {
  val NaN = Double.NaN

  private def assveq(a: Array[Double], b: Array[Double], tol: Double = 1e-12): Unit = {
    assert(a.length == b.length, s"${a.toSeq} vs ${b.toSeq}")
    a.zip(b).foreach { case (x, y) =>
      if (x.isNaN) assert(y.isNaN) else assert(math.abs(x - y) <= tol, s"${a.toSeq} vs ${b.toSeq}")
    }
  }

  // -- impute_linear semantics (linear_interp.cpp:25-113) --

  test("interior linear gap") {
    assveq(imputeLinear(Array(1, NaN, NaN, NaN, 5)), Array(1, 2, 3, 4, 5))
  }
  test("leading back-fill, trailing LOCF") {
    assveq(imputeLinear(Array(NaN, NaN, 3, NaN, 7, NaN)), Array(3, 3, 3, 5, 7, 7))
  }
  test("all-NaN stays all-NaN; empty ok; no-NaN identity") {
    assert(imputeLinear(Array(NaN, NaN)).forall(_.isNaN))
    assert(imputeLinear(Array[Double]()).isEmpty)
    assveq(imputeLinear(Array(1, 2, 3)), Array(1, 2, 3))
  }
  test("single valid value broadcasts") {
    assveq(imputeLinear(Array(NaN, 4, NaN)), Array(4, 4, 4))
  }
  test("idempotent on random series") {
    val rnd = new java.util.Random(1)
    (1 to 100).foreach { _ =>
      val v = Array.fill(rnd.nextInt(50))(if (rnd.nextBoolean()) NaN else rnd.nextInt(10).toDouble)
      val once = imputeLinear(v)
      assveq(imputeLinear(once.clone()), once)
    }
  }

  // -- t_* reductions as coded in reduce_fns.cpp --

  val v = Array(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)

  test("t_mean/max/min/amplitude/median") {
    assert(tMean(v) == 5.0); assert(tMax(v) == 9.0); assert(tMin(v) == 2.0)
    assert(tAmplitude(v) == 7.0); assert(tMedian(v) == 4.5)
    assert(tMedian(Array(1.0, 2.0, 9.0)) == 2.0)
  }
  test("t_std is sample stddev (/(n-1))") {
    assert(math.abs(tStd(v) - math.sqrt(32.0 / 7.0)) < 1e-12)
    assert(tStd(Array(3.0)).isNaN)
  }
  test("t_skewness reproduces the coded quirk factor sqrt(n(n-1))/n - 2") {
    val n = v.length
    val adj = math.sqrt((n * (n - 1)).toDouble) / n - 2.0 // = -1.064...
    val m = 5.0
    val m3 = v.map(x => math.pow(x - m, 3)).sum / n
    val s = math.pow(v.map(x => (x - m) * (x - m)).sum / n, 1.5)
    assert(math.abs(tSkew(v) - m3 / s * adj) < 1e-12)
    assert(adj < 0) // the quirk: factor is negative, sign flips vs textbook
  }
  test("t_kurtosis is n·Σd⁴/(Σd²)² (Pearson)") {
    val m = 5.0
    val m4 = v.map(x => math.pow(x - m, 4)).sum
    val m2 = math.pow(v.map(x => (x - m) * (x - m)).sum, 2)
    assert(math.abs(tKurt(v) - v.length * m4 / m2) < 1e-12)
  }
  test("t_fslope = max |first difference|") {
    assert(tFslope(Array(1.0, 3.0, 2.0, 8.0)) == 6.0)
    assert(tFslope(Array(1.0)).isNaN)
  }
  test("arma quantile (Hyndman-Fan type 5)") {
    // R: quantile(c(1,2,3,4), type=5) → 25%: 1.5, 75%: 3.5
    val x = Array(1.0, 2.0, 3.0, 4.0)
    assert(tQuantileArma(x, 0.25) == 1.5)
    assert(tQuantileArma(x, 0.75) == 3.5)
    assert(tQuantileArma(x, 0.5) == 2.5)
    // odd n: quantile(c(10,20,30), .25, type=5) = 12.5
    assert(tQuantileArma(Array(10.0, 20.0, 30.0), 0.25) == 12.5)
    assert(tIqr(x) == 2.0)
  }
  test("t_mse: DFT energy mean; Parseval check vs direct") {
    val x = Array(1.0, 2.0, 3.0, 4.0, 3.0, 1.0)
    // Parseval: mean(|FFT|²) = Σx² (since Σ|X_k|² = n·Σx²)
    assert(math.abs(tMse(x) - x.map(a => a * a).sum) < 1e-9)
  }

  // -- smoothers --

  test("whittaker matches dense solve of (I + λ D2'D2) z = y") {
    val rnd = new java.util.Random(3)
    for (n <- Seq(3, 4, 5, 8, 30); lambda <- Seq(0.5, 2.0, 25.0)) {
      val y = Array.fill(n)(rnd.nextDouble() * 10)
      val z = whittaker(y, lambda)
      // dense A
      val a = Array.ofDim[Double](n, n)
      for (i <- 0 until n) a(i)(i) = 1.0
      for (r <- 0 until n - 2) {
        val c = Array(1.0, -2.0, 1.0)
        for (p <- 0 to 2; q <- 0 to 2) a(r + p)(r + q) += lambda * c(p) * c(q)
      }
      // check A z ≈ y
      for (i <- 0 until n) {
        val ri = (0 until n).map(j => a(i)(j) * z(j)).sum
        assert(math.abs(ri - y(i)) < 1e-8, s"n=$n λ=$lambda row $i")
      }
    }
  }

  test("sgolay quadratic/cubic k=2 gives classic coefficients [-3,12,17,12,-3]/35") {
    val c = sgolayCoef(3, 2)
    val expect = Array(-3.0, 12.0, 17.0, 12.0, -3.0).map(_ / 35.0)
    assveq(c, expect, 1e-10)
  }
  test("sgolay preserves polynomials up to its order") {
    val y = Array.tabulate(20)(i => 0.5 * i * i - 3 * i + 2.0) // quadratic
    val sm = sgolay(y, order = 3, k = 2)
    (2 until 18).foreach(i => assert(math.abs(sm(i) - y(i)) < 1e-9))
  }

  test("dtw: identity = 0, known small example, symmetry") {
    assert(dtw(Array(1.0, 2.0, 3.0), Array(1.0, 2.0, 3.0)) == 0.0)
    val d1 = dtw(Array(0.0, 1.0, 2.0), Array(0.0, 2.0))
    val d2 = dtw(Array(0.0, 2.0), Array(0.0, 1.0, 2.0))
    assert(math.abs(d1 - d2) < 1e-12)
    assert(d1 > 0)
  }

  test("windowed mean with mirrored edges (locus_mirror: edge repeats)") {
    val out = windowed(Array(1.0, 2.0, 3.0), 1, a => a.sum / a.length)
    // kernel.cpp:8-19: mirror(-1)=0, mirror(3)=2 →
    // [x0,x0,x1]=[1,1,2]→4/3 ; [1,2,3]→2 ; [2,3,3]→8/3
    assveq(out, Array(4.0 / 3, 2.0, 8.0 / 3))
  }
  test("windowed ignores NaN") {
    val out = windowed(Array(1.0, NaN, 3.0), 1, a => a.sum / a.length)
    // [x0,x0,NaN]→1 ; [1,NaN,3]→2 ; [NaN,3,3]→3
    assveq(out, Array(1.0, 2.0, 3.0))
  }
  test("nnls matches brute-force best active set (all 2^n subsets)") {
    val rnd = new java.util.Random(7)
    def solve(aSub: Array[Array[Double]], b: Array[Double]): Array[Double] = {
      // unconstrained LS via normal equations (tiny)
      val m = aSub.length; val n = aSub(0).length
      val g = Array.tabulate(n, n)((p, q) => (0 until m).map(i => aSub(i)(p) * aSub(i)(q)).sum)
      val rhs = Array.tabulate(n)(p => (0 until m).map(i => aSub(i)(p) * b(i)).sum)
      // Gaussian elimination
      val a2 = g.map(_.clone()); val b2 = rhs.clone()
      for (c <- 0 until n) {
        val piv = (c until n).maxBy(r => math.abs(a2(r)(c)))
        val t = a2(c); a2(c) = a2(piv); a2(piv) = t
        val tb = b2(c); b2(c) = b2(piv); b2(piv) = tb
        for (r <- c + 1 until n) {
          val f = a2(r)(c) / a2(c)(c)
          for (c2 <- c until n) a2(r)(c2) -= f * a2(c)(c2)
          b2(r) -= f * b2(c)
        }
      }
      val x = new Array[Double](n)
      for (i <- n - 1 to 0 by -1) {
        var s = b2(i)
        for (j <- i + 1 until n) s -= a2(i)(j) * x(j)
        x(i) = s / a2(i)(i)
      }
      x
    }
    def rss(a: Array[Array[Double]], x: Array[Double], b: Array[Double]): Double =
      (0 until a.length).map { i =>
        val d = b(i) - (0 until x.length).map(j => a(i)(j) * x(j)).sum; d * d
      }.sum
    for (_ <- 0 until 50) {
      val m = 4; val n = 3
      val a = Array.fill(m, n)(rnd.nextDouble())
      val b = Array.fill(m)(rnd.nextDouble() * 2 - 0.5)
      val x = nnls(a, b)
      assert(x.forall(_ >= 0))
      // brute force: best feasible solution over all active subsets
      var best = rss(a, new Array[Double](n), b)
      for (mask <- 1 until (1 << n)) {
        val idx = (0 until n).filter(j => (mask & (1 << j)) != 0).toArray
        val aSub = a.map(row => idx.map(row))
        val z = solve(aSub, b)
        if (z.forall(_ >= -1e-12)) {
          val full = new Array[Double](n)
          idx.zipWithIndex.foreach { case (j, p) => full(j) = math.max(z(p), 0) }
          best = math.min(best, rss(a, full, b))
        }
      }
      assert(rss(a, x, b) <= best + 1e-8,
        s"nnls rss ${rss(a, x, b)} vs brute $best")
    }
  }

  test("bayts: confirm after Bayesian accumulation; reject on drop") {
    // p = [0.1, 0.9, 0.9]: flag at t=1 (pchange = pbayes(0.1,0.9) = 0.5),
    // t=2: pbayes(0.5, 0.9) = 0.9 ≥ chi → confirmed at index 2
    assert(baytsDetect(Array(0.1, 0.9, 0.9), 0.5, 0.9) == 2)
    // drop below 0.5 posterior rejects the run → no change
    assert(baytsDetect(Array(0.1, 0.9, 0.1, 0.2), 0.5, 0.9) == -1)
    // all-forest series: nothing flagged
    assert(baytsDetect(Array(0.1, 0.2, 0.1), 0.5, 0.9) == -1)
  }
  test("bayts pbayes matches reference 1e15 truncation formula") {
    assert(pbayes(0.5, 0.9) == math.floor((0.45 / 0.5) * 1e15) / 1e15)
  }
  test("baytsNf clamps and fuses bands") {
    // single band, x exactly at NF mean → pNF/(pNF+pF) > 0.5, clamped ≤ 0.9
    val p = baytsNf(Array(Array(10.0)), Array(0.0), Array(1.0), Array(10.0), Array(1.0))
    assert(p(0) == 0.9) // pF≈0 → pcond≈1 → clamped to bwf1
    val q = baytsNf(Array(Array(0.0)), Array(0.0), Array(1.0), Array(10.0), Array(1.0))
    assert(q(0) == 0.1) // pNF≈0 → floor at bwf0
  }

  test("mirror matches reference locus_mirror table") {
    // locus_mirror(size=4, leg=2) = [1,0, 0,1,2,3, 3,2] (kernel.cpp:8-19)
    assert((-2 to 5).map(mirror(_, 4)) == Seq(1, 0, 0, 1, 2, 3, 3, 2))
  }
}
