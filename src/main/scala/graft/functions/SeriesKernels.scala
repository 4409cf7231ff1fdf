package graft.functions

/** Pure-Scala per-series kernels transcribing the reference's C++ math
  * *as coded* (not as the textbook formula) — these are both the engine's
  * mapGroups kernels and the unit-test oracles (SURVEY.md §5).
  * NaN plays the role of R's NA.
  */
object SeriesKernels {

  /** impute_linear (/root/reference/src/linear_interp.cpp:25-113):
    * leading back-fill, interior linear by index, trailing LOCF; all-NaN in →
    * all-NaN out. Single pass, O(n). Mutates and returns a copy.
    */
  def imputeLinear(in: Array[Double]): Array[Double] =
    imputeLinearInPlace(in.clone())

  /** Allocation-free variant: mutates and returns `x` (the tier-pipeline
    * hot path fills ~10^8 grid slots per task batch; the defensive clone
    * doubled its memory traffic).
    */
  def imputeLinearInPlace(x: Array[Double]): Array[Double] = {
    val n = x.length
    var curr = 0
    while (curr < n && x(curr).isNaN) curr += 1
    if (curr == n) return x // all-NaN
    var k = 0
    while (k < curr) { x(k) = x(curr); k += 1 } // leading back-fill
    var i = curr
    while (i < n) {
      // i points at a non-NaN; find next NaN run
      var numToNa = i
      while (numToNa + 1 < n && !x(numToNa + 1).isNaN) numToNa += 1
      if (numToNa + 1 >= n) return x
      var naToNum = numToNa + 1
      while (naToNum < n && x(naToNum).isNaN) naToNum += 1
      if (naToNum >= n) { // trailing LOCF
        val v = x(numToNa)
        var j = numToNa + 1
        while (j < n) { x(j) = v; j += 1 }
        return x
      }
      val gaps = naToNum - numToNa
      val base = x(numToNa)
      val target = x(naToNum)
      var step = 1
      var j = numToNa + 1
      while (j < naToNum) {
        // exact operand order of linear_interp.cpp:20-22
        x(j) = base + (step * (target - base) / gaps)
        step += 1; j += 1
      }
      i = naToNum
    }
    x
  }

  // ---- t_* temporal reductions (/root/reference/src/reduce_fns.cpp) ----

  def tMax(v: Array[Double]): Double = v.max
  def tMin(v: Array[Double]): Double = v.min
  def tMean(v: Array[Double]): Double = v.sum / v.length

  /** arma::median: even n → mean of the two middle order statistics. */
  def tMedian(v: Array[Double]): Double = {
    val s = v.sorted; val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** arma::stddev(norm_type=0) = sample stddev, /(n-1) (reduce_fns.cpp:32-34). */
  def tStd(v: Array[Double]): Double = {
    val n = v.length
    if (n < 2) return Double.NaN
    val m = tMean(v)
    math.sqrt(v.map(x => (x - m) * (x - m)).sum / (n - 1))
  }

  /** t_skewness *as coded* (reduce_fns.cpp:37-49): population m3/m2^1.5 times
    * the quirky factor  sqrt(n(n-1))/n - 2  (precedence as written).
    */
  def tSkew(v: Array[Double]): Double = {
    val n = v.length
    val adj = math.sqrt((n * (n - 1)).toDouble) / n - 2.0
    val m = tMean(v)
    val m3 = v.map(x => math.pow(x - m, 3)).sum / n
    val s = math.pow(v.map(x => (x - m) * (x - m)).sum / n, 1.5)
    m3 / s * adj
  }

  /** t_kurtosis (reduce_fns.cpp:52-60): n·Σd⁴ / (Σd²)² — Pearson, not excess. */
  def tKurt(v: Array[Double]): Double = {
    val n = v.length
    val m = tMean(v)
    val m4 = v.map(x => math.pow(x - m, 4)).sum
    val m2sq = { val s2 = v.map(x => (x - m) * (x - m)).sum; s2 * s2 }
    n * m4 / m2sq
  }

  def tAmplitude(v: Array[Double]): Double = v.max - v.min

  /** max |first difference| (reduce_fns.cpp:68-70). NaN for n<2. */
  def tFslope(v: Array[Double]): Double = {
    if (v.length < 2) return Double.NaN
    var mx = Double.NegativeInfinity
    var i = 1
    while (i < v.length) { val d = math.abs(v(i) - v(i - 1)); if (d > mx) mx = d; i += 1 }
    mx
  }

  /** arma::quantile — Hyndman & Fan definition 5 (reduce_fns.cpp:79-92):
    * h = n·p + 0.5; x[⌈h-0.5⌉] interpolated.
    */
  def tQuantileArma(v: Array[Double], p: Double): Double = {
    val s = v.sorted; val n = s.length
    if (n == 1) return s(0)
    val h = n * p + 0.5 // 1-based fractional rank
    if (h <= 1.0) return s(0)
    if (h >= n.toDouble) return s(n - 1)
    val lo = math.floor(h).toInt
    val frac = h - lo
    s(lo - 1) + frac * (s(lo) - s(lo - 1))
  }
  def tFqr(v: Array[Double]): Double = tQuantileArma(v, 0.25)
  def tTqr(v: Array[Double]): Double = tQuantileArma(v, 0.75)
  def tIqr(v: Array[Double]): Double = tTqr(v) - tFqr(v)

  /** t_mse (reduce_fns.cpp:73-76): mean |FFT(series)|² (spectral energy).
    * Naive O(n²) DFT — series are short (≤ timeline length); exactness over
    * speed, and it runs inside a distributed aggregator anyway.
    */
  def tMse(v: Array[Double]): Double = {
    val n = v.length
    var acc = 0.0
    var k = 0
    while (k < n) {
      var re = 0.0; var im = 0.0
      var t = 0
      while (t < n) {
        val ang = -2.0 * math.Pi * k * t / n
        re += v(t) * math.cos(ang); im += v(t) * math.sin(ang)
        t += 1
      }
      acc += re * re + im * im
      k += 1
    }
    acc / n
  }

  // ---- smoothers (/root/reference/src/smooth_whit.cpp, smooth_sgp.cpp) ----

  /** Whittaker 2nd-difference penalized smoother (smooth_whit.cpp:20-81):
    * solves (I + λ·D₂ᵀD₂) z = y per series via banded (pentadiagonal)
    * Cholesky — O(n) forward/back substitution, as in the reference.
    */
  def whittaker(y: Array[Double], lambda: Double): Array[Double] = {
    val n = y.length
    if (n < 3) return y.clone()
    // Build pentadiagonal A = I + λ D2'D2 (bands: 0..2)
    val d0 = new Array[Double](n); val d1 = new Array[Double](n); val d2 = new Array[Double](n)
    // D2'D2 coefficients for second differences
    var i = 0
    while (i < n) {
      val c = (if (i >= 2 && i <= n - 3) 6.0
               else if (i == 1 || i == n - 2) 5.0
               else 1.0)
      d0(i) = 1.0 + lambda * (if (n < 5) d2d2Diag(n, i) else c)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      val c = if (i == 0 || i == n - 2) -2.0 else -4.0
      d1(i) = lambda * c; i += 1
    }
    i = 0
    while (i < n - 2) { d2(i) = lambda * 1.0; i += 1 }
    // Banded LDLᵀ (bandwidth 2)
    val l1 = new Array[Double](n); val l2 = new Array[Double](n)
    val d = new Array[Double](n)
    i = 0
    while (i < n) {
      var dv = d0(i)
      if (i >= 1) dv -= l1(i - 1) * l1(i - 1) * d(i - 1)
      if (i >= 2) dv -= l2(i - 2) * l2(i - 2) * d(i - 2)
      d(i) = dv
      if (i + 1 < n) {
        var e = d1(i)
        if (i >= 1) e -= l1(i - 1) * d(i - 1) * l2(i - 1)
        l1(i) = e / dv
      }
      if (i + 2 < n) l2(i) = d2(i) / dv
      i += 1
    }
    // Solve L z = y
    val z = y.clone()
    i = 0
    while (i < n) {
      if (i >= 1) z(i) -= l1(i - 1) * z(i - 1)
      if (i >= 2) z(i) -= l2(i - 2) * z(i - 2)
      i += 1
    }
    i = 0
    while (i < n) { z(i) /= d(i); i += 1 }
    i = n - 1
    while (i >= 0) {
      if (i + 1 < n) z(i) -= l1(i) * z(i + 1)
      if (i + 2 < n) z(i) -= l2(i) * z(i + 2)
      i -= 1
    }
    z
  }

  /** GCV-selected Whittaker smoothing (Eilers, "A perfect smoother", Anal.
    * Chem. 75(14):3631-3636, 2003): GCV(λ) = (RSS/n) / (1 − tr(H)/n)² with
    * H = (I + λD″ᵀD″)⁻¹; pick the grid λ minimizing it. tr(H) = Σ_j H_jj is
    * computed with one banded solve per basis vector — H_jj is exactly
    * `whittaker(e_j, λ)(j)` — so this reuses the LDLᵀ kernel unchanged
    * (O(n²) per λ; prototype series are label means, n ≲ a few hundred).
    * Closes the reference's smoothing-parameter selection (mgcv's GCV
    * default behind sits_patterns.R:38-140) for the 1-D prototype fits.
    * Returns (chosen λ, smoothed series).
    */
  def whittakerGcv(y: Array[Double],
      lambdas: Seq[Double] = Seq(0.1, 0.5, 1.0, 2.0, 5.0, 10.0, 25.0, 100.0))
      : (Double, Array[Double]) = {
    require(lambdas.nonEmpty, "whittakerGcv needs a non-empty lambda grid")
    val n = y.length
    if (n < 3) return (lambdas.head, y.clone())
    var bestLam = lambdas.head
    var bestGcv = Double.PositiveInfinity
    var bestZ: Array[Double] = null
    for (lam <- lambdas) {
      val z = whittaker(y, lam)
      var rss = 0.0
      var i = 0
      while (i < n) { val e = y(i) - z(i); rss += e * e; i += 1 }
      var trH = 0.0
      var j = 0
      while (j < n) {
        val ej = new Array[Double](n)
        ej(j) = 1.0
        trH += whittaker(ej, lam)(j)
        j += 1
      }
      val denom = 1.0 - trH / n
      val gcv = (rss / n) / (denom * denom)
      // NaN (0/0 at λ→0 on interpolating fits) never wins the comparison
      if (gcv < bestGcv) { bestGcv = gcv; bestLam = lam; bestZ = z }
    }
    if (bestZ == null) (lambdas.head, whittaker(y, lambdas.head))
    else (bestLam, bestZ)
  }

  /** exact D2'D2 diagonal for tiny n (n=3,4) */
  private def d2d2Diag(n: Int, i: Int): Double = {
    // row i of D2ᵀD2 where D2 is (n-2)×n second-difference matrix
    var s = 0.0
    var r = 0
    while (r < n - 2) {
      val c = if (i == r) 1.0 else if (i == r + 1) -2.0 else if (i == r + 2) 1.0 else 0.0
      s += c * c; r += 1
    }
    s
  }

  /** Full Savitzky-Golay coefficient matrix F (n×n, n=2k+1) of
    * api_signal.R:49-79 `.signal_sgolay_coef` (m=0): row r estimates window
    * position r; rows 0..k from the least-squares pseudo-inverse (computed
    * via normal equations — C has full column rank for p<n), rows k+1..n-1 by
    * the point symmetry `filter[(k+2):n,] = filter[k:1, n:1]`.
    */
  def sgolayMatrix(order: Int, k: Int): Array[Array[Double]] = {
    val n = 2 * k + 1
    val m = order + 1
    val f = Array.ofDim[Double](n, n)
    for (row <- 0 to k) {
      // C(i,j) = (i - row)^j, i in 0..n-1 (reference uses 1-based (1:n)-row)
      val c = Array.tabulate(n, m)((i, j) => math.pow((i - row).toDouble, j))
      val g = Array.tabulate(m, m)((p, q) =>
        (0 until n).map(i => c(i)(p) * c(i)(q)).sum)
      val e0 = new Array[Double](m); e0(0) = 1.0
      val a = solveDense(g, e0) // first row of (CᵀC)⁻¹
      for (i <- 0 until n)
        f(row)(i) = (0 until m).map(j => a(j) * c(i)(j)).sum
    }
    for (row <- k + 1 until n; j <- 0 until n)
      f(row)(j) = f(n - 1 - row)(n - 1 - j)
    f
  }

  /** Savitzky-Golay smoother exactly as smooth_sgp.cpp:34-60 `smooth_sg`:
    * interior by causal filter with the central row (≡ correlation
    * y(t)=Σ_s F(k,s)·x(t+k−s)), first k and last k points by the edge rows of
    * F times the first/last window. Series shorter than the window pass
    * through unchanged.
    */
  def sgolay(y: Array[Double], order: Int = 3, k: Int = 3): Array[Double] = {
    val n = 2 * k + 1
    val len = y.length
    if (len < n) return y.clone()
    val f = sgolayMatrix(order, k)
    val out = new Array[Double](len)
    var t = 0
    while (t < k) { // leading edge: rows 0..k-1 × first window
      var acc = 0.0; var j = 0
      while (j < n) { acc += f(t)(j) * y(j); j += 1 }
      out(t) = acc; t += 1
    }
    while (t <= len - k - 1) { // interior: central-row correlation
      var acc = 0.0; var s = 0
      while (s < n) { acc += f(k)(s) * y(t + k - s); s += 1 }
      out(t) = acc; t += 1
    }
    while (t < len) { // trailing edge: rows k+1..n-1 × last window
      val r = t - (len - n)
      var acc = 0.0; var j = 0
      while (j < n) { acc += f(r)(j) * y(len - n + j); j += 1 }
      out(t) = acc; t += 1
    }
    out
  }

  /** Central-row SG coefficients via normal equations (AᵀA)⁻¹Aᵀ e0 —
    * small Gaussian elimination, order ≤ 5.
    */
  def sgolayCoef(order: Int, k: Int): Array[Double] = {
    val win = 2 * k + 1
    val m = order + 1
    // G = AᵀA where A(i,j) = i^j for i in -k..k
    val g = Array.ofDim[Double](m, m)
    val b = new Array[Double](m)
    for (p <- 0 until m; q <- 0 until m)
      g(p)(q) = (-k to k).map(x => math.pow(x, p + q)).sum
    b(0) = 1.0 // e0: evaluate fitted polynomial at x=0
    // solve g * a = b
    val a = solveDense(g, b)
    val c = new Array[Double](win)
    for (x <- -k to k)
      c(x + k) = (0 until m).map(p => a(p) * math.pow(x, p)).sum
    c
  }

  private def solveDense(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    var col = 0
    while (col < n) {
      var piv = col
      var r = col + 1
      while (r < n) { if (math.abs(a(r)(col)) > math.abs(a(piv)(col))) piv = r; r += 1 }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tb = b(col); b(col) = b(piv); b(piv) = tb
      r = col + 1
      while (r < n) {
        val f = a(r)(col) / a(col)(col)
        var c2 = col
        while (c2 < n) { a(r)(c2) -= f * a(col)(c2); c2 += 1 }
        b(r) -= f * b(col)
        r += 1
      }
      col += 1
    }
    val x = new Array[Double](n)
    var i = n - 1
    while (i >= 0) {
      var s = b(i)
      var j = i + 1
      while (j < n) { s -= a(i)(j) * x(j); j += 1 }
      x(i) = s / a(i)(i)
      i -= 1
    }
    x
  }

  /** DTW distance, symmetric-2 step pattern with p-norm local cost
    * (/root/reference/src/dtw.cpp:36-105). O(n·m), two-row DP.
    */
  def dtw(a: Array[Double], b: Array[Double], p: Double = 2.0): Double = {
    val n = a.length; val m = b.length
    if (n == 0 || m == 0) return Double.NaN
    def cost(i: Int, j: Int): Double = math.pow(math.abs(a(i) - b(j)), p)
    var prev = new Array[Double](m)
    var curr = new Array[Double](m)
    prev(0) = cost(0, 0)
    var j = 1
    while (j < m) { prev(j) = prev(j - 1) + cost(0, j); j += 1 }
    var i = 1
    while (i < n) {
      curr(0) = prev(0) + cost(i, 0)
      j = 1
      while (j < m) {
        val c = cost(i, j)
        // symmetric2: diagonal counts twice
        curr(j) = math.min(math.min(prev(j) + c, curr(j - 1) + c), prev(j - 1) + 2 * c)
        j += 1
      }
      val t = prev; prev = curr; curr = t
      i += 1
    }
    math.pow(prev(m - 1), 1.0 / p)
  }

  // ---- mixture model (/root/reference/src/nnls_solver.cpp) ----

  /** Non-negative least squares min‖Ax−b‖, x≥0, by the Lawson-Hanson active
    * set method (the published algorithm behind the reference's per-pixel
    * endmember unmixing). A is m×n dense, small (endmember count ≤ ~8).
    */
  def nnls(a: Array[Array[Double]], b: Array[Double], maxIter: Int = 200): Array[Double] = {
    val m = a.length
    val n = a(0).length
    val x = new Array[Double](n)
    val passive = Array.fill(n)(false)
    def residual(): Array[Double] = {
      val r = b.clone()
      var i = 0
      while (i < m) {
        var j = 0
        while (j < n) { r(i) -= a(i)(j) * x(j); j += 1 }
        i += 1
      }
      r
    }
    def gradient(r: Array[Double]): Array[Double] =
      Array.tabulate(n)(j => (0 until m).map(i => a(i)(j) * r(i)).sum)
    def lsOnPassive(): Array[Double] = {
      val idx = (0 until n).filter(passive).toArray
      if (idx.isEmpty) return new Array[Double](n)
      val k = idx.length
      val g = Array.tabulate(k, k)((p, q) =>
        (0 until m).map(i => a(i)(idx(p)) * a(i)(idx(q))).sum)
      val rhs = Array.tabulate(k)(p => (0 until m).map(i => a(i)(idx(p)) * b(i)).sum)
      val z = solveDense(g, rhs)
      val full = new Array[Double](n)
      idx.zipWithIndex.foreach { case (j, p) => full(j) = z(p) }
      full
    }
    var iter = 0
    while (iter < maxIter) {
      val w = gradient(residual())
      var best = -1
      var bw = 1e-10
      var j = 0
      while (j < n) { if (!passive(j) && w(j) > bw) { bw = w(j); best = j }; j += 1 }
      if (best < 0) return x // KKT satisfied
      passive(best) = true
      var z = lsOnPassive()
      // inner loop: while the trial solution leaves the feasible region,
      // step to the boundary and drop the blocking variables
      while ((0 until n).exists(j2 => passive(j2) && z(j2) <= 0)) {
        var alpha = Double.MaxValue
        var j2 = 0
        while (j2 < n) {
          if (passive(j2) && z(j2) <= 0) {
            val r = x(j2) / (x(j2) - z(j2))
            if (r < alpha) alpha = r
          }
          j2 += 1
        }
        j2 = 0
        while (j2 < n) {
          if (passive(j2)) x(j2) = x(j2) + alpha * (z(j2) - x(j2))
          if (passive(j2) && x(j2) <= 1e-12) { x(j2) = 0; passive(j2) = false }
          j2 += 1
        }
        z = lsOnPassive()
      }
      var j3 = 0
      while (j3 < n) { if (passive(j3)) x(j3) = z(j3); j3 += 1 }
      iter += 1
    }
    x
  }

  // ---- bayts change detection (/root/reference/src/bayts_fns.cpp) ----

  private def dnorm(x: Double, mean: Double, sd: Double): Double =
    math.exp(-0.5 * ((x - mean) / sd) * ((x - mean) / sd)) / (sd * math.sqrt(2 * math.Pi))

  /** pbayes with the reference's 1e15 floor-truncation
    * (bayts_fns.cpp:28-31).
    */
  def pbayes(prior: Double, post: Double): Double = {
    val r = (prior * post) / ((prior * post) + ((1 - prior) * (1 - post)))
    math.floor(r * 1.0e15) / 1.0e15
  }

  /** Per-series non-forest probability, fused across bands
    * (C_bayts_calc_nf, bayts_fns.cpp:43-122): per band dnorm under F and NF
    * stats → conditional pNF/(pNF+pF) (zeroing pNF<1e-5) → clamp to
    * [bwf0,bwf1] → iterative Bayesian fusion across bands.
    * bands(b)(t): value of band b at time t.
    */
  def baytsNf(bands: Array[Array[Double]], meanF: Array[Double], sdF: Array[Double],
      meanNF: Array[Double], sdNF: Array[Double],
      bwf0: Double = 0.1, bwf1: Double = 0.9): Array[Double] = {
    val nT = bands(0).length
    var past: Array[Double] = null
    for (b <- bands.indices) {
      val p = new Array[Double](nT)
      var t = 0
      while (t < nT) {
        val x = bands(b)(t)
        if (x.isNaN) p(t) = Double.NaN
        else {
          val pF = dnorm(x, meanF(b), sdF(b))
          var pNF = dnorm(x, meanNF(b), sdNF(b))
          if (pNF < 0.00001) pNF = 0.0
          if (pNF > 0) pNF = pNF / (pNF + pF)
          if (pNF < bwf0) pNF = bwf0
          if (pNF > bwf1) pNF = bwf1
          p(t) = pNF
        }
        t += 1
      }
      if (past != null) {
        t = 0
        while (t < nT) {
          if (!p(t).isNaN && !past(t).isNaN) p(t) = pbayes(p(t), past(t))
          else if (p(t).isNaN) p(t) = past(t)
          t += 1
        }
      }
      past = p
    }
    past
  }

  /** Sequential change confirmation (C_bayts_detect_changes core loop,
    * bayts_fns.cpp:245-290): flag a step whose NF-prob exceeds `threshold`,
    * Bayes-update the change probability over consecutive steps, reject the
    * run when the posterior drops below 0.5, confirm when it reaches `chi`
    * with a supporting current observation. Returns the 0-based index of the
    * last confirmed-change step, or -1 (no change).
    */
  def baytsDetect(p: Array[Double], threshold: Double = 0.5, chi: Double = 0.9): Int = {
    val n = p.length
    if (n < 2) return -1
    var t = 1
    var flagged = false
    var runStart = -1
    var pchange = Double.NaN
    while (t < n) {
      if (!flagged) {
        if (p(t) > threshold) {
          pchange = pbayes(p(t - 1), p(t))
          flagged = true
          runStart = t
        }
      } else {
        pchange = pbayes(pchange, p(t))
        if (pchange < 0.5) { // reject run (flag 254 semantics)
          flagged = false
          runStart = -1
          pchange = Double.NaN
        }
      }
      if (flagged && pchange >= chi && p(t) >= 0.5) return t // confirmed
      t += 1
    }
    -1
  }

  // ---- windowed kernels w_* (/root/reference/src/kernel.cpp:8-124) ----

  /** Mirrored-edge index, exactly kernel.cpp:8-19 `locus_mirror`:
    * p<0 → -p-1 (edge value repeats first), p≥n → 2n-p-1.
    */
  def mirror(i: Int, n: Int): Int = {
    val j = if (i < 0) -i - 1 else if (i >= n) 2 * n - i - 1 else i
    math.min(math.max(j, 0), n - 1)
  }

  /** Uniform cubic B-spline bump N(t), support [0,4] — the classic
    * integer-knot basis piece. The piecewise polynomials are written in
    * EXACTLY the operand order the DuckDB oracle uses (left-associated
    * sums/products), so basis values are bit-identical across engines.
    */
  def bspline3(t: Double): Double =
    if (t < 0 || t > 4) 0.0
    else if (t < 1) t * t * t / 6.0
    else if (t < 2) (-3 * t * t * t + 12 * t * t - 12 * t + 4) / 6.0
    else if (t < 3) (3 * t * t * t - 24 * t * t + 60 * t - 44) / 6.0
    else (4 - t) * (4 - t) * (4 - t) / 6.0

  /** B-spline basis value of function j (1-based, of k) at point i
    * (1-based, of m): the abscissa is scaled to u ∈ [0, k−3] (nseg = k−3
    * uniform segments) and B_j(u) = N(u − j + 4). Operand order mirrors
    * the oracle: ((i−1)·nseg)/(m−1) − j + 4.
    */
  def bsplineBasis(i: Int, j: Int, m: Int, k: Int): Double =
    bspline3((i - 1) * (k - 3).toDouble / (m - 1) - j + 4)

  /** Penalized B-spline (P-spline, Eilers & Marx 1996) fit of a series:
    * minimize ‖y − Ba‖² + λ‖D₂a‖² over the k-coefficient uniform cubic
    * basis (D₂ = second differences on coefficients — the same
    * discrete-penalty family as mgcv's `s(x)`, which is what the
    * reference's sits_patterns GAM fits per label,
    * /root/reference/R/sits_patterns.R:38-140). Solves the k×k SPD normal
    * equations (BᵀB + λD₂ᵀD₂)a = Bᵀy by Cholesky. Requires m ≥ k.
    * Returns (a, bty, resid, fitted): the coefficients, the moment vector
    * Bᵀy, the normal-equation residual Bᵀy − Ma (≈0 at solve precision —
    * the optimality CERTIFICATE the driver oracle checks, same style as
    * the Whittaker resid oracle), and the fitted series Ba.
    */
  def psplineFit(y: Array[Double], lambda: Double, k: Int)
      : (Array[Double], Array[Double], Array[Double], Array[Double]) = {
    val m = y.length
    require(m >= k && k >= 4, s"pspline: m=$m must be >= k=$k >= 4")
    val b = Array.tabulate(m, k)((i, j) => bsplineBasis(i + 1, j + 1, m, k))
    // M = BᵀB + λ·D₂ᵀD₂ (k×k), bty = Bᵀy
    val mm = Array.ofDim[Double](k, k)
    val bty = new Array[Double](k)
    var i = 0
    while (i < m) {
      var p = 0
      while (p < k) {
        val bip = b(i)(p)
        if (bip != 0.0) {
          bty(p) += bip * y(i)
          var q = 0
          while (q < k) { mm(p)(q) += bip * b(i)(q); q += 1 }
        }
        p += 1
      }
      i += 1
    }
    var r = 0
    while (r < k - 2) { // D₂ row r: a_r − 2a_{r+1} + a_{r+2}
      val d = Array(1.0, -2.0, 1.0)
      var p = 0
      while (p < 3) {
        var q = 0
        while (q < 3) {
          mm(r + p)(r + q) += lambda * d(p) * d(q); q += 1
        }
        p += 1
      }
      r += 1
    }
    // Cholesky M = LLᵀ, then two triangular solves
    val l = Array.ofDim[Double](k, k)
    var c = 0
    while (c < k) {
      var s = mm(c)(c)
      var t = 0
      while (t < c) { s -= l(c)(t) * l(c)(t); t += 1 }
      require(s > 0, s"pspline: normal matrix not SPD at $c")
      l(c)(c) = math.sqrt(s)
      var rr = c + 1
      while (rr < k) {
        var s2 = mm(rr)(c)
        t = 0
        while (t < c) { s2 -= l(rr)(t) * l(c)(t); t += 1 }
        l(rr)(c) = s2 / l(c)(c)
        rr += 1
      }
      c += 1
    }
    val z = new Array[Double](k)
    i = 0
    while (i < k) {
      var s = bty(i)
      var t = 0
      while (t < i) { s -= l(i)(t) * z(t); t += 1 }
      z(i) = s / l(i)(i)
      i += 1
    }
    val a = new Array[Double](k)
    i = k - 1
    while (i >= 0) {
      var s = z(i)
      var t = i + 1
      while (t < k) { s -= l(t)(i) * a(t); t += 1 }
      a(i) = s / l(i)(i)
      i -= 1
    }
    val resid = new Array[Double](k)
    i = 0
    while (i < k) {
      var s = bty(i)
      var t = 0
      while (t < k) { s -= mm(i)(t) * a(t); t += 1 }
      resid(i) = s
      i += 1
    }
    val fitted = new Array[Double](m)
    i = 0
    while (i < m) {
      var s = 0.0
      var j = 0
      while (j < k) { s += b(i)(j) * a(j); j += 1 }
      fitted(i) = s
      i += 1
    }
    (a, bty, resid, fitted)
  }

  /** Apply an NaN-ignoring window stat over a centered window of half-width k
    * with mirrored edge padding (the reference's w_median/w_mean/… shape).
    */
  def windowed(v: Array[Double], k: Int, stat: Array[Double] => Double): Array[Double] = {
    val n = v.length
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val buf = new Array[Double](2 * k + 1)
      var j = -k; var c = 0
      while (j <= k) {
        val x = v(mirror(i + j, n))
        if (!x.isNaN) { buf(c) = x; c += 1 }
        j += 1
      }
      out(i) = if (c == 0) Double.NaN else stat(java.util.Arrays.copyOf(buf, c))
      i += 1
    }
    out
  }
}
