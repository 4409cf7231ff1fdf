package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.SeriesKernels
import graft.operators.{ChangeDetect, Dedup, Select, Similarity}

/** Round-3 fixes: bounded-driver-memory MST filtering for clusterDendro,
  * non-vacuous tibble_prune semantics, and pattern grouping on arbitrary
  * (non-integer) label types.
  */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("clusterDendro MST filter: driver collects ≤ P·(k−1) edges, result equals brute-force single linkage") {
    val rnd = new scala.util.Random(7)
    val k = 40
    // 4 well-separated families with in-family jitter
    val vecs = Array.tabulate(k)(i =>
      Array.tabulate(6)(_ => rnd.nextDouble() * 5 + (i % 4) * 100.0))
    val bc = spark.sparkContext.broadcast(vecs)
    val cand = ChangeDetect.distributedMstCandidates(spark, bc, k, 2.0)
    val parts = math.min(math.max(k / 8, 1), 64)
    assert(cand.length <= parts * (k - 1),
      s"driver collected ${cand.length} edges > P*(k-1) = ${parts * (k - 1)}")
    assert(cand.length < k * (k - 1) / 2, "no filtering happened — full triangle collected")

    // brute-force single linkage over the full triangle (the round-2 shape)
    val nClusters = 4
    val edges = for { i <- 0 until k; j <- i + 1 until k }
      yield (i, j, SeriesKernels.dtw(vecs(i), vecs(j), 2.0))
    val parent = Array.tabulate(k)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
    var groups = k
    edges.sortBy(e => (e._3, e._1, e._2)).foreach { case (i, j, _) =>
      if (groups > nClusters) {
        val (ri, rj) = (find(i), find(j))
        if (ri != rj) { parent(math.max(ri, rj)) = math.min(ri, rj); groups -= 1 }
      }
    }
    val expected = (0 until k).groupBy(find).values.map(_.toSet).toSet

    val series = (for (i <- 0 until k; x <- vecs(i).indices)
      yield (f"c$i%03d", x, vecs(i)(x))).toDF("conv_id", "idx", "value")
    val got = ChangeDetect.clusterDendro(spark, series, nClusters)
      .collect().map(r => r.getString(0).drop(1).toInt -> r.getInt(1))
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    assert(got == expected)
  }

  test("tibble_prune: fractional median → empty (R parity); integral median keeps the cohort") {
    // 4 convs with counts 3,4,5,6 → type-7 median 4.5 → nothing matches
    val even = (for ((c, n) <- Seq("a" -> 3, "b" -> 4, "c" -> 5, "d" -> 6); i <- 0 until n)
      yield (c, i, 1.0)).toDF("conv_id", "turn_idx", "value")
    assert(Select.pruneMedianLength(even).count() == 0)
    // 5 convs with counts 3,4,5,6,7 → median 5 → exactly conv "c"'s 5 rows
    val odd = (for ((c, n) <- Seq("a" -> 3, "b" -> 4, "c" -> 5, "d" -> 6, "e" -> 7); i <- 0 until n)
      yield (c, i, 1.0)).toDF("conv_id", "turn_idx", "value")
    val kept = Select.pruneMedianLength(odd)
    assert(kept.count() == 5)
    assert(kept.select("conv_id").distinct().as[String].collect().toSeq == Seq("c"))
  }

  test("patterns smoothing groups on the label VALUE, not an int cast (string labels stay separate)") {
    val series = (for (c <- Seq("x", "y"); i <- 0 until 8)
      yield (c, i, if (c == "x") 1.0 else 100.0)).toDF("conv_id", "idx", "value")
    val labels = Seq(("x", "low"), ("y", "high")).toDF("conv_id", "label")
    val out = ChangeDetect.patterns(series, labels, lambda = 2.0)
    val byLabel = out.groupBy("label").agg(avg("value").as("m"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(byLabel.keySet == Set("low", "high"),
      s"labels collapsed: ${byLabel.keySet}")
    // Whittaker of a constant series is the constant — per-label identity kept
    assert(math.abs(byLabel("low")._1 - 1.0) < 1e-9 && byLabel("low")._2 == 8)
    assert(math.abs(byLabel("high")._1 - 100.0) < 1e-9 && byLabel("high")._2 == 8)
  }

  test("dedup components: chains, stars, and disjoint pairs resolve to min-id groups") {
    // chain 1-2-3-4 (diameter 3 — needs >1 propagation round), star around
    // 10, and an isolated pair; canonical = min id of each group
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L), (20L, 21L)).toDF("id1", "id2")
    val out = Dedup.components(pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getLong(3))).toMap
    assert(out.size == 10)
    Seq(1L, 2L, 3L, 4L).foreach(d => assert(out(d) == ((1L, d == 1L, 4L)), s"doc $d"))
    Seq(10L, 11L, 12L, 13L).foreach(d => assert(out(d) == ((10L, d == 10L, 4L)), s"doc $d"))
    Seq(20L, 21L).foreach(d => assert(out(d) == ((20L, d == 20L, 2L)), s"doc $d"))
    // a round budget smaller than the diameter must fail loudly, not return
    // partial labels
    assertThrows[IllegalArgumentException] {
      Dedup.components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
        .toDF("id1", "id2"), maxIter = 1)
    }
  }

  test("kmeansCentroids: quantized Lloyd on separable blobs recovers the blob structure") {
    // 3 well-separated cone-shaped blobs in 64-dim; one seed lands in each
    val vecs = (0 until 30).map { i =>
      val blob = i % 3
      val v = Array.tabulate(64) { d =>
        (if (d == blob * 20) 10.0 else 0.0) +
          0.3 * math.sin(i * 7.0 + d * 1.3) // deterministic jitter
      }
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.kmeansCentroids(emb, col("vec_id") < 3, iters = 3)
    assert(cents.count() == 3, "a blob seed collapsed")
    val asg = Similarity.ivfAssignTo(emb, cents).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every member of a blob must share its blob-mates' cell
    for (b <- 0 until 3) {
      val cells = (0 until 30).filter(_ % 3 == b).map(i => asg(i.toLong)).distinct
      assert(cells.size == 1, s"blob $b split across cells $cells")
    }
    assert(asg.values.toSet.size == 3, "blobs merged into one cell")
  }

  test("product quantization: ADC nearest neighbor stays within the blob") {
    val vecs = (0 until 30).map { i =>
      val blob = i % 3
      val v = Array.tabulate(64) { d =>
        (if (d == blob * 20) 10.0 else 0.0) +
          0.3 * math.sin(i * 7.0 + d * 1.3)
      }
      (i.toLong, v)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val cents = Similarity.pqTrain(emb, m = 4, d = 16, col("vec_id") < 3, iters = 2)
    assert(cents.groupBy("sub").count().collect().forall(_.getLong(1) == 3),
      "a subspace codebook lost an entry")
    val codes = Similarity.pqEncode(emb, cents, m = 4, d = 16)
    assert(codes.count() == 30)
    val res = Similarity.pqSearch(emb, cents, codes, col("vec_id") < 6,
      m = 4, d = 16, k = 1).collect()
    assert(res.length == 6)
    res.foreach { r =>
      val qid = r.getLong(0); val eid = r.getLong(1)
      assert(qid % 3 == eid % 3,
        s"ADC top-1 of $qid crossed blobs to $eid (adist ${r.getDouble(2)})")
    }
  }

  test("whittakerGcv: GCV picks a denoising λ (closer to truth than raw) and tr(H) is sane") {
    val n = 60
    val truth = Array.tabulate(n)(i => 50.0 + 30.0 * math.sin(i / 9.0))
    // deterministic pseudo-noise, zero-ish mean, sd ~6
    val noisy = Array.tabulate(n)(i =>
      truth(i) + 6.0 * math.sin(i * 12.9898 + 4.1414) * math.cos(i * 78.233))
    val (lam, z) = SeriesKernels.whittakerGcv(noisy)
    def mse(a: Array[Double]) =
      a.indices.map(i => (a(i) - truth(i)) * (a(i) - truth(i))).sum / n
    assert(lam > 0.0)
    assert(mse(z) < mse(noisy),
      s"GCV fit (λ=$lam) mse ${mse(z)} not below raw mse ${mse(noisy)}")
    // H_jj = whittaker(e_j)(j): each leverage in (0,1], trace in (0,n)
    val hjj = (0 until n).map { j =>
      val e = new Array[Double](n); e(j) = 1.0
      SeriesKernels.whittaker(e, lam)(j)
    }
    assert(hjj.forall(h => h > 0.0 && h <= 1.0 + 1e-12))
    val tr = hjj.sum
    assert(tr > 0.0 && tr < n)
  }

  test("whittakerGcv: noisier series selects λ at least as large as a smooth one") {
    val n = 60
    val base = Array.tabulate(n)(i => 50.0 + 30.0 * math.sin(i / 9.0))
    val noisy = Array.tabulate(n)(i =>
      base(i) + 12.0 * math.sin(i * 12.9898 + 4.1414) * math.cos(i * 78.233))
    val lamSmooth = SeriesKernels.whittakerGcv(base)._1
    val lamNoisy = SeriesKernels.whittakerGcv(noisy)._1
    assert(lamNoisy >= lamSmooth,
      s"noisy λ=$lamNoisy < smooth λ=$lamSmooth")
  }

  test("patternsGcv: schema/grouping as patterns, values equal the per-label GCV fit") {
    val series = (for (c <- Seq("a", "b", "c", "d"); i <- 0 until 20) yield {
      val lab = if (c <= "b") 1 else 2
      (c, i, lab * 40.0 + 10.0 * math.sin(i / 2.0) +
        3.0 * math.sin(i * 7.77 + c.hashCode))
    }).toDF("conv_id", "idx", "value")
    val labels = Seq(("a", 1), ("b", 1), ("c", 2), ("d", 2)).toDF("conv_id", "label")
    val out = ChangeDetect.patternsGcv(series, labels).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    // recompute expected per label by hand
    val means = series.join(labels, "conv_id").groupBy("label", "idx")
      .agg(avg("value").as("v")).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
      .groupBy(_._1._1)
    for ((lab, rows) <- means) {
      val pts = rows.toArray.sortBy(_._1._2)
      val fit = SeriesKernels.whittakerGcv(pts.map(_._2))._2
      pts.indices.foreach { i =>
        assert(math.abs(out((lab, pts(i)._1._2)) - fit(i)) < 1e-12,
          s"label $lab idx ${pts(i)._1._2}")
      }
    }
  }
}
