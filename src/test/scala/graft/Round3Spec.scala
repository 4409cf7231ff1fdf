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

  test("typed minhash kernel ≡ expression form (unicode, empty tokens, dups)") {
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c"),                       // exactly 3 tokens, one shingle
      (3L, "a b"),                         // too short — no row
      (4L, "x  y  z  w"),                  // double spaces → empty tokens
      (5L, "中文 字符 测试 with mixed ascii"),
      (6L, "r r r r r r"),                 // repeated token → duplicate shingles
      (7L, " leading and trailing "),      // edge empties
      (8L, "")                             // empty text
    ).toDF("doc_id", "text")
    val typed = graft.operators.Dedup.minhashSignature(docs, 8)
      .select(col("doc_id"), col("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // the round-2 expression implementation, verbatim
    val exprForm = docs
      .withColumn("toks", split(col("text"), " "))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", expr(
        """array_distinct(transform(sequence(0, size(toks) - 3), i ->
          |  concat_ws(' ', element_at(toks, i + 1), element_at(toks, i + 2),
          |            element_at(toks, i + 3))))""".stripMargin))
      .withColumn("mh", expr(
        """transform(sequence(0, 7), j ->
          |  array_min(transform(sh, s -> md5(concat(cast(j as string), '|', s)))))""".stripMargin))
      .select(col("doc_id"), col("mh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(typed == exprForm)
    assert(!typed.contains(3L) && !typed.contains(8L))
  }

  test("minhash Jaccard estimate: exact dup agrees on all slots, est = n_eq/8") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
      (3L, "the quick brown fox jumps over the lazy cat"), // near dup
      (4L, "completely different content with other words entirely here")
    ).toDF("doc_id", "text")
    val est = graft.operators.Dedup.minhashEstimate(docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    // the exact dup surfaces via LSH and agrees on every signature slot
    assert(est((1L, 2L)) == ((8L, 1.0)))
    est.values.foreach { case (nEq, e) =>
      // any LSH candidate shares at least one full band = rowsPerBand slots
      assert(nEq >= 2 && nEq <= 8)
      // n_eq/8 is an exact 3-decimal binary fraction — estimate is exact
      assert(e == nEq / 8.0)
    }
  }

  test("BM25: hand-computed score, tf ordering, rare-term idf dominance") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "dup dup common"),
      (2L, "dup common common"),
      (3L, "common common common"),
      (4L, "other words here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs,
        Seq((1, "dup"), (2, "common other")), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> (r.getDouble(2), r.getInt(3)))
      .toMap
    // q1 "dup": N=4, df=2 → idf=round(ln(2),6)=0.693147; dl=3=avgdl →
    // score(doc1, tf=2) = 0.693147·(2·2.2)/(2+1.2) = 0.953077… → 0.9531
    assert(out((1, 1L))._1 == 0.9531 && out((1, 1L))._2 == 1)
    assert(out((1, 2L))._2 == 2 && out((1, 2L))._1 < 0.9531)
    assert(!out.contains((1, 3L)) && !out.contains((1, 4L)))
    // q2: "other" (df=1, idf=ln(1+3.5/1.5)) outweighs "common" (df=3,
    // idf=ln(1+1.5/3.5)) → doc4 beats the common-only docs
    assert(out((2, 4L))._2 == 1)
    assert(Set(2L, 3L).contains(
      out.collectFirst { case ((2, d), (_, 2)) => d }.get))
  }

  test("indexStats: df/cf per term with (df desc, cf desc, term) order") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a a b"), (2L, "a c"), (3L, "b  b")).toDF("doc_id", "text")
    val out = TextAnalysis.indexStats(docs, 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: df 2 cf 3; b: df 2 cf 3; c: df 1 cf 1 — tie broken by term
    assert(out.toSeq == Seq(("a", 2L, 3L), ("b", 2L, 3L), ("c", 1L, 1L)))
  }

  test("semDedup: exact dup drops (lower id wins), distinct vectors kept") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(1f, 0f, 0f, 0f)),  // exact dup of 0 → dominated
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0.9f, 0.1f, 0f, 0f)) // cos≈0.994 < 0.999 → kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, col("vec_id") % 2 === 0, iters = 1,
        threshold = 0.999).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(0L) == ((0L, true)))
    assert(out(1L) == ((1L, false)))
    assert(out(2L) == ((0L, true)))
    assert(out(3L) == ((0L, true)))
  }

  test("typed w_* kernel ≡ expression form on random-ish series (incl. n ≤ k)") {
    val k = 2; val m = 2 * k + 1
    val grid = (for (c <- Seq("a", "b", "tiny"); i <- 0 until (if (c == "tiny") 2 else 25))
      yield (c, new java.sql.Timestamp(1735689600000L + i * 60000L),
        math.rint(100 * math.sin(i * 3.7 + c.hashCode)) / 7.0))
      .toDF("conv_id", "bucket_ts", "value")
    val typed = graft.operators.KernelWindows(grid, k)
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.toString).toMap
    // the round-2 expression implementation, verbatim
    val perPoint =
      s"""transform(sequence(0, n - 1), pos -> named_struct(
         |  'bucket_ts', element_at(ts, pos + 1),
         |  'win', transform(sequence(-$k, $k), j -> element_at(vals,
         |    greatest(0, least(n - 1,
         |      CASE WHEN pos + j < 0 THEN -(pos + j) - 1
         |           WHEN pos + j >= n THEN 2*n - (pos + j) - 1
         |           ELSE pos + j END)) + 1))))""".stripMargin
    val modal =
      """aggregate(array_sort(win),
        |  named_struct('best', cast(null as double), 'bc', 0,
        |               'cur', cast(null as double), 'cc', 0),
        |  (s, x) -> CASE WHEN s.cur IS NOT NULL AND x = s.cur THEN
        |      named_struct('best', IF(s.cc + 1 > s.bc, x, s.best),
        |                   'bc', IF(s.cc + 1 > s.bc, s.cc + 1, s.bc),
        |                   'cur', x, 'cc', s.cc + 1)
        |    ELSE
        |      named_struct('best', IF(1 > s.bc, x, s.best),
        |                   'bc', IF(1 > s.bc, 1, s.bc),
        |                   'cur', x, 'cc', 1) END,
        |  s -> s.best)""".stripMargin
    val r4 = (c: org.apache.spark.sql.Column) => round(c + lit(1e-9), 4)
    val exprForm = grid
      .groupBy("conv_id")
      .agg(sort_array(collect_list(struct(col("bucket_ts"), col("value")))).as("pts"))
      .select(col("conv_id"),
        expr("transform(pts, p -> p.bucket_ts)").as("ts"),
        expr("transform(pts, p -> cast(p.value as double))").as("vals"))
      .withColumn("n", size(col("vals")))
      .select(col("conv_id"), explode(expr(perPoint)).as("pt"))
      .select(col("conv_id"), col("pt.bucket_ts").as("bucket_ts"), col("pt.win").as("win"))
      .withColumn("s1", expr("aggregate(win, cast(0 as double), (a, x) -> a + x)"))
      .withColumn("s2", expr("aggregate(win, cast(0 as double), (a, x) -> a + x * x)"))
      .select(col("conv_id"), col("bucket_ts"),
        r4(col("s1")).as("w_sum"), r4(col("s1") / lit(m)).as("w_mean"),
        expr(s"element_at(array_sort(win), ${k + 1})").as("w_median"),
        array_min(col("win")).as("w_min"), array_max(col("win")).as("w_max"),
        r4(sqrt(greatest(lit(0.0),
          (col("s2") - col("s1") * col("s1") / lit(m)) / lit(m - 1)))).as("w_sd"),
        r4((col("s2") - col("s1") * col("s1") / lit(m)) / lit(m - 1)).as("w_var"),
        expr(modal).as("w_modal"))
      .collect().map(r => (r.getString(0), r.getTimestamp(1).getTime) -> r.toString).toMap
    assert(typed.keySet == exprForm.keySet)
    typed.foreach { case (key, row) =>
      assert(row == exprForm(key), s"mismatch at $key")
    }
  }

  test("ArrayDot codegen expression ≡ aggregate(zip_with(...)) fold, inside WholeStageCodegen") {
    graft.functions.GraftFunctions.register(spark)
    // spark.range source (not a LocalTableScan) so whole-stage codegen is
    // actually exercised and visible in the plan
    val vecs = spark.range(20).select(col("id"),
      expr("transform(sequence(0, 63), d -> sin(id * 1.7D + d) * IF(d % 7 = 0, -3.0D, 1.0D))").as("a"),
      expr("transform(sequence(0, 63), d -> cos(id * 0.9D + d * 2.1D))").as("b"))
    val both = vecs.select(col("id"),
      expr("graft_dot(a, b)").as("native"),
      expr("aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (s, x) -> s + x)")
        .as("hof"))
    // bit-identical, not approximately equal — same sequential fold
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
    // and the expression must not break whole-stage codegen: behind an
    // exchange (so the HOF transform building the fixtures is out of the
    // way), the arraydot Project must carry the `*(n)` codegen marker
    val staged = vecs.repartition(2).select(expr("graft_dot(a, b)"))
    staged.collect() // finalize the adaptive plan
    val plan = staged.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("arraydot") && l.replaceAll("[\\s+:-]+", "").startsWith("*(")),
      s"arraydot not inside WholeStageCodegen:\n$plan")
  }

  test("smote: midpoint synthesis from the within-class nearest neighbor; majority untouched") {
    import graft.operators.Imbalance
    val feats = Seq(
      ("a1", 1, 0.0, 0.0), ("a2", 1, 1.0, 0.0), ("a3", 1, 2.0, 0.0), ("a4", 1, 3.0, 0.0),
      ("b1", 2, 0.0, 0.0), ("b2", 2, 1.0, 1.0), ("b3", 2, 10.0, 10.0)
    ).toDF("conv_id", "label", "f1", "f2")
    val out = Imbalance.smoteOversample(feats, Seq("f1", "f2")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getInt(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    // only the minority class (2) is oversampled, one synth row per member
    assert(out.keySet == Set("b1", "b2", "b3"))
    assert(out("b1") == (("b2", 2, 0.5, 0.5)))   // nearest of b1 is b2
    assert(out("b2") == (("b1", 2, 0.5, 0.5)))
    assert(out("b3") == (("b2", 2, 5.5, 5.5)))   // nearest of b3 is b2
    // guard refuses cube-scale classes
    assertThrows[IllegalArgumentException] {
      Imbalance.smoteOversample(feats, Seq("f1", "f2"), maxPerClass = 3)
    }
  }

  test("1-D GLCM: hand-worked symmetric co-occurrence incl. the max-level exclusion quirk") {
    import graft.operators.Texture
    // values [0,1,2,3] → greys [0,5,10,16]; 16 == n_grey is EXCLUDED (the
    // reference's v_i < n_grey guard), so pairs are (0,5),(5,10) symmetric
    val series = Seq(("c", 0, 0.0), ("c", 1, 1.0), ("c", 2, 2.0), ("c", 3, 3.0))
      .toDF("conv_id", "idx", "value")
    val r = Texture.glcmSeries(series).head()
    assert(r.getAs[Double]("contrast") == 25.0)
    assert(r.getAs[Double]("dissimilarity") == 5.0)
    assert(r.getAs[Double]("homogeneity") == math.rint((1.0 / 26 + 1e-9) * 1e4) / 1e4)
    assert(r.getAs[Double]("energy") == 0.5)
    assert(r.getAs[Double]("asm") == 0.25)
    assert(r.getAs[Double]("glcm_mean") == 5.0)
    assert(r.getAs[Double]("variance") == 12.5)
    assert(r.getAs[Double]("std") == 3.5355)
    assert(r.getAs[Double]("correlation") == 0.0)
    // constant series: the reference's normalize divides by zero — excluded
    val const = Seq(("k", 0, 2.0), ("k", 1, 2.0)).toDF("conv_id", "idx", "value")
    assert(Texture.glcmSeries(const).isEmpty)
  }

  test("temporal segmentation: the DP finds planted change points and resists noise splits") {
    import graft.operators.Segment
    // two level shifts; jitter far below lambda
    val series = (0 until 30).map { i =>
      val level = if (i < 10) 10.0 else if (i < 20) 60.0 else 25.0
      ("c", i, level + 0.3 * math.sin(i * 2.1))
    }.toDF("conv_id", "idx", "value")
    val segs = Segment.segmentSeries(series, lambda = 100.0)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .sortBy(_._1)
    assert(segs.map(s => (s._2, s._3)).toSeq == Seq((0, 9), (10, 19), (20, 29)),
      s"wrong boundaries: ${segs.toSeq}")
    // constant series never splits regardless of how small its noise is
    val const = (0 until 20).map(i => ("k", i, 5.0 + 1e-3 * math.cos(i.toDouble)))
      .toDF("conv_id", "idx", "value")
    assert(Segment.segmentSeries(const, lambda = 100.0).count() == 1)
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

  test("repetition metrics: hand-worked dup-word/top-word/dup-gram fractions") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b a b c"), (2L, "x")).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val d1 = out(1L)
    assert(d1.getInt(1) == 5 && d1.getInt(2) == 3 && d1.getInt(3) == 2)
    assert(d1.getDouble(4) == 0.4)    // dup words: (5-3)/5
    assert(d1.getDouble(5) == 0.4)    // top word "a" or "b": 2/5
    assert(d1.getDouble(6) == 0.25)   // 2-grams: "a b" repeats → 1/4
    assert(d1.getDouble(7) == 0.0)    // 3-grams all distinct
    val d2 = out(2L)                  // single token: no 2-/3-grams → 0.0
    assert(d2.getInt(1) == 1 && d2.getDouble(4) == 0.0 &&
      d2.getDouble(5) == 1.0 && d2.getDouble(6) == 0.0 && d2.getDouble(7) == 0.0)
  }

  test("decontaminate: exact dup flagged, partial overlap scored, short docs dropped") {
    import graft.operators.TextAnalysis
    val bench = Seq((0L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "a b c d e"),   // identical → ratio 1.0
      (2L, "z y x w v"),   // disjoint → ratio 0.0
      (3L, "a b c z z"),   // shares only "a b c" → 1/3
      (4L, "a b")          // < 3 tokens → no grams, no row
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(train, bench).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!out.contains(4L))
    assert(out(1L).getDouble(3) == 1.0 && out(1L).getBoolean(4))
    assert(out(2L).getDouble(3) == 0.0 && !out(2L).getBoolean(4))
    assert(out(3L).getLong(1) == 3 && out(3L).getLong(2) == 1 &&
      out(3L).getDouble(3) == 0.3333 && !out(3L).getBoolean(4))
  }

  test("domainCap keeps top-n per source with deterministic tie-break; mixSample is hash-deterministic") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "s1", 100, "en"), (2L, "s1", 300, "en"), (3L, "s1", 300, "en"),
      (4L, "s2", 50, "de")
    ).toDF("doc_id", "source", "n_chars", "lang")
    val capped = TextAnalysis.domainCap(docs, 2).collect()
      .map(r => r.getLong(0) -> r.getInt(3)).toMap
    // ties on n_chars=300 break by doc_id: 2 then 3; doc 1 ranks 3rd → dropped
    assert(capped == Map(2L -> 1, 3L -> 2, 4L -> 1))

    val once = TextAnalysis.mixSample(docs, Map("en" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val twice = TextAnalysis.mixSample(docs, Map("en" -> 0.5)).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(once == twice, "mix sample is not deterministic")
    // default fraction 1.0 keeps every non-en doc
    assert(once.exists(_._1 == 4L))
    // u really is the first-8-hex-digit md5 value
    val u1 = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5").digest("4".getBytes("UTF-8"))
        .take(4).map("%02x".format(_)).mkString, 16)
    assert(once.find(_._1 == 4L).get._2 == u1)
  }

  test("decodeRange: chunk exclusion skips out-of-range chunks entirely; in-chunk slice is exact") {
    import graft.model.{ChunkStruct, Tier}
    import graft.operators.ChunkStore
    import graft.functions.GorillaCodec
    val step = Tier.M1.millis
    val t0 = 1704067200000L // 2024-01-01T00:00Z
    def chunk(conv: String, startMs: Long, vals: Array[Double]) =
      ChunkStruct(conv, "1m", new java.sql.Timestamp(startMs), vals.length,
        "gorilla_lp+dod",
        GorillaCodec.encodeRegularTimestamps(startMs, step, vals.length),
        GorillaCodec.encodeValuesLP(vals))
    val good = chunk("in", t0, Array(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    // a chunk fully OUTSIDE the range with a CORRUPT payload: decodeRange
    // must prune it relationally — if it ever reached the codec it would throw
    val poisoned = chunk("out", t0 + 100 * step,
      Array(9.0, 9.0)).copy(value_payload = Array[Byte](1, 2, 3))
    val ds = spark.createDataset(Seq(good, poisoned))(
      org.apache.spark.sql.Encoders.product[ChunkStruct])
    // range covers indices 2..4 of the good chunk only
    val out = ChunkStore.decodeRange(spark, ds, Tier.M1,
      new java.sql.Timestamp(t0 + 2 * step), new java.sql.Timestamp(t0 + 5 * step))
      .orderBy("bucket_ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    assert(out.toSeq == Seq(("in", t0 + 2 * step, 3.0), ("in", t0 + 3 * step, 4.0),
      ("in", t0 + 4 * step, 5.0)))
    // sanity: the poisoned chunk DOES blow up an unpruned full decode
    intercept[org.apache.spark.SparkException] {
      ChunkStore.decode(spark, ds).count()
    }
  }

  test("optimizer rule rewrites the self-product HOF fold into ArrayDot; general case untouched") {
    graft.functions.GraftFunctions.register(spark)
    val df = spark.range(50).select(
      array((0 until 8).map(i => (col("id") + i).cast("double")): _*).as("v"),
      array((0 until 8).map(i => (col("id") * 2 + i).cast("double")): _*).as("w"))
    val hof = "aggregate(zip_with(%s, %s, (x, y) -> x * y), cast(0 as double), (s, t) -> s + t)"
    val self = df.select(expr(hof.format("v", "v")).as("n2"))
    val opt = self.queryExecution.optimizedPlan.toString
    assert(opt.toLowerCase.contains("arraydot"), s"self-product not rewritten:\n$opt")
    // rewritten result == interpreted fold, bit-identical
    val expected = (0L until 50L).map { id =>
      (0 until 8).map(i => (id + i).toDouble)
        .foldLeft(0.0)((s, x) => s + x * x)
    }.toArray
    assert(self.collect().map(_.getDouble(0)).sameElements(expected))
    // two DIFFERENT arrays: zip_with null-padding semantics must survive —
    // the rule must NOT fire
    val cross = df.select(expr(hof.format("v", "w")).as("d"))
    assert(!cross.queryExecution.optimizedPlan.toString.toLowerCase
      .contains("arraydot"), "unsafe cross-array rewrite fired")
  }

  test("approximate aggregates: linear-counting distinct and histogram quantiles stay in error bounds") {
    import graft.operators.Summary
    // 300 true distincts duplicated ×3 — the estimator must ignore copies
    val vals = (0 until 900).map(i => s"v${i % 300}").toDF("k")
    val lc = Summary.linearCountDistinct(vals, "k", m = 1024).head()
    assert(lc.getInt(0) == 1024)
    val est = lc.getDouble(2)
    assert(math.abs(est - 300) / 300 < 0.15, s"estimate $est too far from 300")

    val nums = (0 until 1000).map(i => ((i * 37) % 1000).toDouble).toDF("x")
    val approx = Summary.histQuantiles(nums, "x", nBins = 64,
      ps = Seq(0.25, 0.5, 0.75)).collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val exact = graft.operators.Predictors.exactQuantiles(nums, "x", Seq(0.25, 0.5, 0.75))
    val binWidth = 999.0 / 64
    Seq(0.25, 0.5, 0.75).zip(exact).foreach { case (p, e) =>
      assert(math.abs(approx(p) - e) <= binWidth + 1e-6,
        s"p=$p approx=${approx(p)} exact=$e off by more than a bin")
    }
  }

  test("sequence packing: per-shard offsets, boundary straddle flag, no cross-shard coupling") {
    import graft.operators.TextAnalysis
    // one shard (ids ≡ 0 mod 8), capacity 10: docs of 4, 4, 4 tokens —
    // the third starts at offset 8 and crosses the seq boundary
    val docs = Seq((0L, "a b c d"), (8L, "e f g h"), (16L, "i j k l"),
      (1L, "m n")).toDF("doc_id", "text")
    val out = TextAnalysis.packSequences(docs, capacity = 10, nShards = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    assert(out(0L) == (0L, 0L, 0L, false))
    assert(out(8L) == (4L, 0L, 4L, false))
    assert(out(16L) == (8L, 0L, 8L, true)) // spans tokens 8..11 → straddles
    assert(out(1L) == (0L, 0L, 0L, false)) // different shard starts fresh
  }

  test("BPE double-space replace ≡ token-level greedy merge on random sequences (property)") {
    import org.scalacheck.{Gen, Prop}
    import org.scalacheck.Test.{check, Parameters}
    // reference semantics: left-to-right non-overlapping merge on the token list
    def greedy(toks: List[String], a: String, b: String): List[String] = toks match {
      case x :: y :: rest if x == a && y == b => (a + b) :: greedy(rest, a, b)
      case x :: rest => x :: greedy(rest, a, b)
      case Nil => Nil
    }
    // the engine's contract: double-space join + plain string replace
    def viaReplace(toks: List[String], a: String, b: String): List[String] =
      ("  " + toks.mkString("  ") + "  ")
        .replace(s" $a  $b ", s" $a$b ")
        .split(" ").filter(_.nonEmpty).toList
    val tok = Gen.oneOf("a", "b", "ab", "aa", "ba", "c")
    val prop = Prop.forAll(Gen.listOfN(12, tok), tok, tok) { (toks, a, b) =>
      viaReplace(toks, a, b) == greedy(toks, a, b)
    }
    val res = check(Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("BPE training: greedy merge contract on overlapping runs (aaa → [aa, a])") {
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // step 1: pair (a,a) appears twice per "aaa" × 2 occurrences = 4; the
    // greedy merge must leave [aa, a] (left-to-right, non-overlapping)
    // step 2: (aa,a) ×2 beats (a,b) ×1; step 3: the leftover (a,b)
    assert(merges == Seq(
      (1, "a a", "aa", 4L), (2, "aa a", "aaa", 2L), (3, "a b", "ab", 1L)))
  }

  test("BPE encode: trained merges applied corpus-wide, never across words") {
    import graft.operators.TextAnalysis
    val train = Seq((1L, "aaa aaa ab")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(train, 2).orderBy("step").collect()
      .map { r => val Array(a, b) = r.getString(1).split(" "); (a, b) }.toSeq
    assert(merges == Seq(("a", "a"), ("aa", "a")))
    val docs = Seq(
      (1L, "aaa aaa ab"), // [aaa][aaa][a b] → 4 tokens, 2 merged
      (2L, "a a"),        // adjacent single-char WORDS: merge must not cross
      (3L, ""),           // empty doc → 0 tokens
      (4L, "baaab")       // greedy inside a word: b aa a b → b aaa b
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bpeEncode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert((out(1L)._1, out(1L)._2) == ((4L, 2L)))
    assert((out(2L)._1, out(2L)._2) == ((2L, 0L)))
    assert(out(3L)._1 == 0L)
    assert((out(4L)._1, out(4L)._2) == ((3L, 1L)))
    // fingerprints are over the full token stream — distinct docs differ
    assert(out.values.map(_._3).toSet.size == 4)
  }

  test("xlsx export: two-sheet workbook round-trips values/types through a standard XML parse") {
    import graft.sources.Exports
    val acc = Seq(("crop", 41L, 0.9318, true), ("forest", 7L, 0.5, false))
      .toDF("label", "n", "acc", "ok")
    val summary = Seq((1, "a<b&\"c\">"), (2, null.asInstanceOf[String]))
      .toDF("id", "note")
    val path = java.nio.file.Files.createTempDirectory("xlsx").resolve("acc.xlsx").toString
    Exports.toXlsx(Seq("accuracy" -> acc, "summary/long name that exceeds the 31-char sheet cap" -> summary), path)

    val zf = new java.util.zip.ZipFile(path)
    try {
      val entries = Iterator.continually(zf.entries())
        .take(1).flatMap(e => Iterator.continually(e).takeWhile(_.hasMoreElements).map(_.nextElement().getName)).toSet
      assert(Set("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
        "xl/_rels/workbook.xml.rels", "xl/worksheets/sheet1.xml",
        "xl/worksheets/sheet2.xml").subsetOf(entries))
      def parse(name: String) = {
        val db = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
        db.parse(zf.getInputStream(zf.getEntry(name)))
      }
      // workbook: sheet names present, long one truncated to 31 chars with / cleaned
      val wb = parse("xl/workbook.xml")
      val sheetNames = {
        val ns = wb.getElementsByTagName("sheet")
        (0 until ns.getLength).map(i => ns.item(i).getAttributes.getNamedItem("name").getNodeValue)
      }
      assert(sheetNames == Seq("accuracy", "summary_long name that exceeds "))
      // sheet1: header row + typed cells
      val s1 = parse("xl/worksheets/sheet1.xml")
      val rows = s1.getElementsByTagName("row")
      assert(rows.getLength == 3)
      def cells(r: org.w3c.dom.Node): Seq[org.w3c.dom.Element] = {
        val ch = r.getChildNodes
        (0 until ch.getLength).map(ch.item).collect { case e: org.w3c.dom.Element => e }
      }
      val hdr = cells(rows.item(0)).map(_.getTextContent)
      assert(hdr == Seq("label", "n", "acc", "ok"))
      val r1 = cells(rows.item(1))
      assert(r1.map(_.getTextContent) == Seq("crop", "41", "0.9318", "1"))
      assert(r1(0).getAttribute("t") == "inlineStr" && r1(1).getAttribute("t") == "" &&
        r1(3).getAttribute("t") == "b")
      // sheet2: XML escaping survives, null → empty cell
      val s2 = parse("xl/worksheets/sheet2.xml")
      val r2 = s2.getElementsByTagName("row")
      assert(cells(r2.item(1)).map(_.getTextContent) == Seq("1", "a<b&\"c\">"))
      assert(cells(r2.item(2)).map(_.getTextContent) == Seq("2")) // null cell omitted
    } finally zf.close()

    // guarded collect: data-scale relations refuse loudly
    val big = spark.range(200).toDF("id")
    val e = intercept[IllegalArgumentException] {
      Exports.toXlsx(Seq("big" -> big), path, maxRows = 100)
    }
    assert(e.getMessage.contains("maxRows"))
  }

  test("gopherRules: exact integer boundaries (50 words, mwl 3.0/10.0, 10% symbols) decide inclusively") {
    val w49 = ("word " * 49).trim             // 49 words → f_wc 0
    val w50 = ("word " * 50).trim             // 50 words → f_wc 1 (inclusive)
    // exactly 10% symbols: 5 '#' chars in 50 words → 50 ≤ 50 passes;
    // 6 '#' → 60 > 50 fails. '#####' is ONE word of the 50.
    val sym10 = ("word " * 49).trim + " #####"
    val sym12 = ("word " * 49).trim + " ######"
    // mean word length exactly 3 (inclusive low bound) and exactly >10
    val mwl3 = ("abc " * 50).trim
    val mwl11 = ("abcdefghijk " * 50).trim
    val docs = Seq((1L, w49), (2L, w50), (3L, sym10), (4L, sym12),
      (5L, mwl3), (6L, mwl11)).toDF("doc_id", "text")
    val m = graft.operators.TextAnalysis.gopherRules(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getAs[Int]("f_wc") == 0 && m(2L).getAs[Int]("f_wc") == 1)
    assert(m(3L).getAs[Int]("f_sym") == 1 && m(4L).getAs[Int]("f_sym") == 0)
    assert(m(5L).getAs[Int]("f_mwl") == 1 && m(6L).getAs[Int]("f_mwl") == 0)
    // the symbol word '#####' has no alphabetic char: 49/50 < 0.8? no —
    // 49·5 = 245 ≥ 200 → alpha still passes (sanity that rules are
    // independent)
    assert(m(3L).getAs[Int]("f_alpha") == 1)
  }

  test("pplBuckets: per-lang thirds are score-monotone (head ≥ middle ≥ tail) and cover every doc") {
    // common trigrams ("aaa...") score high; rare mixtures score low —
    // 12 docs per lang spanning a natural-ness gradient
    val docs = (for {
      lang <- Seq("xx", "yy")
      i <- 0 until 12
    } yield {
      val common = "aaaa" * 6
      val rare = ('b' + i).toChar.toString * 2 + ('n' + i).toChar + ('f' + i).toChar
      val id = (if (lang == "xx") 0 else 100) + i.toLong
      (id, common.take(24 - 2 * i) + rare * i, lang)
    }).toDF("doc_id", "text", "lang")
    val out = graft.operators.TextAnalysis.pplBuckets(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getString(3)))
    assert(out.length == 24, s"coverage: ${out.length} != 24")
    for (l <- Seq("xx", "yy")) {
      val g = out.filter(_._2 == l).groupBy(_._4)
        .map { case (b, rs) => b -> rs.map(_._3) }
      assert(Set("head", "middle", "tail").subsetOf(g.keySet), s"$l: $g")
      assert(g("head").min >= g("middle").max, s"$l head/middle overlap")
      assert(g("middle").min >= g("tail").max, s"$l middle/tail overlap")
    }
  }

  test("srpPairs: copies collide at Hamming 0, antipodes never pair, dot_q is the exact integer dot") {
    val rnd = new scala.util.Random(11)
    val base = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val other = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    val rows = Seq(
      (1L, base.toSeq), (2L, base.toSeq),                 // exact copy pair
      (3L, base.map(-_).toSeq),                           // antipode of 1/2
      (4L, other.toSeq)                                   // unrelated
    ).toDF("vec_id", "embedding")
    val out = Similarity.srpPairs(rows, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    // the copy pair survives at Hamming 0
    val copy = out.find(p => p._1 == 1L && p._2 == 2L)
    assert(copy.isDefined && copy.get._3 == 0, s"copy pair missing: ${out.toSeq}")
    // dot_q equals the manual integer dot of the quantized copy with itself
    val q = Similarity.quantizeInt8(rows.filter($"vec_id" === 1L))
      .select("qvec").collect()(0).getSeq[Int](0)
    val expectDot = q.map(x => x.toLong * x).sum
    assert(copy.get._4 == expectDot, s"dot_q ${copy.get._4} != $expectDot")
    // sign flip complements every signature bit → Hamming 32, never banded
    assert(!out.exists(p => p._2 == 3L || p._1 == 3L),
      s"antipode paired: ${out.toSeq}")
  }

  test("mixTemperature: √n up-weights small sources, caps at 1.0, hash-deterministic") {
    // 2 sources, 9:1 skew: big=180 docs, small=20 docs → total 200,
    // target 120, denom = √180+√20 ≈ 17.888
    val docs = ((0 until 180).map(i => (i.toLong, "big")) ++
      (200 until 220).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = graft.operators.TextAnalysis.mixTemperature(docs)
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected rates: r_small = 120·(√20/denom)/20 = 1.5 → capped 1.0;
    // r_big = 120·(√180/denom)/180 = 0.5 → small keeps ALL, big ~half
    assert(kept("small") == 20L, s"small source not fully kept: $kept")
    assert(kept("big") > 60L && kept("big") < 120L,
      s"big source keep count implausible for rate 0.5: $kept")
    // proportional (τ=1) would keep both at 0.6 — the observed rates differ
    // across sources, so the temperature reweighting is live
    // determinism: same input → identical kept set
    val again = graft.operators.TextAnalysis.mixTemperature(docs)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    val first = out.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(java.util.Arrays.equals(first, again))
  }

  test("turnBoilerplate: scale-relative threshold flags cross-conv repeated content only") {
    // 4 conversations; content "HELLO" appears in 3 of 4 (≥ half → boiler),
    // "rare" in 1 of 4 (< half → clean). Normalization strips the conv:idx:
    // prefix, lowercases, collapses whitespace.
    val turns = Seq(
      ("c1", 0, "u", "c1:0:HELLO   world", null, ts(0)),
      ("c1", 1, "a", "c1:1:rare", null, ts(1)),
      ("c2", 0, "u", "c2:0:hello world", null, ts(2)),
      ("c3", 0, "u", "c3:0:Hello World", null, ts(3)),
      ("c4", 0, "u", "c4:0:other", null, ts(4)),
      ("c4", 1, "a", "c4:1:hello world", null, ts(5))
    ).toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = Dedup.turnBoilerplate(turns).orderBy("conv_id").collect()
    val m = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // hello-world appears in convs {c1,c2,c3,c4} = 4 of 4 ≥ 2 → boiler;
    // "rare"/"other" in 1 conv each → clean
    assert(m("c1") == ((2L, 1L, 0L)), s"c1: ${m("c1")}")
    assert(m("c2") == ((1L, 1L, 0L)))
    assert(m("c3") == ((1L, 1L, 0L)))
    assert(m("c4") == ((2L, 1L, 1L)), "boiler_idx_sum must point at turn 1")
    // frac is int/int exact
    assert(out.find(_.getString(0) == "c1").get.getDouble(4) == 0.5)
  }

  private def ts(sec: Int) = new java.sql.Timestamp(1735689600000L + sec * 1000L)

  test("stratifiedSampling: ceil(alloc*overhead) per stratum in hash order; WindowGroupLimit plan") {
    import graft.operators.Accuracy
    val classes = (0 until 200).map { i =>
      (s"k$i", if (i % 2 == 0) "a" else "b")
    }.toDF("key", "lab")
    val alloc = Seq(("a", 10.0), ("b", 2.5)).toDF("label", "alloc")
    val out = Accuracy.stratifiedSampling(classes, alloc, "lab", "key")
    val got = out.collect()
    // ceil(10*1.2)=12 for a, ceil(2.5*1.2)=3 for b
    val byLab = got.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    assert(byLab == Map("a" -> 12, "b" -> 3), s"got $byLab")
    // deterministic: the selected keys are the smallest by u32(md5(key))
    val expectA = (0 until 200).filter(_ % 2 == 0).map(i => s"k$i")
      .sortBy { k =>
        val h = java.security.MessageDigest.getInstance("MD5")
          .digest(k.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        (java.lang.Long.parseLong(h, 16), k)
      }.take(12).toSet
    assert(got.filter(_.getString(1) == "a").map(_.getString(0)).toSet == expectA)
    // plan: the constant max-want bound must plan a WindowGroupLimit
    assert(out.queryExecution.executedPlan.toString.contains("WindowGroupLimit"),
      "per-stratum top-k must be a partial WindowGroupLimit, not a full sort")
  }

  test("bloomScreen: no false negatives, near-dups clean at 16 bits/key, saturated filter flags everything") {
    val build = (0 until 64).map(i => (i.toLong, s"base document number $i with words"))
      .toDF("doc_id", "text")
    val exact = (0 until 64 by 7).map(i =>
      (i + 1000L, s"base document number $i with words"))
    val novel = (0 until 8).map(i => (i + 2000L, s"entirely new text $i"))
    val probe = (exact ++ novel).toDF("doc_id", "text")
    val out = Dedup.bloomScreen(build, probe).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2), r.getBoolean(3))).toMap
    // members: all 4 bits hit, flagged, is_member true — a Bloom filter
    // NEVER false-negatives
    exact.foreach { case (id, _) =>
      assert(out(id) == ((4, true, true)), s"member $id: ${out(id)}") }
    // 16 bits/key, 64 keys → m = 1024, fill ≈ 0.22: the 8 novel docs all
    // clean at these constants (fixed md5 → deterministic)
    novel.foreach { case (id, _) =>
      val (_, seen, member) = out(id)
      assert(!member, s"novel doc $id cannot be a true member")
      assert(!seen, s"novel doc $id flagged at 16 bits/key")
    }
    // saturation: 0 bits/key is clamped to m=1 → every position collides →
    // everything maybe_seen (the FP branch is reachable and detected by
    // is_member disagreeing)
    val sat = Dedup.bloomScreen(build, probe, bitsPerKey = 0).collect()
    assert(sat.forall(_.getBoolean(2)), "m=1 filter must flag every probe")
    assert(sat.exists(r => r.getBoolean(2) && !r.getBoolean(3)),
      "saturated filter must show observable false positives")
  }

  test("dsirSelect: target-like raw docs outrank target-unlike; weights are integer micros") {
    import graft.operators.TextAnalysis
    // target speaks "alpha beta", off-distribution raw speaks "zulu yankee"
    val docs = (
      (0 until 20).map(i => (i.toLong, "alpha beta alpha beta alpha", "t")) ++
      Seq((100L, "alpha beta alpha beta", "r"),      // target-like raw
          (101L, "zulu yankee zulu yankee", "r"),    // off-distribution raw
          (102L, "alpha zulu beta yankee", "r"))     // mixed
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.dsirSelect(docs, col("lang") === "t", k = 3).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(100L, 102L, 101L),
      s"ranking wrong: ${out.map(_.getLong(0)).toSeq}")
    // the target-like doc must carry positive importance, the alien negative
    val byId = out.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(100L) > 0, s"target-like weight not positive: ${byId(100L)}")
    assert(byId(101L) < 0, s"alien weight not negative: ${byId(101L)}")
  }

  test("qualityModelFilter: model ranks label-positive docs first, keeps exactly the top fraction") {
    import graft.operators.TextAnalysis
    // long docs (y=1) use long words → high f_mwl; short docs (y=0) short
    // words → the mean-word-length feature carries the label signal
    val docs = (
      (0 until 10).map(i => (i.toLong, Seq.fill(60)("standard").mkString(" "), "en")) ++
      (10 until 20).map(i => (i.toLong, Seq.fill(10)("aa").mkString(" "), "en"))
    ).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.qualityModelFilter(docs).collect()
    // 20 docs * 2/5 = 8 kept
    assert(out.length == 8, s"expected 8 kept, got ${out.length}")
    // all kept docs are the high-feature (y=1) class — the model's score
    // ordering reflects training even when no score crosses 0.5
    assert(out.forall(_.getInt(1) == 1),
      s"kept set leaked label-0 docs: ${out.map(r => (r.getLong(0), r.getInt(1))).toSeq}")
    // ties in score settle by doc_id: kept ids are the 8 smallest of class 1
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until 8L),
      s"tie-break by doc_id violated: ${out.map(_.getLong(0)).sorted.toSeq}")
  }

  test("cmsWordFreq: one-sided guarantee est >= true; tiny sketch shows collisions; absent words zero truth") {
    import graft.operators.Summary
    val docs = Seq(
      (1L, "aa aa aa bb cc"), (2L, "aa bb dd ee ff"), (3L, "gg hh ii jj kk")
    ).toDF("doc_id", "text")
    val probes = Seq("aa", "bb", "gg", "zz")
    val wide = Summary.cmsWordFreq(docs, probes).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(wide("aa")._1 == 4 && wide("bb")._1 == 2 && wide("zz")._1 == 0)
    // est >= true everywhere (CMS never undercounts)
    assert(wide.values.forall { case (t, e, o) => e >= t && o == e - t })
    // at w=1024 and 11 distinct words, collisions are absent → est exact
    assert(wide.values.forall { case (t, e, _) => e == t })
    // w=2 forces collisions: estimates still >= true, and at least one probe
    // overcounts (13 occurrences into 2 columns)
    val tiny = Summary.cmsWordFreq(docs, probes, d = 2, w = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(tiny.forall { case (t, e) => e >= t })
    assert(tiny.exists { case (t, e) => e > t }, "no collision at w=2?")
  }

  test("curateConversations: boiler screen, turn floor, and whole-conv dedup each bite") {
    def conv(id: String, contents: Seq[String]) =
      contents.zipWithIndex.map { case (c, i) =>
        (id, i, "u", s"$id:$i:$c", null: String, ts(i)) }
    val boilerTxt = "please see our terms"
    val rows =
      conv("c1", boilerTxt +: (1 to 5).map(i => s"c1 unique $i")) ++
      conv("c2", boilerTxt +: (1 to 5).map(i => s"c2 unique $i")) ++
      conv("c3", boilerTxt +: (1 to 5).map(i => s"c3 unique $i")) ++
      conv("c4", boilerTxt +: (1 to 5).map(i => s"c4 unique $i")) ++
      conv("x9", boilerTxt +: (1 to 5).map(i => s"c1 unique $i")) ++ // c1 copy
      conv("c0", (1 to 3).map(i => s"c0 unique $i"))                 // short
    val turns = rows.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = Dedup.curateConversations(turns).orderBy("conv_id").collect()
    // boiler: "please see our terms" sits in 5 of 6 convs (2·5 ≥ 6) →
    // screened; each surviving conv keeps 5 of 6 turns. c0 dies on the
    // floor (3 < 4); x9 collapses onto c1 (identical kept content).
    assert(out.map(_.getString(0)).toSeq == Seq("c1", "c2", "c3", "c4"),
      s"kept: ${out.map(_.getString(0)).toSeq}")
    assert(out.forall(r => r.getLong(1) == 6L && r.getLong(2) == 5L))
    // the copy's fingerprint equals the original's (same kept content)
    assert(out.map(_.getString(3)).distinct.length == 4)
  }

  test("ngramContainment: subset duplication pins cont1=1.0 while jaccard stays below") {
    // doc 2 contains doc 1 verbatim plus a long tail: every shingle of 1 is
    // in 2, but 2 has many extra shingles
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, base),
      (2L, base + " iota kappa lambda mu nu xi omicron pi rho sigma")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id1", "id2")
    val r = Dedup.ngramContainment(docs, pairs).collect()(0)
    assert(r.getDouble(3) == 1.0, s"cont1 != 1.0: $r") // A fully inside B
    assert(r.getDouble(2) < 0.5, s"jaccard should stay low: $r")
    assert(r.getDouble(4) < 1.0, s"cont2 must reflect B's extra content: $r")
  }

  test("encodingScreen: replacement/control chars flagged, valid unicode passes, tab/newline exempt") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "plain ascii text"),
      (2L, "héllo wörld ünicode"),       // valid non-ASCII
      (3L, "broken � decode � here"),          // two replacements
      (4L, "ctrl\u0001and\u0007bytes"),                  // two control chars
      (5L, "tab\tnewline\ncr\r ok")                      // exempt whitespace
    ).toDF("doc_id", "text")
    val out = TextAnalysis.encodingScreen(docs).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getBoolean(3))).toMap
    assert(out(1L) == ((0, 0, true)))
    assert(out(2L) == ((0, 0, true)), "valid unicode must not flag")
    assert(out(3L) == ((2, 0, false)))
    assert(out(4L) == ((0, 2, false)))
    assert(out(5L) == ((0, 0, true)), "tab/newline/cr are exempt")
  }

  test("chatLint: role-alternation counters and opening-turn flag") {
    val turns = Seq(
      // c1: user→assistant→tool — clean
      ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "tool"),
      // c2: opens with assistant, double-assistant break, tool after user
      ("c2", 0, "assistant"), ("c2", 1, "assistant"),
      ("c2", 2, "user"), ("c2", 3, "tool")
    ).map { case (c, i, r) => (c, i, r, s"$c:$i:x", null: String, ts(i)) }
      .toDF("conv_id", "turn_idx", "role", "text", "tool", "ts")
    val out = graft.operators.Select.chatLint(turns).orderBy("conv_id").collect()
    val c1 = out(0); val c2 = out(1)
    assert(c1.getLong(1) == 3 && c1.getBoolean(2) && c1.getLong(3) == 0 &&
      c1.getLong(4) == 0 && c1.getDouble(5) == 0.0)
    assert(c2.getLong(1) == 4 && !c2.getBoolean(2) && c2.getLong(3) == 1 &&
      c2.getLong(4) == 1 && c2.getDouble(5) == 0.25)
  }

  test("corpusBudget: cell counts exact, word shares sum to 100") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "one two three", "en", "a"),
      (2L, "four five", "en", "a"),
      (3L, "six seven eight nine ten", "de", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.corpusBudget(docs).orderBy("lang", "source").collect()
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(6))).toMap
    assert(m(("en", "a")) == ((2L, 5L, 50.0)))
    assert(m(("de", "b")) == ((1L, 5L, 50.0)))
    assert(math.abs(out.map(_.getDouble(6)).sum - 100.0) < 1e-6)
  }

  test("clusterFrequency margins and clusterClean majority filter with R tie-break") {
    val clustered = Seq(
      ("c1", 1, "A"), ("c2", 1, "A"), ("c3", 1, "B"),
      ("c4", 2, "B"), ("c5", 2, "A")  // cluster 2 tie A/B → first label 'A'
    ).toDF("conv_id", "cluster", "label")
    val freq = ChangeDetect.clusterFrequency(clustered).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(freq(("A", "1")) == 2 && freq(("B", "1")) == 1)
    assert(freq(("Total", "1")) == 3 && freq(("A", "Total")) == 3)
    assert(freq(("Total", "Total")) == 5)
    val clean = ChangeDetect.clusterClean(clustered).collect()
      .map(_.getString(2)).sorted
    // cluster 1 keeps its two A's; cluster 2's tie resolves to A (which.max
    // first-max over the label-sorted table) → c5 kept, c4 dropped
    assert(clean.toSeq == Seq("c1", "c2", "c5"),
      s"clean kept: ${clean.toSeq}")
  }

  test("CMS mergeability: sketch(A ++ B) == cellwise sum of sketch(A) and sketch(B)") {
    import graft.operators.Summary
    val rnd = new scala.util.Random(11)
    def corpus(idBase: Long, n: Int) = (0 until n).map(i =>
      (idBase + i, Seq.fill(5 + rnd.nextInt(10))(s"w${rnd.nextInt(40)}").mkString(" ")))
    val a = corpus(0, 30); val b = corpus(1000, 20)
    def sketch(rows: Seq[(Long, String)]) =
      Summary.cmsCells(rows.toDF("doc_id", "text"), 4, 64)
        .groupBy("r", "pos").agg(count(lit(1)).as("cnt"))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val sa = sketch(a); val sb = sketch(b); val sab = sketch(a ++ b)
    val merged = (sa.keySet ++ sb.keySet).map(k =>
      k -> (sa.getOrElse(k, 0L) + sb.getOrElse(k, 0L))).toMap
    assert(sab == merged, "sketch is not additive across batches")
  }

  test("DSIR antisymmetry: swapping target and raw negates every bucket log-ratio") {
    import graft.operators.TextAnalysis
    // lr(b) = ln(ct+1) - ln(nt+B) - ln(cr+1) + ln(nr+B): exchanging the two
    // corpora negates it exactly; per-doc micro sums must mirror too (same
    // grams scored in both directions when both corpora share a doc text)
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, shared, "t"), (2L, "zulu yankee xray whisky victor", "t"),
      (3L, "alpha alpha alpha beta", "t"), // asymmetry: nonzero ratios
      (11L, shared, "r"), (12L, "zulu yankee xray whisky victor", "r"))
      .toDF("doc_id", "text", "lang")
    val fwd = TextAnalysis.dsirSelect(docs, col("lang") === "t", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rev = TextAnalysis.dsirSelect(docs, col("lang") === "r", k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // doc 11 scored against target-t ≡ doc 1 scored against target-r with
    // the ratio flipped: same grams, mirrored corpora → negated micros
    assert(fwd(11L) != 0L, "asymmetric corpora must give nonzero importance")
    assert(fwd(11L) == -rev(1L), s"${fwd(11L)} vs ${-rev(1L)}")
    assert(fwd(12L) == -rev(2L))
  }

  test("simhash64: identical docs at Hamming 0, near edit within band reach, halves unsigned") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok40", "tok40x") // one-token edit
    val far = (100 to 140).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, near), (4L, far))
      .toDF("doc_id", "text")
    val sigs = Dedup.simhash64(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // halves stay within unsigned 32-bit range (no BIGINT sign-bit games)
    sigs.values.foreach { case (h, l) =>
      assert(h >= 0 && h < (1L << 32) && l >= 0 && l < (1L << 32)) }
    assert(sigs(1L) == sigs(2L), "identical docs must share the signature")
    val pairs = Dedup.simhash64BandPairs(docs, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs(( 1L, 2L)) == 0, "exact pair at Hamming 0")
    // a one-token edit flips few vote balances over 40 tokens; if within 3
    // it must be found via banding; the alien doc must never pair
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"alien doc paired: ${pairs.keySet}")
  }

  test("classAccuracy: hand-worked UA/PA and kappa; prediction-only class handled") {
    import graft.operators.Accuracy
    // actual:    a a a b b c
    // predicted: a a b b b d   (d never occurs in actual)
    val df = Seq(("a","a"),("a","a"),("a","b"),("b","b"),("b","b"),("c","d"))
      .toDF("y", "yhat")
    val out = Accuracy.classAccuracy(df, "y", "yhat").collect()
      .map(r => r.getString(0) -> r).toMap
    // po = 4/6; pe = (2*3 + 3*2 + 0*1 + 1*0)/36 = 12/36
    // kappa = (2/3 - 1/3) / (1 - 1/3) = 0.5
    assert(out("a").getDouble(7) == 0.5, s"kappa: ${out("a").getDouble(7)}")
    assert(out("a").getDouble(6) == 0.6667)
    assert(out("a").getDouble(4) == 1.0)     // UA(a) = 2/2
    assert(out("a").getDouble(5) == 0.6667)  // PA(a) = 2/3
    assert(out("b").getDouble(4) == 0.6667)  // UA(b) = 2/3
    // 'd' was never an actual class: PA undefined (null), UA = 0
    assert(out("d").isNullAt(5), "PA of prediction-only class must be null")
    assert(out("d").getDouble(4) == 0.0)
    // 'c' was never predicted: UA null
    assert(out("c").isNullAt(4))
  }

  test("jlProject: integer projections bounded, copies collide, top-k respects cluster structure") {
    val rnd = new scala.util.Random(5)
    // two well-separated direction families in 64-d
    def vec(family: Int) = Array.tabulate(64)(d =>
      (if ((d % 2 == family % 2)) 1.0 else 0.05) * (0.8 + 0.4 * rnd.nextDouble()))
    val rows = (0 until 20).map(i => (i.toLong, vec(i % 2).toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val proj = Similarity.jlProject(emb).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(proj.values.forall(p => p.length == 16 &&
      p.forall(x => math.abs(x) <= 64L * 127)), "projection out of bounds")
    // identical input vectors project identically
    val twin = Seq((100L, rows.head._2), (101L, rows.head._2))
      .toDF("vec_id", "embedding")
    val tp = Similarity.jlProject(twin).collect().map(_.getSeq[Long](1))
    assert(tp(0) == tp(1))
    // top-3 of an even-family query lands in the even family (JL preserves
    // the families' separation)
    val top = Similarity.jlTopK(emb, col("vec_id") === 0, k = 3).collect()
    assert(top.forall(_.getLong(1) % 2 == 0),
      s"JL top-k crossed families: ${top.map(_.getLong(1)).toSeq}")
  }

  test("substringDups: planted shared span found, interval union exact, short dups missed by design") {
    // k=20, stride=8. Unique filler built from doc-specific characters so
    // no accidental cross-doc grams; SHARED is a 40-char span planted in
    // docs 1 and 2 at different offsets.
    val shared = "the quick brown fox jumps over lazy dogs" // 40 chars
    def filler(c: Char, n: Int) = {
      val rnd = new scala.util.Random(c.toInt) // doc-unique, non-periodic
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val d1 = filler('x', 24) + shared + filler('y', 24)
    val d2 = filler('q', 48) + shared + filler('r', 8)
    val d3 = filler('m', 90) // no dup anywhere
    val docs = Seq((1L, d1), (2L, d2), (3L, d3)).toDF("doc_id", "text")
    val out = Dedup.substringDups(docs, k = 20, stride = 8)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    val byId = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // doc 3: clean
    assert(byId(3L) == ((9L, 0L, 0L)))
    // docs 1 and 2: at least one sampled gram falls inside the shared span
    // in BOTH docs (span length 40 ≥ k + stride − 1 = 27 guarantees it),
    // and the covered chars never exceed the span (no false positives
    // outside, union ≤ 40) and are at least k (one full gram)
    for (id <- Seq(1L, 2L)) {
      val (_, nDup, dupChars) = byId(id)
      assert(nDup >= 1, s"doc $id: shared span not detected")
      assert(dupChars >= 20 && dupChars <= 40,
        s"doc $id: dup_chars=$dupChars outside [k, span]")
    }
    // interval-union math: adjacent sampled dup grams (gap 8 < k) merge —
    // a doc duplicated WHOLE gives dup_chars == n_grams-cover exactly
    val twin = Seq((10L, d3), (11L, d3)).toDF("doc_id", "text")
    val t = Dedup.substringDups(twin, k = 20, stride = 8)
      .orderBy("doc_id").collect()
    // 9 grams at stride 8: union = 8*8 + 20 = 84 chars of the 90
    assert(t.forall(r => r.getLong(1) == 9L && r.getLong(2) == 9L &&
      r.getLong(3) == 84L))
    // short duplicate (< k+stride−1) may be missed: 10-char shared span
    val s10 = "0123456789"
    val m1 = filler('a', 30) + s10 + filler('b', 32)
    val m2 = filler('c', 37) + s10 + filler('d', 25)
    val miss = Dedup.substringDups(
      Seq((20L, m1), (21L, m2)).toDF("doc_id", "text"), k = 20, stride = 8)
      .agg(sum("n_dup")).collect()(0).getLong(0)
    assert(miss == 0L, "sub-threshold span should not produce dup grams")
  }

  test("piiRedact: typed placeholders, counts from pre-redaction text, email consumed before phone") {
    val docs = Seq(
      (1L, "write to a+1234567@x.com or call +447911123456"),
      (2L, "see https://ex.org/a_b and mail bob@ex.net today"),
      (3L, "clean text, nothing to scrub")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.piiRedact(docs)
      .orderBy("doc_id").collect()
    // doc 1: the digit-bearing email local part must be consumed by the
    // email stage — a phone-first order would leave "a<PHONE>@x.com"
    assert(out(0).getString(1) == "write to <EMAIL> or call <PHONE>")
    assert(out(0).getLong(2) == 2L)
    assert(out(1).getString(1) == "see <URL> and mail <EMAIL> today")
    assert(out(1).getLong(2) == 2L)
    assert(out(2).getString(1) == "clean text, nothing to scrub")
    assert(out(2).getLong(2) == 0L)
  }
}
