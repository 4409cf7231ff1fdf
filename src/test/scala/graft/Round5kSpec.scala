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

  test("zoneMap + decodeWhereAtLeast: zone-excluded chunks never reach the codec") {
    import graft.model.{ChunkStruct, Tier}
    import graft.operators.ChunkStore
    import graft.functions.GorillaCodec
    val step = Tier.M1.millis
    val t0 = 1704067200000L
    def chunk(conv: String, startMs: Long, vals: Array[Double]) =
      ChunkStruct(conv, "1m", new java.sql.Timestamp(startMs), vals.length,
        "gorilla_lp+dod",
        GorillaCodec.encodeRegularTimestamps(startMs, step, vals.length),
        GorillaCodec.encodeValuesLP(vals))
    val hot = chunk("hot", t0, Array(10.0, 60.0, 20.0))
    val cold = chunk("cold", t0, Array(1.0, 2.0, 3.0))
    val ds = spark.createDataset(Seq(hot, cold))(
      org.apache.spark.sql.Encoders.product[ChunkStruct])
    // zone map carries exact per-chunk bounds
    val z = ChunkStore.zoneMap(spark, ds).orderBy("conv_id").collect()
      .map(r => (r.getString(0), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(z.toSeq == Seq(("cold", 0L, 1.0, 3.0), ("hot", 0L, 10.0, 60.0)))
    // corrupt the zone-excluded chunk: a pruned read must never decode it
    val zone = ChunkStore.zoneMap(spark, ds)
    val poisoned = spark.createDataset(Seq(hot,
      cold.copy(value_payload = Array[Byte](1, 2, 3))))(
      org.apache.spark.sql.Encoders.product[ChunkStruct])
    val out = ChunkStore.decodeWhereAtLeast(spark, poisoned, zone, 50.0)
      .collect().map(r => (r.getString(0), r.getDouble(2)))
    assert(out.toSeq == Seq(("hot", 60.0)), out.toSeq)
    // sanity: the poisoned chunk DOES blow up an unpruned full decode
    intercept[org.apache.spark.SparkException] {
      ChunkStore.decode(spark, poisoned).count()
    }
  }

  test("lshCurve: S-curve endpoints and the b=4,r=2 midpoint") {
    val jac = Seq((1L, 2L, 1.0), (3L, 4L, 0.0), (5L, 6L, 0.5))
      .toDF("id1", "id2", "jaccard")
    val r = Dedup.lshCurve(jac, bandsB = 4, rowsR = 2).orderBy("id1")
      .collect().map(_.getDouble(3)).toSeq
    // p(1)=1, p(0)=0, p(0.5) = 1 - 0.75^4 = 0.6836
    assert(r == Seq(1.0, 0.0, 0.6836), r.toString)
  }

  test("apdex classification: satisfied/tolerating/frustrated buckets") {
    import org.apache.spark.sql.expressions.Window
    // gaps of 1h (satisfied), 12h (tolerating), 48h (frustrated)
    val h0 = 1704067200000L
    val rows = Seq(
      ("a", 0, "t1", new java.sql.Timestamp(h0)),
      ("a", 1, "t1", new java.sql.Timestamp(h0 + 3600000L)),
      ("a", 2, "t1", new java.sql.Timestamp(h0 + 3600000L + 43200000L)),
      ("a", 3, "t1", new java.sql.Timestamp(h0 + 3600000L + 43200000L
        + 172800000L)))
      .toDF("conv_id", "turn_idx", "tool", "ts")
    val w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    val d = rows.withColumn("d",
      unix_millis(lead("ts", 1).over(w)) - unix_millis(col("ts")))
      .filter(col("d").isNotNull)
    val ag = d.groupBy("tool")
      .agg(count(lit(1)).as("n"),
        sum(when(col("d") <= 21600000L, 1L).otherwise(0L)).as("sat"),
        sum(when(col("d") > 21600000L && col("d") <= 86400000L, 1L)
          .otherwise(0L)).as("tol"))
      .collect()(0)
    // 1 satisfied, 1 tolerating, 1 frustrated -> apdex (1 + 0.5)/3 = 0.5
    assert(ag.getLong(1) == 3 && ag.getLong(2) == 1 && ag.getLong(3) == 1)
  }
}
