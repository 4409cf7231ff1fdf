package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import graft.functions.GorillaCodec
import graft.model.{ChunkStruct, GridPoint, Tier}

/** Byte-packed chunk encoding of per-conversation series (north rule):
  * one ChunkStruct row per (conv, tier) holding delta-of-delta timestamps +
  * Gorilla-XOR values. At 10^12 turns this is what the retention tiers
  * physically store — a ~10-30× smaller table whose row count is O(#convs),
  * not O(#points), and which decodes streamingly per conversation.
  *
  * Encode/decode are typed mapGroups/flatMap over secondary-sorted groups —
  * group memory is bounded by timeline length (≙ the reference's
  * memory-bounded block planning, /root/reference/R/api_jobs.R:10-81).
  */
object ChunkStore {

  /** grid (conv_id, bucket_ts, value) → one chunk per conv. */
  def encode(spark: SparkSession, grid: DataFrame, tier: Tier): Dataset[ChunkStruct] = {
    import spark.implicits._
    grid.select(col("conv_id"), col("bucket_ts"), col("value").cast("double"))
      .as[GridPoint]
      .groupByKey(_.conv_id)
      .mapGroups { (conv, it) =>
        val pts = it.toArray.sortBy(_.bucket_ts.getTime)
        val ts = pts.map(_.bucket_ts.getTime)
        val vs = pts.map(_.value)
        ChunkStruct(conv, tier.name, pts.head.bucket_ts, pts.length, "gorilla+dod",
          GorillaCodec.encodeTimestamps(ts), GorillaCodec.encodeValues(vs))
      }
  }

  /** chunks → grid points (exact inverse of [[encode]]). */
  def decode(spark: SparkSession, chunks: Dataset[ChunkStruct]): Dataset[GridPoint] = {
    import spark.implicits._
    chunks.flatMap { c =>
      val ts = GorillaCodec.decodeTimestamps(c.ts_payload)
      val vs = GorillaCodec.decodeValues(c.value_payload)
      require(ts.length == c.n && vs.length == c.n,
        s"chunk ${c.conv_id}/${c.tier}: decoded ${ts.length}/${vs.length} != ${c.n}")
      Array.tabulate(c.n)(i => GridPoint(c.conv_id, new java.sql.Timestamp(ts(i)), vs(i)))
    }
  }
}
