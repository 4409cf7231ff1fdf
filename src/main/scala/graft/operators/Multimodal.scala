package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for training-data pipelines — engine addition
  * (no sits analog): media ride along as opaque `binary` columns with typed
  * metadata; decode / feature-extraction runs batched per partition.
  *
  * The actual media codecs are NOT in this container, so [[decodeStub]] is a
  * clearly-marked deterministic FAKE decoder (metadata derived from payload
  * bytes). Everything around it — schema, binary column handling, batched
  * mapPartitions shape, deterministic output — is the real production
  * plumbing: swap `stubDecode` for an image/audio library call and nothing
  * else changes. Per-partition batching is the shape that amortizes model /
  * codec initialization (one init per partition, not per row).
  */
object Multimodal {

  /** Attach the opaque media payload + declared metadata. In production the
    * payload is the stored media blob; here it is the UTF-8 text bytes.
    */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("payload"),
      struct(col("source").as("origin"), col("n_chars").as("declared_len"))
        .as("media_meta"))

  /** STUB media decode (deterministic fake): derives "image" metadata and a
    * frame-sample count from the raw bytes. Replace the body marked STUB
    * with a real codec to productionize; the Spark plumbing stays.
    */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        // ---- per-partition init would happen here (codec/model load) ----
        batch.map { case (id, bytes) =>
          // ---- STUB decode: deterministic fake features from bytes ----
          val len = bytes.length
          val first = if (len > 0) bytes(0) & 0xff else 0
          val width = 64 + (len % 64)
          val height = 64 + (first % 64)
          val frames = len / 100 + 1
          (id, len, width, height, frames)
        }
      }
      .toDF("doc_id", "byte_len", "width", "height", "frames")
  }

  /** Deterministic frame sampling plan for a decoded media row: every
    * `stride`-th frame index — pure Catalyst, demonstrates the
    * explode-to-frames shape used for video pipelines.
    */
  def frameSample(decoded: DataFrame, stride: Int): DataFrame =
    decoded.select(col("doc_id"),
      posexplode(expr(s"sequence(0, frames - 1, $stride)")).as(Seq("k", "frame_idx")))
}
