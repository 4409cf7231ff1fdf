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

  /** Perceptual average-hash (aHash) over the raw payload bytes — the
    * classic 8×8 image fingerprint applied to the opaque media column:
    * split the payload into 64 byte buckets (bucket of byte i = ⌊i·64/len⌋,
    * the same floor-division frame rule as LTTB/PAA), set bit j when
    * bucket j's mean byte EXCEEDS the whole-payload mean. The comparison
    * is INTEGER cross-multiplication (Σ_j·len > Σ_all·cnt_j) — no float
    * anywhere, hash-exact cross-engine. With a real image codec the input
    * would be the decoded 8×8 luma plane; the bucket math is identical
    * (swap [[decodeStub]]'s role — the Spark plumbing stays).
    *
    * One typed mapPartitions kernel (the simhash lesson: per-row iterative
    * byte math beats interpreted HOF lambdas), map-only — no shuffle.
    * Empty payloads carry no perceptual content and are dropped (both
    * engines by construction). Output: (doc_id, hash_hi, hash_lo) — two
    * non-negative 32-bit halves (a single signed 64-bit BIGINT would wrap
    * at bit 63 differently across engines).
    */
  def phash(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val len = bytes.length
          if (len == 0) None
          else {
            val sums = new Array[Long](64)
            val cnts = new Array[Long](64)
            var tot = 0L
            var i = 0
            while (i < len) {
              val j = ((i.toLong * 64) / len).toInt
              val v = (bytes(i) & 0xff).toLong
              sums(j) += v; cnts(j) += 1; tot += v
              i += 1
            }
            var hi = 0L; var lo = 0L
            var j = 0
            while (j < 64) {
              if (sums(j) * len > tot * cnts(j)) {
                if (j >= 32) hi |= 1L << (j - 32) else lo |= 1L << j
              }
              j += 1
            }
            Some((id, hi, lo))
          }
        }
      }
      .toDF("doc_id", "hash_hi", "hash_lo")
  }

  /** Byte-histogram Shannon entropy per payload — the media-QA screen that
    * separates text-like (≈4–5 bits), structured, and compressed/encrypted
    * (≈8 bits) payloads without decoding them. The ln values are quantized
    * to integer ten-thousandths BEFORE summation (the zipf lesson), so the
    * per-doc sum Σ c·q(ln c) is an exact integer and
    * H = (n·q(ln n) − Σ c·q(ln c)) / (n·10⁴) is one fixed-order float
    * expression — hash-exact cross-engine. Map-only typed kernel (256-cell
    * count array per row, no shuffle). Output: (doc_id, n_bytes,
    * n_distinct, entropy) in nats; empty payloads drop.
    */
  def payloadEntropy(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, bytes) =>
          val n = bytes.length
          if (n == 0) None
          else {
            val cnt = new Array[Long](256)
            bytes.foreach(b => cnt(b & 0xff) += 1)
            var distinct = 0L
            var s = 0L
            var v = 0
            while (v < 256) {
              val c = cnt(v)
              if (c > 0) {
                distinct += 1
                s += c * Math.round(Math.log(c.toDouble) * 10000)
              }
              v += 1
            }
            val qn = Math.round(Math.log(n.toDouble) * 10000)
            val h = BigDecimal((n * qn - s) / (n * 10000.0) + 1e-9)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            Some((id, n.toLong, distinct, h))
          }
        }
      }
      .toDF("doc_id", "n_bytes", "n_distinct", "entropy")
  }

  /** Perceptual near-duplicate media pairs at Hamming ≤ `maxHamming` over
    * the [[phash]] fingerprints, via the simhash64 pigeonhole banding:
    * `maxHamming+1` segments of 64/(maxHamming+1) bits — two differing
    * hashes within the budget MUST agree on at least one whole segment, so
    * the segment equi-join finds every qualifying pair and the exact
    * bit_count distance filters. Candidates scale with segment-bucket
    * sizes, never the corpus square. Output: (id1, id2, hamming), id1<id2.
    */
  def phashDups(hashes: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bands = maxHamming + 1
    require(64 % bands == 0 && 32 % (64 / bands) == 0,
      s"segment width 64/$bands must pack whole halves")
    val width = 64 / bands
    val mask = (1L << width) - 1
    val keyed = hashes.select(col("doc_id"), col("hash_hi"), col("hash_lo"),
      explode(expr(
        s"""transform(sequence(0, ${bands - 1}), b -> struct(b AS idx,
           |  CASE WHEN b * $width < 32 THEN shiftright(hash_lo, b * $width) & $mask
           |       ELSE shiftright(hash_hi, b * $width - 32) & $mask END AS bval))""".stripMargin))
        .as("band"))
      .select(col("doc_id"), col("hash_hi"), col("hash_lo"),
        col("band.idx").as("bidx"), col("band.bval").as("bval"))
    val a = keyed.select(col("bidx"), col("bval"), col("doc_id").as("id1"),
      col("hash_hi").as("h1"), col("hash_lo").as("l1"))
    val b = keyed.select(col("bidx"), col("bval"), col("doc_id").as("id2"),
      col("hash_hi").as("h2"), col("hash_lo").as("l2"))
    a.join(b, Seq("bidx", "bval"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"),
        expr("bit_count(h1 ^ h2) + bit_count(l1 ^ l2)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
