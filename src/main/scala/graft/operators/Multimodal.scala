package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2 #35): media payloads are
  * opaque `binary` columns with a typed metadata struct riding alongside;
  * decode / feature-extraction runs as a BATCHED per-partition pass, the
  * shape a real vectorized decoder (image/audio codec) needs.
  *
  * The decode step itself is a clearly-marked STUB (codec libraries are
  * not available in this environment): it derives deterministic features
  * from the raw bytes (length, digest, header word, fake dimensions).
  * The Spark-side plumbing — schema, batching, partition parallelism,
  * output encoder — is real and is what matters at 100 TB: payloads never
  * leave their partition, batches amortize per-call codec setup, and the
  * feature output is a narrow row (the heavy binary column is dropped
  * before any shuffle).
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, payload: Array[Byte],
      media_type: String, source: String)

  /** Features extracted by the (stub) decoder. */
  case class MediaFeatures(doc_id: Long, media_type: String, source: String,
      byte_len: Long, digest: String, header: Long, width: Long, height: Long)

  /** STUB decoder: in production this is the vectorized image/audio codec
    * call over one batch. Here it derives deterministic pseudo-features
    * from the bytes so the full pipeline is testable end-to-end. */
  private def decodeBatchStub(batch: Seq[MediaRow]): Seq[MediaFeatures] =
    batch.map { r =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(r.payload).map("%02x".format(_)).mkString
      val header = r.payload.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      val byteLen = r.payload.length.toLong
      // fake decode output: "dimensions" derived from payload bytes (STUB)
      val width = 64L + header % 1857L
      val height = 64L + byteLen % 1017L
      MediaFeatures(r.doc_id, r.media_type, r.source,
        byteLen, digest, header, width, height)
    }

  /** Batched per-partition feature extraction. `batchSize` trades codec
    * setup amortization against memory held per batch. */
  def extractFeatures(media: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => decodeBatchStub(b))
    }
  }

  /** A sampled "video" frame: index, timestamp, and a (stub) per-frame
    * feature. */
  case class FrameRow(doc_id: Long, frame_idx: Long, ts_ms: Long, luma: Long)

  /** Uniform frame sampling over "video" payloads — the third multimodal
    * verb beside decode and feature-extract: pick every stride-th frame so
    * at most `maxFrames` frames survive per document, emit one NARROW row
    * per sampled frame (the payload never leaves its partition; only
    * (id, idx, ts, features) rows shuffle). The decode is the same STUB
    * contract as [[extractFeatures]]: frame count and per-frame "luma"
    * derive deterministically from the payload bytes (a real build swaps
    * in the codec's frame iterator; the batching, explode shape, and
    * narrow output are the production plumbing). 30 fps timestamps. */
  def sampleFrames(media: Dataset[MediaRow], maxFrames: Int = 8,
      batchSize: Int = 64): Dataset[FrameRow] = {
    require(maxFrames >= 1, s"need maxFrames >= 1, got $maxFrames")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.flatMap { r =>
          val byteLen = r.payload.length.toLong
          val header = r.payload.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
          val nFrames = 1L + byteLen % 240L // STUB frame count
          val stride = math.max(1L, math.ceil(nFrames.toDouble / maxFrames).toLong)
          (0L until nFrames by stride).map { f =>
            FrameRow(r.doc_id, f, f * 33L, (header + f * 2654435761L) % 256L)
          }
        }
      }
    }
  }

  /** Fit-within-box resize planning over decoded dimensions — the fourth
    * multimodal verb: images larger than `maxDim` on their long edge scale
    * down preserving aspect ratio (integer floor arithmetic, so the plan
    * is engine-reproducible); smaller images pass through. A pure Column
    * projection — zero shuffle, scan speed at 100 TB. The actual pixel
    * resample belongs in the same batched decode pass as
    * [[extractFeatures]] (STUB here); this computes the target geometry
    * every resize kernel needs. */
  def resizePlan(features: DataFrame, maxDim: Long): DataFrame = {
    require(maxDim >= 1, s"need maxDim >= 1, got $maxDim")
    val mx = greatest(col("width"), col("height"))
    def fit(c: String) = when(mx <= maxDim, col(c))
      .otherwise(expr(s"$c * $maxDim DIV greatest(width, height)"))
    features
      .withColumn("rs_width", fit("width"))
      .withColumn("rs_height", fit("height"))
  }

  /** A 64-bit perceptual hash per media row. */
  case class MediaHash(doc_id: Long, phash: Long)

  /** Perceptual hashing over media payloads — the IMAGE-DEDUP verb: a
    * 64-bit locality-sensitive fingerprint whose Hamming distance tracks
    * payload similarity (re-encoded, lightly edited or cropped copies of
    * one image land within a few bits; unrelated images ~32 apart).
    *
    * The construction is the standard aHash: average the signal into an
    * 8×8 grid, set bit j when cell j exceeds the grid mean. STUB
    * boundary (same contract as [[extractFeatures]]): production feeds
    * the DECODED luma plane into the grid; here the raw payload bytes
    * stand in for it, so the grid/threshold/bit plumbing — and the
    * locality property itself — are real and testable, only the pixel
    * source is faked. Runs in the same batched per-partition pass as the
    * other decode verbs; output is the narrow (id, hash) row, the
    * payload never leaves its partition. */
  def perceptualHash(media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = r.payload
          val n = bytes.length
          val cells = new Array[Double](64)
          if (n > 0) {
            var j = 0
            while (j < 64) {
              val from = (j.toLong * n / 64).toInt
              val to = math.max(from + 1, ((j + 1).toLong * n / 64).toInt)
              var s = 0L
              var i = from
              while (i < math.min(to, n)) { s += bytes(i) & 0xff; i += 1 }
              cells(j) = s.toDouble / math.max(1, math.min(to, n) - from)
              j += 1
            }
          }
          val mean = cells.sum / 64.0
          var h = 0L
          var j = 0
          while (j < 64) {
            if (cells(j) > mean) h |= (1L << j)
            j += 1
          }
          MediaHash(r.doc_id, h)
        }
      }
    }
  }

  /** All pairs within `maxHamming` bits over a (id, phash) frame — the
    * near-duplicate IMAGE join. Banding, not a quadratic cross: the 64
    * bits split into `bands` fixed slices; a pair within maxHamming bits
    * leaves at least one band UNTOUCHED (pigeonhole — requires
    * maxHamming < bands, enforced), so candidates come from a hash
    * equi-join on (band index, band value) — 8-byte shuffle keys, the
    * simhash/minhash band posture — and one codegen'd `bit_count` XOR
    * verifies exactly. Identical hashes (true duplicates) pair in every
    * band; the distinct collapses them. */
  def phashNearDups(hashes: DataFrame, maxHamming: Int = 3,
      bands: Int = 4): DataFrame = {
    require(bands >= 1 && 64 % bands == 0, s"bands must divide 64: $bands")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands, got $maxHamming/$bands")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1L
    val banded = hashes.select(col("doc_id"), col("phash"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("b"),
          shiftrightunsigned(col("phash"), b * width)
            .bitwiseAND(lit(mask)).as("v"))): _*)).as("bd"))
      .select(col("doc_id"), col("phash"),
        col("bd.b").as("b"), col("bd.v").as("v"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.b") === col("b.b") && col("a.v") === col("b.v") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
        col("a.phash").as("h1"), col("b.phash").as("h2"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast(LongType))
      .filter(col("hamming") <= maxHamming)
      .select("d1", "d2", "hamming")
  }

  /** Wrap a text table as a media table: payload = UTF-8 bytes (standing in
    * for an opaque image/audio blob), metadata kept as typed columns. */
  def asMedia(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
      col(idCol).cast(LongType).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      lit("text/plain").as("media_type"),
      col(sourceCol).as("source")
    ).as[MediaRow]
  }
}
