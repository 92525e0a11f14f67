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
