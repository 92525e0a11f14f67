package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.operators.Similarity

/** Streaming face of the ANN index family: incremental IVF ingest.
  *
  * A production vector store does not re-cluster on every ingest — at
  * 100 TB the k-means build over the standing corpus is precisely the
  * cost being avoided. Instead the coarse quantizer is trained on a slow
  * cadence (a batch job — [[Similarity.kmeansCentroids]]) and ingest is
  * the cheap half: each arriving vector is assigned to its nearest
  * STANDING cell and appended to that cell's posting list, immediately
  * searchable by the same `ivfTopK` probe path. This is the
  * `dedup_minhash_incremental` posture applied to vectors: batch-vs-
  * standing-index, zero index-sized shuffle per micro-batch.
  *
  * Mechanics: the centroid matrix is collected ONCE at stream start
  * ([[Similarity.cellAssigner]] — index-sized driver state, nCells×dim,
  * the same broadcast-literal strategy the batch probe uses), and each
  * micro-batch runs the one-pass codegen'd NearestCells kernel — a pure
  * per-row projection: no stream-side aggregation, no state store,
  * append mode. Because stream and batch share the SAME assigner
  * closure, stream-assigned cells equal batch `assignCells` output
  * bitwise (pinned in StreamingSpec).
  *
  * The foreachBatch sink seam (not a direct `format("parquet")` write)
  * is deliberate: a real deployment appends to the lake's cell-bucketed
  * layout or MERGEs into a posting table — the batchId gives the sink
  * idempotence (the UpsertSink convention).
  */
object VectorIngest {

  /** Assign each arriving vector to its nearest standing cell and hand
    * the assigned micro-batch to `sink`. `centroids` is the standing
    * quantizer's (cell, pos, centroid) table; resolved once, before the
    * stream starts. */
  def ivfIngest(vectors: DataFrame, centroids: DataFrame,
      vecCol: String)(sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] = {
    val assign = Similarity.cellAssigner(centroids, vecCol)
    vectors.writeStream
      .outputMode("append")
      .foreachBatch((batch: Dataset[Row], id: Long) => sink(assign(batch), id))
  }
}
