package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-composition operators — the last-mile steps that turn a curated
  * document pool into a training mix: per-source mixture sampling and
  * fixed-budget sequence packing.
  */
object Curation {

  /** Deterministic mixture (down)sampling: keep each document with its
    * source's target probability. The keep/drop decision is an
    * md5-derived uniform draw on the DOC ID — no rand() (retried tasks
    * must agree), engine-portable (md5 agrees everywhere, so the sample
    * is oracle-checkable), and per-row independent, so the operator is a
    * ZERO-SHUFFLE filter at scan speed (contrast exact-k stratified
    * sampling, which needs a per-group top-k). Because the draw is keyed
    * on the doc id, re-runs and incremental loads keep/drop the SAME
    * documents — the mixture stays idempotent across pipeline runs. */
  def mixtureSample(docs: DataFrame, sourceCol: String, idCol: String,
      weights: Map[String, Double], defaultWeight: Double): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(w => w >= 0.0 && w <= 1.0),
      "weights must be probabilities in [0, 1]")
    // uniform draw in [0, 2^32): first 8 md5 hex chars of the id
    val draw = conv(substring(md5(col(idCol).cast(StringType)), 1, 8), 16, 10)
      .cast(LongType)
    val weight = weights.foldLeft(lit(defaultWeight): Column) {
      case (acc, (s, w)) => when(col(sourceCol) === s, lit(w)).otherwise(acc)
    }
    docs.filter(draw < (weight * lit(4294967296L)).cast(LongType))
  }

  /** Greedy sequence packing: chunks are ordered deterministically within
    * each group and assigned to fixed-token-budget training sequences by
    * running token count — seq_id = tokens_before / budget. This is the
    * packing step that turns variable-length chunks into dense
    * fixed-length pretraining sequences (minimal padding); a chunk that
    * straddles a boundary stays in the earlier sequence, so a sequence
    * can exceed the budget by less than one chunk (the trainer then
    * splits or pads — the standard greedy contract). The running sum is
    * integer-exact.
    *
    * SCALE: with `shards = 1` the window partitions by `groupCol` alone —
    * every chunk of a source funnels through ONE task for the cumulative
    * sum, which is a serial scan of the whole corpus when there are only
    * a handful of sources. Pass `shards > 1` to pack within
    * `(groupCol, shard)`, where shard is a deterministic md5 bucket of
    * the leading order column (the document key), so whole documents stay
    * together and the running sums parallelize across `shards` tasks per
    * source. Sequence identity is then `(groupCol, shard, seq_id)` — the
    * `shard` column is kept in the output. Packing per shard is the real
    * pipeline contract anyway (sequences are materialized per output
    * file/shard), and the md5 bucket keeps assignment reproducible across
    * re-runs and engines (no rand(), no partition-id dependence). */
  def packSequences(chunks: DataFrame, groupCol: String,
      orderCols: Seq[String], tokenCol: String, budget: Long,
      shards: Int = 1): DataFrame = {
    require(budget >= 1, s"need budget >= 1, got $budget")
    require(shards >= 1, s"need shards >= 1, got $shards")
    val sharded = shards > 1
    val withShard =
      if (!sharded) chunks
      else chunks.withColumn("shard",
        conv(substring(md5(col(orderCols.head).cast(StringType)), 1, 8), 16, 10)
          .cast(LongType) % shards)
    val partCols = if (sharded) Seq(col(groupCol), col("shard")) else Seq(col(groupCol))
    val w = Window.partitionBy(partCols: _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withShard
      .withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("seq_id",
        floor((col("__cum") - col(tokenCol)) / budget).cast(LongType))
      .drop("__cum")
  }
}
