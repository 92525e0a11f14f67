package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Global ranking without a single-task window. A bare
  * `Window.orderBy(...)` funnels the whole dataset through ONE task —
  * the classic scalability cliff of global row_number/ntile. The
  * standard distributed fix: range-repartition on the order, sort
  * within partitions, collect the per-partition COUNTS (a
  * numPartitions-sized driver array — iteration-control-sized state),
  * and reconstruct the exact global rank as partition-offset +
  * in-partition row_number (a window PARTITIONED by partition id —
  * parallel). The result is independent of where the sampled range
  * boundaries fall, so it is deterministic even though the
  * partitioning itself is an implementation detail.
  */
object Ranking {

  /** `df` plus `rankCol` = exact 1-based global rank under `order`
    * (which must be a total order — include a unique tie-break column).
    * Returns (ranked frame, total row count). The frame is backed by an
    * eager localCheckpoint (offsets and ranks must read the SAME
    * materialization — a recompute could re-sample range boundaries);
    * `Bridge.unpersistCheckpoints(result)` frees it when done. */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
      rankCol: String): (DataFrame, Long) = {
    require(order.nonEmpty, "need at least one order column")
    import org.apache.spark.sql.graft.Bridge
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = Bridge.resetStats(
      df.repartitionByRange(p, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(true))
    val counts = sorted.groupBy(col("__pid")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val total = counts.map(_._2).sum
    // offsets as ONE constant-array literal indexed by pid — NOT a
    // when(__pid === k, off) ladder: the chained-CASE form is
    // numPartitions-deep PER ROW, and at a production
    // spark.sql.shuffle.partitions of 2000+ the generated method would
    // cross the JIT 8 KB huge-method cliff (the round-8 lesson). The
    // array literal is a single constant object; element_at is O(1)
    // codegen. Rows only exist in partitions that HAVE rows, so sizing
    // to maxPid+1 covers every pid the expression can see (empty
    // trailing partitions contribute no rows and need no slot).
    val offCol = offsetLookup(counts, "__pid")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val ranked = sorted
      .withColumn(rankCol, row_number().over(w).cast(LongType) + offCol)
      .drop("__pid")
    (ranked, total)
  }

  /** Exclusive running offset per partition id as a flat O(1)-per-row
    * expression: a BIGINT array literal (one constant object, sized
    * maxPid+1, gaps = empty partitions carry the running total so any
    * pid indexes correctly) read via element_at. Shared by
    * [[withGlobalRank]] and [[withPrefixSums]]. */
  private def offsetLookup(perPid: Seq[(Int, Long)], pidCol: String): Column = {
    if (perPid.isEmpty) return lit(0L)
    val byPid = perPid.toMap
    val arr = new Array[Long](perPid.map(_._1).max + 1)
    var acc = 0L
    for (pid <- arr.indices) {
      arr(pid) = acc
      acc += byPid.getOrElse(pid, 0L)
    }
    element_at(lit(arr), col(pidCol) + 1)
  }

  /** `df` plus an inclusive prefix sum (`<c>_cum`) of each BIGINT column
    * in `sumCols` under the total order `order` — the running-total
    * generalization of [[withGlobalRank]], with the same distributed
    * shape: range-repartition on the order, sort within partitions,
    * collect PER-PARTITION TOTALS (a numPartitions × sumCols driver
    * array), and reconstruct the exact global running sum as
    * partition-offset + in-partition cumulative window (partitioned by
    * partition id — parallel, never a single-task global window). Sums
    * are BIGINT so accumulation order cannot change the result; the
    * same eager-localCheckpoint note as [[withGlobalRank]] applies
    * (offsets and cumulatives must read ONE materialization). */
  def withPrefixSums(df: DataFrame, order: Seq[Column],
      sumCols: Seq[String]): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    require(sumCols.nonEmpty, "need at least one sum column")
    import org.apache.spark.sql.graft.Bridge
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = Bridge.resetStats(
      df.repartitionByRange(p, order: _*)
        .sortWithinPartitions(order: _*)
        .withColumn("__pid", spark_partition_id())
        .localCheckpoint(true))
    val partTotals = sorted.groupBy(col("__pid"))
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(c => sum(col(c)).as(c)): _*)
      .collect()
      .map(r => r.getInt(0) -> sumCols.map(c => r.getAs[Long](c)).toArray)
      .sortBy(_._1)
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sumCols.zipWithIndex.foldLeft(sorted) { case (acc, (c, i)) =>
      // same flat array-literal offset dissemination as withGlobalRank
      // (one constant per sum column, never a partitions-deep CASE)
      val offCol = offsetLookup(partTotals.map { case (pid, t) =>
        pid -> t(i)
      }, "__pid")
      acc.withColumn(s"${c}_cum", sum(col(c)).over(w) + offCol)
    }.drop("__pid")
  }

  /** SQL-standard NTILE(k) from a 1-based rank over `n` rows: the first
    * n % k buckets take ceil(n/k) rows, the rest floor(n/k) — matching
    * Spark's and DuckDB's window NTILE exactly. floor over doubles is
    * exact here (ranks < 2^53; quotients land ≥ 1/bucketSize away from
    * the next integer). */
  def ntileFromRank(rank: Column, n: Long, k: Int): Column = {
    require(k >= 1, s"need k >= 1, got $k")
    require(n >= 0, s"need n >= 0, got $n")
    val size = n / k
    val rem = n % k
    if (size == 0L) rank.cast(LongType)
    else {
      val big = size + 1L
      when(rank <= lit(rem * big),
        floor((rank - 1L) / lit(big.toDouble)).cast(LongType) + 1L)
        .otherwise(lit(rem) +
          floor((rank - 1L - rem * big) / lit(size.toDouble)).cast(LongType) + 1L)
    }
  }

  /** Equi-depth (equal-frequency) binning of `valueCol` into k buckets —
    * the feature-engineering quantile binning step, exact: bucket = the
    * NTILE of the row's global (value, tieCol) rank. Composes
    * [[withGlobalRank]] + [[ntileFromRank]]; same checkpoint note. */
  def equiDepthBins(df: DataFrame, valueCol: String, tieCol: String,
      k: Int): DataFrame = {
    val (ranked, n) = withGlobalRank(df,
      Seq(col(valueCol), col(tieCol)), "__rank")
    ranked
      .withColumn("bucket", ntileFromRank(col("__rank"), n, k))
      .drop("__rank")
  }
}
