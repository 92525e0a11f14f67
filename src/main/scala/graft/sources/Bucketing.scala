package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables for co-located joins (SURVEY.md §5): pre-shuffling a
  * fact table into N buckets on its join key at WRITE time means every
  * subsequent join/aggregation on that key runs with **zero Exchange** —
  * at 100 TB this converts the recurring dominant cost (a full fact
  * shuffle per query) into a one-time write cost.
  *
  * Spark's bucketing rides the session catalog (`saveAsTable`), hashes by
  * `spark.sql.sources.bucketing` murmur3 — both sides of a join bucketed
  * by the same key and count join partition-to-partition.
  */
object Bucketing {

  /** Write `df` as a bucketed (and optionally sorted) catalog table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      bucketCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** True if the physical plan of `df` contains a shuffle exchange —
    * bucketed co-located joins must report false. */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
