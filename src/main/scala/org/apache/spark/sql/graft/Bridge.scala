package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` Column <-> Expression conversion, the
  * standard pattern for libraries that ship custom Catalyst expressions
  * (Spark itself exposes no public constructor for a Column backed by a
  * custom Expression). */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wrap a (resolved) logical plan as a DataFrame on `spark`. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Membership probe against a serialized Bloom filter — the SAME
    * codegen'd expression Spark's own runtime row-group filtering injects
    * (`BloomFilterMightContain`), with the filter shipped as a binary
    * literal (it rides the task broadcast like any literal). `value` must
    * be a LONG column hashed consistently with how the filter was built
    * (put via `putLong` — e.g. `DataFrameStatFunctions.bloomFilter` over a
    * long column); the probe uses `mightContainLong`, so build and probe
    * agree bit-for-bit. */
  def bloomMightContain(bloomBytes: Array[Byte], value: Column): Column =
    column(org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
      org.apache.spark.sql.catalyst.expressions.Literal
        .create(bloomBytes, org.apache.spark.sql.types.BinaryType),
      expression(value)))

  /** Unpersist every `localCheckpoint` block set a DataFrame's plan reads
    * from. `Dataset.unpersist` cannot do this — checkpoints persist their
    * RDD directly, outside the CacheManager — so iterative operators that
    * checkpoint per round (e.g. connected components) would otherwise
    * retain every superseded round's blocks for the life of the session.
    * After this call the DataFrame is NOT recomputable (a local checkpoint
    * truncates lineage); only release frames that will never be read again. */
  def unpersistCheckpoints(df: DataFrame): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.logical.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
