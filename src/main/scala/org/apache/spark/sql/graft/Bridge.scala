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

  /** Rewrap a local-checkpointed DataFrame around its ALREADY-MATERIALIZED
    * RDD with FRESH (default) statistics. `Dataset.localCheckpoint` carries
    * the origin plan's estimated `sizeInBytes` forward; in an iterative
    * loop whose round is a few self-joins, the size-only estimator
    * MULTIPLIES the inputs' estimates, so the carried BigInt grows as
    * ~3^rounds DIGITS — by round ~12 the driver spends its time in
    * Karatsuba/Toom-Cook BigInteger multiplication inside plan statistics
    * (measured: 122 s for one 1379-row round) and AQE never broadcasts the
    * tiny joins because their estimated size is astronomical. The rewrap
    * keeps the SAME persisted RDD (so [[unpersistCheckpoints]] still frees
    * it) but the new LogicalRDD reports default stats, and runtime (AQE)
    * sizes take over from there. */
  def resetStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    ds.queryExecution.logical match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        ds.sparkSession.internalCreateDataFrame(lr.rdd, df.schema)
      case _ => df
    }
  }

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

  /** Recursively delete `dir` at JVM shutdown, AFTER Spark's own cleanup.
    *
    * A raw `Runtime.addShutdownHook` deleter races Spark's
    * ShutdownHookManager (both walk the same scratch tree concurrently —
    * benign only because failures are swallowed). Registering through
    * Spark's manager at a priority below `TEMP_DIR_SHUTDOWN_PRIORITY`
    * (25) sequences the hooks: Spark removes its blockmgr/spark-*
    * children first, then this removes the parent. `private[spark]` API,
    * hence routed through this bridge. */
  def removeDirOnShutdown(dir: java.io.File): Unit = {
    org.apache.spark.util.ShutdownHookManager.addShutdownHook(10) { () =>
      def rm(f: java.io.File): Unit = {
        val kids = f.listFiles()
        if (kids != null) kids.foreach(rm)
        f.delete(): Unit
      }
      rm(dir)
    }
    ()
  }

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
