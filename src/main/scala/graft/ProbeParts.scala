package graft

import org.apache.spark.sql.functions._

/** One-off: report the partition counts of the multi-pass checkpoint
  * inputs (single-row-group parquet scans make them 1-partition RDDs,
  * serializing every downstream pass). */
object ProbeParts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-parts")
    def parts(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      System.err.println(s"[probe-parts] $name -> ${df.rdd.getNumPartitions} partitions")
    parts("embeddings scan", Tables.embeddings(spark, sfDir))
    parts("embeddings ckpt",
      Tables.embeddings(spark, sfDir).select("vec_id", "embedding").localCheckpoint(true))
    parts("documents scan", Tables.documents(spark, sfDir))
    parts("lineitem scan", Tables.lineitem(spark, sfDir))
    val sh = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("sh"))
    parts("doc explode ckpt", sh.localCheckpoint(true))
    System.err.println(s"[probe-parts] defaultParallelism = ${spark.sparkContext.defaultParallelism}")
    spark.stop()
  }
}
