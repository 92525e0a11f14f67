package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan for each named query
  * (or all) so scan pruning (`ReadSchema`), filter pushdown
  * (`PushedFilters`), join strategies and `WholeStageCodegen` spans can be
  * reviewed. Usage: runMain graft.Explain [sfDir] [query ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local(4, "graft-explain")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
