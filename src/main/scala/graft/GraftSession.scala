package graft

import org.apache.spark.sql.SparkSession

/** Session factory used by tests and benchmarks.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting), shuffle
  * partitions sized to the local core count (on a real cluster this is
  * overridden to ~2-3x total cores by the submitter), UTC everywhere so
  * results are reproducible against the DuckDB oracle.
  */
object GraftSession {
  def local(cores: Int = 4, appName: String = "graft"): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // fresh throwaway warehouse per JVM so saveAsTable (bucketing demos)
      // never collides with a stale location in the working directory
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
