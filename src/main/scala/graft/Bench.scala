package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // no session artifacts -> skip the per-class-miss RPC fetch the
      // Spark 4 isolation default installs (see GraftSession)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.local.dir", GraftSession.scratchDir())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: the first timed query otherwise absorbs 1-5 s of
    // JIT + codegen compilation (the §7.1 first-query variance class)
    try {
      val w = SparkEntry.queries("q1_pricing_summary")(spark, sfDir)
      w.agg(bit_xor(xxhash64(w.columns.map(col): _*)), count(lit(1))).head()
    } catch { case _: Throwable => () }
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    // local-iteration filter: SPARK_GRAFT_ONLY=q1,q2 times just those
    // queries; unset (the driver's mode) runs everything as before
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val results = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val t0 = System.nanoTime()
      // Force EVERY output column with a row-hash aggregate: a bare
      // count() lets column pruning delete computed projections, so a
      // projection-family query would time little more than the scan
      // (round-6 fix — timings for those queries step up vs BENCH_r05
      // by measurement definition, not regression; see SURVEY §7.1).
      // bit_xor, not sum: summed row hashes overflow Long under ANSI.
      try {
        val df = fn(spark, sfDir)
        df.agg(bit_xor(xxhash64(df.columns.map(col): _*)), count(lit(1))).head()
      } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // UNTIMED cleanup: the cluster-family queries each leave one live
      // localCheckpoint (their result); letting those accumulate across
      // the run recreates the round-3 storage-pressure variance class
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet -- baseline).foreach(id => rdds(id).unpersist(blocking = false))
      // stderr progress line per query: correlates a wall-clock stall
      // with the query it hit (the JSON line on stdout stays the contract)
      System.err.println(f"[bench] $name%-32s $elapsed%8.2f s")
      name -> elapsed
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
