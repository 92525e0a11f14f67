package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase-level profiler for the `time_travel` fixture query (the r15
  * baseline's #2 line at 5.9 s): splits the three version commits, the
  * three snapshot read-backs, and the final collect so the fixture IO
  * cost is attributable. Usage: runMain graft.ProbeTimeTravel [nRuns]
  */
object ProbeTimeTravel {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRuns = args.headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-tt")
    import graft.sources.Snapshots
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    for (run <- 1 to nRuns; ckpt <- Seq(false, true)) {
      val path = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(SparkEntry.stagingBase), "graft_probe_tt_").toString
      try {
        val ev0 = Tables.events(spark, sfDir)
          .filter(col("ts") < to_timestamp(lit("2024-01-08")))
          .select("event_id", "user_id", "event_type", "ts")
        val ev = if (ckpt) ev0.localCheckpoint(true) else ev0
        val (v1, t1) = time(Snapshots.commitAppend(spark, path, ev, "ts"))
        val (v2, t2) = time(Snapshots.commitDeleteKeys(spark, path, "user_id",
          ev.select(col("user_id")).filter(col("user_id") % 97 === 0)))
        val batch = ev.filter(col("event_id") % 1000 === 0)
        val (v3, t3) = time(Snapshots.commitUpsert(spark, path,
          batch.withColumn("user_id", col("user_id") + 1L)
            .unionByName(batch.withColumn("event_id",
              col("event_id") + 1000000000L)),
          "ts", "event_id"))
        val (n, t4) = time {
          Seq(v1, v2, v3).map { v =>
            Snapshots.readSnapshot(spark, path, v)
              .groupBy(col("y").cast(LongType).as("y"),
                col("m").cast(LongType).as("m"), col("d").cast(LongType).as("d"))
              .agg(count(lit(1)).as("n_rows"), sum(col("user_id")).as("sum_uid"))
              .withColumn("version", lit(v))
          }.reduce(_ unionByName _).collect().length
        }
        System.err.println(f"[probe-tt] run$run ckpt=$ckpt%-5s append=$t1%5.2f delete=$t2%5.2f upsert=$t3%5.2f read3=$t4%5.2f ($n rows) total=${t1 + t2 + t3 + t4}%5.2f s")
        if (ckpt) org.apache.spark.sql.graft.Bridge.unpersistCheckpoints(ev)
      } finally {
        val p = new org.apache.hadoop.fs.Path(path)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true): Unit
      }
    }
    spark.stop()
  }
}
