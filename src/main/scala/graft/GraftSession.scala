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
  /** Shuffle/spill scratch: tmpfs when available. A production cluster
    * puts `spark.local.dir` on fast local NVMe; routing the local-mode
    * equivalent through a RAM disk keeps benchmarks measuring the engine
    * rather than the sandbox's block device (measured: individual
    * queries stall 30-100 s in `FileOutputStream.write` when the host's
    * virtio disk chokes on shuffle writes). */
  private[graft] def scratchDir(): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    val base =
      if (java.nio.file.Files.isWritable(shm)) shm
      else java.nio.file.Paths.get(sys.props("java.io.tmpdir"))
    java.nio.file.Files.createTempDirectory(base, "graft-local").toString
  }

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
      // Spark 4 defaults session-artifact isolation ON, which wraps every
      // job in a JobArtifactState whose ExecutorClassLoader resolves each
      // classloader MISS (janino-generated code produces thousands) over a
      // driver RPC file-download — a serialized round-trip per miss. This
      // library adds no session artifacts (its jar rides the executor
      // classpath under spark-submit), so isolation buys nothing and the
      // RPC detour can dominate wall-clock when syscalls are slow
      // (measured: the whole sf0.1 bench 912 s -> ~2 min on one host).
      // Session-creation-time conf — it has no effect set later.
      .config("spark.sql.artifact.isolation.enabled", "false")
      .config("spark.local.dir", scratchDir())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
