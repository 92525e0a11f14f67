package graft

import org.apache.spark.sql.functions._

/** Fresh-session probe for the distributed exact-quantile path at the
  * retired boundary scale (~16M distinct doubles per group — past the
  * measured ~15M point where buffered `percentile` heap-OOMs at 24g).
  * Times n warm runs of the full operator so the stress row's number can
  * be judged against a context-free twin (the round-11
  * stress-context-inflation rule: keep a fresh-session probe beside any
  * suspicious stress row). */
object ProbeQuantiles {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 32L * 1000 * 1000
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-q")
    def vals = spark.range(rows)
      .select((col("id") % 2).cast("string").as("k"),
        (pmod(xxhash64(col("id")), lit(1000000000000L)) / 1000.0).as("v"))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val out = graft.operators.Quantiles.exactByKey(vals, "k", "v",
        Seq("p25" -> 0.25, "p50" -> 0.5, "p95" -> 0.95))
      val r = out
        .agg(bit_xor(xxhash64(out.columns.map(col): _*)), count(lit(1)))
        .head()
      println(f"[probe] run $i exactByKey($rows)  ${(System.nanoTime() - t0) / 1e9}%8.2f s" +
        s"  (${r.getLong(0)}/${r.getLong(1)})")
      // free this run's prefix-sum checkpoint so runs 2-3 don't measure
      // under stale copies (the stress-context-inflation class)
      org.apache.spark.sql.graft.Bridge.unpersistCheckpoints(out)
    }
    spark.stop()
  }
}
