package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fresh-session round-robin probe for the stress bloom_join family
  * (the ProbeKeyness convention: isolate a suspicious stress timing from
  * the stress session's replication/cache context; round-robin the
  * variants because host noise clusters in TIME, so run position must be
  * decorrelated from variant before a min means anything).
  *
  * Round-12 findings this probe established (mins of 3 interleaved
  * rounds, fresh session; 100× replicated in a second session):
  *   - 20×:  plain 1.69 s | forced default-size bloom 2.11 s |
  *           forced 8M-item/64M-bit bloom 4.90 s
  *   - 100×: plain 3.25 s | forced default 3.23 s | forced sized 5.43 s
  *   - 100× replication: plain 4.46 s | forced default 3.66 s (beats
  *     plain outright) | forced sized 5.28 s
  * i.e. an injected runtime bloom filter is FREE at min on this host
  * (even the "saturated" default bitmap at 3M creation keys), and the
  * 8×-bigger sized bitmap costs ~2-3 s of build/merge — the round-11
  * "saturated-filter inversion" (130.8 s vs 11.6 s) was two IDENTICAL
  * plans through a host contention window: the default
  * creationSideThreshold=10MB had blocked injection at stress scale all
  * along (the replicated creation side's inherited crossJoin estimate is
  * 74 MB at 20× / 369 MB at 100×), which the stress bloomProbe lines now
  * print (`injected=`, `creation_est_bytes=`) on every run.
  *
  * Usage: runMain graft.ProbeBloom [sfDir] [factor]
  */
object ProbeBloom {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = if (args.length > 1) args(1).toInt else 20
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-bloom")
    spark.sparkContext.setLogLevel("WARN")

    val nOrd = 1500000L
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_partkey", "l_extendedprice")
      .crossJoin(spark.range(factor).toDF("rep"))
      .select((col("l_orderkey") + col("rep") * nOrd).as("l_orderkey"),
        col("l_partkey"), col("l_extendedprice"))
      .repartition(64).localCheckpoint(true)
    val ordR = Tables.orders(spark, sfDir)
      .select("o_orderkey", "o_orderpriority")
      .crossJoin(spark.range(factor).toDF("rep"))
      .select((col("o_orderkey") + col("rep") * nOrd).as("o_orderkey"),
        col("o_orderpriority"))
      .repartition(64).localCheckpoint(true)
    println(s"[probe] li=${li.count()} ord=${ordR.count()} (x$factor)")

    def body(): DataFrame = {
      val o = ordR.filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("l_partkey") % 25).as("pb"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(28,6)")).cast("double")
            .as("revenue"))
    }
    // witness = "xorhash/rowcount": the xor-of-xxhash64 actually proves
    // cross-variant RESULT equality (a bare row count would not)
    def checksum(df: DataFrame): String = {
      val r = df
        .agg(bit_xor(xxhash64(df.columns.map(col): _*)), count(lit(1)))
        .head()
      s"${r.getLong(0)}/${r.getLong(1)}"
    }
    def timed(tag: String)(f: => String): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($r)")
    }
    val conf = spark.conf
    def set(pairs: (String, String)*): Unit =
      pairs.foreach { case (k, v) => conf.set(k, v) }
    set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")

    val plainConfs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")
    val forcedConfs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "8GB",
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems" -> "1000000",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> "4000000",
      "spark.sql.optimizer.runtime.bloomFilter.numBits" -> "8388608")
    val sizedConfs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "8GB",
      "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems" -> "8000000",
      "spark.sql.optimizer.runtime.bloomFilter.maxNumItems" -> "8000000",
      "spark.sql.optimizer.runtime.bloomFilter.numBits" -> "67108864")
    val variants = Seq(
      "plain" -> plainConfs, "forced_default" -> forcedConfs,
      "forced_sized" -> sizedConfs)

    // one untimed warm slot, then ROUND-ROBIN the variants: host noise
    // clusters in time (the window lesson), so interleaving decorrelates
    // run position from variant — per-variant MIN is the honest read
    set(plainConfs: _*)
    timed("warm (plain)") { checksum(body()) }
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (round <- 1 to 3; (tag, confs) <- variants) {
      set(confs: _*)
      val t0 = System.nanoTime()
      val r = checksum(body())
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[probe] r$round $tag%-16s $sec%8.2f s  ($r)")
      best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), sec)
    }
    println("[probe] MIN  " + variants.map { case (t, _) =>
      f"$t=${best(t)}%.2f s" }.mkString("  "))
    spark.stop()
  }
}
