package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Phase-level profiler for the registered pagerank query: entry edge
  * checkpoint, node+degree checkpoint, the 5-round rank chain, and the
  * final top-100. Usage: runMain graft.ProbePagerank [nRuns] */
object ProbePagerank {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRuns = args.headOption.map(_.toInt).getOrElse(3)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-probe-pr")
    import org.apache.spark.sql.graft.Bridge
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def ckpt(df: org.apache.spark.sql.DataFrame) =
      Bridge.resetStats(df.localCheckpoint(true))
    for (run <- 1 to nRuns) {
      val pairs = Tables.lineitem(spark, sfDir)
        .select(col("l_partkey").as("a"), (col("l_suppkey") + 1000000L).as("b"))
        .distinct()
      val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
        .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      val wide = sys.env.get("SPARK_GRAFT_PROBE_WIDE").exists(_ == "1")
      val e0 = edges.select(
        col("src").cast(LongType).as("__src"), col("dst").cast(LongType).as("__dst"))
      val (e, tE) = time(ckpt(
        if (wide) e0.repartition(spark.sparkContext.defaultParallelism) else e0))
      val (dn, tDn) = time(ckpt(e.select(col("__src").as("node"))
        .union(e.select(col("__dst").as("node"))).distinct()
        .join(e.groupBy(col("__src").as("node"))
          .agg(count(lit(1)).as("__deg")), Seq("node"), "left")))
      val scale = 1000000L; val dampNum = 85L; val dampDen = 100L
      val base = scale * (dampDen - dampNum) / dampDen
      var r = dn.withColumn("pr", lit(scale))
      val (_, tRounds) = time {
        for (_ <- 1 to 5) {
          val shares = r.filter(col("__deg").isNotNull)
            .select(col("node"), expr("pr div __deg").as("__share"))
          val contrib = e.join(shares, e("__src") === shares("node"))
            .groupBy(col("__dst").as("node"))
            .agg(sum(col("__share")).as("__s"))
          r = dn.join(contrib, Seq("node"), "left")
            .select(col("node"), col("__deg"),
              (lit(base) + expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen")).as("pr"))
        }
        ckpt(r.select(col("node"), col("pr")))
      }
      val out = Bridge.resetStats(r.select(col("node"), col("pr")).localCheckpoint(true))
      val (_, tTop) = time {
        val top = out.orderBy(col("pr").desc, col("node")).limit(100)
        top.agg(bit_xor(xxhash64(col("node"), col("pr"))), count(lit(1))).head()
      }
      System.err.println(f"[probe-pr] run$run e=$tE%5.2f dn=$tDn%5.2f rounds=$tRounds%5.2f top=$tTop%5.2f total=${tE + tDn + tRounds + tTop}%5.2f s")
      Bridge.unpersistCheckpoints(e); Bridge.unpersistCheckpoints(dn)
      Bridge.unpersistCheckpoints(out)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
