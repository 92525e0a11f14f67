package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions._

/** Round-robin A/B for the ngram_diversity explode parallelism question:
  * the corpus parquet is a single row group, so the tokenize+shingle
  * explode runs in ONE task. A keyless repartition(n) before the explode
  * pays a text-sized shuffle to buy n-way parallel string work. Prior
  * rounds measured the repartition SLOWER twice — this probe re-tests
  * with an EXPLICIT partition count (a user-specified repartition(n) is
  * not AQE-coalescible, ruling out the coalesce-back-to-one failure
  * mode) and round-robins the variants so host noise can't bias a fixed
  * order. Usage: runMain graft.ProbeNgram [nRounds]
  */
object ProbeNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRounds = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-probe-ngram")
    def diversity(docs: DataFrame): DataFrame = {
      val sh = docs
        .select(col("source"), explode(wordShingles(col("text"), 3)).as("sh"))
      sh.groupBy("source", "sh").agg(count(lit(1)).as("c"))
        .groupBy("source")
        .agg(
          sum(col("c")).as("n_total"),
          count(lit(1)).as("n_distinct"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_singletons"))
        .withColumn("ttr", col("n_distinct").cast(DoubleType) / col("n_total"))
        .orderBy("source")
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "serial " -> (() => diversity(Tables.documents(spark, sfDir))),
      s"rr$cpus   " -> (() => diversity(
        Tables.documents(spark, sfDir).repartition(cpus))),
      s"rr${4 * cpus}  " -> (() => diversity(
        Tables.documents(spark, sfDir).repartition(4 * cpus))))
    def force(df: DataFrame): Unit = {
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*)), count(lit(1))).head(): Unit
    }
    // warm-up, untimed
    force(variants.head._2())
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (round <- 1 to nRounds; (name, f) <- variants) {
      val t0 = System.nanoTime()
      force(f())
      val s = (System.nanoTime() - t0) / 1e9
      best(name) = math.min(best.getOrElse(name, Double.MaxValue), s)
      System.err.println(f"[probe-ngram] round$round $name $s%6.2f s")
    }
    best.toSeq.sortBy(_._1).foreach { case (n, s) =>
      System.err.println(f"[probe-ngram] MIN $n $s%6.2f s")
    }
    spark.stop()
  }
}
