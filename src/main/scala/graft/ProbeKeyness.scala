package graft
import org.apache.spark.sql.functions._
object ProbeKeyness {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32, "probe-keyness")
    val sfDir = "/root/testdata/sf0.1"
    val docs0 = graft.Tables.documents(spark, sfDir)
    val n = docs0.count()
    val docs = docs0.crossJoin(spark.range(20).toDF("rep"))
      .select((col("doc_id") + col("rep") * n).as("doc_id"),
        concat(lit("r"), col("rep"), lit(" "), col("text")).as("text"))
      .repartition(64).localCheckpoint(true)
    def time(nm: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $nm%-28s ${(System.nanoTime()-t0)/1e9}%8.2f s ($r)")
    }
    val withSrc = docs.select(col("doc_id"),
      concat(lit("s"), pmod(col("doc_id"), lit(20L))).as("source"), col("text"))
    time("tokenize_explode_count") {
      withSrc.select(col("source"),
        explode(graft.functions.wsTokens(lower(col("text")))).as("term"))
        .groupBy("source", "term").agg(count(lit(1)).as("c")).count()
    }
    time("full_keyness") {
      graft.operators.TextAnalysis.sourceKeyness(withSrc, "source", "text", 5L, 15).count()
    }
    time("full_keyness_2nd") {
      graft.operators.TextAnalysis.sourceKeyness(withSrc, "source", "text", 5L, 15).count()
    }
    spark.stop()
  }
}
