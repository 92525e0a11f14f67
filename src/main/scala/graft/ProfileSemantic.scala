package graft

import org.apache.spark.sql.functions.{bit_xor, col, count, lit, xxhash64}

import graft.operators.{Dedup, Similarity}

/** Stage-level profiler for the `dedup_semantic` pipeline (the consistent
  * top line of the warm bench): separates the k-means quantizer build, the
  * cell-blocked pair verify, and the connected-components canonicalizer,
  * with per-round timings for the latter. Each stage is forced honestly
  * (checksum aggregate, never count — CLAUDE.md round-6 rule).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.ProfileSemantic [nRuns]
  */
object ProfileSemantic {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nRuns = args.headOption.map(_.toInt).getOrElse(2)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-profile")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      df.agg(bit_xor(xxhash64(df.columns.map(col): _*)), count(lit(1))).head(): Unit
    }
    for (run <- 1 to nRuns) {
      val emb = Tables.embeddings(spark, sfDir)
      val (cents, tBuild) = time {
        val c = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
        c.localCheckpoint(true) // pin so later stages don't re-run the build
      }
      val (pairs, tPairs) = time {
        val assigned = Similarity.assignCells(
          emb.select(col("vec_id"), col("embedding")), "embedding", cents, "__cell")
        val p = Dedup.embeddingPairs(assigned, "vec_id", "embedding", "__cell", tau = 0.35)
          .localCheckpoint(true) // isolate pair-verify cost from clustering
        p
      }
      val nPairs = pairs.count()
      if (run == 1) {
        // driver-side graph census (pairs are candidate-sized): component
        // count, max component size, and max BFS eccentricity from the
        // min node — the lower bound on neighbor-propagation rounds
        val es = pairs.select("v1", "v2").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val adj = scala.collection.mutable.HashMap
          .empty[Long, scala.collection.mutable.ArrayBuffer[Long]]
        es.foreach { case (a, b) =>
          adj.getOrElseUpdate(a, scala.collection.mutable.ArrayBuffer.empty) += b
          adj.getOrElseUpdate(b, scala.collection.mutable.ArrayBuffer.empty) += a
        }
        val seen = scala.collection.mutable.HashSet.empty[Long]
        var comps = 0; var maxSize = 0; var maxEcc = 0
        adj.keys.toSeq.sorted.foreach { root =>
          if (!seen.contains(root)) {
            comps += 1
            var frontier = List(root); seen += root
            var size = 0; var ecc = -1
            while (frontier.nonEmpty) {
              ecc += 1; size += frontier.size
              frontier = frontier.flatMap(adj(_)).filter(seen.add)
            }
            maxSize = maxSize.max(size); maxEcc = maxEcc.max(ecc)
          }
        }
        System.err.println(
          s"[profile] graph: ${adj.size} nodes, ${es.length} pairs, $comps components, max size $maxSize, max ecc-from-min $maxEcc")
      }
      val jumps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_JUMPS", "1").toInt
      val (result, tCluster) = time {
        val r = Dedup.clusterPairs(pairs, d1 = "v1", d2 = "v2", jumps = jumps,
          onRound = (i, s) => System.err.println(f"[profile] run$run round $i%2d $s%7.3f s"))
        force(r.select(col("doc_id").as("vec_id"), col("canonical_id")).orderBy("vec_id"))
        r
      }
      Dedup.releaseClusters(result)
      graft.Bridge2.sweep(spark)
      System.err.println(
        f"[profile] run$run build=$tBuild%6.2f s  pairs=$tPairs%6.2f s ($nPairs rows)  cluster=$tCluster%6.2f s  total=${tBuild + tPairs + tCluster}%6.2f s")
    }
    spark.stop()
  }
}

/** Unpersist every RDD the profiler's checkpoints left behind. */
private object Bridge2 {
  def sweep(spark: org.apache.spark.sql.SparkSession): Unit = {
    val rdds = spark.sparkContext.getPersistentRDDs
    rdds.values.foreach(_.unpersist(blocking = false))
  }
}
