package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Link-graph analytics — the authority-scoring pass of a web-crawl
  * curation pipeline (rank domains/hosts before deciding what to keep).
  *
  * PageRank here is FIXED-POINT INTEGER arithmetic end to end: ranks are
  * BIGINT multiples of 1/`scale`, per-edge shares use integer division,
  * and the damping step is an integer multiply-then-divide. Floating
  * point would make the result depend on aggregation order (Spark) vs
  * left-to-right (an oracle) — integer sums are order-independent, so
  * the whole iteration is deterministic, engine-portable, and
  * oracle-checkable bit for bit. The cost is floor truncation: each
  * round drops < 1 rank unit per (edge + node), so with scale = 1e6 the
  * scores agree with float PageRank to ~5 decimal places — far inside
  * any ranking-use tolerance. Dangling mass (nodes with no out-edges)
  * is dropped, the common simplification.
  */
object Graph {

  /** `iters` rounds of damped PageRank over `edges` (directed src→dst).
    *
    * rank_0(v) = scale;
    * share_i(u) = rank_i(u) div outdeg(u)                 (per node)
    * rank_{i+1}(v) = base + (dampNum · Σ_{(u,v)∈E} share_i(u)) div dampDen
    * base = (scale · (dampDen − dampNum)) div dampDen.
    *
    * SCALE: per round, the node-sized rank frame joins the node-sized
    * degree table (same key — co-partitioned), then ONE edge-sized join
    * distributes shares and ONE map-side-combined aggregate on dst
    * collects them — the classic pregel alternation; nothing larger than
    * the edge list ever shuffles, and the iteration count is a constant
    * of the operator, not of the data. For long chains on huge graphs,
    * checkpoint every few rounds (the clusterPairs playbook — stats
    * reset included); at the fixed small `iters` typical for authority
    * scoring the plan tree stays shallow enough to skip it.
    *
    * Overflow headroom: Σ shares ≤ N·scale, so dampNum·Σ needs
    * N·scale·dampNum < 2^63 — with defaults, ~10^11 nodes.
    *
    * `checkpointEvery > 0` materializes the rank frame every that many
    * rounds (the clusterPairs playbook: `localCheckpoint` truncates the
    * deepening join lineage, `Bridge.resetStats` stops the size-only
    * estimator from compounding through the rounds, and each superseded
    * checkpoint's blocks unpersist immediately). Results are identical
    * either way (spec-pinned); reach for it on long chains over huge
    * graphs, skip it for the shallow authority-scoring defaults. The
    * final backing checkpoint stays persisted while the result is in
    * use — `Bridge.unpersistCheckpoints(result)` frees it. */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, scale: Long = 1000000L,
      dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 0): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(scale >= 1L, s"need scale >= 1, got $scale")
    require(dampDen >= 1L && dampNum >= 0L && dampNum <= dampDen,
      s"need 0 <= dampNum <= dampDen, got $dampNum/$dampDen")
    require(checkpointEvery >= 0, s"need checkpointEvery >= 0, got $checkpointEvery")
    import org.apache.spark.sql.graft.Bridge
    val base = scale * (dampDen - dampNum) / dampDen
    val e = edges.select(col(srcCol).cast(LongType).as("__src"),
      col(dstCol).cast(LongType).as("__dst"))
    val deg = e.groupBy(col("__src").as("node"))
      .agg(count(lit(1)).as("__deg"))
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    var r = nodes.withColumn("pr", lit(scale))
    var backing: Option[DataFrame] = None
    for (i <- 1 to iters) {
      val shares = r.join(deg, Seq("node"))
        .select(col("node"), expr("pr div __deg").as("__share"))
      val contrib = e.join(shares, e("__src") === shares("node"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(col("__share")).as("__s"))
      r = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampNum * coalesce(__s, 0L)) div $dampDen")).as("pr"))
      if (checkpointEvery > 0 && i % checkpointEvery == 0 && i < iters) {
        val ck = Bridge.resetStats(r.localCheckpoint(true))
        backing.foreach(Bridge.unpersistCheckpoints)
        backing = Some(ck)
        r = ck
      }
    }
    r
  }

  /** Minimum hop distance from a seed set (multi-source BFS, bounded at
    * `maxHops`): the reachability pass behind "everything within k links
    * of these domains" crawl scoping or contamination blast-radius
    * checks. Returns (node, hops) for every node reached, hops =
    * shortest distance — BFS levels make the minimum well-defined and
    * deterministic regardless of traversal order.
    *
    * SCALE: classic frontier propagation — each round joins the EDGE
    * list against the current frontier only (never the full reached
    * set), dedups, and anti-joins the accumulated distances so the
    * frontier holds exactly the newly-reached nodes; work per round is
    * proportional to the frontier's out-edges, total work to the
    * reachable edge set. Rounds localCheckpoint (eager) with stats reset
    * and superseded checkpoints unpersist immediately — the clusterPairs
    * storage playbook. The empty-frontier test is a driver scalar
    * (iteration control, not data collection). The final distance
    * checkpoint stays persisted while the result is in use —
    * `Bridge.unpersistCheckpoints(result)` frees it. */
  def hopDistance(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"need maxHops >= 0, got $maxHops")
    import org.apache.spark.sql.graft.Bridge
    def ckpt(df: DataFrame): DataFrame =
      Bridge.resetStats(df.localCheckpoint(true))
    val e = edges.select(col(srcCol).cast(LongType).as("src"),
      col(dstCol).cast(LongType).as("dst"))
    var dist = ckpt(seeds.select(col(seedCol).cast(LongType).as("node"))
      .distinct().withColumn("hops", lit(0L)))
    var frontier = dist.select("node")
    var frontierBacking: Option[DataFrame] = None
    var hop = 1
    var done = maxHops == 0
    while (!done) {
      val next = ckpt(e
        .join(frontier.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hops", lit(hop.toLong)))
      frontierBacking.foreach(Bridge.unpersistCheckpoints)
      frontierBacking = None
      if (next.isEmpty) {
        Bridge.unpersistCheckpoints(next)
        done = true
      } else {
        val newDist = ckpt(dist.unionByName(next))
        Bridge.unpersistCheckpoints(dist)
        dist = newDist
        frontier = next.select("node")
        frontierBacking = Some(next)
        hop += 1
        if (hop > maxHops) done = true
      }
    }
    frontierBacking.foreach(Bridge.unpersistCheckpoints)
    dist
  }

  /** The DuckDB oracle for [[hopDistance]]: a recursive CTE whose UNION
    * dedups (node, hops) STATES, so cycles collapse to ≤ nodes×maxHops
    * rows instead of enumerating paths; the final MIN collapses
    * re-reachings at later hops. */
  def hopDistanceSql(edgesCte: String, seedsCte: String,
      maxHops: Int): String =
    s"""WITH RECURSIVE e AS ($edgesCte),
       |seeds AS ($seedsCte),
       |walk(node, hops) AS (
       | SELECT node, 0 FROM seeds
       | UNION
       | SELECT e.dst, w.hops + 1 FROM walk w JOIN e ON e.src = w.node
       | WHERE w.hops < $maxHops)
       |SELECT node, CAST(MIN(hops) AS BIGINT) AS hops FROM walk
       |GROUP BY node ORDER BY hops, node""".stripMargin

  /** The DuckDB oracle for [[pageRankInt]], GENERATED from the same
    * parameters (the zvalueSql one-source-two-engines pattern): one CTE
    * per iteration, `//` mirroring `div` (identical on the non-negative
    * values both sides produce), integer sums order-independent. */
  def pageRankIntSql(edgesCte: String, iters: Int, k: Int,
      scale: Long = 1000000L, dampNum: Long = 85L,
      dampDen: Long = 100L): String = {
    val base = scale * (dampDen - dampNum) / dampDen
    val rounds = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node, CAST($base + ($dampNum * COALESCE(c.s, 0)) // $dampDen AS BIGINT) AS pr
         | FROM nodes n LEFT JOIN (
         |  SELECT e.dst, SUM(r.pr // d.deg) AS s
         |  FROM e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.node
         |  GROUP BY e.dst) c ON n.node = c.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS ($edgesCte),
       |deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |r0 AS (SELECT node, CAST($scale AS BIGINT) AS pr FROM nodes),
       |$rounds
       |SELECT node, pr FROM r$iters ORDER BY pr DESC, node LIMIT $k""".stripMargin
  }
}
