package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Similarity, TextAnalysis}

/** Curation-family coverage: mixture sampling boundaries/idempotency,
  * greedy sequence packing (incl. the sharded scale form), and the
  * k-means coarse quantizer (determinism, SSE descent, cell bounds,
  * empty-cell carry-forward).
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-curation-test")
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  // ------------------------------------------------------------------
  // mixtureSample
  // ------------------------------------------------------------------

  def mixPool: DataFrame = spark.range(0, 2000)
    .select(col("id").as("doc_id"),
      when(col("id") % 2 === 0, "web").otherwise("books").as("source"))

  test("mixture weight 1.0 keeps every doc, 0.0 drops every doc") {
    val out = Curation.mixtureSample(mixPool, "source", "doc_id",
      Map("web" -> 1.0, "books" -> 0.0), defaultWeight = 0.5)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource.getOrElse("web", 0L) == 1000L)
    assert(bySource.getOrElse("books", 0L) == 0L)
  }

  test("mixture default weight applies to unlisted sources") {
    val listedOnly = Curation.mixtureSample(mixPool, "source", "doc_id",
      Map("web" -> 1.0), defaultWeight = 0.0)
    assert(listedOnly.filter(col("source") === "books").count() == 0L)
    val explicitBooks = Curation.mixtureSample(mixPool, "source", "doc_id",
      Map("web" -> 1.0, "books" -> 0.25), defaultWeight = 0.0)
    val defaultBooks = Curation.mixtureSample(mixPool, "source", "doc_id",
      Map("web" -> 1.0), defaultWeight = 0.25)
    // the default path draws exactly like an explicit weight
    assert(explicitBooks.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      defaultBooks.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("mixture is idempotent and monotone in the weight (keyed draw)") {
    def ids(w: Double): Set[Long] =
      Curation.mixtureSample(mixPool, "source", "doc_id",
        Map.empty, defaultWeight = w)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val a = ids(0.3)
    val b = ids(0.3)
    assert(a == b) // same draw on re-run: retried tasks / re-reads agree
    // a doc kept at w stays kept at any w' >= w (draw is keyed on the id,
    // not re-rolled) — incremental weight changes never churn the sample
    assert(a.subsetOf(ids(0.6)))
  }

  test("mixture kept fraction approaches the weight") {
    val kept = Curation.mixtureSample(mixPool, "source", "doc_id",
      Map.empty, defaultWeight = 0.3).count()
    val frac = kept.toDouble / 2000.0
    assert(math.abs(frac - 0.3) < 0.03, s"kept fraction $frac vs weight 0.3")
  }

  test("mixture rejects weights outside [0, 1]") {
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(mixPool, "source", "doc_id", Map("web" -> 1.5), 0.5)
    }
    intercept[IllegalArgumentException] {
      Curation.mixtureSample(mixPool, "source", "doc_id", Map.empty, -0.1)
    }
  }

  // ------------------------------------------------------------------
  // packSequences
  // ------------------------------------------------------------------

  def chunks: DataFrame = Seq(
    ("web", 1L, 0L, 3L), ("web", 1L, 1L, 3L), ("web", 2L, 0L, 3L),
    ("web", 2L, 1L, 3L), ("books", 9L, 0L, 5L), ("books", 9L, 1L, 5L)
  ).toDF("source", "doc_id", "chunk_id", "n_tokens")

  test("packing assigns chunks greedily; a straddling chunk stays in the earlier sequence") {
    val out = Curation.packSequences(chunks, "source",
        Seq("doc_id", "chunk_id"), "n_tokens", budget = 8L)
      .orderBy("source", "doc_id", "chunk_id")
      .select("source", "doc_id", "chunk_id", "seq_id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // web cums: 3,6,9,12 -> tokens_before 0,3,6,9 -> seqs 0,0,0,1
    // (the third chunk ends at 9 > 8 but STARTED inside the budget: greedy keeps it)
    // books cums: 5,10 -> before 0,5 -> seqs 0,0
    assert(out.toSeq == Seq(
      ("books", 9L, 0L, 0L), ("books", 9L, 1L, 0L),
      ("web", 1L, 0L, 0L), ("web", 1L, 1L, 0L),
      ("web", 2L, 0L, 0L), ("web", 2L, 1L, 1L)))
  }

  test("sharded packing keeps documents whole and packs each shard like an unsharded run") {
    val docs = Tables.documents(spark, sf)
    val c = graft.operators.TextAnalysis.chunkTokens(docs, "doc_id", "text", 64, 56)
      .withColumn("source", (col("doc_id") % 3).cast("string"))
    val sharded = Curation.packSequences(c, "source",
      Seq("doc_id", "chunk_id"), "n_chunk_tokens", budget = 512L, shards = 4)
    // every document's chunks land in exactly one shard
    val split = sharded.groupBy("doc_id")
      .agg(countDistinct(col("shard")).as("n"))
      .filter(col("n") > 1).count()
    assert(split == 0L)
    // within each (source, shard), the assignment equals an unsharded run
    // over just that slice — sharding only narrows the window partition
    val slices = sharded.select("source", "shard").distinct().collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(slices.length > 4) // the md5 bucket actually spreads
    slices.take(3).foreach { case (src, sh) =>
      val slice = sharded.filter(col("source") === src && col("shard") === sh)
      val alone = Curation.packSequences(
        slice.drop("seq_id", "shard"), "source",
        Seq("doc_id", "chunk_id"), "n_chunk_tokens", budget = 512L)
      val got = slice.orderBy("doc_id", "chunk_id")
        .select("doc_id", "chunk_id", "seq_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val want = alone.orderBy("doc_id", "chunk_id")
        .select("doc_id", "chunk_id", "seq_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == want, s"slice ($src, $sh)")
    }
  }

  test("packing rejects non-positive budget and shards") {
    intercept[IllegalArgumentException] {
      Curation.packSequences(chunks, "source", Seq("doc_id"), "n_tokens", 0L)
    }
    intercept[IllegalArgumentException] {
      Curation.packSequences(chunks, "source", Seq("doc_id"), "n_tokens", 8L, shards = 0)
    }
  }

  // ------------------------------------------------------------------
  // packSequencesBfd
  // ------------------------------------------------------------------

  test("bfd packing: exactly-once, within-budget bins, near-optimal count") {
    val budget = 100L
    val items = Seq(70L, 60L, 50L, 40L, 35L, 30L, 25L, 20L, 15L, 10L, 5L, 90L)
    val df = items.zipWithIndex
      .map { case (n, i) => ("s", i.toLong, n) }.toDF("source", "doc_id", "n_tokens")
    val out = Curation.packSequencesBfd(df, "source", Seq("doc_id"), "n_tokens", budget)
    // exactly-once
    assert(out.count() == items.length &&
      out.select("doc_id").distinct().count() == items.length)
    // every bin within budget (no oversize items in this fixture)
    val fills = out.groupBy("seq_id").agg(sum("n_tokens").as("fill"))
      .collect().map(_.getLong(1))
    assert(fills.forall(_ <= budget), fills.mkString(","))
    // FFD/BFD bound: bins <= 11/9 * ceil(total/budget) + 1
    val opt = (items.sum + budget - 1) / budget
    assert(fills.length <= (11 * opt) / 9 + 1, s"${fills.length} bins for opt>=$opt")
  }

  test("bfd packing: oversize chunk gets its own bin; repartition-invariant") {
    val df = Seq(("s", 1L, 150L), ("s", 2L, 60L), ("s", 3L, 60L))
      .toDF("source", "doc_id", "n_tokens")
    val out = Curation.packSequencesBfd(df, "source", Seq("doc_id"), "n_tokens", 100L)
      .select("doc_id", "seq_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // the oversize 150 sits alone; the two 60s cannot share a bin
    assert(Seq(out(1L), out(2L), out(3L)).distinct.length == 3, out.toString)
    val chunked = TextAnalysis.chunkTokens(
      Tables.documents(spark, sf), "doc_id", "text",
      chunkSize = 32, stride = 24, carry = Seq("source"))
    def run(c: DataFrame) = Curation
      .packSequencesBfd(c, "source", Seq("doc_id", "chunk_id"),
        "n_chunk_tokens", budget = 512L, shards = 4)
      .select("source", "shard", "doc_id", "chunk_id", "seq_id")
      .orderBy("source", "shard", "doc_id", "chunk_id")
      .collect().toSeq
    assert(run(chunked) == run(chunked.repartition(13)))
  }

  // ------------------------------------------------------------------
  // kmeansCentroids
  // ------------------------------------------------------------------

  def emb: DataFrame = Tables.embeddings(spark, sf)

  /** Corpus SSE against a (cell, pos, centroid) table: assign each vector
    * to its nearest centroid (same kernel the operator uses), then sum
    * squared per-dimension residuals. */
  def sse(vectors: DataFrame, cents: DataFrame): Double = {
    val m = cents.collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) => c -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)) }
      .toArray.sortBy(_._1)
    val assigned = vectors.select(
      col("embedding"),
      graft.functions.nearestCells(col("embedding"), m.map(_._2), m.map(_._1), 1)
        .getItem(0).as("cell"))
    assigned
      .select(col("cell").as("a_cell"), posexplode(col("embedding")).as(Seq("a_pos", "x")))
      .join(cents,
        col("a_cell") === col("cell") && col("a_pos").cast("long") === col("pos"))
      .agg(sum(pow(col("x").cast("double") - col("centroid"), 2.0)))
      .head().getDouble(0)
  }

  test("kmeans centroids are bit-reproducible across runs") {
    def run() = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
      .orderBy("cell", "pos")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(run() == run())
  }

  test("kmeans SSE is non-increasing in the iteration count") {
    val sses = (1 to 4).map { it =>
      sse(emb, Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = it))
    }
    sses.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"SSE rose: $sses")
    }
    assert(sses.last < sses.head) // and the descent is real, not flat
  }

  test("kmeans emits at most k cells and survives emptied cells") {
    // 3 of 4 points identical with k=3: at least two seeds coincide, so a
    // cell empties on the first assignment and must carry its centroid
    val tiny = Seq(
      (1L, Array(0f, 0f)), (2L, Array(0f, 0f)),
      (3L, Array(0f, 0f)), (4L, Array(10f, 10f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.kmeansCentroids(tiny, "vec_id", "embedding", k = 3, iters = 3)
    val cells = out.select("cell").distinct().collect().map(_.getString(0)).sorted
    assert(cells.length <= 3)
    val byCell = out.collect()
      .groupBy(_.getString(0))
      .map { case (c, rows) => c -> rows.sortBy(_.getLong(1)).map(_.getDouble(2)).toSeq }
    // the two surviving centroids are exactly the two point masses
    assert(byCell.values.toSet == Set(Seq(0.0, 0.0), Seq(10.0, 10.0)))

    val big = Similarity.kmeansCentroids(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(big.select("cell").distinct().count() <= 8L)
  }

  // ------------------------------------------------------------------
  // dsirWeights
  // ------------------------------------------------------------------

  // disjoint vocabularies: target docs speak "alpha..", raw docs "zulu.."
  def dsirPool: DataFrame = Seq(
    (1L, "tgt", "alpha beta gamma delta alpha beta"),
    (2L, "tgt", "beta gamma delta alpha gamma beta"),
    (3L, "raw", "zulu yankee xray whiskey zulu yankee"),
    (4L, "raw", "yankee xray whiskey zulu xray yankee")
  ).toDF("doc_id", "source", "text")

  test("shuffle shards is a balanced deterministic permutation of the corpus") {
    val pool = spark.range(0, 10000).select(col("id").as("doc_id"))
    val a = Curation.shuffleShards(pool, "doc_id", nShards = 8, seed = 7L)
    // permutation: every row present exactly once, (shard, pos) unique,
    // positions within each shard are a contiguous 1..size prefix
    assert(a.count() == 10000)
    assert(a.select("shard", "pos").distinct().count() == 10000)
    val perShard = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max(col("pos")).as("maxp"), min(col("pos")).as("minp"))
      .collect()
    assert(perShard.length == 8)
    perShard.foreach { r =>
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == 1L)
    }
    // md5 uniformity keeps shards balanced (1250 expected per shard)
    val sizes = perShard.map(_.getLong(1))
    assert(sizes.max <= 1400 && sizes.min >= 1100, sizes.mkString(","))
    // deterministic across runs; a different seed is a different order
    val b = Curation.shuffleShards(pool, "doc_id", nShards = 8, seed = 7L)
    assert(a.except(b).count() == 0 && b.except(a).count() == 0)
    val c = Curation.shuffleShards(pool, "doc_id", nShards = 8, seed = 8L)
    assert(c.except(a).count() > 0)
  }

  test("dsir separates target-like from raw-like documents") {
    val scored = Curation.dsirWeights(dsirPool, col("source") === "tgt",
        "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // every target-vocab gram has c_t >= 1, c_r = 0 (and vice versa), so
    // the scores separate with certainty barring a full md5 bucket
    // collision between the two vocabularies
    assert(scored(1L) > 0 && scored(2L) > 0, s"target docs: $scored")
    assert(scored(3L) < 0 && scored(4L) < 0, s"raw docs: $scored")
    assert(scored(1L) > scored(3L))
  }

  test("dsir feature stream is unigrams + bigrams and scores are deterministic") {
    val out = Curation.dsirWeights(dsirPool, col("source") === "tgt",
      "doc_id", "text")
    // 6 tokens -> 6 unigrams + 5 bigrams
    assert(out.select("n_feats").distinct().collect().map(_.getLong(0)).toSeq == Seq(11L))
    val a = out.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Curation.dsirWeights(dsirPool, col("source") === "tgt",
      "doc_id", "text").orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("epoch plan: integer targets and ceil epochs from weights and budget") {
    val docs = Seq(
      (1L, "a b c d e", "wiki"), (2L, "a b c d e", "wiki"), // 10 tokens
      (3L, "x y z w v", "web")                              // 5 tokens
    ).toDF("doc_id", "text", "source")
    val out = Curation.epochPlan(docs, "source", "text",
        Map("wiki" -> 3L), defaultWeight = 1L, budget = 100L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // web: weight 1/4 -> 25 target over 5 natural = 5 epochs
    // wiki: weight 3/4 -> 75 target over 10 natural = ceil(7.5) = 8 epochs
    assert(out.toSeq == Seq(
      ("web", 5L, 1L, 25L, 5L),
      ("wiki", 10L, 3L, 75L, 8L)))
    intercept[IllegalArgumentException] {
      Curation.epochPlan(docs, "source", "text", Map("wiki" -> 0L), 1L, 100L)
    }
  }

  // ------------------------------------------------------------------
  // principal component (matrix-free power iteration)
  // ------------------------------------------------------------------

  test("principal component recovers a planted dominant direction, bit-stably") {
    val d = 8
    val vecs = (0 until 40).map { i =>
      val a = Array.fill(d)(0.0f)
      a(3) = (i - 20).toFloat               // dominant variance axis
      a(6) = ((i % 5) - 2).toFloat * 0.3f   // minor axis
      (i.toLong, a)
    }
    val df = vecs.toDF("vec_id", "embedding")
    val (mu, v, lam) = Similarity.principalComponent(df, "embedding", iters = 20)
    assert(math.abs(v(3)) > 0.999, v.mkString(","))
    assert(v(v.indices.maxBy(i => math.abs(v(i)))) > 0) // canonical sign
    // Rayleigh maximality: lambda dominates the quadratic form along
    // every coordinate axis
    val axisQuad = (0 until d).map { k =>
      vecs.map { case (_, a) => val t = a(k) - mu(k); t * t }.sum
    }
    assert(axisQuad.forall(q => lam + 1e-6 >= q), s"lam=$lam axis=$axisQuad")
    // layout invariance: decimal per-dim aggregates make every round —
    // and thus the result — bit-identical under repartitioning
    val (mu2, v2, lam2) =
      Similarity.principalComponent(df.repartition(7), "embedding", iters = 20)
    assert(mu.toSeq == mu2.toSeq && v.toSeq == v2.toSeq && lam == lam2)
    val scores = Similarity.pcaProject(df, "vec_id", "embedding", mu, v)
      .orderBy("vec_id").collect().map(_.getDouble(1))
    val scores2 = Similarity.pcaProject(df.repartition(5), "vec_id", "embedding", mu, v)
      .orderBy("vec_id").collect().map(_.getDouble(1))
    assert(scores.toSeq == scores2.toSeq)
    // the planted extremes project strongest
    assert(math.abs(scores(0)) > math.abs(scores(20)))
  }

  test("margin mining ranks a planted translation pair first, invariantly") {
    // src 100 points at e1-ish directions; tgt contains ONE aligned copy
    // of src 0 (cosine 1) among rotated distractors
    def v(a: Float, b: Float, c: Float): Array[Float] = Array(a, b, c)
    val src = Seq(
      (0L, v(1f, 0f, 0f)), (1L, v(0.9f, 0.1f, 0f)), (2L, v(0.8f, 0.2f, 0f)),
      (3L, v(0f, 1f, 0f)), (4L, v(0f, 0.9f, 0.1f))
    ).toDF("vec_id", "embedding")
    val tgt = Seq(
      (100L, v(2f, 0f, 0f)),      // aligned with src 0 (cosine 1)
      (101L, v(0f, 0f, 1f)), (102L, v(0.1f, 0f, 1f)),
      (103L, v(0f, 0.1f, 1f)), (104L, v(0.3f, 0.3f, 1f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.marginMine(src, tgt, "vec_id", "embedding",
      k = 3, topN = 5)
    val top = out.head()
    assert((top.getLong(0), top.getLong(1)) == (0L, 100L),
      out.collect().mkString(";"))
    val again = Similarity.marginMine(src.repartition(3), tgt.repartition(4),
      "vec_id", "embedding", k = 3, topN = 5)
    assert(out.collect().map(_.toSeq).toSeq == again.collect().map(_.toSeq).toSeq)
  }

  // ------------------------------------------------------------------
  // weightedSampleK
  // ------------------------------------------------------------------

  /** Straight-line reference of the priority draw: first 8 md5 hex chars
    * of the id string, integer-divided by the weight. */
  private def refPriority(id: Long, w: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16) / w
  }

  test("weighted sample equals the straight-line top-k by priority") {
    val pool = mixPool // 2000 rows, web/books alternating
    val weights = Map("web" -> 4L)
    val got = Curation.weightedSampleK(pool, "doc_id", "source",
      weights, defaultWeight = 1L, k = 100)
      .select("doc_id", "priority").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val expect = (0L until 2000L)
      .map(id => id -> refPriority(id, if (id % 2 == 0) 4L else 1L))
      .sortBy { case (id, p) => (p, id) }.take(100)
    assert(got == expect)
  }

  test("weighted sample is exact-k, monotone in weight, repartition-invariant") {
    val out = Curation.weightedSampleK(mixPool, "doc_id", "source",
      Map("web" -> 8L), defaultWeight = 1L, k = 400)
    assert(out.count() == 400L)
    val bySource = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // equal-size sources: the weight-8 source must dominate the sample
    assert(bySource("web") > bySource("books"),
      s"weight-8 source under-sampled: $bySource")
    val shuffled = Curation.weightedSampleK(mixPool.repartition(7), "doc_id",
      "source", Map("web" -> 8L), defaultWeight = 1L, k = 400)
    assert(out.collect().map(_.toSeq).toSeq == shuffled.collect().map(_.toSeq).toSeq)
  }

  test("weighted sample with k >= pool returns the whole pool; rejects bad args") {
    val tiny = mixPool.limit(10)
    val out = Curation.weightedSampleK(tiny, "doc_id", "source",
      Map.empty, defaultWeight = 1L, k = 100)
    assert(out.count() == 10L)
    intercept[IllegalArgumentException] {
      Curation.weightedSampleK(tiny, "doc_id", "source",
        Map("web" -> 0L), defaultWeight = 1L, k = 5)
    }
    intercept[IllegalArgumentException] {
      Curation.weightedSampleK(tiny, "doc_id", "source",
        Map.empty, defaultWeight = 1L, k = 0)
    }
  }

  test("temperature mix upweights small sources, targets bounded, layout-invariant") {
    import spark.implicits._
    // three sources with token masses 1 : 4 : 16 — sqrt weights 1 : 2 : 4
    val docs = (Seq.fill(1)(("s_small", "tok")) ++
      Seq.fill(4)(("s_mid", "tok")) ++
      Seq.fill(16)(("s_big", "tok")))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val out = Curation.temperatureMix(docs, "source", "text", budget = 7000L)
      .orderBy("source").collect()
    val bySrc = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    // exact shares: weights 1/7, 2/7, 4/7 vs natural 1/21, 4/21, 16/21
    assert(bySrc("s_small")._3 > bySrc("s_small")._2) // upweighted
    assert(bySrc("s_big")._3 < bySrc("s_big")._2)     // downweighted
    assert(math.abs(bySrc("s_mid")._3 - 2.0 / 7.0) < 1e-12)
    // floor targets never exceed the budget in total
    assert(out.map(_.getLong(5)).sum <= 7000L)
    assert(bySrc("s_small")._4 == (7000L / 7))
    // bitwise layout invariance (decimal weight sum is order-independent)
    val again = Curation.temperatureMix(docs.repartition(7), "source", "text",
        budget = 7000L).orderBy("source").collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
