package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Layout, TextAnalysis}

/** End-to-end "ingest day" integration — the composed daily pipeline:
  * bootstrap index → shattered write → compaction → day-2 incremental
  * dedup → quality mix → sequence packing. Every stage is unit-covered
  * in its own spec; what this suite pins is the COMPOSITION contract:
  *
  *  1. the incremental path must reproduce the single global batch run
  *     row-for-row (not just count-for-count),
  *  2. on-disk maintenance (compaction) must be invisible to dedup
  *     semantics,
  *  3. re-ingesting an already-ingested batch must be a complete no-op,
  *  4. the curation tail (mixture sample + packing) must commute with
  *     incremental arrival — day-wise curation equals whole-corpus
  *     curation — which is what makes the daily pipeline restartable
  *     without reprocessing history at 100 TB.
  */
class IngestDaySpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-ingest-test")
  val sf = "/root/testdata/sf0.001"

  /** Chunk docs at the dedup_incremental registration's granularity. */
  private def chunked(docs: DataFrame): DataFrame =
    TextAnalysis.chunkTokens(docs, "doc_id", "text", chunkSize = 16,
        stride = 8, carry = Seq("source"))
      .select(col("doc_id"), col("source"), col("chunk_id"),
        col("n_chunk_tokens"), md5(col("chunk_text")).as("chunk_hash"))

  /** Keep-first exact dedup by chunk hash, (doc_id, chunk_id) order. */
  private def keepFirst(chunks: DataFrame): DataFrame = {
    val w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_id")
    chunks.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1).drop("__rk")
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.select("doc_id", "source", "chunk_id", "n_chunk_tokens", "chunk_hash")
      .collect().map(_.mkString("|")).toSeq.sorted

  test("incremental day-2 ingest over a compacted day-1 index reproduces " +
      "the global batch dedup; re-ingest is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    try {
      val docs = Tables.documents(spark, sf)
      val day1 = docs.filter(col("doc_id") % 5 >= 2) // bootstrap corpus
      val day2 = docs.filter(col("doc_id") % 5 < 2)  // the new batch

      // day 1: dedup within the bootstrap, index it on disk the way a
      // many-task write leaves it (shattered small files)
      val c1 = chunked(day1)
      val kept1 = keepFirst(c1)
      kept1.repartition(16).write.mode("overwrite").parquet(s"$dir/index_raw")

      // maintenance: compact the shattered index — must be a pure layout
      // change (same rows, fewer files)
      val (before, after, _) = Layout.compactFiles(spark, s"$dir/index_raw",
        s"$dir/index", targetBytes = Long.MaxValue, sortCols = Seq("chunk_hash"))
      assert(before == 16 && after == 1, s"before=$before after=$after")
      val index = spark.read.parquet(s"$dir/index")
      assert(sortedRows(index) == sortedRows(kept1),
        "compaction changed the index contents")

      // day 2: classify the batch against the on-disk index
      val c2 = chunked(day2)
      val classified = Dedup.incrementalExact(index, c2, "chunk_hash",
        orderCols = Seq("doc_id", "chunk_id"))

      // conservation: every batch chunk classified, exactly once
      assert(classified.count() == c2.count())
      val statuses = classified.groupBy("status").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(statuses.keySet.subsetOf(Set("kept", "dup_of_index", "dup_in_batch")))
      assert(statuses.getOrElse("kept", 0L) > 0 &&
        statuses.getOrElse("dup_of_index", 0L) > 0 &&
        statuses.getOrElse("dup_in_batch", 0L) > 0,
        s"expected all three statuses at this SF, got $statuses")

      val kept2 = classified.filter(col("status") === "kept").drop("status")

      // THE composition contract: day1-kept ++ day2-kept must equal one
      // global keep-first over the union with day-1 rows ordered first —
      // row-for-row, not merely count-for-count
      val globalKept = keepFirst(
        c1.withColumn("__day", lit(1)).unionByName(c2.withColumn("__day", lit(2)))
          .withColumn("__rk0", row_number().over(
            Window.partitionBy("chunk_hash").orderBy("__day", "doc_id", "chunk_id")))
          .filter(col("__rk0") === 1).drop("__rk0", "__day"))
      assert(sortedRows(kept1.unionByName(kept2)) == sortedRows(globalKept),
        "incremental path diverged from the global batch run")

      // append day-2 keepers; re-ingesting the same batch is a no-op:
      // every chunk is now a duplicate of the index
      val index2 = index.unionByName(kept2)
      val reingest = Dedup.incrementalExact(index2, c2, "chunk_hash",
        orderCols = Seq("doc_id", "chunk_id"))
      assert(reingest.filter(col("status") =!= "dup_of_index").count() == 0,
        "re-ingest of an already-ingested batch was not a no-op")

      // oversized-batch guardrail: forcing the shuffled fallback
      // (threshold below the batch's distinct-hash count) must classify
      // every row identically to the broadcast path
      val viaShuffle = Dedup.incrementalExact(index, c2, "chunk_hash",
        orderCols = Seq("doc_id", "chunk_id"), maxBroadcastKeys = 1)
      val keyed = Seq("doc_id", "chunk_id", "status")
      assert(classified.select(keyed.map(col): _*)
          .except(viaShuffle.select(keyed.map(col): _*)).count() == 0 &&
        viaShuffle.select(keyed.map(col): _*)
          .except(classified.select(keyed.map(col): _*)).count() == 0,
        "shuffled fallback diverged from the broadcast path")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("the curation tail commutes with incremental arrival: day-wise " +
      "mixture + packing equals whole-corpus mixture + packing") {
    val docs = Tables.documents(spark, sf)
    val day1 = docs.filter(col("doc_id") % 5 >= 2)
    val day2 = docs.filter(col("doc_id") % 5 < 2)
    val weights = Map("src0" -> 1.0, "src1" -> 0.6, "src2" -> 0.25)

    // mixture sampling is keyed on the doc id, so sampling each day's
    // arrivals independently must select exactly the whole-corpus sample
    val mixAll = Curation.mixtureSample(docs, "source", "doc_id", weights,
      defaultWeight = 0.1)
    val mixDays = Curation.mixtureSample(day1, "source", "doc_id", weights,
        defaultWeight = 0.1)
      .unionByName(Curation.mixtureSample(day2, "source", "doc_id", weights,
        defaultWeight = 0.1))
    assert(mixAll.select("doc_id").except(mixDays.select("doc_id")).count() == 0 &&
      mixDays.select("doc_id").except(mixAll.select("doc_id")).count() == 0,
      "mixture sample is not incremental-arrival invariant")
    assert(mixAll.count() > 0 && mixAll.count() < docs.count())

    // packing over the sampled chunks: deterministic (two runs identical)
    // and budget-respecting (a sequence exceeds the budget only by the
    // straddling chunk's tail — strictly less than one max chunk)
    val chunks = chunked(mixAll)
    def pack(): DataFrame = Curation.packSequences(chunks, "source",
      orderCols = Seq("doc_id", "chunk_id"), tokenCol = "n_chunk_tokens",
      budget = 256L, shards = 2)
    val p1 = pack().collect().map(_.mkString("|")).sorted.toSeq
    val p2 = pack().collect().map(_.mkString("|")).sorted.toSeq
    assert(p1 == p2, "packing is not deterministic across runs")

    val maxChunk = chunks.agg(max("n_chunk_tokens")).head().getLong(0)
    val seqTotals = pack()
      .groupBy("source", "shard", "seq_id")
      .agg(sum("n_chunk_tokens").as("tok"), count(lit(1)).as("n"))
    assert(seqTotals.filter(col("tok") >= lit(256L) + lit(maxChunk)).count() == 0,
      "a packed sequence exceeded budget by a full chunk or more")
    // density: every non-final sequence in a (source, shard) reaches the
    // budget once its straddling chunk is counted — no premature breaks
    val lastSeq = seqTotals.withColumn("__last",
      col("seq_id") === max("seq_id").over(
        Window.partitionBy("source", "shard")))
    assert(lastSeq.filter(!col("__last") && col("tok") < 256L).count() == 0,
      "a non-final sequence was packed under budget")
  }

  test("merge-on-read deletes: request path rewrites nothing, reads apply " +
      "vectors, compaction converges plain readers") {
    import spark.implicits._
    import graft.sources.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_mor_spec_").toString
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val rows = Seq(
        (1L, ts("2024-01-01 01:00:00")), (2L, ts("2024-01-01 02:00:00")),
        (3L, ts("2024-01-01 03:00:00")),
        (4L, ts("2024-01-02 01:00:00")), (2L, ts("2024-01-02 02:00:00"))
      ).toDF("user_id", "ts")
      Staging.writeStaged(rows, "ts", dir)
      def fileSet() = {
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val it = fs.listFiles(p, true)
        Iterator.continually(it).takeWhile(_.hasNext).map(_.next())
          .map(f => (f.getPath.toString, f.getModificationTime))
          .filter(f => f._1.contains("y=") && f._1.endsWith(".parquet"))
          .toSeq.sorted
      }
      val dataBefore = fileSet()
      Staging.writeDeleteVector(spark, dir, "user_id", Seq(2L).toDF("user_id"))
      // request path touched NO data file...
      assert(fileSet() == dataBefore)
      // ...plain readers still see the old rows (the MOR contract)...
      assert(Staging.readStaged(spark, dir).count() == 5L)
      // ...erasure-aware readers do not
      assert(Staging.readWithDeletes(spark, dir, "user_id")
        .select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L, 4L))
      // vectors accumulate across requests
      Staging.writeDeleteVector(spark, dir, "user_id", Seq(3L).toDF("user_id"))
      assert(Staging.readWithDeletes(spark, dir, "user_id")
        .select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
      // compaction folds vectors in physically and clears the sidecar:
      // plain readers converge with erasure-aware ones
      val report = Staging.compactDeletes(spark, dir, "user_id")
        .orderBy("y", "m", "d").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(report.toSeq == Seq((1L, 3L, 2L, 1L), (2L, 2L, 1L, 1L)))
      assert(!new java.io.File(s"$dir/_deletes").exists)
      assert(Staging.readStaged(spark, dir)
        .select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
      assert(Staging.readWithDeletes(spark, dir, "user_id")
        .select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
      // compacting again with no sidecar is an empty-report no-op
      assert(Staging.compactDeletes(spark, dir, "user_id").count() == 0L)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("erasure rewrites only affected partitions, removes emptied ones, " +
      "and the surviving lake is exactly original-minus-keys") {
    import spark.implicits._
    import graft.sources.Staging
    val dir = java.nio.file.Files.createTempDirectory("graft_del_spec_").toString
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      // day1: mixed (one key erased); day2: untouched; day3: fully erased
      val rows = Seq(
        (1L, ts("2024-01-01 01:00:00")), (2L, ts("2024-01-01 02:00:00")),
        (3L, ts("2024-01-01 03:00:00")),
        (4L, ts("2024-01-02 01:00:00")), (5L, ts("2024-01-02 02:00:00")),
        (2L, ts("2024-01-03 01:00:00")), (2L, ts("2024-01-03 02:00:00"))
      ).toDF("user_id", "ts")
      Staging.writeStaged(rows, "ts", dir)
      def dataFiles(sub: String) =
        new java.io.File(s"$dir/$sub").listFiles()
          .filter(f => f.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
      val day2Before = dataFiles("y=2024/m=1/d=2")
      val report = Staging.deleteKeys(spark, dir, "user_id",
          Seq(2L).toDF("user_id"))
        .orderBy("y", "m", "d").collect()
        .map(r => (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      // (d, before, deleted, after): day2 must NOT appear
      assert(report.toSeq == Seq((1L, 3L, 1L, 2L), (3L, 2L, 2L, 0L)))
      // untouched partition: same files, same mtimes, same bytes
      assert(dataFiles("y=2024/m=1/d=2") == day2Before)
      // fully-erased partition directory is GONE (dynamic overwrite alone
      // would have silently kept its old files)
      assert(!new java.io.File(s"$dir/y=2024/m=1/d=3").exists)
      // surviving lake == original minus the erased key
      val back = Staging.readStaged(spark, dir)
        .select("user_id").as[Long].collect().sorted.toSeq
      assert(back == Seq(1L, 3L, 4L, 5L))
      // idempotency: erasing the same keys again is a no-op with an
      // empty report
      assert(Staging.deleteKeys(spark, dir, "user_id",
        Seq(2L).toDF("user_id")).count() == 0L)
      assert(Staging.readStaged(spark, dir).count() == 4L)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("time travel: snapshot isolation across erasure + upsert, manifest " +
      "pruning, and vacuum convergence") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft_tt_spec_").toString
    try {
      def ts(s: String) = java.sql.Timestamp.valueOf(s)
      val v1rows = Seq(
        (1L, 10L, ts("2024-01-01 01:00:00")),
        (2L, 97L, ts("2024-01-01 02:00:00")),
        (3L, 20L, ts("2024-01-02 01:00:00")),
        (4L, 97L, ts("2024-01-02 02:00:00")),
        (5L, 30L, ts("2024-01-03 01:00:00")))
      val v1df = v1rows.toDF("event_id", "user_id", "ts")
      assert(Snapshots.commitAppend(spark, dir, v1df, "ts") == 1L)
      // v2: erase user 97 (touches days 1 and 2, not 3)
      assert(Snapshots.commitDeleteKeys(spark, dir, "user_id",
        Seq(97L).toDF("user_id")) == 2L)
      // v3: upsert — update event 3's user, insert event 6 on day 3
      assert(Snapshots.commitUpsert(spark, dir,
        Seq((3L, 21L, ts("2024-01-02 01:00:00")),
          (6L, 40L, ts("2024-01-03 02:00:00"))).toDF("event_id", "user_id", "ts"),
        "ts", "event_id") == 3L)

      def snap(v: Long, prune: Option[org.apache.spark.sql.Column] = None) =
        Snapshots.readSnapshot(spark, dir, v, prune)
          .select("event_id", "user_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // SNAPSHOT ISOLATION: v1 read AFTER both commits is the original
      assert(snap(1) == v1rows.map(t => (t._1, t._2)).sorted)
      assert(snap(2) == Seq((1L, 10L), (3L, 20L), (5L, 30L)))
      assert(snap(3) == Seq((1L, 10L), (3L, 21L), (5L, 30L), (6L, 40L)))

      // MANIFEST PRUNING: a y/m/d predicate reads only that day's files
      val pruned = Snapshots.readSnapshot(spark, dir, 3,
        Some(col("d") === 1L))
      assert(pruned.select("event_id").as[Long].collect().sorted.toSeq == Seq(1L))
      // normalize URI rendering (file:/ vs file:///) before comparing
      def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
      val day1Files = Snapshots.manifest(spark, dir, 3)
        .filter(col("d") === 1L).select("file").as[String].collect()
        .map(norm).toSet
      val touched = pruned.inputFiles.map(norm).toSet
      assert(touched.subsetOf(day1Files),
        s"pruned read touched ${touched -- day1Files}")

      // untouched-partition file REUSE across versions: day 3's original
      // file is still live in v2's manifest (no rewrite of unaffected data)
      val d3v1 = Snapshots.manifest(spark, dir, 1)
        .filter(col("d") === 3L).select("file").as[String].collect().toSet
      val d3v2 = Snapshots.manifest(spark, dir, 2)
        .filter(col("d") === 3L).select("file").as[String].collect().toSet
      assert(d3v1 == d3v2 && d3v1.nonEmpty)

      // VACUUM: keep only v3 — v3 stays byte-identical, old versions gone
      val v3Before = snap(3)
      val deleted = Snapshots.vacuum(spark, dir, keepFrom = 3L)
      assert(deleted > 0L, "vacuum reclaimed nothing")
      assert(snap(3) == v3Before)
      assert(Snapshots.currentVersion(spark, dir) == 3L)
      intercept[Exception](Snapshots.manifest(spark, dir, 1).collect())
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("manifest column stats: versioned reads skip files the partition tuple cannot") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft_stats_spec_").toString
    try {
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      // three commits on the SAME day (partition tuples identical — the
      // y/m/d prune can separate nothing) with disjoint value ranges:
      // only the manifest's per-file [min, max] bounds can skip here
      def batch(ids: Range, base: Double) = ids.map(i =>
        (i.toLong, base + (i % 10), ts(1 + i % 5))).toDF("event_id", "value", "ts")
      assert(Snapshots.commitAppend(spark, dir, batch(0 until 50, 0.0),
        "ts", statsCols = Seq("value")) == 1L)
      assert(Snapshots.commitAppend(spark, dir, batch(50 until 100, 100.0),
        "ts", statsCols = Seq("value")) == 2L)
      assert(Snapshots.commitAppend(spark, dir, batch(100 until 150, 200.0),
        "ts", statsCols = Seq("value")) == 3L)
      def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
      val allFiles = Snapshots.manifest(spark, dir, 3)
        .select("file").as[String].collect().map(norm).toSet
      // the selective range hits only batch 2's [100, 109] band
      val hit = Snapshots.readSnapshot(spark, dir, 3,
        statsRanges = Map("value" -> (103.0, 105.0)))
      val touched = hit.inputFiles.map(norm).toSet
      assert(touched.nonEmpty && touched.subsetOf(allFiles))
      assert(touched.size < allFiles.size,
        s"stats prune skipped nothing: $touched of $allFiles")
      // superset guarantee: the pruned read + row filter equals the full
      // read + row filter, row for row
      val pred = col("value") >= 103.0 && col("value") <= 105.0
      val got = hit.filter(pred).select("event_id").as[Long].collect().sorted.toSeq
      val want = Snapshots.readSnapshot(spark, dir, 3)
        .filter(pred).select("event_id").as[Long].collect().sorted.toSeq
      assert(got == want && got.nonEmpty)
      // conservative paths: a whole-domain range keeps every file; a
      // column with no recorded bounds keeps every file
      assert(Snapshots.readSnapshot(spark, dir, 3,
        statsRanges = Map("value" -> (0.0, 1e9)))
        .inputFiles.map(norm).toSet == allFiles)
      assert(Snapshots.readSnapshot(spark, dir, 3,
        statsRanges = Map("event_id" -> (0.0, 1.0)))
        .inputFiles.map(norm).toSet == allFiles)
      // stats compose with the partition prune (same collected list)
      val both = Snapshots.readSnapshot(spark, dir, 3,
        prune = Some(col("d") === 1L),
        statsRanges = Map("value" -> (103.0, 105.0)))
      assert(both.inputFiles.map(norm).toSet.subsetOf(touched))
      // a range that PROVABLY misses every live file is a normal outcome
      // of stats pruning: empty frame, lake schema, no error
      val none = Snapshots.readSnapshot(spark, dir, 3,
        statsRanges = Map("value" -> (-500.0, -400.0)))
      assert(none.isEmpty)
      assert(none.columns.toSet ==
        Snapshots.readSnapshot(spark, dir, 3).columns.toSet)
      // the unpruned read of a missing snapshot stays a caller error
      intercept[Exception](Snapshots.readSnapshot(spark, dir, 99))
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("manifest quantile sketches: catalog-only row estimates, exact at small n, coverage reported") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_manifest_").toString
    try {
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      def batch(ids: Range) = ids.map(i =>
        (i.toLong, ((i * 2654435761L) % 1000L).toDouble, ts(1 + i % 5)))
        .toDF("event_id", "value", "ts")
      // commit 1 WITHOUT sketches (coverage must be reported, not faked)
      assert(Snapshots.commitAppend(spark, dir, batch(0 until 300), "ts") == 1L)
      // commits 2-3 with sketches over `value`
      assert(Snapshots.commitAppend(spark, dir, batch(300 until 900),
        "ts", sketchCols = Seq("value"), sketchK = 64) == 2L)
      assert(Snapshots.commitAppend(spark, dir, batch(900 until 1500),
        "ts", sketchCols = Seq("value"), sketchK = 64) == 3L)
      val (est, covered) = Snapshots.estimateRowsInRange(
        spark, dir, 3, "value", 0.0, 250.0)
      // only the sketched commits are covered
      assert(covered == 1200L, s"covered=$covered")
      // the estimate tracks the true selectivity of the covered rows
      val truth = Snapshots.readSnapshot(spark, dir, 3)
        .filter(col("event_id") >= 300 &&
          col("value").between(0.0, 250.0)).count()
      assert(math.abs(est - truth) / truth < 0.35,
        s"est=$est truth=$truth (covered=$covered)")
      // EXACT when covered rows <= the fold width: tiny lake, k well
      // above its row count — sample == population
      val tiny = java.nio.file.Files.createTempDirectory("graft_sketch_tiny_").toString
      try {
        // covered rows (80) <= min build k (128) => sample == population
        assert(Snapshots.commitAppend(spark, tiny, batch(0 until 40),
          "ts", sketchCols = Seq("value"), sketchK = 128) == 1L)
        assert(Snapshots.commitAppend(spark, tiny, batch(40 until 80),
          "ts", sketchCols = Seq("value"), sketchK = 128) == 2L)
        val (e2, c2) = Snapshots.estimateRowsInRange(
          spark, tiny, 2, "value", 100.0, 500.0)
        val t2 = Snapshots.readSnapshot(spark, tiny, 2)
          .filter(col("value").between(100.0, 500.0)).count()
        assert(c2 == 80L && e2 == t2.toDouble, s"e2=$e2 t2=$t2")
      } finally {
        val p = new org.apache.hadoop.fs.Path(tiny)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
      // a column with no sketches anywhere: zero estimate, zero coverage
      assert(Snapshots.estimateRowsInRange(spark, dir, 3, "event_id", 0, 10)
        == ((0.0, 0L)))
      // snapshot reads are unaffected by the sketch column's presence
      assert(Snapshots.readSnapshot(spark, dir, 3).count() == 1500L)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("manifest string stats skip files; pre-stats manifests stay readable and committable") {
    import spark.implicits._
    import graft.sources.Snapshots
    val dir = java.nio.file.Files.createTempDirectory("graft_statstr_spec_").toString
    try {
      def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
      // same-day commits with disjoint CATEGORICAL ranges: only the
      // VARCHAR [min, max] bounds can separate the files
      def batch(ids: Range, src: String) = ids.map(i =>
        (i.toLong, src, ts(1 + i % 5))).toDF("event_id", "source", "ts")
      assert(Snapshots.commitAppend(spark, dir, batch(0 until 40, "arxiv"),
        "ts", statsCols = Seq("source", "event_id")) == 1L)
      assert(Snapshots.commitAppend(spark, dir, batch(40 until 80, "web"),
        "ts", statsCols = Seq("source", "event_id")) == 2L)
      def norm(p: String) = new org.apache.hadoop.fs.Path(p).toUri.getPath
      val allFiles = Snapshots.manifest(spark, dir, 2)
        .select("file").as[String].collect().map(norm).toSet
      // the point predicate source = 'web' as the range ("web","web")
      // hits only batch 2's files — strict subset
      val hit = Snapshots.readSnapshot(spark, dir, 2,
        statsStrRanges = Map("source" -> ("web", "web")))
      val touched = hit.inputFiles.map(norm).toSet
      assert(touched.nonEmpty && touched.subsetOf(allFiles)
        && touched.size < allFiles.size,
        s"string stats prune skipped nothing: $touched of $allFiles")
      // superset guarantee: pruned read + row filter == full read + filter
      val got = hit.filter(col("source") === "web")
        .select("event_id").as[Long].collect().sorted.toSeq
      val want = Snapshots.readSnapshot(spark, dir, 2)
        .filter(col("source") === "web")
        .select("event_id").as[Long].collect().sorted.toSeq
      assert(got == want && got.nonEmpty)
      // numeric and string bounds ride the same commits and compose
      assert(Snapshots.readSnapshot(spark, dir, 2,
          statsRanges = Map("event_id" -> (0.0, 10.0)),
          statsStrRanges = Map("source" -> ("web", "web")))
        .isEmpty) // batch 2 holds ids >= 40 — the conjunction misses all
      // BACKWARD COMPAT: rewrite v2's manifest WITHOUT the stats columns
      // (a lake written by the pre-stats format), then commit and read
      val m2 = Snapshots.manifest(spark, dir, 2)
        .drop("stats", "stats_str").collect()
      val mdir = s"$dir/_manifests/v2"
      val p2 = new org.apache.hadoop.fs.Path(mdir)
      p2.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p2, true)
      spark.createDataFrame(spark.sparkContext.parallelize(m2.toSeq),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("batch", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("file", org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("y", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("m", org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("d", org.apache.spark.sql.types.LongType))))
        .write.parquet(mdir)
      // stats-pruned reads over the old manifest conservatively keep all
      assert(Snapshots.readSnapshot(spark, dir, 2,
          statsStrRanges = Map("source" -> ("web", "web")))
        .inputFiles.map(norm).toSet == allFiles)
      // a new commit unions the old (stats-less) manifest without error
      assert(Snapshots.commitAppend(spark, dir, batch(80 until 120, "wiki"),
        "ts", statsCols = Seq("source")) == 3L)
      val v3 = Snapshots.readSnapshot(spark, dir, 3)
      assert(v3.count() == 120L)
      // and the NEW batch's bounds still prune within the mixed manifest
      val wiki = Snapshots.readSnapshot(spark, dir, 3,
        statsStrRanges = Map("source" -> ("wiki", "wiki")))
      // old files (NULL bounds) conservatively kept; batch 2's "web"
      // bounds would have been dropped had they survived the rewrite —
      // so the guarantee here is superset semantics, not strictness
      assert(wiki.filter(col("source") === "wiki").count() == 40L)
    } finally {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("schema evolution: merged read types the absent column as nulls; batch reads prune") {
    // materialize the staged batches via the registered query
    SparkEntry.queries("schema_evolution")(spark, sf).collect()
    val path = SparkEntry.formatStagePath(sf, "orders", "evo")
    val merged = SparkEntry.schemaEvolutionRead(spark, path)
    // the pre-evolution batch surfaces the new column as typed nulls
    assert(merged.schema("o_orderpriority").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(merged.filter(col("batch") === 1 && col("o_orderpriority").isNotNull)
      .isEmpty)
    // a batch predicate prunes at the DIRECTORY level: the filter lands
    // in the scan's partitionFilters (inputFiles ignores pruning — it
    // lists the whole location; the round-3 rule: assert on the exec)
    val scans = merged.filter(col("batch") === 2)
      .queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.exists(_.references.exists(
      _.name == "batch"))), scans.map(_.partitionFilters).mkString("; "))
    assert(scans.forall(_.dataFilters.isEmpty),
      scans.map(_.dataFilters).mkString("; "))
  }

  test("crypto_shred: kept users round-trip bit-exact, shredded users decrypt to null") {
    val e = Tables.events(spark, sf).select(col("user_id"), col("props"))
    val keys = SparkEntry.shredKeys(spark, sf)
    val enc = e.join(keys, Seq("user_id"))
      .select(col("user_id"), col("props"),
        aes_encrypt(col("props").cast("binary"), col("key"), lit("ECB"))
          .as("ct"))
    // kept cohort: decrypting with the (kept) key restores the exact bytes
    val kept = enc.filter(col("user_id") % 97 =!= 0)
      .join(keys, Seq("user_id"))
      .select(col("props"),
        aes_decrypt(col("ct"), col("key"), lit("ECB")).cast("string").as("pt"))
    assert(kept.count() > 0)
    assert(kept.filter(col("pt") =!= col("props")).count() == 0)
    // shredded cohort: without its key the payload is unreadable —
    // try_aes_decrypt under ANY other user's key yields null, not garbage
    // (AES-GCM-free ECB has no auth tag, but a wrong 16-byte key still
    // fails the PKCS padding check with overwhelming probability)
    val wrongKey = keys.filter(col("user_id") % 97 =!= 0).limit(1)
      .select(col("key").as("wrong")).crossJoin(
        enc.filter(col("user_id") % 97 === 0))
    val readable = wrongKey
      .select(try_aes_decrypt(col("ct"), col("wrong"), lit("ECB")).as("pt"))
      .filter(col("pt").isNotNull).count()
    assert(readable == 0, s"$readable shredded payloads readable under a wrong key")
  }

  test("crypto_shred_gcm: derived-IV GCM round-trips, authenticates, and is deterministic") {
    val e = Tables.events(spark, sf).select(col("user_id"), col("props"))
    val keys = SparkEntry.shredKeys(spark, sf)
    val pt = col("props").cast("binary")
    def encrypt(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("props"),
        aes_encrypt(pt, col("key"), lit("GCM"), lit("NONE"),
          SparkEntry.shredIv(col("key"), pt)).as("ct"))
    val enc = encrypt(e.join(keys, Seq("user_id")))
    // kept cohort: decrypting with the kept key restores the exact bytes
    // (Spark prepends the provided IV, so decrypt is just (ct, key, GCM))
    val kept = enc.filter(col("user_id") % 97 =!= 0)
      .join(keys, Seq("user_id"))
      .select(col("props"),
        aes_decrypt(col("ct"), col("key"), lit("GCM")).cast("string").as("pt"))
    assert(kept.count() > 0)
    assert(kept.filter(col("pt") =!= col("props")).count() == 0)
    // wrong key: GCM is AUTHENTICATED — the tag check fails by
    // construction (not merely with-overwhelming-probability as ECB's
    // padding check), so try_aes_decrypt yields null for every row
    val wrongKey = keys.filter(col("user_id") % 97 =!= 0).limit(1)
      .select(col("key").as("wrong")).crossJoin(
        enc.filter(col("user_id") % 97 === 0))
    val readable = wrongKey
      .select(try_aes_decrypt(col("ct"), col("wrong"), lit("GCM")).as("pt"))
      .filter(col("pt").isNotNull).count()
    assert(readable == 0, s"$readable shredded payloads readable under a wrong key")
    // shredded cohort surfaces as null in the registered report
    val report = SparkEntry.queries("crypto_shred_gcm")(spark, sf).collect()
    assert(report.length == 2)
    val byCohort = report.map(r => r.getBoolean(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byCohort(false)._1 == byCohort(false)._2, "kept cohort must be fully readable")
    assert(byCohort(true)._2 == 0, "shredded cohort must be fully unreadable")
    // determinism: the derived IV makes the ciphertext a pure function of
    // (key, plaintext) — two independent encryptions agree bit for bit
    // (the gate's no-rand invariant, impossible with GCM's random IV)
    val twice = enc.select(col("user_id"), col("props"), col("ct").as("ct1"))
      .join(encrypt(e.join(keys, Seq("user_id")))
        .select(col("user_id"), col("props"), col("ct").as("ct2")),
        Seq("user_id", "props"))
    assert(twice.filter(col("ct1") =!= col("ct2")).count() == 0,
      "derived-IV GCM ciphertext must be deterministic")
  }
}
