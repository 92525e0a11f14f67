package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Versioned snapshot reads over the staged lake — the time-travel verb
  * the maintenance family (z-order / compaction / MOR / CDC / SCD2 /
  * erasure) composes with: every commit writes NEW immutable data files
  * plus a manifest listing the files live at that version, so any past
  * version stays readable until [[vacuum]] reclaims it. This is the
  * Iceberg/Delta snapshot posture (manifest = per-file partition tuple,
  * planning = manifest pruning) re-expressed over plain parquet; the
  * reference analog is the idempotent re-run semantics of its staged
  * hourly loads (rust_twitter_steam_pipeline.py staging), which this
  * generalizes from "re-run replaces the slice" to "every run is a
  * readable version".
  *
  * Layout:
  *   path/files/b<v>/y=…/m=…/d=…/part-*.parquet   (immutable data files)
  *   path/_manifests/v<v>/part-*.parquet           (batch, file, y, m, d)
  *
  * Scale notes: a commit lists only ITS OWN new files (one leaf-dir walk
  * of the just-written batch); the carry-forward of prior manifest rows
  * is a DataFrame union, never a per-file driver loop over the whole
  * lake. Reads prune at the MANIFEST — a y/m/d predicate filters manifest
  * rows before any data file is opened, which is exactly the min/max
  * rectangle trick of zorder_scan lifted to the file catalog (Iceberg's
  * partition-tuple pruning). The file-path collect at read-planning time
  * is manifest-rows-after-pruning-sized — the same driver-side state
  * every table format's planner carries. Copy-on-write commits rewrite
  * only the partitions that contain a matching key (the deleteKeys
  * posture) and leave old files on disk for older versions.
  */
object Snapshots {

  private def manifestDir(path: String, v: Long) = s"$path/_manifests/v$v"
  private def batchDir(path: String, v: Long) = s"$path/files/b$v"

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed version (0 = empty lake, no commits yet). */
  def currentVersion(spark: SparkSession, path: String): Long = {
    val root = new org.apache.hadoop.fs.Path(s"$path/_manifests")
    val f = fs(spark, path)
    if (!f.exists(root)) 0L
    else f.listStatus(root).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") => n.drop(1).toLong }
      .foldLeft(0L)(math.max)
  }

  /** The manifest of version `v`: one row per live data file —
    * (batch BIGINT, file STRING, y BIGINT, m BIGINT, d BIGINT,
    * stats MAP<STRING, ARRAY<DOUBLE>>,
    * stats_str MAP<STRING, ARRAY<STRING>>,
    * sketches MAP<STRING, STRUCT<k, n, hs, vs>>). `stats` maps a numeric
    * column name to its per-file [min, max]; `stats_str` the same for
    * STRING columns (dictionary-style VARCHAR bounds — the commonest
    * selective predicates in the LLM-pipeline queries are categorical,
    * e.g. source = 'web'); `sketches` holds per-file bottom-k quantile
    * sketches for [[estimateRowsInRange]]. All empty when the commit
    * passed no statsCols/sketchCols — the Iceberg-style file-catalog
    * summaries that answer planning questions WITHOUT opening a single
    * parquet footer. */
  def manifest(spark: SparkSession, path: String, v: Long): DataFrame = {
    require(v >= 1, s"no version $v: versions start at 1")
    spark.read.parquet(manifestDir(path, v))
  }

  private val statsType = MapType(StringType, ArrayType(DoubleType))
  private val statsStrType = MapType(StringType, ArrayType(StringType))
  private val sketchType = MapType(StringType, StructType(
    StructField("k", LongType) +: graft.functions.MinKByHash.outType.fields.toSeq))

  /** Backward compatibility with manifests written before the stats
    * columns existed (an on-disk format must never strand old lakes):
    * absent bounds/sketch columns surface as typed NULL maps, which
    * every pruning predicate already treats as "conservatively keep"
    * (and estimators as "file not covered"). */
  private def withStatsCols(m: DataFrame): DataFrame = {
    val m1 = if (m.columns.contains("stats")) m
      else m.withColumn("stats", lit(null).cast(statsType))
    val m2 = if (m1.columns.contains("stats_str")) m1
      else m1.withColumn("stats_str", lit(null).cast(statsStrType))
    if (m2.columns.contains("sketches")) m2
    else m2.withColumn("sketches", lit(null).cast(sketchType))
  }

  /** Read snapshot `v`, optionally pruned by a predicate over the
    * manifest's y/m/d partition columns (manifest pruning: files whose
    * partition tuple fails the predicate are never opened), by
    * `statsRanges` — per-column closed query ranges checked against the
    * manifest's per-file [min, max] bounds (a file is skipped only when
    * its recorded range PROVABLY misses the query range; files without
    * bounds for a column are conservatively kept) — and by
    * `statsStrRanges`, the same check for STRING columns under
    * lexicographic order (a point predicate `source = 'web'` is the
    * range ("web", "web")). Stats pruning is a superset guarantee like
    * partition pruning: the caller still applies its own row filter.
    * Partition columns come back on every row, directory-derived per
    * batch. A pruned read whose file set comes back EMPTY is a normal
    * outcome (a legitimate query range can provably miss every live
    * file) and returns an empty frame with the lake schema; only an
    * UNPRUNED read of a fileless snapshot is a caller error. */
  def readSnapshot(spark: SparkSession, path: String, v: Long,
      prune: Option[Column] = None,
      statsRanges: Map[String, (Double, Double)] = Map.empty,
      statsStrRanges: Map[String, (String, String)] = Map.empty,
      // a caller that already holds v's manifest frame passes it through
      // (commitReplace reads the same tiny parquet for `carried`
      // otherwise — one listing+footer round-trip per commit saved)
      manifestOpt: Option[DataFrame] = None): DataFrame = {
    def rangePrune[T](m: DataFrame, statsCol: String,
        ranges: Map[String, (T, T)]): DataFrame =
      ranges.foldLeft(m) { case (acc, (c, (lo, hi))) =>
        val bounds = element_at(col(statsCol), lit(c))
        acc.filter(coalesce(
          element_at(bounds, 1) <= lit(hi) && element_at(bounds, 2) >= lit(lo),
          lit(true)))
      }
    val m0 = withStatsCols(manifestOpt.getOrElse(manifest(spark, path, v)))
    val statsPruned = rangePrune(rangePrune(m0, "stats", statsRanges),
      "stats_str", statsStrRanges)
    val m = prune.foldLeft(statsPruned)(_ filter _)
    val files = m.select(col("batch"), col("file"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    def readBatch(b: Long, fl: Seq[String]): DataFrame =
      // per-batch basePath so the y=/m=/d= segments below it parse back
      // into partition columns on every batch's rows
      spark.read.option("basePath", batchDir(path, b))
        .parquet(fl.toIndexedSeq: _*)
    if (files.nonEmpty)
      files.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (b, fl) => readBatch(b, fl.map(_._2)) }
        .reduce(_ unionByName _)
    else {
      val pruned = prune.nonEmpty || statsRanges.nonEmpty || statsStrRanges.nonEmpty
      require(pruned, s"snapshot v$v has no live files")
      // schema from ONE live file of the unpruned manifest (snapshot
      // schemas are union-compatible across batches by construction)
      val any = manifest(spark, path, v).select(col("batch"), col("file")).head(1)
      require(any.nonEmpty, s"snapshot v$v has no live files")
      readBatch(any(0).getLong(0), Seq(any(0).getString(1))).limit(0)
    }
  }

  /** One entry of the manifest's per-file sketch map — a bottom-k
    * quantile sketch of a column's values in that file (the
    * [[graft.functions.MinKByHash]] struct shape plus the BUILD k,
    * which [[estimateRowsInRange]] needs to pick a sound fold width). */
  private case class SketchCell(k: Long, n: Long, hs: Seq[Long], vs: Seq[Double])

  /** Write a batch's rows as version `v`'s new files and return their
    * manifest rows (one leaf-dir walk of the just-written batch only;
    * with `statsCols`/`sketchCols`, plus ONE read-back scan of the
    * just-written batch — never the lake — to record per-file [min, max]
    * bounds and per-file bottom-k quantile sketches). */
  private def writeBatch(spark: SparkSession, path: String, v: Long,
      rows: DataFrame, statsCols: Seq[String],
      sketchCols: Seq[String] = Nil, sketchK: Int = 256): DataFrame = {
    val dir = batchDir(path, v)
    // overwrite: the MANIFEST is the commit point, so a batch dir left by
    // a commit that crashed before writing its manifest is orphaned — the
    // retry recomputes the same version and must be able to replace it
    // (ErrorIfExists would wedge the lake permanently on that path)
    rows.write.mode("overwrite").partitionBy("y", "m", "d").parquet(dir)
    // per-file bounds: numeric columns cast to DOUBLE (exact for BIGINTs
    // below 2^53 — the contract; columns past that precision belong in
    // partition tuples, not stats); STRING columns keep native min/max
    // VARCHAR bounds (lexicographic — engine-comparable dictionary-style
    // bounds, the categorical-predicate skipping path). Keyed by URI
    // path — input_file_name renders file:/// where Path.toString
    // renders file:/ (the round-11 rule).
    def norm(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    type FileStats = (Map[String, Seq[Double]], Map[String, Seq[String]])
    val statsByFile: Map[String, FileStats] =
      if (statsCols.isEmpty) Map.empty
      else {
        val back = spark.read.parquet(dir)
        val isStr = statsCols.map(c =>
          c -> (back.schema(c).dataType == StringType)).toMap
        val aggs = statsCols.zipWithIndex.flatMap { case (c, i) =>
          if (isStr(c)) Seq(min(col(c)).as(s"mn$i"), max(col(c)).as(s"mx$i"))
          else Seq(min(col(c)).cast(DoubleType).as(s"mn$i"),
            max(col(c)).cast(DoubleType).as(s"mx$i"))
        }
        back.groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val present = statsCols.zipWithIndex.flatMap { case (c, i) =>
              val (mn, mx) = (r.getAs[Any](s"mn$i"), r.getAs[Any](s"mx$i"))
              if (mn == null || mx == null) None else Some((c, mn, mx))
            }
            val num = present.collect { case (c, mn, mx) if !isStr(c) =>
              c -> Seq(mn.asInstanceOf[Double], mx.asInstanceOf[Double]) }.toMap
            val str = present.collect { case (c, mn, mx) if isStr(c) =>
              c -> Seq(mn.asInstanceOf[String], mx.asInstanceOf[String]) }.toMap
            norm(r.getString(0)) -> ((num, str))
          }.toMap
      }
    // per-file bottom-k quantile sketches — a manifest-resident column
    // SUMMARY (Iceberg's column-sketch posture): the hash is xxhash64 of
    // the whole row (stable across scans, duplicates keep a multiset),
    // so the kept sample is deterministic; per-column NULLs are excluded
    // from that column's sketch (its n = the file's non-null count)
    val sketchByFile: Map[String, Map[String, SketchCell]] =
      if (sketchCols.isEmpty) Map.empty
      else {
        val back = spark.read.parquet(dir)
        val rowHash = xxhash64(back.columns.map(col): _*)
        val aggs = sketchCols.zipWithIndex.map { case (c, i) =>
          // a NULL value skips the (h, v) pair inside the aggregate
          graft.functions.minKByHash(
            rowHash, col(c).cast(DoubleType), sketchK).as(s"sk$i")
        }
        back.groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            norm(r.getString(0)) -> sketchCols.zipWithIndex.map {
              case (c, i) =>
                val s = r.getStruct(i + 1)
                c -> SketchCell(sketchK.toLong, s.getLong(0),
                  s.getSeq[Long](1), s.getSeq[Double](2))
            }.toMap
          }.toMap
      }
    val f = fs(spark, path)
    val it = f.listFiles(new org.apache.hadoop.fs.Path(dir), true)
    val out = scala.collection.mutable.ArrayBuffer.empty[
      (Long, String, Long, Long, Long, Map[String, Seq[Double]],
        Map[String, Seq[String]], Map[String, SketchCell])]
    while (it.hasNext) {
      val s = it.next()
      val p = s.getPath.toString
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".")) {
        def part(k: String): Long = {
          val seg = p.split("/").find(_.startsWith(s"$k=")).getOrElse(
            sys.error(s"no $k= segment in $p"))
          seg.drop(2).toLong
        }
        val (num, str) = statsByFile.getOrElse(norm(p),
          (Map.empty[String, Seq[Double]], Map.empty[String, Seq[String]]))
        out += ((v, p, part("y"), part("m"), part("d"), num, str,
          sketchByFile.getOrElse(norm(p), Map.empty[String, SketchCell])))
      }
    }
    import spark.implicits._
    out.toSeq
      .toDF("batch", "file", "y", "m", "d", "stats", "stats_str", "sketches")
  }

  private def writeManifest(path: String, v: Long, rows: DataFrame): Long = {
    rows.write.parquet(manifestDir(path, v))
    v
  }

  /** Append `df` as a new version: new files = the batch's, manifest =
    * previous live set + the new files. With `statsCols`, the new files'
    * per-column [min, max] bounds are recorded in the manifest (see
    * [[readSnapshot]]'s statsRanges — pair with a value-clustered write
    * order so bounds are tight, the z-order/Hilbert composition). With
    * `sketchCols`, the manifest additionally records a per-file bottom-k
    * quantile sketch of each named column — a deterministic uniform
    * sample the catalog can fold for selectivity/row-count estimates
    * WITHOUT opening a data file ([[estimateRowsInRange]]).
    * Returns the new version. */
  def commitAppend(spark: SparkSession, path: String, df: DataFrame,
      tsCol: String, statsCols: Seq[String] = Nil,
      sketchCols: Seq[String] = Nil, sketchK: Int = 256): Long = {
    val v = currentVersion(spark, path) + 1
    val added = writeBatch(spark, path, v,
      Staging.withDateParts(df, tsCol), statsCols, sketchCols, sketchK)
    // allowMissingColumns: a manifest written before the stats columns
    // existed carries NULL bounds forward (pruned reads conservatively
    // keep such files) instead of breaking the lake's on-disk format
    val live = if (v == 1) added
      else manifest(spark, path, v - 1)
        .unionByName(added, allowMissingColumns = true)
    writeManifest(path, v, live)
  }

  /** Copy-on-write keyed delete as a new version (the GDPR erasure verb
    * with history): partitions containing a matching key are rewritten
    * into new survivor files; untouched partitions carry their OLD file
    * entries forward unread; deleted rows stay readable at prior
    * versions until [[vacuum]]. Returns the new version. */
  def commitDeleteKeys(spark: SparkSession, path: String, keyCol: String,
      keys: DataFrame): Long =
    commitReplace(spark, path, keyCol, keys.select(col(keyCol)).distinct(),
      insert = None)

  /** Keyed upsert as a new version: current rows whose key appears in
    * the batch are replaced, the batch's rows (updates + brand-new keys)
    * are inserted — MERGE with whole-row UPDATE + INSERT semantics, as
    * one copy-on-write commit. `df` must carry `tsCol` for partition
    * derivation. Returns the new version. */
  def commitUpsert(spark: SparkSession, path: String, df: DataFrame,
      tsCol: String, keyCol: String): Long = {
    val batch = Staging.withDateParts(df, tsCol)
    commitReplace(spark, path, keyCol,
      batch.select(col(keyCol)).distinct(), insert = Some(batch))
  }

  /** Shared copy-on-write core: drop every current row whose `keyCol`
    * is in `keys` (broadcast — erasure/upsert key sets are
    * request-scale), add `insert`'s rows, rewriting ONLY partitions that
    * hold a matching key or receive inserted rows. */
  private def commitReplace(spark: SparkSession, path: String,
      keyCol: String, keys: DataFrame, insert: Option[DataFrame]): Long = {
    val prev = currentVersion(spark, path)
    require(prev >= 1, "commitReplace on an empty lake: commitAppend first")
    val v = prev + 1
    val mPrev = manifest(spark, path, prev)
    val cur = readSnapshot(spark, path, prev, manifestOpt = Some(mPrev))
    val k = broadcast(keys)
    val enc = (col("y").cast(LongType) * 10000L +
      col("m").cast(LongType) * 100L + col("d").cast(LongType))
    // affected = partitions holding a matching key ∪ partitions gaining
    // inserted rows (partition-count-sized collect, the deleteKeys shape)
    val affected = (cur.join(k, Seq(keyCol), "left_semi").select(enc.as("__p"))
        .unionByName(insert.map(_.select(enc.as("__p")))
          .getOrElse(spark.emptyDataFrame.withColumn("__p", lit(0L)).limit(0))))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    val survivors = cur.filter(enc.isInCollection(affected))
      .join(k, Seq(keyCol), "left_anti")
    val rewritten = insert match {
      case Some(b) => survivors.unionByName(b)
      case None => survivors
    }
    val added = writeBatch(spark, path, v, rewritten, statsCols = Nil)
    val carried = mPrev.filter(!(
      (col("y") * 10000L + col("m") * 100L + col("d")).isInCollection(affected)))
    writeManifest(path, v, carried.unionByName(added, allowMissingColumns = true))
  }

  /** Estimate how many rows of snapshot `v` have `column` in the CLOSED
    * range [lo, hi] — from the MANIFEST's per-file bottom-k sketches
    * alone, no data file opened (the catalog-resident selectivity
    * estimate a 100 TB planner wants before committing to a scan).
    *
    * Soundness of the fold: every covered file keeps its k
    * smallest-hash values, so the k smallest hashes of the UNION are
    * all present in the per-file sketches — [[graft.functions.MinKMerge]]
    * at k' <= k reconstructs the union's exact bottom-k' sample, a
    * uniform-by-hash sample of all covered rows (never biased toward
    * small files the way a plain sample-union would be). Estimate =
    * coveredN × (sampled-in-range / sample size); EXACT when the
    * covered rows number <= the fold width (sample == population —
    * spec-pinned).
    *
    * Returns (estimate, coveredRows): files committed without a sketch
    * for `column` (older manifests, different sketchCols) contribute to
    * neither — the caller sees coverage explicitly instead of a
    * silently-partial estimate.
    *
    * The fold width is the MINIMUM build k over covered files (each
    * cell records the k it was built with): bottom-k' of the union is
    * reconstructible from per-file bottom-k_i samples exactly when
    * k' <= min k_i, so mixed-k lakes stay sound — a smaller-k commit
    * narrows the fold, never biases it. */
  def estimateRowsInRange(spark: SparkSession, path: String, v: Long,
      column: String, lo: Double, hi: Double): (Double, Long) = {
    val cells = withStatsCols(manifest(spark, path, v))
      .select(element_at(col("sketches"), lit(column)).as("sk"))
      .filter(col("sk").isNotNull)
      .select(struct(col("sk.n").as("n"), col("sk.hs").as("hs"),
        col("sk.vs").as("vs")).as("sk"), col("sk.k").as("__k"))
    val widths = cells.agg(min(col("__k")), sum(col("sk.n"))).head()
    if (widths.isNullAt(0)) (0.0, 0L)
    else {
      val kFold = widths.getLong(0).toInt
      val covered = widths.getLong(1)
      val merged = cells.agg(
        graft.functions.minKMerge(col("sk"), math.max(kFold, 1)).as("s"))
      val est = merged.select(
          col("s").getField("n").as("n"),
          size(col("s").getField("vs")).cast("long").as("m"),
          size(filter(col("s").getField("vs"),
            x => x >= lit(lo) && x <= lit(hi))).cast("long").as("hit"))
        .head()
      val (n, m, hit) = (est.getLong(0), est.getLong(1), est.getLong(2))
      (if (m == 0L) 0.0 else n.toDouble * hit / m, covered)
    }
  }

  /** Reclaim history: delete every data file not referenced by any
    * manifest of version >= `keepFrom`, and the older manifests
    * themselves. Snapshots >= keepFrom remain byte-identical; older
    * versions become unreadable (the retention trade every table format
    * makes). Returns the number of files deleted. */
  def vacuum(spark: SparkSession, path: String, keepFrom: Long): Long = {
    val cu = currentVersion(spark, path)
    require(keepFrom >= 1 && keepFrom <= cu, s"keepFrom=$keepFrom out of [1,$cu]")
    val keep = (keepFrom to cu).map(v =>
        manifest(spark, path, v).select(col("file")))
      .reduce(_ unionByName _).distinct()
      .collect().map(_.getString(0)).toSet
    val f = fs(spark, path)
    val it = f.listFiles(new org.apache.hadoop.fs.Path(s"$path/files"), true)
    var deleted = 0L
    val toDelete = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      if (!name.startsWith("_") && !name.startsWith(".") &&
          !keep.contains(s.getPath.toString))
        toDelete += s.getPath
    }
    toDelete.foreach { p => f.delete(p, false); deleted += 1 }
    (1L until keepFrom).foreach { v =>
      f.delete(new org.apache.hadoop.fs.Path(manifestDir(path, v)), true)
    }
    deleted
  }
}
