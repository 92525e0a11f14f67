package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout — Z-order (Morton) clustering.
  *
  * At 100 TB the dominant cost of most queries is the scan, and the
  * dominant scan optimization after partition pruning is FILE SKIPPING on
  * min/max column statistics (parquet footers / table-format manifests).
  * A table sorted on one column skips beautifully on that column and not
  * at all on any other; interleaving the bits of k columns into one sort
  * key (the classic Z-order curve, as used by Delta/Iceberg `OPTIMIZE
  * ZORDER BY`) gives every interleaved column locality: each output file
  * covers a small hyper-rectangle of the key space, so a selective filter
  * on ANY of the k columns prunes most files.
  *
  * Everything here is built from codegen'd integer built-ins
  * (shiftright/shiftleft/and/or) — no UDF, no custom kernel needed: the
  * bit-interleave unrolls to `bits * k` disjoint-bit OR terms inside one
  * whole-stage-codegen projection.
  *
  * Reference analog: the reference stages its warehouse loads as
  * y/m/d-partitioned parquet (RustCheatersDataPipeline
  * dags/custom_operators/S3ToStagingOperator.py) — time-only layout.
  * Z-order is the layout story for the OTHER dimensions a 100 TB corpus
  * is queried on (source x language, user x time, part x supplier).
  */
object Layout {

  /** Bit-interleaved Z-value of `cols`, `bits` low bits each.
    *
    * Bit `i` of column `j` (0-indexed, `j=0` most significant within a
    * round) lands at output position `i * k + (k - 1 - j)`, so the value
    * orders rows by the interleaved magnitudes of all k columns. Each
    * input is masked to its low `bits` bits first, which makes the
    * expression total (negative or oversized inputs wrap rather than
    * corrupt the curve; callers layout-ing signed data should bias it
    * non-negative upstream). `bits * k` must fit in a signed Long.
    */
  def zvalue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"z-order needs >= 2 columns, got $k")
    require(bits >= 1 && bits * k <= 63, s"bits*cols must be in [1,63], got ${bits * k}")
    val mask = (1L << bits) - 1L
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long").bitwiseAND(lit(mask)), i).bitwiseAND(lit(1L)),
      i * k + (k - 1 - j))
    terms.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL text (DuckDB + Spark dialect-common:
    * only `&`, `|`, `>>`, `<<` on BIGINT), for oracle parity. */
  def zvalueSql(cols: Seq[String], bits: Int): String = {
    val k = cols.size
    val mask = (1L << bits) - 1L
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
    } yield s"((((CAST($c AS BIGINT) & $mask) >> $i) & 1) << ${i * k + (k - 1 - j)})"
    terms.mkString("(", " | ", ")")
  }

  /** Append the z-value column (named `as`). */
  def zorderLayout(df: DataFrame, cols: Seq[String], bits: Int,
      as: String = "zval"): DataFrame =
    df.withColumn(as, zvalue(cols.map(col), bits))

  /** Small-file compaction — the steady-state maintenance op every
    * ingest-heavy table needs: streaming staged writes and hourly
    * upserts leave KB-scale files, and past a few thousand of them scan
    * cost is task scheduling and footer reads, not IO. Rewrites the
    * directory into ceil(actualBytes / targetBytes) files, sized from
    * the REAL on-disk byte count (never row-count guesses, which
    * misjudge compression 10x either way). The listing is RECURSIVE so
    * hive-partitioned (k=v subdir) inputs size correctly too; note the
    * rewrite itself is flat — partition columns become data columns in
    * the output (compact per-partition to keep a partitioned layout).
    *
    * With `sortCols` the rewrite range-partitions and sorts (restoring
    * min/max file-skipping stats as it compacts — pair with [[zvalue]]
    * for multi-dimensional keys); without, it round-robins via
    * `coalesce` when shrinking (no shuffle at all) and `repartition`
    * only when it must grow the file count. Returns
    * (filesBefore, filesAfter, bytes). */
  def compactFiles(spark: org.apache.spark.sql.SparkSession, inPath: String,
      outPath: String, targetBytes: Long,
      sortCols: Seq[String] = Nil): (Int, Int, Long) = {
    require(targetBytes >= 1L, s"need targetBytes >= 1, got $targetBytes")
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(conf)
    // recursive: partitioned layouts (k=v subdirs) keep their data files
    // below the root, so a top-level listing would size the rewrite from
    // zero bytes. Hidden components (_SUCCESS, _temporary/, .crc) are
    // excluded wherever they appear in the path.
    val root = p.toUri.getPath
    def hidden(path: org.apache.hadoop.fs.Path): Boolean =
      path.toUri.getPath.stripPrefix(root).split('/')
        .exists(seg => seg.startsWith("_") || seg.startsWith("."))
    val it = fs.listFiles(p, true)
    val parts = Iterator.continually(it)
      .takeWhile(_.hasNext).map(_.next())
      .filterNot(st => hidden(st.getPath))
      .toArray
    val bytes = parts.map(_.getLen).sum
    val filesBefore = parts.length
    require(filesBefore > 0, s"no data files to compact under $inPath")
    val filesAfter = math.max(1L, (bytes + targetBytes - 1L) / targetBytes).toInt
    val in = spark.read.parquet(inPath)
    val out =
      if (sortCols.nonEmpty)
        in.repartitionByRange(filesAfter, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else if (filesAfter < filesBefore) in.coalesce(filesAfter)
      else in.repartition(filesAfter)
    out.write.mode("overwrite").parquet(outPath)
    (filesBefore, filesAfter, bytes)
  }

  /** Write `df` re-clustered on the Z-curve: range-partitioned into
    * `files` output files by z-value, rows z-sorted within each file so
    * parquet row-group stats stay tight too. The z column itself is
    * dropped — it is a layout device, not data. Range partitioning
    * samples the z distribution, so skew in the raw columns does not
    * produce skewed files. */
  def zorderWrite(df: DataFrame, cols: Seq[String], bits: Int,
      path: String, files: Int): Unit = {
    require(files >= 1, s"need files >= 1, got $files")
    val z = df.withColumn("__z", zvalue(cols.map(col), bits))
    z.repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
