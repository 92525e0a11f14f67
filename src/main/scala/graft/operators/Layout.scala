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

  // ------------------------------------------------------------------
  // Hilbert curve (2D) — the locality-tighter layout twin of zvalue
  // ------------------------------------------------------------------
  //
  // Morton interleaving jumps: consecutive z-values can be far apart in
  // the plane (the 2^k-boundary seams), so a z-clustered file's bounding
  // rectangle is looser than its row count deserves under skewed
  // selectivity. The Hilbert curve is the space-filling curve WITHOUT
  // seams — consecutive indices are always grid-neighbors (the adjacency
  // property, property-pinned), so equal-count file slices cover tighter
  // rectangles and min/max skipping prunes more files at high
  // selectivity skew (why Iceberg grew OPTIMIZE ... hilbert beside
  // zorder).
  //
  // Formulation: the classic per-level rotate loop is restated as a
  // 4-STATE AUTOMATON over the ORIGINAL bit-pairs, MSB first. The
  // reachable transforms of the recursive construction form the Klein
  // group {identity, swap, complement-both, swap∘complement}; for state
  // st and bit-pair (a, b) the emitted base-4 digit and the successor
  // state are pure table lookups. Both 16-entry tables pack into ONE
  // BIGINT literal (2 bits per entry), so a level is
  //   idx2 = (st·4 + a·2 + b)·2
  //   digit = (DTAB >> idx2) & 3 ;  st' = (STAB >> idx2) & 3
  // — dialect-common BIGINT bit ops only, the zvalueSql parity trick.
  // The state chain forces per-level column derivations (inlining the
  // state expression would blow up 2^bits); the Spark face chains
  // `withColumn` projections, the generated oracle chains CTEs with
  // level-suffixed names (DuckDB's same-SELECT alias references make
  // reusing one name ambiguous there).

  /** digit(st)(a)(b) and next-state(st)(a)(b) of the Hilbert automaton,
    * indexed st·4 + a·2 + b. States: 0 identity, 1 swap, 2 complement,
    * 3 swap∘complement. Derived from the textbook rotate rule: on
    * transformed bits (rx, ry) = st(a, b), digit = (3·rx) XOR ry; the
    * next transform prepends swap when ry = 0 (plus complement when
    * rx = 1). */
  private val hilbertDigitTable: Array[Long] =
    Array(0, 1, 3, 2, 0, 3, 1, 2, 2, 3, 1, 0, 2, 1, 3, 0)
  private val hilbertNextTable: Array[Long] =
    Array(1, 0, 3, 0, 0, 2, 1, 1, 2, 1, 2, 3, 3, 3, 0, 2)
  private def packTable(t: Array[Long]): Long =
    t.zipWithIndex.map { case (v, i) => v << (2 * i) }.reduce(_ | _)
  private[operators] val hilbertDtab: Long = packTable(hilbertDigitTable)
  private[operators] val hilbertStab: Long = packTable(hilbertNextTable)

  /** Straight-line reference (the classic rotate loop) — the
    * property-test twin the automaton must stay identical to. */
  private[graft] def hilbertRef(x: Long, y: Long, bits: Int): Long = {
    var (hx, hy) = (x, y)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((hx & s) > 0) 1L else 0L
      val ry = if ((hy & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { hx = s - 1 - hx; hy = s - 1 - hy }
        val t = hx; hx = hy; hy = t
      }
      s >>= 1
    }
    d
  }

  /** Append the Hilbert index of (xCol, yCol) as `as` — the layout verb
    * mirroring [[zorderLayout]]. Inputs mask to their low `bits` bits
    * (the zvalue wrap contract); 2·bits must fit a signed Long. One
    * chained projection per level, all codegen'd integer built-ins. */
  def hilbertLayout(df: DataFrame, xCol: String, yCol: String, bits: Int,
      as: String = "hval"): DataFrame = {
    require(bits >= 1 && 2 * bits <= 62, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1L
    def shr(v: Column, n: Column): Column = call_function("shiftright", v, n)
    var cur = df
      .withColumn("__hx", col(xCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hy", col(yCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hst", lit(0L))
      .withColumn(as, lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val idx2 = (col("__hst") * 4 +
        shr(col("__hx"), lit(i)).bitwiseAND(lit(1L)) * 2 +
        shr(col("__hy"), lit(i)).bitwiseAND(lit(1L))) * 2
      // both layers read the PRE-transition __hst of the incoming frame
      cur = cur
        .withColumn(as,
          col(as) * 4 + shr(lit(hilbertDtab), idx2).bitwiseAND(lit(3L)))
        .withColumn("__hst", shr(lit(hilbertStab), idx2).bitwiseAND(lit(3L)))
    }
    cur.drop("__hx", "__hy", "__hst")
  }

  /** Write `df` re-clustered on the Hilbert curve — [[zorderWrite]] with
    * the seam-free key: range-partitioned into `files` output files by
    * Hilbert index, rows curve-sorted within each file, the index column
    * dropped (a layout device, not data). */
  def hilbertWrite(df: DataFrame, xCol: String, yCol: String, bits: Int,
      path: String, files: Int): Unit = {
    require(files >= 1, s"need files >= 1, got $files")
    hilbertLayout(df, xCol, yCol, bits, "__h")
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  // ------------------------------------------------------------------
  // Hilbert curve (3D) — the k-cube generalization of the 2D automaton
  // ------------------------------------------------------------------
  //
  // The 2-D Klein-group trick generalizes: the recursive construction's
  // reachable transforms for n dimensions form a subgroup of the n-cube
  // rotation group, finite and enumerable. Rather than hand-deriving the
  // n=3 tables, the automaton is GENERATED at class init from the
  // textbook per-level rules (Hamilton's compact-Hilbert formulation:
  // Gray-code digit + entry-point/direction state update), then frozen
  // as packed BIGINT rows. BFS over (entry, direction) reaches exactly
  // 12 states for n=3 (4 for n=2 — the Klein group, cross-checked);
  // each state's 8 transitions pack into ONE BIGINT (7 bits per input
  // label: 3-bit digit | 4-bit next state), so a level is one
  // element_at on a 12-long array literal plus shifts/masks — still
  // dialect-common (the oracle renders the lookup as a 12-way CASE).
  // Correctness is property-pinned the way any Hilbert construction is
  // defined: bijective on the grid, ADJACENT (consecutive indices are
  // grid neighbors), and NESTED (the index refines recursively:
  // h(x,y,z,b) >> 3 == h(x>>1, y>>1, z>>1, b-1)).

  /** Gray-code inverse on n-bit words. */
  private def gcInv(g: Long): Long = {
    var i = g; var j = 1
    while ((g >> j) != 0) { i ^= (g >> j); j += 1 }
    i
  }
  private def trailingSetBits(v: Long): Int =
    java.lang.Long.numberOfTrailingZeros(~v)
  /** Intra-subcube direction of digit w (Hamilton's d(w)). */
  private def dW(w: Long, n: Int): Int =
    if (w == 0L) 0
    else if (w % 2 == 0) trailingSetBits(w - 1) % n
    else trailingSetBits(w) % n
  /** Entry point of digit w (Hamilton's e(w)). */
  private def eW(w: Long): Long =
    if (w == 0L) 0L else { val v = 2L * ((w - 1L) / 2L); v ^ (v >> 1) }
  private def rotr(v: Long, r0: Int, n: Int): Long = {
    val r = r0 % n
    ((v >> r) | (v << (n - r))) & ((1L << n) - 1L)
  }
  private def rotl(v: Long, r: Int, n: Int): Long = rotr(v, n - (r % n), n)

  /** One automaton step of the n-D construction: from state (e, d) on
    * input label l (coordinate j contributes bit j), the emitted base-2^n
    * digit and the successor state. */
  private def hilbertStep(e: Long, d: Int, l: Long, n: Int): (Long, (Long, Int)) = {
    val w = gcInv(rotr(l ^ e, d + 1, n))
    (w, (e ^ rotl(eW(w), d + 1, n), (d + dW(w, n) + 1) % n))
  }

  /** The n=3 automaton as packed per-state BIGINT rows: input label l's
    * transition sits at bits l·8 as digit | (nextState << 3) — 7 bits,
    * so bit 63 stays clear and arithmetic vs logical shift semantics
    * can never differ between engines. Generated by BFS from the
    * initial (entry 0, direction 0) state. */
  private[operators] lazy val hilbert3Rows: Array[Long] = {
    val n = 3
    val ids = scala.collection.mutable.LinkedHashMap[(Long, Int), Int]()
    def sid(s: (Long, Int)): Int = ids.getOrElseUpdate(s, ids.size)
    val queue = scala.collection.mutable.Queue[(Long, Int)]()
    val trans = scala.collection.mutable.Map[(Int, Long), (Long, Int)]()
    sid((0L, 0)); queue.enqueue((0L, 0))
    while (queue.nonEmpty) {
      val s @ (e, d) = queue.dequeue()
      for (l <- 0L until 8L) {
        val (w, s2) = hilbertStep(e, d, l, n)
        val isNew = !ids.contains(s2)
        trans((ids(s), l)) = (w, sid(s2))
        if (isNew) queue.enqueue(s2)
      }
    }
    require(ids.size <= 16, s"3-D automaton grew ${ids.size} states (> 4-bit pack)")
    Array.tabulate(ids.size) { s =>
      (0 until 8).map { l =>
        val (w, ns) = trans((s, l.toLong))
        (w | (ns.toLong << 3)) << (8 * l)
      }.reduce(_ | _)
    }
  }

  /** Straight-line reference (the per-level rule loop, no tables) — the
    * property-test twin the tabled expression must stay identical to. */
  private[graft] def hilbert3Ref(x: Long, y: Long, z: Long, bits: Int): Long = {
    val n = 3
    var e = 0L; var d = 0; var h = 0L
    var i = bits - 1
    while (i >= 0) {
      val l = ((x >> i) & 1L) | (((y >> i) & 1L) << 1) | (((z >> i) & 1L) << 2)
      val (w, s2) = hilbertStep(e, d, l, n)
      h = (h << n) | w
      e = s2._1; d = s2._2
      i -= 1
    }
    h
  }

  /** Append the 3-D Hilbert index of (xCol, yCol, zCol) as `as` — the
    * k=3 twin of [[hilbertLayout]]. Inputs mask to their low `bits` bits
    * (the zvalue wrap contract); 3·bits must fit a signed Long. One
    * chained projection pair per level: an element_at row lookup on the
    * 12-long table literal plus shifts/masks, all codegen'd built-ins. */
  def hilbert3Layout(df: DataFrame, xCol: String, yCol: String, zCol: String,
      bits: Int, as: String = "hval"): DataFrame = {
    require(bits >= 1 && 3 * bits <= 62, s"bits must be in [1,20], got $bits")
    val mask = (1L << bits) - 1L
    def shr(v: Column, n: Column): Column = call_function("shiftright", v, n)
    var cur = df
      .withColumn("__hx", col(xCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hy", col(yCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hz", col(zCol).cast("long").bitwiseAND(lit(mask)))
      .withColumn("__hst", lit(0L))
      .withColumn(as, lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val l = shr(col("__hx"), lit(i)).bitwiseAND(lit(1L)) +
        shr(col("__hy"), lit(i)).bitwiseAND(lit(1L)) * 2 +
        shr(col("__hz"), lit(i)).bitwiseAND(lit(1L)) * 4
      val ent = shr(
        element_at(lit(hilbert3Rows), (col("__hst") + 1).cast("int")), l * 8)
        .bitwiseAND(lit(127L))
      // both layers read the PRE-transition __hst of the incoming frame
      cur = cur
        .withColumn(as, col(as) * 8 + ent.bitwiseAND(lit(7L)))
        .withColumn("__hst", shr(ent, lit(3)).bitwiseAND(lit(15L)))
    }
    cur.drop("__hx", "__hy", "__hz", "__hst")
  }

  /** Write `df` re-clustered on the 3-D Hilbert curve — [[hilbertWrite]]
    * at k=3: range-partitioned into `files` output files by the 3-D
    * Hilbert index, rows curve-sorted within each file, the index
    * column dropped (a layout device, not data). */
  def hilbert3Write(df: DataFrame, xCol: String, yCol: String, zCol: String,
      bits: Int, path: String, files: Int): Unit = {
    require(files >= 1, s"need files >= 1, got $files")
    hilbert3Layout(df, xCol, yCol, zCol, bits, "__h")
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** [[hilbert3Layout]] as a complete DuckDB-dialect SQL statement for
    * oracle parity — the [[hilbertSql]] chained-CTE trick at k=3, with
    * the per-state row lookup rendered as a 12-way CASE (everything else
    * is the same BIGINT bit ops both engines compute identically).
    * Caller appends its ORDER BY. */
  def hilbert3Sql(table: String, keyCols: Seq[String], x: String, y: String,
      z: String, bits: Int, as: String = "hval"): String = {
    require(bits >= 1 && 3 * bits <= 62, s"bits must be in [1,20], got $bits")
    val mask = (1L << bits) - 1L
    val keys = keyCols.mkString(", ")
    def caseRow(p: Int): String =
      hilbert3Rows.zipWithIndex
        .map { case (r, s) => s"WHEN $s THEN CAST($r AS BIGINT)" }
        .mkString(s"(CASE st$p ", " ", " END)")
    val sb = new StringBuilder
    sb ++= s"WITH h0 AS (SELECT $keys, CAST($x AS BIGINT) & $mask AS hx, " +
      s"CAST($y AS BIGINT) & $mask AS hy, CAST($z AS BIGINT) & $mask AS hz, " +
      s"CAST(0 AS BIGINT) AS st0, CAST(0 AS BIGINT) AS hd0 FROM $table)"
    var c = 0
    for (i <- bits - 1 to 0 by -1) {
      val p = c; c += 1
      val lExpr = s"(((hx >> $i) & 1) + ((hy >> $i) & 1) * 2 + ((hz >> $i) & 1) * 4)"
      sb ++= s",\nh$c AS (SELECT $keys, hx, hy, hz, " +
        s"((en >> 3) & 15) AS st$c, hd$p * 8 + (en & 7) AS hd$c FROM " +
        s"(SELECT $keys, hx, hy, hz, st$p, hd$p, " +
        s"((${caseRow(p)} >> ($lExpr * 8)) & 127) AS en FROM h$p))"
    }
    sb ++= s"\nSELECT $keys, hd$c AS $as FROM h$c"
    sb.toString
  }

  /** The same computation as a complete dialect-common SQL statement
    * (chained CTE levels, level-suffixed column names), for oracle
    * parity — the [[zvalueSql]] generated-formula trick extended to a
    * stateful curve. Caller appends its ORDER BY. */
  def hilbertSql(table: String, keyCols: Seq[String], x: String, y: String,
      bits: Int, as: String = "hval"): String = {
    require(bits >= 1 && 2 * bits <= 62, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1L
    val keys = keyCols.mkString(", ")
    val sb = new StringBuilder
    sb ++= s"WITH h0 AS (SELECT $keys, CAST($x AS BIGINT) & $mask AS hx, " +
      s"CAST($y AS BIGINT) & $mask AS hy, CAST(0 AS BIGINT) AS st0, " +
      s"CAST(0 AS BIGINT) AS hd0 FROM $table)"
    var c = 0
    for (i <- bits - 1 to 0 by -1) {
      val p = c; c += 1
      val idx2 = s"(st$p * 4 + ((hx >> $i) & 1) * 2 + ((hy >> $i) & 1)) * 2"
      sb ++= s",\nh$c AS (SELECT $keys, hx, hy, " +
        s"(($hilbertStab >> ($idx2)) & 3) AS st$c, " +
        s"hd$p * 4 + (($hilbertDtab >> ($idx2)) & 3) AS hd$c FROM h$p)"
    }
    sb ++= s"\nSELECT $keys, hd$c AS $as FROM h$c"
    sb.toString
  }
}
