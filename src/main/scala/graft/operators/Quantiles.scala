package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

/** Distributed EXACT interpolated quantiles — the prefix-sum formulation
  * that retires the buffered-`percentile` memory boundary.
  *
  * Spark's exact `percentile` aggregate materializes every distinct value
  * of a group in ONE aggregation buffer (an OpenHashMap on a single
  * reducer); the measured single-node boundary is ~15M distinct doubles
  * on a 24g heap. This operator computes the SAME statistic — bit for bit
  * — with no per-group buffer anywhere:
  *
  *   1. rollup to (key, value) → count: one map-side-combined shuffle,
  *      output sized by DISTINCT values, the only corpus-sized pass;
  *   2. exact global running counts under (key, value) order via
  *      [[Ranking.withPrefixSums]] — range-repartition + in-partition
  *      cumulative window + a numPartitions-sized driver offset array
  *      (never a single-task global window);
  *   3. per-key base/size from a keys-sized agg of the running counts;
  *   4. each requested p resolves to at most TWO ranks (floor/ceil of
  *      the fractional position); a broadcast of the keys × ps target
  *      table picks the covering rows out of the running counts and the
  *      interpolation is a constant-time projection.
  *
  * Bit parity with `percentile` (and therefore with the DuckDB
  * `quantile_cont` oracle — the proven price_percentiles parity):
  * position = (n−1)·p as ONE long→double multiply, lower/higher =
  * floor/ceil, result = (higher−pos)·v_lo + (pos−lower)·v_hi with the
  * `v_lo == v_hi` early return Spark short-circuits (the two-term form
  * can differ in the last ulp from `v` itself, so the early return is
  * part of the contract, not an optimization).
  *
  * SCALE: every shuffle moves the distinct-value rollup, not the corpus;
  * driver state is the partition-count array plus nothing (the keys×ps
  * target table stays distributed and broadcasts executor-side). Key
  * cardinality contract: the per-key base/size agg and the broadcast
  * target table are keys × ps — fine from 1 key (corpus gates) through
  * millions (dim-sized); values must be double-valued (cast upfront,
  * matching `percentile`'s toDoubleValue on numeric input).
  */
object Quantiles {

  /** One row per key: `keyCol`, `n` (non-null value count), and one
    * DOUBLE column per `(name, p)` in `ps` holding the exact
    * interpolated p-quantile of `valueCol` within the key — bitwise
    * equal to `expr("percentile(valueCol, p)")` per group (spec-pinned).
    * Keys whose values are all NULL do not appear (matching an agg row
    * with NULL percentile only in presence; callers needing those keys
    * outer-join them back). */
  def exactByKey(df: DataFrame, keyCol: String, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    exactFromCounts(
      df.select(col(keyCol), col(valueCol), lit(1L).as("__cnt1")),
      keyCol, valueCol, "__cnt1", ps)

  /** [[exactByKey]] over an ALREADY-AGGREGATED (key, value, count) frame
    * — the monitoring family's deployment seam (the ksFromCounts
    * pattern): the streaming (group, value) counts sink KS/MWU/PSI
    * accumulate can be scored for EXACT quantiles without re-touching
    * raw rows, and a sink holding several partial rows per (key, value)
    * (micro-batch appends, backfills) re-sums to identical results —
    * summing counts equals counting raw rows bit for bit (integer
    * aggregation; streamed == batch percentile is pinned bitwise in
    * StreamingSpec). Same bounded-state contract as ksFromCounts: state
    * is the DISTINCT (key, value) domain, so continuous feeds need an
    * upstream quantization grid — and `maxDistinctPerKey` puts that
    * contract IN the plan (the theilSen maxBuckets convention): when
    * set, a key whose distinct-value domain exceeds the cap fails with
    * raise_error BEFORE the prefix-sum checkpoint materializes the
    * blown-up state, instead of degrading silently. Opt-in (default
    * unguarded) because the guard's per-key window count costs one
    * extra Exchange of the rollup — standing counts-sink scorers should
    * set it; one-shot exact jobs (exactByKey callers) need not. */
  def exactFromCounts(counts: DataFrame, keyCol: String, valueCol: String,
      cntCol: String, ps: Seq[(String, Double)],
      maxDistinctPerKey: Long = Long.MaxValue): DataFrame = {
    require(ps.nonEmpty, "need at least one (name, p)")
    ps.foreach { case (n, p) =>
      require(p >= 0.0 && p <= 1.0, s"percentage out of [0,1]: $n=$p") }
    require(ps.map(_._1).distinct.size == ps.size, "duplicate quantile names")
    require(maxDistinctPerKey >= 1, s"maxDistinctPerKey=$maxDistinctPerKey < 1")
    // 1. distinct-value rollup (re-sum — partial sink rows combine here)
    //    — the only input-sized pass
    val cnt0 = counts
      .filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol).as("__k"), col(valueCol).cast(DoubleType).as("__v"))
      .agg(sum(col(cntCol).cast(LongType)).as("__c"))
    val cnt = if (maxDistinctPerKey == Long.MaxValue) cnt0 else {
      import org.apache.spark.sql.expressions.Window
      cnt0
        .withColumn("__nd", count(lit(1)).over(Window.partitionBy("__k")))
        .select(col("__k"),
          when(col("__nd") > maxDistinctPerKey, raise_error(concat(
            lit("exactFromCounts: key '"), col("__k").cast("string"),
            lit("' has "), col("__nd").cast("string"),
            lit(s" distinct values > maxDistinctPerKey=$maxDistinctPerKey" +
              " — state is the distinct (key, value) domain; quantize" +
              " the feed upstream, don't widen the cap"))))
            .otherwise(col("__v")).as("__v"),
          col("__c"))
    }
    // 2. exact global running counts under (key, value) total order
    //    ((key, value) is unique by construction — no tie-break needed)
    val cum = Ranking.withPrefixSums(cnt, Seq(col("__k"), col("__v")), Seq("__c"))
    // 3. keys-sized per-key base (global cum just before the key's first
    //    row) and size; runs over the checkpointed reduced frame
    val keys = cum.groupBy(col("__k"))
      .agg(min(col("__c_cum") - col("__c")).as("__base"),
        max(col("__c_cum")).as("__end"))
      .select(col("__k"), col("__base"), (col("__end") - col("__base")).as("__n"))
    // 4. targets: for each (key, p) the fractional position and its
    //    floor/ceil ranks, carried as GLOBAL cumulative positions
    val pArr = array(ps.map { case (name, p) =>
      struct(lit(name).as("name"), lit(p).as("p")) }: _*)
    val targets = keys
      .select(col("__k").as("__tk"), col("__base"), col("__n"),
        explode(pArr).as("__t"))
      .select(col("__tk"), col("__base"), col("__n"),
        col("__t").getField("name").as("__name"),
        ((col("__n") - 1L).cast(DoubleType) * col("__t").getField("p"))
          .as("__pos"))
      .select(col("__tk"), col("__n"), col("__name"), col("__pos"),
        floor(col("__pos")).as("__lo"), ceil(col("__pos")).as("__hi"),
        (col("__base") + floor(col("__pos"))).as("__glo"),
        (col("__base") + ceil(col("__pos"))).as("__ghi"))
    // a running-count row covers global 1-based rank r iff
    // cum − c < r ≤ cum; target ranks are __glo+1 / __ghi+1
    val coversLo = col("__c_cum") - col("__c") <= col("__glo") &&
      col("__glo") < col("__c_cum")
    val coversHi = col("__c_cum") - col("__c") <= col("__ghi") &&
      col("__ghi") < col("__c_cum")
    val picked = cum.join(broadcast(targets),
        col("__k") === col("__tk") && (coversLo || coversHi))
      .groupBy(col("__k"), col("__name"))
      .agg(max(col("__n")).as("__n"), max(col("__pos")).as("__pos"),
        max(col("__lo")).as("__lo"), max(col("__hi")).as("__hi"),
        max(when(coversLo, col("__v"))).as("__vlo"),
        max(when(coversHi, col("__v"))).as("__vhi"))
    // Spark's exact interpolation, in its written order: early-return on
    // equal keys (lo==hi ⇒ same covering row ⇒ equal), else two-term form
    val res = when(col("__lo") === col("__hi") || col("__vlo") === col("__vhi"),
        col("__vlo"))
      .otherwise(
        (col("__hi").cast(DoubleType) - col("__pos")) * col("__vlo") +
          (col("__pos") - col("__lo").cast(DoubleType)) * col("__vhi"))
    picked
      .select(col("__k"), col("__n"), col("__name"), res.as("__q"))
      .groupBy(col("__k").as(keyCol))
      .agg(max(col("__n")).cast(LongType).as("n"),
        ps.map { case (name, _) =>
          max(when(col("__name") === name, col("__q"))).as(name) }: _*)
  }

  /** Ungrouped face: ONE row — `n` plus the named exact quantiles of the
    * whole frame (the corpus-gate threshold shape). */
  def exact(df: DataFrame, valueCol: String,
      ps: Seq[(String, Double)]): DataFrame =
    exactByKey(df.select(lit(0L).as("__one"), col(valueCol)),
        "__one", valueCol, ps)
      .drop("__one")

  // ---- bottom-k quantile SKETCH (the storable/mergeable twin) ----
  //
  // The exact machinery above answers one-shot questions; a 100 TB lake
  // also wants a PERSISTED per-shard quantile summary it can fold at
  // read time (the Iceberg-manifest posture the snapshot stats column
  // takes for min/max, extended to the whole distribution). The sketch
  // here is a DETERMINISTIC bottom-k-by-hash sample (Cohen & Kaplan's
  // bottom-k sketch): keep the k values whose unique-row-id hashes are
  // smallest — a uniform sample whose kept multiset is a pure function
  // of the data (hash = md5 hex-prefix, the engine-portable 32-bit
  // parity trick, so even DuckDB reproduces it row for row). Unlike
  // KLL/t-digest (randomized compaction — unreproducible across runs),
  // bottom-k is a SEMILATTICE: merge(sketch(A), sketch(B)) ==
  // sketch(A ∪ B) exactly, so per-shard sketches compose at any
  // grouping with no error stacking; the estimate's error comes only
  // from sampling (DKW: sup-CDF error O(sqrt(ln(1/δ)/k)) w.h.p. over
  // the hash), and a group with n <= k is EXACT (sample == population).

  /** Per-key bottom-k sketch column: (keyCol, sketch STRUCT<n, hs, vs>).
    * `idCol` must uniquely identify a row within the key (the hash
    * seed); state is exactly k pairs + a counter per group, map-side
    * combined — ONE bounded hash aggregate however large the corpus. */
  def sketchByKey(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(graft.functions.minKByHash(
        sketchHash(col(idCol)), col(valueCol).cast(DoubleType), k).as("sketch"))

  /** The engine-portable sample hash: 32-bit md5 hex-prefix of the row
    * id's string form (DuckDB computes the identical BIGINT from the
    * identical formula — the proven zorder_scan parity). */
  def sketchHash(id: Column): Column =
    conv(substring(md5(id.cast(StringType)), 1, 8), 16, 10).cast(LongType)

  /** Fold stored per-shard sketches back to one per key — the read-time
    * half. Exactly equals sketching the concatenated shards
    * (spec-pinned semilattice property). */
  def sketchMerge(sketches: DataFrame, keyCol: String, sketchCol: String,
      k: Int): DataFrame =
    sketches.groupBy(col(keyCol))
      .agg(graft.functions.minKMerge(col(sketchCol), k).as("sketch"))

  /** Estimate the p-quantile from a sketch column: the exact interpolated
    * percentile OF THE SAMPLE, in Spark's written `percentile` order
    * (incl. the v_lo == v_hi early return — the bit-parity contract),
    * over the value array sorted by value. NULL when the sample is
    * empty. A pure projection — sketches are group-level rows. */
  def sketchQuantile(sketch: Column, p: Double): Column = {
    require(p >= 0.0 && p <= 1.0, s"percentage out of [0,1]: $p")
    val srt = array_sort(sketch.getField("vs"))
    val m = size(srt).cast(LongType)
    val pos = (m - 1L).cast(DoubleType) * lit(p)
    val lo = floor(pos)
    val hi = ceil(pos)
    val vlo = element_at(srt, (lo + 1L).cast(IntegerType))
    val vhi = element_at(srt, (hi + 1L).cast(IntegerType))
    when(m === 0L, lit(null).cast(DoubleType))
      .otherwise(when(lo === hi || vlo === vhi, vlo)
        .otherwise((hi.cast(DoubleType) - pos) * vlo +
          (pos - lo.cast(DoubleType)) * vhi))
  }
}
