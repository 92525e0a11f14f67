package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Data-quality gates the reference applies before every stage/load:
  * duplicate-row and missing-value checks that abort the pipeline on
  * violation (reference: dags/scripts/rust_twitter_steam_facts.py:53-56,
  * 153-157 — `raise Exception("Data Contains Duplicate Rows")`).
  *
  * Implemented as ONE aggregation pass over the frame (a single job, no
  * per-check scans) that yields a small report; `assertClean` collects just
  * that report (a handful of rows) and throws like the reference.
  */
object Quality {

  /** One row per check: (check_name, violations). */
  def report(df: DataFrame, naturalKey: Seq[String], notNull: Seq[String]): DataFrame = {
    val dupCheck =
      (count(lit(1)) - countDistinct(naturalKey.head, naturalKey.tail: _*))
        .cast("long")
        .as("dup_natural_key")
    val nullChecks = notNull.map { c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"null_$c")
    }
    val agg = df.agg(dupCheck, nullChecks: _*)
    val pairs = agg.columns.flatMap(c => Seq(lit(c), col(c)))
    agg
      .select(explode(map(pairs: _*)).as(Seq("check_name", "violations")))
      .orderBy("check_name")
  }

  /** Referential-integrity orphan check: child rows whose foreign key has
    * no parent. The reference's fact loads resolve FKs with INNER JOINs
    * (sql_queries.py:20-31), which silently DROP orphans — this gate makes
    * them visible before the load. A left-anti join: one shuffle on the
    * key (or a broadcast when the parent key set is dim-sized). */
  def orphans(child: DataFrame, fk: org.apache.spark.sql.Column,
      parent: DataFrame, pk: org.apache.spark.sql.Column): DataFrame =
    child.join(parent.select(pk), fk === pk, "left_anti")

  /** One (check_name, violations) row per named orphan check. */
  def referentialReport(
      checks: Seq[(String, DataFrame, org.apache.spark.sql.Column, DataFrame, org.apache.spark.sql.Column)]
  ): DataFrame = {
    require(checks.nonEmpty, "referentialReport needs at least one check")
    checks.map { case (name, child, fk, parent, pk) =>
      orphans(child, fk, parent, pk)
        .agg(count(lit(1)).cast("long").as("violations"))
        .withColumn("check_name", lit(name))
        .select("check_name", "violations")
    }.reduce(_ unionByName _).orderBy("check_name")
  }

  /** Trailing-window volume-spike detector — the ingest-monitoring gate
    * that flags an hour whose event count jumps more than `z` sample
    * standard deviations above its own type's trailing mean (bot storms,
    * replayed batches, scraper loops — the anomalies a 100 TB ingest
    * wants surfaced before they poison training mixes).
    *
    * The z-test is evaluated in EXACT integer arithmetic so the flag is
    * engine-portable (no float mean/stddev whose rounding could flip a
    * boundary row between engines): with n = trailing hours present,
    * s = Σcnt, q = Σcnt², the predicate `cnt > mean + z·stddev_samp`
    * squares to
    *
    *   n·cnt > s  AND  (n-1)·(n·cnt - s)² > z²·n·(n·q - s²)
    *
    * which is all BIGINT. Headroom: the binding term is (n−1)·(n·cnt−s)²
    * ≤ (trailing−1)·(trailing·cnt)², so at the default trailing=24 the
    * exact path is safe while hourly counts stay below ~2.6e7 (under ANSI
    * mode an overflow THROWS rather than corrupts); pass `wide = true` to
    * run the same test in DECIMAL(38,0) — identical flags, headroom to
    * ~1e17 events/hour/type. Hours with fewer than
    * `minN` trailing observations never flag (cold start). Shape: the
    * hourly rollup partial-aggregates MAP-SIDE, so its Exchange carries
    * hourly rows, not events; the type-keyed window then re-shuffles
    * those same hourly rows (hours × types — trivial at any corpus
    * size). Two Exchanges, both hourly-row-sized: strictly cheaper than
    * the one-Exchange alternative of repartitioning raw events by type. */
  def spikes(events: DataFrame, typeCol: String, tsCol: String,
      trailing: Int = 24, z: Int = 3, minN: Int = 8,
      wide: Boolean = false): DataFrame =
    spikesFromHourly(
      events.groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"), col(typeCol))
        .agg(count(lit(1)).as("cnt")),
      typeCol, "hour_ts", "cnt", trailing, z, minN, wide)

  /** [[spikes]] over an ALREADY-AGGREGATED hourly count table — the entry
    * point the streaming deployment uses: the watermarked hourly rollup
    * streams into a sink, and this runs over the accumulating sink table
    * (hours × types rows) without re-touching raw events. Composition
    * spec-pinned in StreamingSpec. */
  def spikesFromHourly(hourlyCounts: DataFrame, typeCol: String,
      hourCol: String, cntCol: String,
      trailing: Int = 24, z: Int = 3, minN: Int = 8,
      wide: Boolean = false): DataFrame = {
    require(trailing >= 2 && minN >= 2 && minN <= trailing && z >= 1,
      s"bad spike params: trailing=$trailing minN=$minN z=$z")
    // `wide` runs the identical z-test in DECIMAL(38,0) — same integer
    // semantics (scale 0, exact), ~1e17 headroom instead of ~2.6e7
    def n(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (wide) c.cast(org.apache.spark.sql.types.DecimalType(38, 0)) else c
    // cnt² is projected BEFORE the window so all three frame sums share
    // one Window node (one pass per sorted partition, not three)
    val hourly = hourlyCounts
      .select(col(hourCol).as("hour_ts"), col(typeCol), col(cntCol).as("cnt"))
      .withColumn("__cnt_sq", n(col("cnt")) * n(col("cnt")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("hour_ts"))
      .rowsBetween(-trailing, -1)
    hourly
      .select(col("hour_ts"), col(typeCol), col("cnt"),
        count(lit(1)).over(w).as("n_prior"),
        sum(col("cnt")).over(w).as("s_prior"),
        sum(col("__cnt_sq")).over(w).as("q_prior"))
      .withColumn("is_spike",
        col("n_prior") >= minN &&
        n(col("n_prior")) * n(col("cnt")) > n(col("s_prior")) &&
        n(col("n_prior") - 1) *
          pow2(n(col("n_prior")) * n(col("cnt")) - n(col("s_prior"))) >
          n(lit(z.toLong * z)) * n(col("n_prior")) *
            (n(col("n_prior")) * n(col("q_prior")) - pow2(n(col("s_prior")))))
      .select(
        graft.functions.tsString(col("hour_ts")).as("hour_start"),
        col(typeCol), col("cnt"),
        col("n_prior"), col("s_prior"), col("q_prior"), col("is_spike"))
  }

  private def pow2(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = c * c

  /** Robust (median/MAD) volume-anomaly flags per type — the
    * outlier-resistant twin of [[spikes]]: one burst INSIDE the trailing
    * window inflates the z-test's mean and variance and can mask the next
    * burst, while the median and the median absolute deviation shrug off
    * up to half the window. Same ROWS-`trailing`-preceding frame as the
    * z-test; flags `cnt > median + k·MAD`.
    *
    * Engine-portable exactness (the [[spikes]] playbook — clear the
    * divisions): with medians interpolated as (a+b)/2, both
    * `med2 = 2·median(cnt)` and `mad4 = 2·median(|2·cnt − med2|)` are
    * BIGINT-valued, and the flag is the pure integer predicate
    *
    *   4·cnt > 2·med2 + k·mad4
    *
    * (the doubles Spark/DuckDB return for interpolated medians carry at
    * most a .5 fraction, so doubling them is exact in both engines).
    *
    * Shape: the hourly rollup partial-aggregates MAP-SIDE (hourly rows on
    * the wire, never events); MAD needs a second pass over each frame
    * with that frame's median in hand — no single window pass can nest
    * that — so the frame is realized as a row-number band self-join of
    * the HOURLY frame (hours × types × ≤trailing rows). At 100 TB the
    * hourly frame of the event stream is still just hours × types: every
    * Exchange after the rollup is bounded by that, never by events. */
  def madAnomalies(events: DataFrame, typeCol: String, tsCol: String,
      trailing: Int = 24, k: Int = 5, minN: Int = 8): DataFrame =
    madFromHourly(
      events.groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"), col(typeCol))
        .agg(count(lit(1)).as("cnt")),
      typeCol, "hour_ts", "cnt", trailing, k, minN)

  /** [[madAnomalies]] over an ALREADY-AGGREGATED hourly count table — the
    * same deployment seam as [[spikesFromHourly]]: the streaming hourly
    * sink can be scored without re-touching raw events. */
  def madFromHourly(hourlyCounts: DataFrame, typeCol: String,
      hourCol: String, cntCol: String,
      trailing: Int = 24, k: Int = 5, minN: Int = 8): DataFrame = {
    require(trailing >= 2 && minN >= 2 && minN <= trailing && k >= 1,
      s"bad mad params: trailing=$trailing minN=$minN k=$k")
    // CONTRACT: the band self-join below fans the hourly frame out by a
    // factor of `trailing` — safe because the frame is hours×types-sized,
    // but `trailing` is a MULTIPLIER on that bounded frame (at
    // trailing=10k the "tiny" frame stops being tiny: a year of hourly
    // data × 10k ≈ 1e8 rows per type). Cap it where the fan-out stays
    // comfortably sub-data-sized; wider baselines belong in a coarser
    // bucket granularity, not a wider band.
    require(trailing <= 1000,
      s"trailing=$trailing: band-join fan-out × the hourly frame — " +
        "use coarser buckets instead of a wider trailing window")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("hour_ts"))
    // the frame MEDIAN is a plain window aggregate (one sorted pass);
    // only the deviation pass — which needs that median in hand per
    // current row — requires realizing the frame as a band self-join
    val hourly = hourlyCounts
      .select(col(hourCol).as("hour_ts"), col(typeCol), col(cntCol).as("cnt"))
      .select(col("hour_ts"), col(typeCol), col("cnt"),
        row_number().over(w).as("rn"),
        (expr("percentile(cnt, 0.5)")
          .over(w.rowsBetween(-trailing, -1)) * 2)
          .cast(org.apache.spark.sql.types.LongType).as("med2"))
    val prior = hourly.select(col(typeCol).as("__t"),
      col("cnt").as("p_cnt"), col("rn").as("p_rn"))
    // LEFT join keeps cold-start hours (empty frame -> n_prior 0, null med)
    hourly.join(prior,
        col(typeCol) === col("__t") &&
        col("p_rn") >= col("rn") - trailing && col("p_rn") <= col("rn") - 1,
        "left")
      .groupBy(col("hour_ts"), col(typeCol), col("cnt"), col("med2"))
      .agg(count(col("p_cnt")).as("n_prior"),
        (expr("percentile(abs(2 * p_cnt - med2), 0.5)") * 2)
          .cast(org.apache.spark.sql.types.LongType).as("mad4"))
      .withColumn("is_anomaly",
        col("n_prior") >= minN &&
        lit(4) * col("cnt") > lit(2) * col("med2") + lit(k.toLong) * col("mad4"))
      .select(
        graft.functions.tsString(col("hour_ts")).as("hour_start"),
        col(typeCol), col("cnt"), col("n_prior"), col("med2"), col("mad4"),
        col("is_anomaly"))
  }

  /** CUSUM (cumulative-sum control chart) level-shift flags per type —
    * the monitoring family's SUSTAINED-shift leg. The z-test ([[spikes]])
    * and the MAD twin catch single-hour bursts but re-baseline on slow
    * change; the OLS slope ([[trendFromBuckets]]) catches a steady ramp
    * but not a step; CUSUM accumulates every hour's small excess over a
    * reference level and alarms when the running total crosses a decision
    * threshold — the classic Page (1954) detector for a persistent +20%
    * step that never individually spikes.
    *
    * The recurrence S_i = max(0, S_{i−1} + d_i) looks inherently
    * sequential, but with P_i = Σ_{j≤i} d_j (prefix sum, P_0 = 0) it
    * closes to S_i = P_i − min(0, min_{j≤i} P_j) — two stacked window
    * aggregates over the SAME type-keyed ordering, one Exchange, no
    * per-row state. Engine-portable exactness (the [[spikes]] playbook —
    * clear the divisions): the reference level is the per-type median of
    * the hourly counts doubled to BIGINT (med2 = 2·median, exact in both
    * engines since interpolated medians carry at most a .5 fraction), so
    * the deviation d2_i = 2·cnt_i − med2 − slack2 and every downstream
    * sum/min/compare is pure BIGINT. `slack2` and `threshold2` are in
    * the same ×2 scale (slack2 = 2k absorbs drift up to k counts/hour;
    * threshold2 = 2h alarms once the accumulated excess tops h counts).
    *
    * Shape: the hourly rollup partial-aggregates MAP-SIDE (hourly rows on
    * the wire, never events); the per-type median is an unbounded-frame
    * window aggregate and the prefix sum/min ride a cumulative frame —
    * both windows hash-partition by type, so ONE hourly-row-sized
    * Exchange serves the whole chain. At 100 TB the post-rollup state is
    * still hours × types. */
  def cusum(events: DataFrame, typeCol: String, tsCol: String,
      slack2: Long = 2L, threshold2: Long = 16L): DataFrame =
    cusumFromHourly(
      events.groupBy(date_trunc("hour", col(tsCol)).as("hour_ts"), col(typeCol))
        .agg(count(lit(1)).as("cnt")),
      typeCol, "hour_ts", "cnt", slack2, threshold2)

  /** [[cusum]] over an ALREADY-AGGREGATED hourly count table — the same
    * deployment seam as [[spikesFromHourly]]/[[madFromHourly]]: the
    * streaming hourly sink can be scored without re-touching raw
    * events. */
  def cusumFromHourly(hourlyCounts: DataFrame, typeCol: String,
      hourCol: String, cntCol: String,
      slack2: Long = 2L, threshold2: Long = 16L): DataFrame = {
    require(slack2 >= 0 && threshold2 > 0,
      s"bad cusum params: slack2=$slack2 threshold2=$threshold2")
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col(typeCol))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col(typeCol)).orderBy(col("hour_ts"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    hourlyCounts
      .select(col(hourCol).as("hour_ts"), col(typeCol), col(cntCol).as("cnt"))
      // reference level first: its unbounded frame must not share a
      // Window node with the cumulative frame below
      .select(col("hour_ts"), col(typeCol), col("cnt"),
        (expr("percentile(cnt, 0.5)").over(wAll) * 2)
          .cast(org.apache.spark.sql.types.LongType).as("med2"))
      .withColumn("__d2", lit(2) * col("cnt") - col("med2") - lit(slack2))
      .select(col("hour_ts"), col(typeCol), col("cnt"), col("med2"),
        sum(col("__d2")).over(wCum).as("__p2"))
      .select(col("hour_ts"), col(typeCol), col("cnt"), col("med2"),
        (col("__p2") - least(min(col("__p2")).over(wCum), lit(0L)))
          .as("cusum2"))
      .withColumn("is_shift", col("cusum2") > lit(threshold2))
      .select(
        graft.functions.tsString(col("hour_ts")).as("hour_start"),
        col(typeCol), col("cnt"), col("med2"), col("cusum2"), col("is_shift"))
  }

  /** Per-source distribution-drift monitor — the corpus-composition twin
    * of [[spikes]]: for each source, the total-variation distance between
    * its hashed-token-bucket distribution and the corpus-wide one. A
    * scraper that starts returning error pages, a source that flips
    * language, or a replayed dump all move a source's token distribution
    * long before eyeballing documents would catch it; TV distance
    * (½·Σ|p_i − q_i| ∈ [0,1]) is the standard, threshold-friendly gauge.
    *
    * Engine-portable exactness (the [[spikes]] playbook): the summed term
    * |o_i/n_g − c_i/N| is cleared of divisions —
    *
    *   tv_g = Σ_i |o_i·N − c_i·n_g|  /  (2·n_g·N)
    *
    * — so the accumulation is pure BIGINT (order-independent, no float
    * rounding; safe while o_i·N stays under 2^63 — widen to DECIMAL past
    * ~10^9 tokens/bucket·source); only the final ratio is one double
    * division both engines evaluate identically on identical operands.
    * Tokens hash into `buckets` md5 buckets (the dsir idiom), so state is
    * buckets×sources regardless of vocabulary.
    *
    * Shape: one explode + map-side-combined groupBy — the only
    * data-sized pass; its Exchange carries ≤ buckets×sources rows. The
    * bucket totals then ride a bucket-keyed window and the per-source
    * rollup re-aggregates the same tiny frame. No joins, no driver state. */
  def drift(docs: DataFrame, sourceCol: String, textCol: String,
      buckets: Int = 4096): DataFrame =
    driftFromBuckets(tokenBuckets(docs, sourceCol, textCol, buckets),
      sourceCol, "__b")
      .withColumnRenamed("n_obs", "n_tokens")

  /** One row per token with its hashed bucket (`__b`) — the observation
    * stream [[drift]] scores. Exposed so the STREAMING face aggregates
    * the identical stream ([[graft.streaming.EventsStream.driftCounts]]
    * rolls these up incrementally; [[driftFromCounts]] then scores the
    * accumulated sink) — one formula, both deployment modes. */
  def tokenBuckets(docs: DataFrame, sourceCol: String, textCol: String,
      buckets: Int = 4096): DataFrame = {
    require(buckets >= 2, s"need buckets >= 2, got $buckets")
    docs.select(col(sourceCol),
        explode(graft.functions.wsTokens(col(textCol))).as("__tok"))
      .withColumn("__b",
        conv(substring(md5(col("__tok")), 1, 8), 16, 10)
          .cast(org.apache.spark.sql.types.LongType) % buckets)
  }

  /** [[drift]] over an ARBITRARY per-row bucket assignment — the reuse
    * seam for non-text distributions: numeric columns bin with
    * `floor(value·k)`, categorical ones are their own buckets, joint
    * distributions concatenate-and-hash. One row in, one observation in;
    * same BIGINT-exact TV arithmetic and tiny-frame plan. */
  def driftFromBuckets(rows: DataFrame, sourceCol: String,
      bucketCol: String): DataFrame =
    driftFromCounts(
      rows.groupBy(col(sourceCol), col(bucketCol).as("__b"))
        .agg(count(lit(1)).as("o")),
      sourceCol, "__b", "o")

  /** [[drift]] over ALREADY-AGGREGATED per-(source, bucket) counts — the
    * streaming entry point (the [[spikesFromHourly]] playbook): the
    * bucket-count rollup accumulates in a sink table and this scores the
    * accumulated frame without re-touching raw documents. Counts are
    * re-summed per (source, bucket) first, so a sink holding several
    * partial rows per pair (micro-batch appends) scores identically to
    * one holding finals; the re-sum keys match the upstream aggregate's,
    * so the batch path plans NO extra Exchange (corpus_drift's
    * one-data-sized-shuffle guard still holds). */
  def driftFromCounts(counts: DataFrame, sourceCol: String,
      bucketCol: String, cntCol: String): DataFrame = {
    val cnt = counts
      .groupBy(col(sourceCol), col(bucketCol).as("__b"))
      .agg(sum(col(cntCol)).cast(org.apache.spark.sql.types.LongType).as("o"))
    // all three totals ride windows over the same buckets×sources frame
    // (trivial row count), so no joins and no second data-sized pass
    import org.apache.spark.sql.expressions.Window
    val scored = cnt
      .withColumn("c", sum(col("o")).over(Window.partitionBy(col("__b"))))
      .withColumn("ng", sum(col("o")).over(Window.partitionBy(col(sourceCol))))
      .withColumn("N", sum(col("o")).over(Window.partitionBy()))
    // a bucket the source never hits still contributes |0 − c_i·n_g|:
    // add the missing mass n_g·(N − Σ_present c_i) after the rollup
    scored
      .groupBy(col(sourceCol))
      .agg(
        max(col("ng")).as("n_obs"),
        sum(abs(col("o") * col("N") - col("c") * col("ng"))).as("__present"),
        sum(col("c")).as("__c_present"),
        max(col("N")).as("__N"))
      .select(
        col(sourceCol),
        col("n_obs"),
        ((col("__present") + col("n_obs") * (col("__N") - col("__c_present")))
          .cast(org.apache.spark.sql.types.DoubleType) /
          (lit(2.0) * col("n_obs").cast(org.apache.spark.sql.types.DoubleType) *
            col("__N").cast(org.apache.spark.sql.types.DoubleType)))
          .as("tv_distance"))
  }

  /** Population Stability Index per source — the industry-standard ML
    * drift score beside the TV ([[driftFromCounts]]) and KS legs:
    * PSI = Σ_i (p_i − q_i)·ln(p_i/q_i) weights each bucket's shift by
    * its log-ratio, so a bucket going 1% → 3% alarms harder than
    * 30% → 32% (TV scores both 0.02). Conventional reading: < 0.1
    * stable, > 0.2 shifted (`is_shifted` flags the latter).
    *
    * Add-1 smoothing over the pool's observed bucket set keeps every
    * log finite (p = (o+1)/(n_g+B), q = (c+1)/(N+B)). Engine-portable
    * exactness: clearing denominators, with u = (o+1)·(N+B) and
    * v = (c+1)·(n_g+B),
    *
    *   PSI_g = Σ_i (u_i − v_i)·round₆(ln(u_i/v_i))  /  ((n_g+B)·(N+B))
    *
    * — (u−v) is pure BIGINT, the rounded ln is a deterministic function
    * of two BIGINTs both engines divide identically, the Σ accumulates
    * as DECIMAL ((18,0)×(18,6) stays inside both engines' exact
    * 38-digit multiply), and only the final division runs in IEEE
    * double. Safe while |u−v| < 1e18, i.e. obs·buckets below ~1e18.
    *
    * Shape: the (source, bucket) re-sum is the only data-sized pass, and
    * it runs ONCE — the reduced ≤ S×B-row frame CHECKPOINTS (eager,
    * trivially bounded) because four derivations read it (pool, per-source
    * totals, grand totals, the grid's present-count join) and Spark would
    * otherwise re-run the corpus rollup for each; the pool table and the
    * one-row totals broadcast onto the S×B smoothing grid, so no Exchange
    * after the rollup ever scales with the corpus. The checkpoint is swept by
    * the harness's per-query cache sweep (the lm_score_cached pattern). */
  def psiFromCounts(counts: DataFrame, sourceCol: String,
      bucketCol: String, cntCol: String): DataFrame = {
    val L = org.apache.spark.sql.types.LongType
    // eager localCheckpoint, not persist(): four derivations read this
    // frame and two of them JOIN — if `counts` is a non-re-instanceable
    // source (a streaming memory sink), DeduplicateRelations cannot split
    // the shared subtree and analysis dies with INTERNAL_ERROR
    // "conflicting references in Join" (the round-10 events_mad class).
    // The checkpoint rebases every reader on one LogicalRDD (a
    // MultiInstanceRelation), which also keeps the corpus rollup from
    // re-running per derivation; the frame is ≤ S×B rows. Swept by the
    // harness's per-query RDD sweep like every checkpoint.
    val cnt = counts
      .groupBy(col(sourceCol), col(bucketCol).as("__b"))
      .agg(sum(col(cntCol)).cast(L).as("o"))
      .localCheckpoint(true)
    val pool = cnt.groupBy(col("__b")).agg(sum(col("o")).cast(L).as("c"))
    val srcs = cnt.groupBy(col(sourceCol)).agg(sum(col("o")).cast(L).as("ng"))
    val tot = pool.agg(sum(col("c")).cast(L).as("N"),
      count(lit(1)).as("B"))
    val grid = srcs
      .crossJoin(broadcast(pool))
      .join(cnt, Seq(sourceCol, "__b"), "left")
      .na.fill(0L, Seq("o"))
      .crossJoin(broadcast(tot))
      .withColumn("__u", (col("o") + 1) * (col("N") + col("B")))
      .withColumn("__v", (col("c") + 1) * (col("ng") + col("B")))
    grid
      .withColumn("__t",
        (col("__u") - col("__v")).cast(DecimalType(18, 0)) *
          round(log(col("__u").cast(DoubleType) / col("__v").cast(DoubleType)), 6)
            .cast(DecimalType(18, 6)))
      .groupBy(col(sourceCol))
      .agg(max(col("ng")).as("n_obs"),
        (sum(col("__t")).cast(DoubleType) /
          ((max(col("ng")) + max(col("B"))) * (max(col("N")) + max(col("B"))))
            .cast(DoubleType)).as("psi"))
      .withColumn("is_shifted", col("psi") > lit(0.2))
  }

  /** Throws if any check reports violations (the reference's hard gate). */
  def assertClean(df: DataFrame, naturalKey: Seq[String], notNull: Seq[String]): Unit = {
    val bad = report(df, naturalKey, notNull)
      .filter(col("violations") > 0)
      .collect()
    if (bad.nonEmpty) {
      val msg = bad.map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(", ")
      throw new IllegalStateException(s"Data quality violations: $msg")
    }
  }

  /** Schema drift between two snapshots — the METADATA twin of the
    * token/value drift monitors: which columns were added, removed, or
    * type-changed since the last run. Pure driver-side schema comparison
    * (schemas are metadata; nothing scans), so it gates an ingest at any
    * corpus size for free. Intended use: `schemaDrift(expected,
    * incoming)` before a load, alert or quarantine on any `changed` row
    * (additive `added` columns usually pass with the mergeSchema read —
    * see [[graft.sources.Staging.readStaged]]). */
  def schemaDrift(before: org.apache.spark.sql.types.StructType,
      after: org.apache.spark.sql.types.StructType): Seq[SchemaDriftRow] = {
    val b = before.fields.map(f => f.name -> f.dataType.sql).toMap
    val a = after.fields.map(f => f.name -> f.dataType.sql).toMap
    val added = after.fields.collect {
      case f if !b.contains(f.name) =>
        SchemaDriftRow(f.name, "added", None, Some(f.dataType.sql)) }
    val removed = before.fields.collect {
      case f if !a.contains(f.name) =>
        SchemaDriftRow(f.name, "removed", Some(f.dataType.sql), None) }
    val changed = before.fields.collect {
      case f if a.get(f.name).exists(_ != f.dataType.sql) =>
        SchemaDriftRow(f.name, "changed", Some(f.dataType.sql), Some(a(f.name))) }
    (added ++ removed ++ changed).sortBy(r => (r.status, r.column)).toSeq
  }

  case class SchemaDriftRow(column: String, status: String,
      before: Option[String], after: Option[String])

  /** Deequ-style column profile — one row per column: row count, null
    * count, EXACT distinct count, and numeric min/max (emitted as
    * DOUBLE straight from the data — no arithmetic, so values are
    * engine-exact; non-numeric columns profile null min/max). ONE pass:
    * a single aggregate computes every measure (Spark plans the
    * multi-distinct via Expand — rows × columns before the partial
    * aggregate collapses them, the standard exact-profiler cost; swap
    * `approx_count_distinct` in at 100 TB if exactness isn't owed) and
    * an array-of-structs explode unpivots the one result row. The
    * column list with numeric flags comes from the SCHEMA, and
    * [[tableProfileSql]] generates the DuckDB oracle from the SAME
    * list — one source, two engines. */
  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val schema = df.schema
    def isNum(c: String): Boolean =
      schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]
    val aggs =
      count(lit(1)).as("__nrows") +:
        cols.flatMap { c =>
          Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
            countDistinct(col(c)).as(s"__nd_$c")) ++
            (if (isNum(c)) Seq(
              min(col(c)).cast("double").as(s"__mn_$c"),
              max(col(c)).cast("double").as(s"__mx_$c"))
            else Seq.empty)
        }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val entries = cols.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__nrows").as("n_rows"),
        col(s"__null_$c").as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        (if (isNum(c)) col(s"__mn_$c") else lit(null).cast("double")).as("min_num"),
        (if (isNum(c)) col(s"__mx_$c") else lit(null).cast("double")).as("max_num"))
    }
    one.select(explode(array(entries: _*)).as("e")).select("e.*")
  }

  /** The DuckDB oracle for [[tableProfile]], generated from the same
    * (column, isNumeric) list. */
  def tableProfileSql(table: String, cols: Seq[(String, Boolean)]): String = {
    require(cols.nonEmpty, "need at least one column")
    cols.map { case (c, isNum) =>
      val mn = if (isNum) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      val mx = if (isNum) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         | CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
         | CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
         | $mn AS min_num, $mx AS max_num FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY col_name"
  }

  /** Freshness gate — the arrival-latency leg of the monitoring family
    * (volume spike / value drift / corpus drift / schema drift /
    * freshness): per group, the newest event timestamp and its age in
    * whole minutes against an EXPLICIT reference instant (never now() —
    * retried tasks and the oracle must agree), flagged when the age
    * exceeds `maxLagMinutes`. One map-side-combined MAX per group —
    * group-bounded Exchange, nothing event-sized moves; integer epoch
    * arithmetic end to end. */
  def freshness(df: DataFrame, groupCol: String, tsCol: String,
      referenceTs: String, maxLagMinutes: Long): DataFrame = {
    require(maxLagMinutes >= 0L, s"need maxLagMinutes >= 0, got $maxLagMinutes")
    // integer microsecond arithmetic with `div` (truncating): exact and
    // engine-portable for the contract's non-negative lags — the
    // reference instant must be at-or-after the data (a negative lag
    // would truncate toward zero here but floor under DuckDB's `//`).
    // STREAMING deployment: sink a per-group max-ts streaming aggregate
    // (update mode) and run this same function over the accumulating
    // sink — max re-merges, so per-micro-batch partial maxima score
    // identically to finals (StreamingSpec-pinned; the driftFromCounts
    // re-aggregation design)
    df.groupBy(col(groupCol))
      .agg(max(col(tsCol)).as("__latest"))
      .withColumn("__diff",
        unix_micros(to_timestamp(lit(referenceTs))) - unix_micros(col("__latest")))
      .select(
        col(groupCol),
        date_format(col("__latest"), "yyyy-MM-dd HH:mm:ss").as("latest_ts"),
        expr("__diff div 60000000").as("lag_minutes"))
      .withColumn("stale", col("lag_minutes") > maxLagMinutes)
  }

  /** Key-sequence gap report (the "islands" completeness check): missing
    * ranges in an expected-dense key sequence — a silently-dropped batch
    * shows up as a hole in the id space long before row counts drift.
    * A gap exists wherever consecutive distinct keys differ by more than
    * `step`; each gap reports its missing range and count (integer `div`
    * — key spaces past 2^53 would lose precision in a double divide).
    *
    * SCALE: a bare `Window.orderBy` would drag every key through ONE
    * task. Instead keys bucket by `k div bucketSpan`: in-bucket gaps run
    * as a bucket-PARTITIONED window (parallel, the corpus-sized pass),
    * and cross-bucket gaps fall out of a lag over the per-bucket
    * min/max SUMMARY — keyspace/bucketSpan rows, the only global
    * window. The two legs partition the consecutive-pair set exactly
    * (a straddling pair is precisely (max of bucket i, min of the next
    * non-empty bucket)), so the union equals the flat single-window
    * formulation the oracle spells out. */
  /** Join-key skew report — the diagnostic run BEFORE a big join or
    * aggregation ships at 100 TB: the top-k hottest keys with their
    * corpus share and cumulative share, plus the key-space size. A top
    * key holding >1/parallelism of the rows predicts a straggler
    * reducer — the number that decides between the plain join (AQE
    * skew-split handles it), salting ([[Skew.saltedJoin]]) or a
    * broadcast rethink, per the measured round-10 guidance. Shape: one
    * map-side-combined count rollup, a one-row totals aggregate
    * broadcast back, and a TakeOrdered top-k — the only window runs on
    * the ≤ topK survivors. share and cum_share are IEEE divisions/sums
    * in rank order (fixed order → engine-identical). */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, s"need topK >= 1, got $topK")
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_keys"))
    val w = Window.orderBy(col("cnt").desc, col("key"))
    counts
      .orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(totals))
      .select(
        row_number().over(w).cast("long").as("rank"),
        col("key"), col("cnt"), col("total"), col("n_keys"),
        (col("cnt").cast("double") / col("total").cast("double")).as("share"),
        sum(col("cnt").cast("double") / col("total").cast("double"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum_share"))
  }

  def idGaps(df: DataFrame, keyCol: String, step: Long = 1L,
      bucketSpan: Long = 1000000L): DataFrame = {
    require(step >= 1L, s"need step >= 1, got $step")
    require(bucketSpan >= 1L, s"need bucketSpan >= 1, got $bucketSpan")
    import org.apache.spark.sql.expressions.Window
    val keys = df.select(col(keyCol).cast("long").as("__k")).distinct()
      .withColumn("__b", expr(s"__k div $bucketSpan"))
    val wIn = Window.partitionBy("__b").orderBy("__k")
    val inBucket = keys
      .withColumn("__prev", lag(col("__k"), 1).over(wIn))
      .filter(col("__prev").isNotNull && col("__k") - col("__prev") > step)
      .select(
        (col("__prev") + step).as("gap_start"),
        (col("__k") - step).as("gap_end"),
        (expr(s"(__k - __prev) div $step") - 1L).as("n_missing"))
    val summary = keys.groupBy("__b")
      .agg(min(col("__k")).as("__mn"), max(col("__k")).as("__mx"))
    val boundary = summary
      .withColumn("__pmx", lag(col("__mx"), 1).over(Window.orderBy("__b")))
      .filter(col("__pmx").isNotNull && col("__mn") - col("__pmx") > step)
      .select(
        (col("__pmx") + step).as("gap_start"),
        (col("__mn") - step).as("gap_end"),
        (expr(s"(__mn - __pmx) div $step") - 1L).as("n_missing"))
    inBucket.unionByName(boundary)
  }

  /** Fixed-point integer EWMA anomaly flags over a pre-aggregated
    * (key, bucket, count) frame — the monitoring family's SMOOTHER leg
    * beside the z-test ([[spikes]]) and median/MAD ([[events_mad]]'
    * machinery): a spike fires when a bucket's count exceeds `spikeNum`×
    * the exponentially-smoothed level of the PRIOR buckets, so a slow
    * drift re-baselines instead of alarming forever (the z-test's frame
    * does too, but EWMA needs O(1) state — the form a streaming monitor
    * actually carries).
    *
    * Determinism: the recurrence is integer fixed-point,
    * `s' = ((alphaDen−1)·s + n·scale) div alphaDen`, every operand
    * NON-NEGATIVE — deliberately, because DuckDB's `//` floors while
    * JVM division truncates, and the two only agree on non-negative
    * values (the naive `s + (n·scale − s) div alphaDen` form has a
    * negative numerator whenever traffic falls). The oracle replays the
    * identical recurrence as a recursive CTE — hash-exact, the pagerank
    * fixed-point playbook.
    *
    * SCALE: the sequential pass runs on the BUCKET-level frame (already
    * reduced by the caller's map-side-combined rollup: hours × keys, not
    * events), one partition per key hash, sorted within — the
    * pack_sequences_bfd precedent for a per-group sequential fold whose
    * groups fit a partition trivially. Overflow: s ≤ max(n)·scale, the
    * update multiplies by alphaDen — headroom ~2^63/(scale·alphaDen). */
  def ewmaFromBuckets(buckets: DataFrame, keyCol: String, bucketCol: String,
      countCol: String, alphaDen: Long = 8L, scale: Long = 256L,
      spikeNum: Long = 2L): DataFrame = {
    require(alphaDen >= 2L, s"need alphaDen >= 2, got $alphaDen")
    require(scale >= 1L && spikeNum >= 1L, s"bad scale=$scale/spikeNum=$spikeNum")
    val ss = buckets.sparkSession
    import ss.implicits._
    val sorted = buckets
      .select(col(keyCol).cast("string").as("k"), col(bucketCol).as("b"),
        col(countCol).cast("long").as("n"))
      .repartition(col("k")).sortWithinPartitions(col("k"), col("b"))
    sorted.mapPartitions { it =>
      var curKey: String = null
      var s = 0L
      var started = false
      it.map { r =>
        val k = r.getString(0)
        val b = r.getAs[java.sql.Timestamp](1)
        val n = r.getLong(2)
        if (k != curKey) { curKey = k; started = false; s = 0L }
        val spike = started && n * scale > spikeNum * s
        s = if (!started) { started = true; n * scale }
            else ((alphaDen - 1L) * s + n * scale) / alphaDen
        (k, b, n, s, spike)
      }
    }.toDF(keyCol, bucketCol, countCol, "ewma_scaled", "spike")
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the
    * `valueCol` distributions of groups `a` and `b` — the monitoring
    * family's BINLESS distribution-shift leg: TV drift
    * ([[driftFromBuckets]]) needs a bucketing choice and is blind to
    * shifts inside a bucket; KS is the sup-distance between the two
    * EMPIRICAL CDFs, no bins, sensitive to any location/shape change.
    *
    * Exact integer form: with per-distinct-value counts (na, nb) and
    * running totals (ca, cb), D = max |nb_tot·ca − na_tot·cb| / (na_tot·
    * nb_tot) — the numerator is all-BIGINT so the max is engine-exact,
    * and the one shared IEEE division at the end is bit-identical on
    * identical operands (the events_spike playbook).
    *
    * SCALE: the corpus reduces FIRST to distinct (value → na, nb) counts
    * in one map-side-combined rollup; the running CDFs ride
    * [[Ranking.withPrefixSums]] — range-repartition + partition-offset
    * reconstruction — so there is NO single-task global window anywhere
    * even when the value domain is continuous (distinct values ~ rows).
    * Totals arrive as a broadcast one-row cross join (the established
    * one-row-aggregate shape). */
  def ksStatistic(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame =
    ksFromCounts(
      df.select(col(groupCol), col(valueCol), lit(1L).as("__n")),
      groupCol, valueCol, "__n", a, b)

  /** [[ksStatistic]] over ALREADY-AGGREGATED per-(group, value) counts —
    * the streaming entry point (the [[driftFromCounts]] playbook): a
    * streaming `groupBy(group, value).count()` accumulates in a sink
    * whose state is bounded by the DISTINCT (group, value) domain —
    * that bound is the deployment contract (a continuous value stream
    * needs a quantization upstream; an id-like value column does not
    * belong under KS at all) — and this scores the accumulated frame
    * without re-touching raw rows. Counts are re-summed per (group,
    * value) first, so a sink holding several partial rows per pair
    * (micro-batch appends) scores identically to one holding finals;
    * summing 1s is the identical aggregate the raw path runs, so the
    * batch and streaming faces share every downstream operand bit for
    * bit. */
  def ksFromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      cntCol: String, a: String, b: String): DataFrame = {
    require(a != b, s"need two distinct groups, got '$a' twice")
    val cnt = counts
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === a, col(cntCol)).otherwise(0L)).as("na"),
        sum(when(col(groupCol) === b, col(cntCol)).otherwise(0L)).as("nb"))
    val cum = graft.operators.Ranking.withPrefixSums(
      cnt, Seq(col("v")), Seq("na", "nb"))
    val totals = broadcast(cnt.agg(
      sum(col("na")).as("na_tot"), sum(col("nb")).as("nb_tot")))
    cum.crossJoin(totals)
      .agg(
        max(col("na_tot")).as("n_a"),
        max(col("nb_tot")).as("n_b"),
        max(abs(col("nb_tot") * col("na_cum") -
          col("na_tot") * col("nb_cum"))).as("d_num"))
      .select(
        lit(a).as("type_a"), lit(b).as("type_b"),
        col("n_a"), col("n_b"), col("d_num"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null))
          .otherwise(col("d_num").cast("double") /
            (col("n_a") * col("n_b")).cast("double")).as("ks"))
  }

  /** The fixed-bin quantizer shared by [[ksBinnedStatistic]] and its
    * streaming face: bin = clamp(floor((v − lo)/w), −1, nBins) with
    * w = (hi − lo)/nBins — bin −1 is the underflow sink, bin nBins the
    * overflow sink, so EVERY real value lands in one of nBins + 2 bins
    * however unbounded the domain. One subtraction, one IEEE division by
    * a literal, one floor: both engines compute it bit-identically (the
    * value_psi floor(value·16) precedent).
    *
    * CONTRACT: NaN is OUTSIDE the quantizer's domain — Spark's
    * floor(double) yields LongType so NaN.toLong lands in bin 0, while
    * DuckDB's FLOOR(NaN)=NaN propagates through GREATEST/LEAST (NaN
    * sorts greatest there) to the overflow sink. Callers must filter
    * NaN alongside NULL (`!isnan` / `NOT isnan`) on BOTH engines'
    * faces; ±Infinity is handled consistently (the clamp sinks). */
  def ksBinCol(value: Column, lo: Double, hi: Double, nBins: Int): Column = {
    require(nBins >= 2, s"need >= 2 bins, got $nBins")
    require(hi > lo, s"need hi > lo, got [$lo, $hi]")
    val w = (hi - lo) / nBins
    least(greatest(floor((value - lo) / w), lit(-1.0)), lit(nBins.toDouble))
      .cast(org.apache.spark.sql.types.LongType)
  }

  /** Fixed-bin approximate KS — the BOUNDED-STATE twin of
    * [[ksFromCounts]] for unbounded domains. The exact streaming KS's
    * state is the distinct (group, value) rollup: bounded only by the
    * value domain (fine for quantized test feeds, unbounded for a
    * continuous metric — the contract documented on [[ksFromCounts]]).
    * Binning at INGEST caps the state at groups × (nBins + 2) rows
    * FOREVER, whatever arrives; the trade is resolution: the sup runs
    * over bin boundaries only, so with per-bin masses p_i = na_i/n_a,
    * q_i = nb_i/n_b,
    *
    *   D_binned ≤ D_exact ≤ D_binned + max_i max(p_i, q_i)
    *
    * (inside a bin each CDF moves by at most its bin mass) — the
    * property-tested error contract; more bins → tighter. Downstream of
    * the quantizer this IS [[ksFromCounts]] over the bin domain, so the
    * streaming face (bin → `EventsStream.valueCounts` → score the sink)
    * equals this batch face bit for bit (pinned in StreamingSpec), the
    * same shared-operand design as KS/MWU/PSI. */
  def ksBinnedStatistic(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String, lo: Double, hi: Double, nBins: Int): DataFrame =
    ksFromCounts(
      // enforce ksBinCol's NaN contract HERE, not per caller: Spark
      // floors NaN into bin 0 while DuckDB sinks it to overflow, so an
      // unfiltered NaN silently miscounts the lowest bin (NULLs drop
      // alongside — neither is a real observation of the distribution)
      df.filter(col(valueCol).isNotNull &&
          !isnan(col(valueCol).cast(org.apache.spark.sql.types.DoubleType)))
        .select(col(groupCol),
          ksBinCol(col(valueCol), lo, hi, nBins).as("__bin"),
          lit(1L).as("__n")),
      groupCol, "__bin", "__n", a, b)

  /** Exact two-sample Mann–Whitney U between the `valueCol` distributions
    * of groups `a` and `b` — the monitoring family's RANK-BASED shift leg
    * beside KS: KS is the sup-CDF-distance (sensitive to any shape
    * change, but a single point of divergence decides it); U is the
    * pairwise win count #{x∈A > y∈B} (+ half-ties), i.e. the
    * AUC/common-language effect size — robust to outliers and the
    * natural "did the distribution MOVE" statistic.
    *
    * Exact integer form: per distinct value, 2·midrank = 2·(rows
    * strictly below) + cnt + 1 — ties get their exact midrank with no
    * halves; 2·U_A = Σ na·2midrank − n_a·(n_a+1), all BIGINT/DECIMAL, so
    * `u2_a` is engine-exact and AUC_A = U_A/(n_a·n_b) is ONE IEEE
    * division over exact operands (u2 < 2·n_a·n_b must stay < 2^63 —
    * ~2e9 rows per side; past that emit the decimal). Identity
    * U_A + U_B = n_a·n_b is property-pinned.
    *
    * SCALE: identical shape to [[ksFromCounts]] — corpus reduces FIRST
    * to distinct (value → na, nb) counts, running totals ride
    * [[Ranking.withPrefixSums]] (range-repartition + offsets, NO
    * single-task window even with a continuous domain), one single-row
    * aggregate ends it. */
  def mwuFromCounts(counts: DataFrame, groupCol: String, valueCol: String,
      cntCol: String, a: String, b: String): DataFrame = {
    require(a != b, s"need two distinct groups, got '$a' twice")
    val cnt = counts
      .filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("v"))
      .agg(
        sum(when(col(groupCol) === a, col(cntCol)).otherwise(0L)).as("na"),
        sum(when(col(groupCol) === b, col(cntCol)).otherwise(0L)).as("nb"))
    val cum = graft.operators.Ranking.withPrefixSums(
      cnt, Seq(col("v")), Seq("na", "nb"))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val mid2 = lit(2) * (col("na_cum") - col("na") + col("nb_cum") - col("nb")) +
      col("na") + col("nb") + 1
    val s = cum.agg(
      sum(col("na")).as("n_a"), sum(col("nb")).as("n_b"),
      sum(dec(col("na")) * mid2).as("r2a"))
    s.select(col("n_a"), col("n_b"),
        (col("r2a") - dec(col("n_a")) * (col("n_a") + 1)).cast("long").as("u2"))
      .select(
        lit(a).as("type_a"), lit(b).as("type_b"), col("n_a"), col("n_b"),
        col("u2").as("u2_a"),
        when(col("n_a") === 0L || col("n_b") === 0L, lit(null).cast(DoubleType))
          .otherwise(col("u2").cast(DoubleType) /
            (lit(2L) * col("n_a") * col("n_b")).cast(DoubleType)).as("auc_a"))
  }

  /** Raw-rows face of [[mwuFromCounts]] (counts of 1 — the identical
    * aggregate the streaming (group, value) sink accumulates, so both
    * faces share every downstream operand bit for bit, the KS design). */
  def mwuStatistic(df: DataFrame, groupCol: String, valueCol: String,
      a: String, b: String): DataFrame =
    mwuFromCounts(
      df.select(col(groupCol), col(valueCol), lit(1L).as("__n")),
      groupCol, valueCol, "__n", a, b)

  /** Generated DuckDB oracle for [[mwuStatistic]] over several group
    * pairs (same distinct-value rollup, same 2·midrank integers, HUGEINT
    * accumulation, same single IEEE division). CTEs are tag-suffixed and
    * hoisted into ONE top-level WITH — DuckDB rejects WITH inside a
    * FROM-subquery (the value_ks oracle's layout). */
  def mwuSql(table: String, groupCol: String, valueCol: String,
      pairs: Seq[(String, String)]): String = {
    require(pairs.nonEmpty, "need at least one group pair")
    val ctes = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"""f$i AS (SELECT $groupCol g, $valueCol v FROM $table
         |        WHERE $groupCol IN ('$a', '$b') AND $valueCol IS NOT NULL),
         |c$i AS (SELECT v,
         |       CAST(SUM(CASE WHEN g = '$a' THEN 1 ELSE 0 END) AS BIGINT) na,
         |       CAST(SUM(CASE WHEN g = '$b' THEN 1 ELSE 0 END) AS BIGINT) nb
         |      FROM f$i GROUP BY v),
         |cum$i AS (SELECT na, nb,
         |        SUM(na + nb) OVER (ORDER BY v
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |          - (na + nb) AS bef
         |        FROM c$i),
         |s$i AS (SELECT CAST(SUM(na) AS BIGINT) n_a, CAST(SUM(nb) AS BIGINT) n_b,
         |       SUM(CAST(na AS HUGEINT) * (2*bef + na + nb + 1)) r2a FROM cum$i)"""
        .stripMargin
    }.mkString(",\n")
    val sels = pairs.zipWithIndex.map { case ((a, b), i) =>
      s"""SELECT '$a' AS type_a, '$b' AS type_b, n_a, n_b,
         | CAST(r2a - CAST(n_a AS HUGEINT)*(n_a+1) AS BIGINT) AS u2_a,
         | CASE WHEN n_a = 0 OR n_b = 0 THEN NULL
         |  ELSE CAST(CAST(r2a - CAST(n_a AS HUGEINT)*(n_a+1) AS BIGINT) AS DOUBLE)
         |       / CAST(2*n_a*n_b AS DOUBLE) END AS auc_a
         |FROM s$i""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH $ctes
       |SELECT * FROM (
       |$sels)
       |ORDER BY type_a, type_b""".stripMargin
  }

  /** Theil–Sen robust trend over a pre-aggregated (key, bucket, count)
    * frame — the ROBUST twin of [[trendFromBuckets]]'s OLS slope: OLS
    * weighs each point by its squared x-distance, so one corrupt bucket
    * (an outage hour, a backfill spike at the window's edge) can flip
    * the fitted sign; the MEDIAN of all pairwise slopes tolerates up to
    * ~29% corrupted buckets (the estimator's breakdown point) — the
    * standard robust trend statistic.
    *
    * Engine parity: x is the per-key hour shift the OLS leg uses, each
    * pairwise slope is ONE IEEE division of two BIGINTs, and the median
    * is interpolated over identical double multisets (quantile_cont —
    * the price_percentiles parity pattern; the even-count interpolation
    * averages two doubles, IEEE-identical in both engines). `declining`
    * is a sign test on the median.
    *
    * SCALE: pairs are per-key (time-horizon)², never corpus-sized — the
    * input is the caller's already-reduced bucket rollup (B buckets per
    * key ⇒ B²/2 pairs; 30 days hourly = 720 buckets ≈ 259k pairs/key, a
    * bounded self-join by construction).
    *
    * CONTRACT (the madFromHourly trailing≤1000 convention, horizon
    * edition): `maxBuckets` caps B per key because B is a QUADRATIC
    * multiplier on the pair join — a 5-year hourly series (43.8k
    * buckets) is ~960M pairs PER KEY, and the per-key slope-median
    * percentile buffers every pair. The cap is enforced IN the plan
    * (`raise_error` at the eager checkpoint — the horizon is data-
    * dependent, so a driver-side `require` can't see it) and fails
    * before any pair is produced. Longer horizons belong in coarser
    * buckets (slope is per-hour either way), not a bigger cap.
    *
    * The shifted frame is eagerly checkpointed: it feeds BOTH sides of
    * the pair join through a Window, the exact shared-subtree shape
    * that dies in DeduplicateRelations over non-re-instanceable sources
    * (the psiFromCounts posture), and the checkpoint keeps the rollup
    * from running twice. */
  def theilSenFromBuckets(buckets: DataFrame, keyCol: String,
      bucketCol: String, countCol: String,
      maxBuckets: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxBuckets >= 2, s"need maxBuckets >= 2, got $maxBuckets")
    val base = buckets.select(
      col(keyCol).as("k"),
      expr(s"unix_timestamp($bucketCol) div 3600").as("h"),
      col(countCol).cast("long").as("y"))
    val w = Window.partitionBy("k")
    val shifted = base
      .withColumn("x", col("h") - min(col("h")).over(w))
      .withColumn("__nb", count(lit(1)).over(w))
      .select(col("k"),
        when(col("__nb") > maxBuckets, raise_error(concat(
          lit("theilSenFromBuckets: key '"), col("k").cast("string"),
          lit(s"' has "), col("__nb"),
          lit(s" buckets > maxBuckets=$maxBuckets — the pairwise-slope " +
            "join is B^2/2 per key; use coarser buckets, not a wider cap"))))
          .otherwise(col("x")).as("x"),
        col("y"))
      .localCheckpoint(true)
    val lo = shifted.select(col("k"), col("x").as("x1"), col("y").as("y1"))
    val hi = shifted.select(col("k"), col("x").as("x2"), col("y").as("y2"))
    lo.join(hi, Seq("k"))
      .filter(col("x1") < col("x2"))
      .select(col("k"),
        ((col("y2") - col("y1")).cast(DoubleType) /
          (col("x2") - col("x1")).cast(DoubleType)).as("sl"))
      .groupBy(col("k").as(keyCol))
      .agg(count(lit(1)).as("n_pairs"),
        expr("percentile(sl, 0.5)").as("slope"))
      .withColumn("declining",
        (col("slope") < 0.0).cast(org.apache.spark.sql.types.LongType))
  }

  /** Per-key OLS trend over a pre-aggregated (key, bucket, count) frame —
    * the monitoring family's TREND leg: the z-test/MAD/EWMA monitors all
    * re-baseline on slow change BY DESIGN, so a gradual decline (a dying
    * event source, a slowly rotting scraper) never alarms; the
    * least-squares slope of count against bucket index is exactly the
    * statistic that catches it.
    *
    * Exact integer form: x = hours since the KEY'S OWN first bucket
    * (slope is shift-invariant, and the shift keeps every product far
    * inside BIGINT — absolute epoch-hour x would overflow n·Σx² at ~720
    * buckets), slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) with BIGINT
    * numerator/denominator emitted exactly and the slope itself the one
    * shared IEEE division. `declining` is a sign test on the numerator —
    * integer-exact, engine-portable.
    *
    * SCALE: runs on the caller's already-reduced bucket frame; the
    * per-key min rides a Window over the SAME key partitioning the
    * sum rollup then reuses (one Exchange total). */
  def trendFromBuckets(buckets: DataFrame, keyCol: String,
      bucketCol: String, countCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = buckets.select(
      col(keyCol).as("k"),
      expr(s"unix_timestamp($bucketCol) div 3600").as("h"),
      col(countCol).cast("long").as("y"))
    val w = Window.partitionBy("k")
    val shifted = base.withColumn("x", col("h") - min(col("h")).over(w))
    shifted.groupBy(col("k").as(keyCol))
      .agg(
        count(lit(1)).as("n_buckets"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .select(
        col(keyCol), col("n_buckets"),
        (col("n_buckets") * col("sxy") - col("sx") * col("sy")).as("slope_num"),
        (col("n_buckets") * col("sxx") - col("sx") * col("sx")).as("slope_den"))
      .withColumn("slope",
        when(col("slope_den") === 0L, lit(null))
          .otherwise(col("slope_num").cast("double") /
            col("slope_den").cast("double")))
      .withColumn("declining", (col("slope_num") < 0L).cast("long"))
  }

  /** Pairwise Pearson correlation over fixed-point numeric columns — the
    * profiler's RELATIONSHIP leg beside [[tableProfile]]'s per-column
    * measures (deequ's correlation analyzer): collinear features and
    * broken derived columns (price no longer tracking quantity) show up
    * here first.
    *
    * Exactness: each value is quantized to integer `cents` units (the
    * inputs carry ≤2 decimals — checked to 1e-9 on the test tables), so
    * every moment Σx, Σx², Σxy accumulates as DECIMAL — order-independent
    * EXACT sums where double accumulation would be layout-dependent. The
    * correlation itself is then a fixed IEEE expression over exact
    * operands, with the decimal→double conversions VARCHAR-mediated on
    * both engines (the embedding_centroids parity route; DuckDB's native
    * decimal→double cast is 1 ulp off). Constant columns yield NULL.
    *
    * SCALE: ONE map-side-combined global aggregate (k + k(k+1)/2 sums in
    * a single pass — no per-pair jobs, no corr() double accumulation),
    * one single-partition Exchange of one row, then a row-per-pair
    * explode of the single result row. [[corrMatrixSql]] generates the
    * DuckDB oracle from the SAME column list (HUGEINT sums mirror the
    * decimal exactness). */
  def corrMatrix(df: DataFrame, cols: Seq[String],
      cents: Int = 100): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got $cols")
    require(cents >= 1, s"need cents >= 1, got $cents")
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val base = df.select(cols.zipWithIndex.map { case (c, i) =>
      round(col(c) * cents, 0).cast("long").as(s"q$i")
    }: _*)
    // per-row PRODUCTS stay in BIGINT (codegen'd primitive multiply,
    // ANSI-checked — quantized inputs must keep |x·y| < 2^63, i.e. each
    // ~3e9 units; measured ~4x less per-row BigDecimal work than
    // decimal×decimal) — only the ACCUMULATION widens to DECIMAL, where
    // 128-bit exactness is actually needed
    def dec(c: Column) = c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val sums: Seq[Column] =
      Seq(count(lit(1)).as("n")) ++
        cols.indices.map(i => sum(dec(col(s"q$i"))).as(s"s$i")) ++
        cols.indices.map(i =>
          sum(dec(col(s"q$i") * col(s"q$i"))).as(s"p${i}_$i")) ++
        pairs.map { case (i, j) =>
          sum(dec(col(s"q$i") * col(s"q$j"))).as(s"p${i}_$j") }
    val one = base.agg(sums.head, sums.tail: _*)
    def vmd(c: Column) = c.cast("string").cast("double")
    val rows = pairs.map { case (i, j) =>
      val num = col("n") * col(s"p${i}_$j") - col(s"s$i") * col(s"s$j")
      val di = col("n") * col(s"p${i}_$i") - col(s"s$i") * col(s"s$i")
      val dj = col("n") * col(s"p${j}_$j") - col(s"s$j") * col(s"s$j")
      struct(
        lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        col("n").as("n_rows"),
        when(di === 0 || dj === 0, lit(null).cast("double"))
          .otherwise(vmd(num) / sqrt(vmd(di) * vmd(dj))).as("corr"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** Declarative data-quality rule — the deequ-style "check" AST: each
    * rule compiles to one conditional aggregate, so a whole suite
    * evaluates in ONE corpus pass ([[checkRules]]) and the SAME rule list
    * generates the DuckDB oracle ([[checkRulesSql]]). Null handling is
    * explicit: range/set/pattern rules only judge NON-NULL values
    * (nullness is `NotNull`'s job); `Unique` counts surplus duplicates
    * among null-free key tuples. */
  sealed trait Rule { def name: String }
  object Rule {
    case class NotNull(column: String) extends Rule {
      def name = s"not_null($column)"
    }
    case class Unique(columns: Seq[String]) extends Rule {
      require(columns.nonEmpty, "Unique needs at least one column")
      def name = s"unique(${columns.mkString(",")})"
    }
    case class InRange(column: String, lo: Double, hi: Double) extends Rule {
      def name = s"in_range($column,$lo,$hi)"
    }
    case class InSet(column: String, values: Seq[String]) extends Rule {
      require(values.nonEmpty, "InSet needs at least one value")
      def name = s"in_set($column)"
    }
    /** Pattern must stay in the Java-regex/RE2 common subset (the
      * piiPatterns contract) so both engines match identically. */
    case class Matches(column: String, pattern: String) extends Rule {
      def name = s"matches($column)"
    }
  }

  /** Evaluate a rule suite in ONE aggregation pass — the ingest
    * acceptance gate as data, not code: per rule, its violation count
    * and pass flag (violations == 0), plus the row total. The whole
    * suite is k conditional sums (+ one Expand-backed distinct per
    * Unique rule, the tableProfile posture) in a single
    * map-side-combined aggregate; the result row explodes to one row
    * per rule. At 100 TB this is exactly one scan regardless of how
    * many rules the suite carries. */
  def checkRules(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    import Rule._
    def nonNullTuple(cols: Seq[String]): Column =
      cols.map(col(_).isNotNull).reduce(_ && _)
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: rules.zipWithIndex
      .flatMap {
        case (NotNull(c), i) =>
          Seq(sum(col(c).isNull.cast("long")).as(s"__v$i"))
        case (Unique(cs), i) =>
          val tup = when(nonNullTuple(cs), struct(cs.map(col): _*))
          Seq(count(tup).as(s"__t$i"), count_distinct(tup).as(s"__d$i"))
        case (InRange(c, lo, hi), i) =>
          Seq(sum((col(c).isNotNull &&
            (col(c) < lo || col(c) > hi)).cast("long")).as(s"__v$i"))
        case (InSet(c, vs), i) =>
          Seq(sum((col(c).isNotNull &&
            !col(c).isin(vs: _*)).cast("long")).as(s"__v$i"))
        case (Matches(c, p), i) =>
          Seq(sum((col(c).isNotNull &&
            !col(c).rlike(p)).cast("long")).as(s"__v$i"))
      }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val v = r match {
        case Unique(_) => col(s"__t$i") - col(s"__d$i")
        case _ => col(s"__v$i")
      }
      struct(lit(r.name).as("rule"), col("__n").as("n_rows"),
        v.as("violations"), (v === 0L).cast("long").as("passed"))
    }
    one.select(explode(array(rows: _*)).as("r")).select("r.*")
  }

  /** The DuckDB twin of [[checkRules]], generated from the same rule
    * list (names included), so the oracle can never drift from the
    * evaluator. */
  def checkRulesSql(table: String, rules: Seq[Rule]): String = {
    import Rule._
    def esc(s: String) = s.replace("'", "''")
    val aggs = "COUNT(*) AS __n" +: rules.zipWithIndex.flatMap {
      case (NotNull(c), i) =>
        Seq(s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS __v$i")
      case (Unique(cs), i) =>
        val nn = cs.map(c => s"$c IS NOT NULL").mkString(" AND ")
        val tup = s"CASE WHEN $nn THEN (${cs.mkString(", ")}) END"
        Seq(s"CAST(COUNT($tup) AS BIGINT) AS __t$i",
          s"CAST(COUNT(DISTINCT $tup) AS BIGINT) AS __d$i")
      case (InRange(c, lo, hi), i) =>
        Seq(s"CAST(SUM(CASE WHEN $c IS NOT NULL AND ($c < $lo OR $c > $hi) " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS __v$i")
      case (InSet(c, vs), i) =>
        val set = vs.map(v => s"'${esc(v)}'").mkString(", ")
        Seq(s"CAST(SUM(CASE WHEN $c IS NOT NULL AND $c NOT IN ($set) " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS __v$i")
      case (Matches(c, p), i) =>
        Seq(s"CAST(SUM(CASE WHEN $c IS NOT NULL AND NOT regexp_matches($c, '${esc(p)}') " +
          s"THEN 1 ELSE 0 END) AS BIGINT) AS __v$i")
    }
    val rows = rules.zipWithIndex.map { case (r, i) =>
      val v = r match {
        case Unique(_) => s"__t$i - __d$i"
        case _ => s"__v$i"
      }
      s"""SELECT '${esc(r.name)}' AS rule, __n AS n_rows,
         | CAST($v AS BIGINT) AS violations,
         | CAST(CASE WHEN $v = 0 THEN 1 ELSE 0 END AS BIGINT) AS passed
         |FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH s AS (SELECT ${aggs.mkString(", ")} FROM $table)
       |SELECT * FROM (
       |$rows)
       |ORDER BY rule""".stripMargin
  }

  /** The DuckDB twin of [[corrMatrix]], generated from the same column
    * list: HUGEINT (128-bit) sums give the same order-independent
    * exactness as Spark's decimals, and the identical VARCHAR-mediated
    * double conversion + IEEE tail makes corr bit-equal. */
  def corrMatrixSql(table: String, cols: Seq[String],
      cents: Int = 100): String = {
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (i, j)
    val qs = cols.zipWithIndex.map { case (c, i) =>
      s"CAST(round($c * $cents) AS HUGEINT) AS q$i" }.mkString(", ")
    val moments =
      (cols.indices.map(i => s"SUM(q$i) AS s$i") ++
        cols.indices.map(i => s"SUM(q$i*q$i) AS p${i}_$i") ++
        pairs.map { case (i, j) => s"SUM(q$i*q$j) AS p${i}_$j" }).mkString(", ")
    val rows = pairs.map { case (i, j) =>
      val num = s"n*p${i}_$j - s$i*s$j"
      val di = s"n*p${i}_$i - s$i*s$i"
      val dj = s"n*p${j}_$j - s$j*s$j"
      s"""SELECT '${cols(i)}' AS col_x, '${cols(j)}' AS col_y, n AS n_rows,
         | CASE WHEN ($di) = 0 OR ($dj) = 0 THEN NULL
         |  ELSE CAST(CAST($num AS VARCHAR) AS DOUBLE)
         |   / sqrt(CAST(CAST($di AS VARCHAR) AS DOUBLE)
         |          * CAST(CAST($dj AS VARCHAR) AS DOUBLE)) END AS corr
         |FROM s""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH q AS (SELECT $qs FROM $table),
       |s AS (SELECT COUNT(*) AS n, $moments FROM q)
       |SELECT * FROM (
       |$rows)
       |ORDER BY col_x, col_y""".stripMargin
  }

  /** Benford first-digit fraud/anomaly monitor: observed first-digit
    * distribution of a positive numeric column against the Benford
    * expectation p(d) = log10(1 + 1/d), per-digit deviation flagged
    * past `flagEps`. Naturally-grown magnitudes (prices, populations,
    * transaction amounts) follow Benford; fabricated or truncated
    * feeds don't — the classic forensic DQ check.
    *
    * Engine parity: the first digit comes from a MAGNITUDE-BAND CASE
    * ladder over exact BIGINT comparisons (floor once, then integer
    * divides — log10/pow have no cross-engine rounding contract); the
    * nine Benford constants are Scala-computed literals embedded in
    * BOTH the Spark plan and the generated oracle (string-roundtrip
    * exact), so shares and deviations are IEEE ops on identical
    * operands. One scan, one 9-group rollup — corpus-size-free after
    * the map-side partial. */
  def benfordReport(df: DataFrame, valueCol: String,
      flagEps: Double = 0.02): DataFrame = {
    val all = org.apache.spark.sql.expressions.Window.partitionBy()
    val p = benfordP.zipWithIndex.foldLeft(lit(null)
        .cast(org.apache.spark.sql.types.DoubleType)) {
      case (acc, (pd, i)) => when(col("digit") === (i + 1).toLong, lit(pd))
        .otherwise(acc)
    }
    df.filter(col(valueCol) >= 1.0)
      .select(floor(col(valueCol)).cast(org.apache.spark.sql.types.LongType)
        .as("__i"))
      .select(expr(benfordDigitCase("div")).as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_obs"))
      .withColumn("__n", sum(col("n_obs")).over(all))
      .select(col("digit"), col("n_obs"),
        (col("n_obs").cast(org.apache.spark.sql.types.DoubleType) /
          col("__n").cast(org.apache.spark.sql.types.DoubleType))
          .as("obs_share"),
        p.as("benford_p"))
      .withColumn("abs_dev", abs(col("obs_share") - col("benford_p")))
      .withColumn("flagged", col("abs_dev") > lit(flagEps))
      .orderBy("digit")
  }

  /** The nine Benford probabilities, computed once in Scala and embedded
    * as literals on both engines. */
  val benfordP: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  /** The shared first-digit CASE ladder over a BIGINT column `__i` —
    * `op` is "div" (Spark) or "//" (DuckDB); both truncate identically
    * on the non-negative ground the >= 1 filter guarantees. */
  def benfordDigitCase(op: String): String = {
    val arms = (1 to 18).map { k =>
      val bound = BigInt(10).pow(k)
      val denom = BigInt(10).pow(k - 1)
      if (k == 1) s"WHEN __i < 10 THEN __i"
      else s"WHEN __i < $bound THEN __i $op $denom"
    }.mkString(" ")
    s"CASE $arms END"
  }

  /** Generated DuckDB oracle for [[benfordReport]] (same ladder, same
    * Scala-stamped constants, same IEEE expression shapes). */
  def benfordSql(table: String, valueCol: String,
      flagEps: Double = 0.02): String = {
    val consts = benfordP.zipWithIndex
      .map { case (pd, i) => s"WHEN digit = ${i + 1} THEN CAST('$pd' AS DOUBLE)" }
      .mkString(" ")
    s"""WITH i AS (SELECT CAST(floor($valueCol) AS BIGINT) AS __i
       | FROM $table WHERE $valueCol >= 1.0),
       |d AS (SELECT ${benfordDigitCase("//")} AS digit FROM i),
       |g AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
       |t AS (SELECT SUM(n_obs) AS n FROM g)
       |SELECT digit, n_obs,
       | CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) AS obs_share,
       | CASE $consts END AS benford_p,
       | abs(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
       |     - CASE $consts END) AS abs_dev,
       | abs(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE)
       |     - CASE $consts END) > CAST('$flagEps' AS DOUBLE) AS flagged
       |FROM g, t ORDER BY digit""".stripMargin
  }

  /** Autocorrelation of an hourly count series at fixed lags — the
    * seasonality DETECTOR beside [[seasonalFromHourly]]'s fixed-period
    * scorer: a daily-rhythm feed shows the ACF peak at lag 24, a broken
    * dedup upstream shows it at lag 1, and a flat feed shows none. Input
    * is any (key, hour, cnt) rollup (the monitor-seam shape).
    *
    * Semantics: the series is ZERO-FILLED on the dense global [min,max]
    * hour spine per key first (the [[Temporal.gapFill]] posture) — a lag
    * over the sparse frame would pair values across silent gaps and the
    * "lag" would stop being a time lag. Pearson ACF per (key, lag) over
    * the aligned pairs (x_t, x_{t-lag}); keys with a constant series
    * yield NULL.
    *
    * Exactness: counts are BIGINT; per-pair products stay BIGINT
    * (codegen'd, ANSI-checked — per-hour counts must keep |x·y| < 2^63,
    * i.e. each below ~3e9 rows/hour), only the accumulation widens to
    * DECIMAL; the ACF tail is a fixed IEEE expression over exact
    * operands with VARCHAR-mediated double conversion on both engines
    * (the corrMatrix parity route). [[acfSql]] generates the DuckDB twin
    * from the SAME lag list.
    *
    * SCALE: everything after the caller's hourly rollup is
    * hours×keys-bounded — ONE fused window pass emits every lag column
    * (no interleaved projections, the round-9 rule), ONE key rollup
    * carries all 6·|lags| conditional sums, then a row-per-lag explode. */
  def acf(hourly: DataFrame, keyCol: String, hourCol: String,
      cntCol: String, lags: Seq[Int]): DataFrame = {
    require(lags.nonEmpty && lags.forall(_ >= 1), s"lags must be >= 1: $lags")
    require(lags.distinct.size == lags.size, s"duplicate lags: $lags")
    val dense = denseHourly(hourly, keyCol, hourCol, cntCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(hourCol))
    val lagCols = lags.map(l => lag(col("x"), l).over(w).as(s"y$l"))
    val framed = dense.select(col(keyCol) +: col("x") +: lagCols: _*)
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val sums = lags.flatMap { l =>
      val y = col(s"y$l")
      Seq(
        count(y).as(s"n$l"),
        sum(when(y.isNotNull, dec(col("x")))).as(s"sx$l"),
        sum(dec(y)).as(s"sy$l"),
        sum(dec(col("x") * y)).as(s"sxy$l"),
        sum(when(y.isNotNull, dec(col("x") * col("x")))).as(s"sxx$l"),
        sum(dec(y * y)).as(s"syy$l"))
    }
    val agg = framed.groupBy(col(keyCol)).agg(sums.head, sums.tail: _*)
    def vmd(c: Column) = c.cast("string").cast(DoubleType)
    val rows = lags.map { l =>
      val n = col(s"n$l")
      val num = n * col(s"sxy$l") - col(s"sx$l") * col(s"sy$l")
      val dx = n * col(s"sxx$l") - col(s"sx$l") * col(s"sx$l")
      val dy = n * col(s"syy$l") - col(s"sy$l") * col(s"sy$l")
      struct(lit(l).cast("long").as("lag"), n.as("n_pairs"),
        when(dx === 0 || dy === 0, lit(null).cast(DoubleType))
          .otherwise(vmd(num) / sqrt(vmd(dx) * vmd(dy))).as("acf"))
    }
    agg.select(col(keyCol), explode(array(rows: _*)).as("r"))
      .select(col(keyCol), col("r.lag").as("lag"),
        col("r.n_pairs").as("n_pairs"), col("r.acf").as("acf"))
  }

  /** Zero-fill an (key, hour, cnt) rollup on the dense global [min,max]
    * hour spine per key — the shared substrate of the series monitors
    * that are wrong across silent gaps ([[acf]], [[changepointFromHourly]]).
    * Three derivations (bounds, key set, the join) read the rollup — an
    * eager checkpoint of the hours×keys frame keeps the CORPUS scan at
    * exactly one (the psiFromCounts posture); broadcast hints keep the
    * tiny joins exchange-free regardless of the checkpoint's inherited
    * size estimate. Returns (keyCol, hourCol, x: long). */
  private def denseHourly(hourly: DataFrame, keyCol: String,
      hourCol: String, cntCol: String): DataFrame = {
    val hk = hourly.localCheckpoint(true)
    val bounds = hk.agg(min(col(hourCol)).as("lo"), max(col(hourCol)).as("hi"))
    val spine = bounds.select(explode(sequence(col("lo"), col("hi"),
      expr("INTERVAL 1 HOUR"))).as(hourCol))
    val keys = hk.select(col(keyCol)).distinct()
    spine.crossJoin(broadcast(keys))
      .join(broadcast(hk), Seq(hourCol, keyCol), "left")
      .select(col(keyCol), col(hourCol),
        coalesce(col(cntCol), lit(0L)).cast("long").as("x"))
  }

  /** Generated DuckDB oracle for [[acf]] over an events-style table —
    * same spine zero-fill (the hourly_gapfill fragment), same lag list,
    * HUGEINT sums for the decimal exactness, identical IEEE tail. */
  def acfSql(table: String, tsCol: String, keyCol: String,
      lags: Seq[Int]): String = {
    val lagSel = lags.map(l =>
      s"lag(x, $l) OVER (PARTITION BY k ORDER BY h) AS y$l").mkString(", ")
    val moments = lags.flatMap { l =>
      Seq(
        s"CAST(COUNT(y$l) AS BIGINT) AS n$l",
        s"SUM(CASE WHEN y$l IS NOT NULL THEN CAST(x AS HUGEINT) END) AS sx$l",
        s"SUM(CAST(y$l AS HUGEINT)) AS sy$l",
        s"SUM(CAST(x AS HUGEINT) * y$l) AS sxy$l",
        s"SUM(CASE WHEN y$l IS NOT NULL THEN CAST(x AS HUGEINT) * x END) AS sxx$l",
        s"SUM(CAST(y$l AS HUGEINT) * y$l) AS syy$l")
    }.mkString(", ")
    val rows = lags.map { l =>
      val num = s"n$l*sxy$l - sx$l*sy$l"
      val dx = s"n$l*sxx$l - sx$l*sx$l"
      val dy = s"n$l*syy$l - sy$l*sy$l"
      s"""SELECT k AS $keyCol, CAST($l AS BIGINT) AS lag, n$l AS n_pairs,
         | CASE WHEN ($dx) = 0 OR ($dy) = 0 THEN NULL
         |  ELSE CAST(CAST($num AS VARCHAR) AS DOUBLE)
         |   / sqrt(CAST(CAST($dx AS VARCHAR) AS DOUBLE)
         |          * CAST(CAST($dy AS VARCHAR) AS DOUBLE)) END AS acf
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH hourly AS (
       | SELECT date_trunc('hour', $tsCol) h, $keyCol k, COUNT(*) n
       | FROM $table GROUP BY 1, 2),
       |bounds AS (SELECT MIN(h) lo, MAX(h) hi FROM hourly),
       |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
       |grid AS (SELECT s.h, t.k
       |         FROM spine s CROSS JOIN (SELECT DISTINCT k FROM hourly) t),
       |dense AS (SELECT g.k, g.h, COALESCE(hh.n, 0) AS x
       |          FROM grid g LEFT JOIN hourly hh ON g.h = hh.h AND g.k = hh.k),
       |lagged AS (SELECT k, x, $lagSel FROM dense),
       |m AS (SELECT k, $moments FROM lagged GROUP BY k)
       |SELECT * FROM (
       |$rows)
       |ORDER BY $keyCol, lag""".stripMargin
  }

  /** Cross-correlation between TWO keys' hourly count series at signed
    * lags — the pairwise completion of [[acf]] (self-similarity says "is
    * there a rhythm"; cross-correlation says "does A LEAD B, and by how
    * many hours" — clicks leading purchases, scrape volume leading
    * ingest volume). Positive lag l pairs x_t (key a) with y_{t-l}
    * (key b): a peak at l > 0 means B LEADS A by l hours.
    *
    * Same contract as [[acf]]: dense-spine zero-fill, ONE fused window
    * pass emitting every signed-lag column (`lag` for l ≥ 0, `lead` for
    * l < 0 — both engines share those two verbs; negative offsets
    * don't), exact BIGINT products / DECIMAL accumulation, IEEE tail
    * over VARCHAR-mediated doubles, everything after the hourly rollup
    * hours-bounded. */
  def xcorr(hourly: DataFrame, keyCol: String, hourCol: String,
      cntCol: String, a: String, b: String, maxLag: Int): DataFrame = {
    require(a != b, s"need two distinct keys, got '$a' twice")
    require(maxLag >= 0, s"need maxLag >= 0, got $maxLag")
    val dense = denseHourly(
      hourly.filter(col(keyCol).isin(a, b)), keyCol, hourCol, cntCol)
    val side = dense.groupBy(col(hourCol))
      .agg(
        sum(when(col(keyCol) === a, col("x")).otherwise(0L)).as("xa"),
        sum(when(col(keyCol) === b, col("x")).otherwise(0L)).as("xb"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(hourCol))
    val lags = (-maxLag to maxLag)
    val lagCols = lags.map { l =>
      val c = if (l >= 0) lag(col("xb"), l).over(w)
              else lead(col("xb"), -l).over(w)
      c.as(s"y_${if (l < 0) "m" + (-l) else l.toString}")
    }
    // hours-bounded frame: the single-task global-order window is the
    // documented acceptable shape here (the data-sized form is Ranking's)
    val framed = side.select(col("xa") +: lagCols: _*)
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    def nm(l: Int) = if (l < 0) "m" + (-l) else l.toString
    val sums = lags.flatMap { l =>
      val y = col(s"y_${nm(l)}")
      Seq(
        count(y).as(s"n_${nm(l)}"),
        sum(when(y.isNotNull, dec(col("xa")))).as(s"sx_${nm(l)}"),
        sum(dec(y)).as(s"sy_${nm(l)}"),
        sum(dec(col("xa") * y)).as(s"sxy_${nm(l)}"),
        sum(when(y.isNotNull, dec(col("xa") * col("xa")))).as(s"sxx_${nm(l)}"),
        sum(dec(y * y)).as(s"syy_${nm(l)}"))
    }
    val agg = framed.agg(sums.head, sums.tail: _*)
    def vmd(c: Column) = c.cast("string").cast(DoubleType)
    val rows = lags.map { l =>
      val n = col(s"n_${nm(l)}")
      val num = n * col(s"sxy_${nm(l)}") - col(s"sx_${nm(l)}") * col(s"sy_${nm(l)}")
      val dx = n * col(s"sxx_${nm(l)}") - col(s"sx_${nm(l)}") * col(s"sx_${nm(l)}")
      val dy = n * col(s"syy_${nm(l)}") - col(s"sy_${nm(l)}") * col(s"sy_${nm(l)}")
      struct(lit(l).cast("long").as("lag"), n.as("n_pairs"),
        when(dx === 0 || dy === 0, lit(null).cast(DoubleType))
          .otherwise(vmd(num) / sqrt(vmd(dx) * vmd(dy))).as("xcorr"))
    }
    agg.select(explode(array(rows: _*)).as("r"))
      .select(lit(a).as("key_a"), lit(b).as("key_b"),
        col("r.lag").as("lag"), col("r.n_pairs").as("n_pairs"),
        col("r.xcorr").as("xcorr"))
  }

  /** Generated DuckDB oracle for [[xcorr]] (same spine, same lag/lead
    * split, HUGEINT sums, identical IEEE tail). */
  def xcorrSql(table: String, tsCol: String, keyCol: String,
      a: String, b: String, maxLag: Int): String = {
    val lags = (-maxLag to maxLag)
    def nm(l: Int) = if (l < 0) "m" + (-l) else l.toString
    val lagSel = lags.map { l =>
      val e = if (l >= 0) s"lag(xb, $l) OVER (ORDER BY h)"
              else s"lead(xb, ${-l}) OVER (ORDER BY h)"
      s"$e AS y_${nm(l)}"
    }.mkString(", ")
    val moments = lags.flatMap { l =>
      val y = s"y_${nm(l)}"
      Seq(
        s"CAST(COUNT($y) AS BIGINT) AS n_${nm(l)}",
        s"SUM(CASE WHEN $y IS NOT NULL THEN CAST(xa AS HUGEINT) END) AS sx_${nm(l)}",
        s"SUM(CAST($y AS HUGEINT)) AS sy_${nm(l)}",
        s"SUM(CAST(xa AS HUGEINT) * $y) AS sxy_${nm(l)}",
        s"SUM(CASE WHEN $y IS NOT NULL THEN CAST(xa AS HUGEINT) * xa END) AS sxx_${nm(l)}",
        s"SUM(CAST($y AS HUGEINT) * $y) AS syy_${nm(l)}")
    }.mkString(", ")
    val rows = lags.map { l =>
      val n = s"n_${nm(l)}"
      val num = s"$n*sxy_${nm(l)} - sx_${nm(l)}*sy_${nm(l)}"
      val dx = s"$n*sxx_${nm(l)} - sx_${nm(l)}*sx_${nm(l)}"
      val dy = s"$n*syy_${nm(l)} - sy_${nm(l)}*sy_${nm(l)}"
      s"""SELECT '$a' AS key_a, '$b' AS key_b, CAST($l AS BIGINT) AS lag,
         | $n AS n_pairs,
         | CASE WHEN ($dx) = 0 OR ($dy) = 0 THEN NULL
         |  ELSE CAST(CAST($num AS VARCHAR) AS DOUBLE)
         |   / sqrt(CAST(CAST($dx AS VARCHAR) AS DOUBLE)
         |          * CAST(CAST($dy AS VARCHAR) AS DOUBLE)) END AS xcorr
         |FROM m""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH hourly AS (
       | SELECT date_trunc('hour', $tsCol) h, $keyCol k, COUNT(*) n
       | FROM $table WHERE $keyCol IN ('$a', '$b') GROUP BY 1, 2),
       |bounds AS (SELECT MIN(h) lo, MAX(h) hi FROM hourly),
       |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
       |grid AS (SELECT s.h, t.k
       |         FROM spine s CROSS JOIN (SELECT DISTINCT k FROM hourly) t),
       |dense AS (SELECT g.k, g.h, COALESCE(hh.n, 0) AS x
       |          FROM grid g LEFT JOIN hourly hh ON g.h = hh.h AND g.k = hh.k),
       |side AS (SELECT h,
       |         CAST(SUM(CASE WHEN k = '$a' THEN x ELSE 0 END) AS BIGINT) xa,
       |         CAST(SUM(CASE WHEN k = '$b' THEN x ELSE 0 END) AS BIGINT) xb
       |        FROM dense GROUP BY h),
       |lagged AS (SELECT xa, $lagSel FROM side),
       |m AS (SELECT $moments FROM lagged)
       |SELECT * FROM (
       |$rows)
       |ORDER BY lag""".stripMargin
  }

  /** Single change-point locator over an hourly count series — the
    * monitor family's WHERE leg: CUSUM ([[cusum|cusumFromHourly]]) says a
    * level shift HAPPENED; this says WHEN, as the binary-segmentation
    * argmax every changepoint stack starts with. For each key the split
    * t* maximizes the cleared-denominator deviation |T·S_t − t·S| (the
    * exact integer form of |mean_before(t) − global mean| · t·T), with
    * the smallest-t tie-break fixing determinism.
    *
    * Zero-filled on the dense hour spine ([[denseHourly]]) — a missing
    * hour is a rate of zero, not an absent sample, exactly the shift a
    * dying feed shows. All decisions BIGINT-exact: products need
    * T·S < 2^63 (at 720 hourly buckets that is ~1.2e16 rows — beyond
    * 100 TB of events); the two emitted means are single IEEE divisions
    * of exact operands, and `flagged` compares d·flagDen > flagNum·T·S
    * in integers (default 1/4 of the theoretical max).
    *
    * SCALE: everything after the caller's hourly rollup is
    * hours×keys-bounded — ONE fused window pass (position + prefix over
    * one spec), a key-sized total rollup broadcast back, and a struct
    * argmax on the reduced frame (SortAggregate there is the documented
    * acceptable shape). */
  def changepointFromHourly(hourly: DataFrame, keyCol: String,
      hourCol: String, cntCol: String,
      flagNum: Long = 1L, flagDen: Long = 4L): DataFrame = {
    require(flagNum >= 0L && flagDen >= 1L,
      s"bad flag threshold $flagNum/$flagDen")
    val dense = denseHourly(hourly, keyCol, hourCol, cntCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(hourCol))
    val pre = dense.select(col(keyCol), col(hourCol),
      row_number().over(w).cast("long").as("t"),
      sum(col("x")).over(w).as("st"))
    val tot = pre.groupBy(col(keyCol))
      .agg(max(col("t")).as("bigT"), max(col("st")).as("s"))
    val d = abs(col("bigT") * col("st") - col("t") * col("s"))
    val scored = pre.join(broadcast(tot), Seq(keyCol))
      .filter(col("t") < col("bigT") || col("bigT") === 1L)
      .select(col(keyCol), col("bigT"), col("s"),
        struct(d.as("d"), (-col("t")).as("negt"), col("t").as("t"),
          col(hourCol).as("h"), col("st").as("st")).as("cand"))
    scored.groupBy(col(keyCol))
      .agg(max(col("bigT")).as("bigT"), max(col("s")).as("s"),
        max(col("cand")).as("m"))
      .select(
        col(keyCol), col("bigT").as("n_hours"), col("s").as("total"),
        col("m.t").as("split_t"),
        date_format(col("m.h"), "yyyy-MM-dd HH:mm:ss").as("split_hour"),
        col("m.d").as("d_max"),
        (col("m.st").cast(DoubleType) / col("m.t").cast(DoubleType))
          .as("mean_before"),
        when(col("bigT") === col("m.t"), lit(null).cast(DoubleType))
          .otherwise((col("s") - col("m.st")).cast(DoubleType) /
            (col("bigT") - col("m.t")).cast(DoubleType)).as("mean_after"),
        (col("m.d") * flagDen > lit(flagNum) * col("bigT") * col("s"))
          .as("flagged"))
  }

  /** Generated DuckDB oracle for [[changepointFromHourly]] over an
    * events-style table (same dense spine, same integer argmax with the
    * t-ascending tie-break, same IEEE divisions). */
  def changepointSql(table: String, tsCol: String, keyCol: String,
      flagNum: Long = 1L, flagDen: Long = 4L): String =
    s"""WITH hourly AS (
       | SELECT date_trunc('hour', $tsCol) h, $keyCol k, COUNT(*) n
       | FROM $table GROUP BY 1, 2),
       |bounds AS (SELECT MIN(h) lo, MAX(h) hi FROM hourly),
       |spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h FROM bounds),
       |grid AS (SELECT s.h, t.k
       |         FROM spine s CROSS JOIN (SELECT DISTINCT k FROM hourly) t),
       |dense AS (SELECT g.k, g.h, COALESCE(hh.n, 0) AS x
       |          FROM grid g LEFT JOIN hourly hh ON g.h = hh.h AND g.k = hh.k),
       |pre AS (SELECT k, h,
       |        CAST(row_number() OVER (PARTITION BY k ORDER BY h) AS BIGINT) t,
       |        CAST(SUM(x) OVER (PARTITION BY k ORDER BY h
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) st
       |        FROM dense),
       |tot AS (SELECT k, MAX(t) bigT, MAX(st) s FROM pre GROUP BY k),
       |j AS (SELECT p.k, p.h, p.t, p.st, o.bigT, o.s,
       |       abs(o.bigT*p.st - p.t*o.s) AS d
       |      FROM pre p JOIN tot o ON p.k = o.k
       |      WHERE p.t < o.bigT OR o.bigT = 1),
       |best AS (SELECT *, row_number() OVER (PARTITION BY k ORDER BY d DESC, t ASC) rn
       |         FROM j)
       |SELECT k AS $keyCol, bigT AS n_hours, s AS total,
       | t AS split_t, strftime(h, '%Y-%m-%d %H:%M:%S') AS split_hour,
       | d AS d_max,
       | CAST(st AS DOUBLE) / CAST(t AS DOUBLE) AS mean_before,
       | CASE WHEN bigT = t THEN NULL
       |  ELSE CAST(s - st AS DOUBLE) / CAST(bigT - t AS DOUBLE) END AS mean_after,
       | (d * $flagDen > $flagNum * bigT * s) AS flagged
       |FROM best WHERE rn = 1 ORDER BY $keyCol""".stripMargin

  /** Concentration audit of a categorical key — the corpus-BALANCE gate
    * beside [[corpusStats-style profiling|tableProfile]]: Gini
    * coefficient and Herfindahl–Hirschman index of the per-key row
    * distribution. A training mix that believes it is source-diverse but
    * carries G≈0.8 is dominated by a few sources — this makes that one
    * number, exactly.
    *
    * Exactness: per-key counts are BIGINT; Gini over ascending
    * (count, key) ranks uses G = (2·Σ i·c_i − (n+1)·Σc) / (n·Σc) — ties
    * commute in the sum, so the key tie-break fixes determinism without
    * affecting the value; HHI = Σc² / (Σc)². Both emitted as exact
    * num/den BIGINT pairs PLUS the IEEE ratio over VARCHAR-mediated
    * doubles (the corrMatrix route).
    *
    * SCALE: one map-side-combined rollup to the key-bounded frame, then
    * a single-task rank window EXPLICITLY bounded by the key domain (a
    * few thousand sources at most — never data-sized; the data-sized
    * global-rank form is [[graft.operators.Ranking]]'s job), then one
    * single-row aggregate. */
  def concentration(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c"), col(keyCol))
    val ranked = counts.select(col("c"),
      row_number().over(w).cast("long").as("i"))
    def dec(c: Column) = c.cast(DecimalType(38, 0))
    val s = ranked.agg(count(lit(1)).as("n"), sum(dec(col("c"))).as("t"),
      sum(dec(col("i") * col("c"))).as("sic"),
      sum(dec(col("c") * col("c"))).as("scc"))
    def vmd(c: Column) = c.cast("string").cast(DoubleType)
    val gnum = lit(2) * col("sic") - (col("n") + 1) * col("t")
    val gden = col("n") * col("t")
    val hden = col("t") * col("t")
    s.select(
      col("n").as("n_keys"), col("t").cast("long").as("n_rows"),
      gnum.cast("long").as("gini_num"), gden.cast("long").as("gini_den"),
      when(gden === 0, lit(null).cast(DoubleType))
        .otherwise(vmd(gnum) / vmd(gden)).as("gini"),
      col("scc").cast("long").as("hhi_num"),
      hden.cast("long").as("hhi_den"),
      when(hden === 0, lit(null).cast(DoubleType))
        .otherwise(vmd(col("scc")) / vmd(hden)).as("hhi"))
  }

  /** Generated DuckDB oracle for [[concentration]] (same rank order,
    * HUGEINT sums, same num/den emission and IEEE ratios). */
  def concentrationSql(table: String, keyCol: String): String =
    s"""WITH c AS (SELECT $keyCol, COUNT(*) c FROM $table GROUP BY 1),
       |r AS (SELECT c, row_number() OVER (ORDER BY c, $keyCol) i FROM c),
       |s AS (SELECT CAST(COUNT(*) AS BIGINT) n, SUM(CAST(c AS HUGEINT)) t,
       |             SUM(CAST(i AS HUGEINT) * c) sic,
       |             SUM(CAST(c AS HUGEINT) * c) scc FROM r)
       |SELECT n AS n_keys, CAST(t AS BIGINT) AS n_rows,
       | CAST(2*sic - (n+1)*t AS BIGINT) AS gini_num,
       | CAST(n*t AS BIGINT) AS gini_den,
       | CASE WHEN n*t = 0 THEN NULL
       |  ELSE CAST(CAST(2*sic - (n+1)*t AS VARCHAR) AS DOUBLE)
       |       / CAST(CAST(n*t AS VARCHAR) AS DOUBLE) END AS gini,
       | CAST(scc AS BIGINT) AS hhi_num, CAST(t*t AS BIGINT) AS hhi_den,
       | CASE WHEN t*t = 0 THEN NULL
       |  ELSE CAST(CAST(scc AS VARCHAR) AS DOUBLE)
       |       / CAST(CAST(t*t AS VARCHAR) AS DOUBLE) END AS hhi
       |FROM s""".stripMargin
}
