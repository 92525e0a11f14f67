package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import org.apache.spark.sql.types.StructType

/** The reference's hourly ingestion cadence (DAG
  * `schedule_interval="@hourly"`) re-expressed as Structured Streaming
  * (SURVEY.md §2 #13/#15/#16): the SAME windowed-rollup transform serves
  * the batch query (`hourly_rollup`) and the stream, which is the point —
  * an hourly Airflow batch becomes a continuously-running incremental job
  * with watermark-bounded state instead of a cron fan-out.
  *
  * Scale notes: windowed aggregation state is bounded by the watermark
  * (2 h of per-(window, event_type) partial aggregates); the session
  * tracker keys state by user so it distributes across executors, and
  * event-time timeout GCs idle users — no unbounded state at 100 TB/day.
  */
object EventsStream {

  /** File-based events stream: same schema as the batch `events` table,
    * new parquet files picked up incrementally (the streaming analog of
    * the reference's hourly staged drops). */
  def fromParquetDir(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** One-shot incremental catch-up over a staged lake — the batch-cadence
    * analog of the reference's S3KeySensor-gated hourly DAG (reference:
    * dags/rust_twitter_steam_pipeline.py:66,217-236 — every run waits for
    * the hour's key, then loads exactly that slice). `Trigger.AvailableNow`
    * drains everything that exists at start (in rate-limited micro-batches)
    * and STOPS, so a cron/Airflow task can invoke it on the old cadence;
    * the stream checkpoint replaces the sensor + interval bookkeeping:
    * newly-arrived partition files are discovered, processed exactly once,
    * and never reprocessed, and a crashed run resumes idempotently from
    * the checkpoint. This is the migration path for the reference's hourly
    * batch users who aren't ready for an always-on stream. */
  def catchupOnce(spark: SparkSession, path: String, schema: StructType,
      checkpoint: String)(process: (DataFrame, Long) => Unit): Unit = {
    val q = fromParquetDir(spark, path, schema)
      .writeStream
      .foreachBatch((batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        process(batch.toDF(), id))
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
  }

  /** Watermarked tumbling-hour rollup — identical logic to the batch
    * `hourly_rollup` query (shared transform). Append mode emits each hour
    * once its watermark passes. */
  def hourlyRollup(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    graft.SparkEntry.hourlyRollupTransform(events.withWatermark("ts", watermark))

  /** Streaming face of the corpus-drift monitor — the spikesFromHourly
    * playbook applied to [[graft.operators.Quality.drift]]: the hashed
    * token-bucket counts (identical stream to the batch operator's, via
    * `Quality.tokenBuckets`) roll up as a streaming aggregation whose
    * state is buckets×sources-sized regardless of feed volume; the sink
    * table accumulates them, and `Quality.driftFromCounts` scores the
    * accumulated frame without re-touching raw documents. Streaming ==
    * batch TV distance is spec-pinned in StreamingSpec. */
  def driftCounts(docs: DataFrame, sourceCol: String, textCol: String,
      buckets: Int = 4096): DataFrame =
    graft.operators.Quality.tokenBuckets(docs, sourceCol, textCol, buckets)
      .groupBy(col(sourceCol), col("__b"))
      .agg(count(lit(1)).as("n_tok"))

  /** Streaming face of the KS monitor's state — the (group, value)
    * distinct rollup [[graft.operators.Quality.ksFromCounts]] scores:
    * a streaming aggregation whose state is bounded by the DISTINCT
    * (group, value) domain, NOT the feed volume. That bound is the
    * deployment contract: KS over a continuous value column needs an
    * upstream quantization (the caller picks the grid — the statistic is
    * then exact ON that grid); an unbounded-cardinality id column does
    * not belong under KS at all. Streaming == batch `ks` is spec-pinned
    * bitwise in StreamingSpec. */
  def valueCounts(rows: DataFrame, groupCol: String,
      valueCol: String): DataFrame =
    rows.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("n"))

  /** Streaming face of the bottom-k quantile sketch — the
    * accumulating-sink design KS/MWU/PSI/exact quantiles share, with
    * sink state STRICTLY bounded: each micro-batch appends its own
    * per-key sketch row (exactly k pairs + a counter), so the sink
    * holds batches × keys bounded rows and is compactible at any time
    * (re-fold into one row per key) with ZERO loss — bottom-k merge is
    * an exact semilattice, so [[sketchFromSink]]'s fold equals the
    * one-shot batch sketch BITWISE whatever the batch boundaries
    * (pinned in StreamingSpec). Use as the foreachBatch body over the
    * arriving rows; unlike the (group, value) counts sink, a continuous
    * value domain needs NO upstream quantization grid here. */
  def sketchBatch(batch: DataFrame, keyCol: String, valueCol: String,
      idCol: String, k: Int): DataFrame =
    graft.operators.Quantiles.sketchByKey(batch, keyCol, valueCol, idCol, k)

  /** Score the accumulated per-batch sketch sink: one merged sketch per
    * key (then estimate with [[graft.operators.Quantiles.sketchQuantile]]). */
  def sketchFromSink(sink: DataFrame, keyCol: String, k: Int): DataFrame =
    graft.operators.Quantiles.sketchMerge(sink, keyCol, "sketch", k)

  /** Streaming face of the OHLC bar aggregate (`events_ohlc`): a
    * watermarked tumbling-hour rollup whose positional endpoints are
    * RE-SUM-SAFE — open/close carry their (ts_us, event_id) ORDER KEYS
    * via min_by/max_by, so a sink holding several partial rows per
    * (type, hour) (micro-batch appends, a backfill landing beside live
    * data) recombines to exactly the batch bar: sums/extremes combine
    * directly, and the endpoint columns let [[ohlcFromSink]] pick the
    * globally-first/last partial. State is hours × types within the
    * watermark — the hourly-rollup bound. Streamed == batch bars are
    * pinned bitwise in StreamingSpec. */
  def ohlcState(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .filter(col("value").isNotNull)
      .withWatermark("ts", watermark)
      .groupBy(col("event_type"), window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        min_by(struct(unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("value")),
          struct(col("ts"), col("event_id"))).as("__o"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(struct(unix_micros(col("ts")).as("ts_us"),
            col("event_id"), col("value")),
          struct(col("ts"), col("event_id"))).as("__c"))
      .select(col("event_type"),
        date_format(col("window").getField("start"),
          "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("n"),
        col("__o").getField("ts_us").as("open_ts_us"),
        col("__o").getField("event_id").as("open_id"),
        col("__o").getField("value").as("open"),
        col("high"), col("low"),
        col("__c").getField("ts_us").as("close_ts_us"),
        col("__c").getField("event_id").as("close_id"),
        col("__c").getField("value").as("close"))

  /** The scoring half of the OHLC seam: recombine an accumulated sink's
    * partial rows into final bars (a sink of finals is a fixed point —
    * the MonitorSeam re-sum invariant). Values pass through untouched,
    * so streamed bars equal batch bars bitwise. */
  def ohlcFromSink(sink: DataFrame): DataFrame =
    sink.groupBy(col("event_type"), col("hour_start"))
      .agg(
        sum(col("n")).as("n"),
        min_by(col("open"),
          struct(col("open_ts_us"), col("open_id"))).as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        max_by(col("close"),
          struct(col("close_ts_us"), col("close_id"))).as("close"))

  case class TwapEvent(event_type: String, ts_us: Long, event_id: Long,
    value: Double)
  case class TwapObs(event_type: String, value: Double, dt_us: Long)
  case class TwapLast(ts_us: Long, event_id: Long, value: Double)

  /** Streaming face of the TWAP aggregate (`events_twap`): the
    * time-weight of an observation is the gap to its SUCCESSOR, so a
    * contribution finalizes only when the next event of its type
    * arrives — per-type flatMapGroupsWithState carries exactly ONE row
    * of state (the latest observation) and emits each finalized
    * (value, holding-time) pair once, which makes the contribution sink
    * append-only and re-sum-safe by construction. The in-flight last
    * observation carries no weight yet — the same convention as the
    * batch query, whose final observation per type never gets one.
    * CONTRACT: per-type event-time order across micro-batches (pair
    * with upstream watermark ordering/dedup); within a batch, rows sort
    * by (ts_us, event_id) — the batch query's exact tie-break.
    * Streamed == batch (n_obs, total_dt_us, twap) is pinned bitwise in
    * StreamingSpec via [[twapFromContributions]]. */
  def twapContributions(events: Dataset[TwapEvent]): Dataset[TwapObs] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (k: String, it: Iterator[TwapEvent], state: GroupState[TwapLast]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.ts_us, e.event_id))
          val chain = state.getOption.map(l =>
            TwapEvent(k, l.ts_us, l.event_id, l.value)).toIndexedSeq ++ sorted
          val out = chain.iterator.zip(chain.iterator.drop(1)).map {
            case (a, b) => TwapObs(k, a.value, b.ts_us - a.ts_us)
          }.toIndexedSeq
          chain.lastOption.foreach(e =>
            state.update(TwapLast(e.ts_us, e.event_id, e.value)))
          out.iterator
      }
  }

  /** The scoring half of the TWAP seam: aggregate an accumulated
    * contribution sink — per-pair products enter as order-independent
    * exact decimals (the batch query's §6 parity form), so the score
    * equals the batch TWAP bitwise however the contributions were
    * micro-batched. */
  def twapFromContributions(sink: DataFrame): DataFrame =
    sink.groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("dt_us")).as("total_dt_us"),
        (sum((col("value") * col("dt_us").cast(
            org.apache.spark.sql.types.DoubleType))
            .cast(org.apache.spark.sql.types.DecimalType(28, 6)))
          .cast(org.apache.spark.sql.types.DoubleType) /
          sum(col("dt_us")).cast(org.apache.spark.sql.types.DoubleType))
          .as("twap"))

  /** Streaming exact dedup: drop re-delivered events by key within the
    * watermark horizon (`dropDuplicatesWithinWatermark`) — the streaming
    * face of `dedup_exact`, with state BOUNDED by the watermark instead of
    * growing with the stream (the non-negotiable property at 100 TB/day). */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermarkCol: String, delay: String): DataFrame =
    events
      .withWatermark(watermarkCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** The reference's idempotent hourly warehouse load as a streaming sink:
    * each micro-batch merges into the accumulated state with SCD-1
    * latest-wins semantics (`Star.upsertDoUpdate`) — re-delivered batches
    * are harmless, matching `ON CONFLICT DO UPDATE`. The in-memory `state`
    * var stands in for the warehouse table; on a real deployment the
    * foreachBatch body is a MERGE into a transactional table format. */
  class UpsertSink(keys: Seq[String], latestBy: Seq[String]) extends Serializable {
    @volatile private var state: Option[DataFrame] = None

    def current: Option[DataFrame] = state

    def write(batch: DataFrame, batchId: Long): Unit = synchronized {
      import org.apache.spark.sql.functions.col
      val merged = state match {
        case Some(existing) =>
          graft.operators.Star.upsertDoUpdate(
            existing, batch, keys, latestBy.map(col))
        case None =>
          import graft.operators.Cleaning.CleaningOps
          batch.dedupKeepFirst(keys, latestBy.map(c => col(c).desc))
      }
      // materialize so the merged plan doesn't re-read a reused batch source
      state = Some(merged.localCheckpoint(eager = true))
    }
  }

  /** Watermarked stream-stream attribution join: each purchase matched to
    * the same user's clicks in `[click_ts, click_ts + window)` — the
    * STREAMING face of the batch `Temporal.intervalJoin` (identical
    * semantics; parity is spec-pinned by running this very function over
    * batch frames, where the watermark is a no-op).
    *
    * Why the watermarks on BOTH sides: they are what lets Spark bound the
    * join state. The time-range condition plus the click watermark tells
    * the engine a buffered click is dead once the watermark passes
    * click_ts + window, and vice versa for purchases — so state is
    * O(arrival rate x window), not O(stream length). Without them a
    * stream-stream inner join must buffer both streams forever, the
    * unbounded-state trap at 100 TB/day. */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
      userCol: String = "user_id", clickTs: String = "click_ts",
      purchaseTs: String = "purchase_ts",
      window: String = "30 minutes", delay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark(clickTs, delay)
    val p = purchases.withWatermark(purchaseTs, delay)
      .withColumnRenamed(userCol, "__p_user")
    p.join(c,
        col("__p_user") === col(userCol) &&
          col(purchaseTs) >= col(clickTs) &&
          col(purchaseTs) < col(clickTs) + expr(s"INTERVAL $window"))
      .drop("__p_user")
  }

  /** Streaming dedup with BOUNDED state: `dropDuplicatesWithinWatermark`
    * holds a key's fingerprint only until the watermark passes its event
    * time, where the exact-dedup face (`dedupedStream`) must keep every
    * key seen FOREVER — the difference between O(keys in the replay
    * horizon) and O(stream lifetime) state at 100 TB/day. The contract
    * traded for that bound, spec-pinned: duplicates arriving INSIDE the
    * horizon are dropped; a duplicate arriving after the watermark
    * passed its original is emitted AGAIN (late replays re-admit — the
    * downstream idempotent sink is still required, it just sees
    * horizon-bounded duplication instead of unbounded). */
  def dedupWithinWatermark(events: DataFrame, tsCol: String = "ts",
      keyCols: Seq[String] = Seq("event_id"),
      delay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** LEFT OUTER stream-stream attribution: every purchase is emitted —
    * joined to its in-window clicks when they exist, and exactly once
    * with NULL click columns when the watermark PROVES none can arrive
    * (the "conversion with no known touchpoint" rows an attribution
    * report is incomplete without). The outer side adds a semantics the
    * inner join doesn't have: a NULL-padded row cannot be emitted on
    * arrival (a matching click might still come), only on TIMEOUT — once
    * the click watermark passes the end of the purchase's match
    * interval — so unmatched results trail the watermark by design,
    * they are not late, and a consumer must not read their absence
    * mid-stream as "no conversion gap". Same watermark-bounded state as
    * the inner join: O(arrival rate × window), never O(stream). */
  def attributionJoinOuter(clicks: DataFrame, purchases: DataFrame,
      userCol: String = "user_id", clickTs: String = "click_ts",
      purchaseTs: String = "purchase_ts",
      window: String = "30 minutes", delay: String = "10 minutes"): DataFrame = {
    val c = clicks.withWatermark(clickTs, delay)
    val p = purchases.withWatermark(purchaseTs, delay)
      .withColumnRenamed(userCol, "__p_user")
    p.join(c,
        col("__p_user") === col(userCol) &&
          col(purchaseTs) >= col(clickTs) &&
          col(purchaseTs) < col(clickTs) + expr(s"INTERVAL $window"),
        "leftOuter")
      .withColumnRenamed("__p_user", "p_user_id")
  }

  /** Stream-static decontamination: documents arriving on a stream are
    * dropped when they share any bottom-k fingerprint hash with a STATIC
    * benchmark corpus — ingest-time eval-set hygiene, so contaminated
    * documents never land in the lake at all (the batch
    * `Dedup.decontaminate` is the audit over what already landed).
    *
    * Shape: the benchmark fingerprint set collapses to ONE row holding the
    * hash set (benchmarks are thousands of docs — dim-sized by
    * definition), broadcast into every micro-batch; each document's
    * fingerprint is a per-row projection and the check is an
    * `arrays_overlap` filter. No stream-side aggregation, no state, append
    * mode — the micro-batch cost is a scan. */
  def decontaminateStream(docs: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 8): DataFrame = {
    import graft.functions.{shingleBottomK, wsTokens}
    val fp = shingleBottomK(wsTokens(col(textCol)), shingleN, k)
    val benchArr = graft.operators.TextAnalysis
      .fingerprint(benchmark, idCol, textCol, shingleN, k)
      .agg(collect_set(col("sh_hash")).as("__bench"))
    docs
      .withColumn("__fp", fp)
      .crossJoin(broadcast(benchArr))
      .filter(!arrays_overlap(col("__fp"), col("__bench")))
      .drop("__fp", "__bench")
  }

  /** Ingest-time quality gate: each arriving document is scored with the
    * same zero-shuffle quality projection the batch operators use and kept
    * only at/above a threshold computed OFFLINE from a static reference
    * corpus (the batch percentile job — thresholds move slowly, so
    * pipelines pin one per run). The score is a pure per-row projection
    * and the threshold ONE broadcast scalar: no stream-side aggregation,
    * no state, append mode — micro-batch cost is a scan. Parity with the
    * batch `quality_filter` gate is spec-pinned. */
  def qualityGateStream(docs: DataFrame, reference: DataFrame,
      textCol: String, pct: Double = 0.25): DataFrame = {
    // the offline threshold job rides the DISTRIBUTED exact-quantile
    // machinery (graft.operators.Quantiles.exact — the quality_filter
    // posture): bitwise the buffered-`percentile` statistic with no
    // reference-corpus-sized aggregation buffer; it runs EAGERLY here
    // (batch side), so the streaming plan sees one broadcast scalar
    val thr = graft.operators.Quantiles.exact(
      graft.operators.TextAnalysis.quality(reference, textCol),
      "quality_score", Seq("__thr" -> pct)).select("__thr")
    graft.operators.TextAnalysis.quality(docs, textCol)
      .crossJoin(broadcast(thr))
      .filter(col("quality_score") >= col("__thr"))
      .drop("__thr")
  }

  // ---- stateful sessionization (#16) ----

  /** Minimal event for session tracking (event-time in epoch millis). */
  case class SessionEvent(user_id: Long, ts_ms: Long)

  /** Per-user open-session state. */
  case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long)

  /** A closed (gap-expired) session. */
  case class ClosedSession(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /** Gap-based session tracker over `flatMapGroupsWithState`: state is one
    * small OpenSession per active user; a session closes (and is emitted)
    * when a later event arrives more than `gapMs` after the last one.
    * Works identically over a stream (incremental state) and a batch
    * (state starts empty, all groups processed once). */
  def sessionTracker(events: Dataset[SessionEvent], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, evs: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          val sorted = evs.toSeq.sortBy(_.ts_ms)
          var closed = List.empty[ClosedSession]
          var open = state.getOption
          sorted.foreach { e =>
            open = open match {
              case Some(s) if e.ts_ms - s.last_ms > gapMs =>
                closed ::= ClosedSession(user, s.start_ms, s.last_ms, s.n_events)
                Some(OpenSession(e.ts_ms, e.ts_ms, 1L))
              case Some(s) =>
                Some(s.copy(last_ms = e.ts_ms, n_events = s.n_events + 1L))
              case None =>
                Some(OpenSession(e.ts_ms, e.ts_ms, 1L))
            }
          }
          open.foreach(state.update)
          closed.reverse.iterator
      }
  }

  /** The same gap-session logic on `transformWithState` — Spark 4's
    * successor to `flatMapGroupsWithState`: state lives in named, typed
    * handles (`ValueState`) instead of one opaque blob, can carry a TTL,
    * and runs on the RocksDB state store (the disk-backed store that keeps
    * huge key spaces out of executor heap — the property that matters when
    * the tracker holds one entry per active user at 100 TB/day).
    * Semantics are spec-pinned identical to [[sessionTracker]]. */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[SessionEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var closed = List.empty[ClosedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        cur = cur match {
          case Some(s) if e.ts_ms - s.last_ms > gapMs =>
            closed ::= ClosedSession(user, s.start_ms, s.last_ms, s.n_events)
            Some(OpenSession(e.ts_ms, e.ts_ms, 1L))
          case Some(s) =>
            Some(s.copy(last_ms = e.ts_ms, n_events = s.n_events + 1L))
          case None =>
            Some(OpenSession(e.ts_ms, e.ts_ms, 1L))
        }
      }
      cur.foreach(open.update)
      closed.reverse.iterator
    }
  }

  def sessionTrackerTws(events: Dataset[SessionEvent], gapMs: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs), TimeMode.None(), OutputMode.Append())
  }

  /** A session event carrying a real event-time column (for watermarks). */
  case class TimedSessionEvent(user_id: Long, ts_ms: Long,
      event_time: java.sql.Timestamp)

  /** Timer-based session closing — the semantics [[sessionTracker]] and
    * [[SessionProcessor]] CANNOT express: their sessions only close when a
    * LATER event from the same user arrives, so an idle user's last
    * session never emits. Here every input (re)arms an event-time timer at
    * `last_ms + gapMs`; when the WATERMARK passes it, `handleExpiredTimer`
    * emits the session and clears the state — idle users close and their
    * state is GC'd without ever sending another event. This is the
    * unbounded-state fix that matters at 100 TB/day: state size tracks
    * ACTIVE users, not all users ever seen. */
  class TimeoutSessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedSessionEvent, ClosedSession] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[TimedSessionEvent],
        timerValues: TimerValues): Iterator[ClosedSession] = {
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var closed = List.empty[ClosedSession]
      var cur = if (open.exists()) Some(open.get()) else None
      sorted.foreach { e =>
        cur = cur match {
          case Some(s) if e.ts_ms - s.last_ms > gapMs =>
            closed ::= ClosedSession(user, s.start_ms, s.last_ms, s.n_events)
            Some(OpenSession(e.ts_ms, e.ts_ms, 1L))
          case Some(s) =>
            Some(s.copy(last_ms = e.ts_ms, n_events = s.n_events + 1L))
          case None =>
            Some(OpenSession(e.ts_ms, e.ts_ms, 1L))
        }
      }
      cur.foreach { s =>
        open.update(s)
        // re-arm: one live timer per user at the current gap deadline.
        // Materialize before deleting — mutating the timer store while
        // iterating its own iterator is fragile against store internals.
        val armed = getHandle.listTimers().map(_.asInstanceOf[Long]).toSeq
        armed.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(s.last_ms + gapMs)
      }
      closed.reverse.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[ClosedSession] =
      if (open.exists()) {
        val s = open.get()
        open.clear() // idle user: state GC'd, not retained forever
        Iterator.single(ClosedSession(user, s.start_ms, s.last_ms, s.n_events))
      } else Iterator.empty
  }

  /** Watermarked stream of [[TimedSessionEvent]] -> sessions closed either
    * by a later event OR by gap timeout once the watermark passes. */
  def sessionTrackerTimeout(events: Dataset[TimedSessionEvent], gapMs: Long,
      watermarkDelay: String = "0 seconds"): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("event_time", watermarkDelay)
      .as[TimedSessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new TimeoutSessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
