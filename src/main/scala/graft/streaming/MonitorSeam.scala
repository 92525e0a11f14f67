package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** The monitoring family's deployment seam, made first-class: every
  * monitor in the family (z-spike, MAD, EWMA, CUSUM, trend, seasonal,
  * TV/PSI/KS drift, freshness) deploys as the SAME two halves —
  *
  *   1. an ACCUMULATING ROLLUP: a watermarked streaming aggregation
  *      whose state is domain-bounded (hours × types for the volume
  *      monitors; buckets × sources for the drift legs), appended to a
  *      sink table, and
  *   2. a SCORER: a batch function over the accumulated sink that never
  *      re-touches raw rows — `spikesFromHourly`, `madFromHourly`,
  *      `cusumFromHourly`, `trendFromBuckets`, `ewmaFromBuckets`,
  *      `driftFromCounts`, `psiFromCounts`, `ksFromCounts`.
  *
  * Until round 11 each monitor hand-wired that seam. This helper names
  * it so NEW monitors (including user-defined ones) get the two
  * invariants for free:
  *
  *   - the sink's hour column round-trips as a formatted STRING
  *     (engine-portable) and comes back as a timestamp here;
  *   - the sink is RE-SUMMED per (key, hour) before scoring, so a sink
  *     holding several partial rows per pair (micro-batch appends, a
  *     backfill landing beside live data) scores identically to one
  *     holding finals — the property that makes the rollup safely
  *     APPEND-only at any scale.
  *
  * A scorer is any `(frame, keyCol, hourCol, cntCol) => flags` function —
  * exactly the shape of every `*FromHourly` above (extra parameters
  * partially applied), so built-ins and user monitors ride one seam.
  */
object MonitorSeam {

  /** The accumulating half for volume monitors: the watermarked
    * tumbling-hour rollup (shared with the batch `hourly_rollup` query).
    * Write its output stream to a sink table in append mode; score the
    * sink with [[scoreHourly]]. */
  def hourlyState(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    EventsStream.hourlyRollup(events, watermark)

  /** The scoring half: normalize an accumulated hourly sink (hour column
    * as string or timestamp), re-sum per (key, hour), and apply
    * `scorer`. Example — the built-in spike monitor over a sink:
    * {{{
    * MonitorSeam.scoreHourly(sink, "event_type", "hour_start", "n")(
    *   Quality.spikesFromHourly(_, _, _, _, trailing = 24, z = 3, minN = 8))
    * }}} */
  def scoreHourly(sink: DataFrame, keyCol: String, hourCol: String,
      cntCol: String)(
      scorer: (DataFrame, String, String, String) => DataFrame): DataFrame = {
    val resummed = sink
      .select(col(keyCol), to_timestamp(col(hourCol)).as("__hour"),
        col(cntCol).cast(LongType).as("__n"))
      .groupBy(col(keyCol), col("__hour"))
      .agg(sum(col("__n")).as("__n"))
    scorer(resummed, keyCol, "__hour", "__n")
  }
}
