package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming deployment forms of the batch monitoring family — the
  * spike detector runs over the watermarked hourly sink
  * ([[EventsStream]]), drift re-scores the accumulated bucket sink, and
  * the EWMA smoother here carries its recurrence as keyed O(1) state.
  */
object MonitorStream {

  case class Bucket(key: String, bucket_ms: Long, n: Long)
  case class EwmaFlag(key: String, bucket_ms: Long, n: Long,
      ewma_scaled: Long, spike: Boolean)
  case class EwmaState(s: Long, started: Boolean)

  /** The `Quality.ewmaFromBuckets` recurrence as keyed streaming state —
    * literally the O(1) carry the batch operator's doc comment promises
    * a streaming monitor would hold. Buckets must arrive in bucket order
    * per key (the upstream watermarked rollup emits them so); within a
    * micro-batch they are sorted defensively. Identical integer
    * recurrence — the parity spec pins streaming == batch flags bitwise
    * on the same feed. */
  class EwmaProcessor(alphaDen: Long, scale: Long, spikeNum: Long)
      extends StatefulProcessor[String, Bucket, EwmaFlag] {
    @transient private var st: ValueState[EwmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EwmaState](
        "ewma", Encoders.product[EwmaState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Bucket],
        timerValues: TimerValues): Iterator[EwmaFlag] = {
      var (s, started) =
        if (st.exists()) { val x = st.get(); (x.s, x.started) }
        else (0L, false)
      val out = rows.toSeq.sortBy(_.bucket_ms).map { b =>
        val spike = started && b.n * scale > spikeNum * s
        s = if (!started) { started = true; b.n * scale }
            else ((alphaDen - 1L) * s + b.n * scale) / alphaDen
        EwmaFlag(key, b.bucket_ms, b.n, s, spike)
      }
      st.update(EwmaState(s, started))
      out.iterator
    }
  }

  def ewmaFlags(buckets: Dataset[Bucket], alphaDen: Long = 8L,
      scale: Long = 256L, spikeNum: Long = 2L): Dataset[EwmaFlag] = {
    import buckets.sparkSession.implicits._
    buckets.groupByKey(_.key)
      .transformWithState(new EwmaProcessor(alphaDen, scale, spikeNum),
        TimeMode.None(), OutputMode.Append())
  }
}
