package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming Misra-Gries heavy hitters — the continuous form of the batch
  * `text_heavy_hitters_approx` sketch (same decrement semantics, same
  * guarantees), kept as TYPED STATE in `transformWithState` so the
  * candidate set survives across micro-batches on the RocksDB store.
  *
  * Sharding contract: tokens route to shards BY TOKEN (the caller hashes
  * the token to a shard id), so every occurrence of a token lands on ONE
  * shard and that shard's Misra-Gries summary holds a per-shard-exact
  * lower bound. Each shard's state is ≤ `capacity` counters regardless of
  * stream length — the bounded-state property that matters for an
  * unbounded token stream — and any token whose true count exceeds
  * shardTokens/(capacity+1) is guaranteed present in its shard's
  * candidate set (the MG recall bound; spec-pinned).
  *
  * Each micro-batch emits the shard's CURRENT candidates tagged with the
  * running `n_seen` so a consumer (or the spec) selects the latest
  * snapshot per shard with a plain max — memory-sink friendly without
  * update-mode semantics.
  */
object HeavyHittersStream {

  case class Tok(shard: Int, token: String)
  case class Hitter(shard: Int, token: String, lower_bound: Long, n_seen: Long)
  case class MgState(tokens: Seq[String], counts: Seq[Long], seen: Long)

  class MgProcessor(capacity: Int)
      extends StatefulProcessor[Int, Tok, Hitter] {
    @transient private var st: ValueState[MgState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[MgState](
        "mg", Encoders.product[MgState], TTLConfig.NONE)

    override def handleInputRows(shard: Int, rows: Iterator[Tok],
        timerValues: TimerValues): Iterator[Hitter] = {
      val summary = scala.collection.mutable.HashMap.empty[String, Long]
      var seen = 0L
      if (st.exists()) {
        val s = st.get()
        s.tokens.zip(s.counts).foreach { case (t, c) => summary(t) = c }
        seen = s.seen
      }
      rows.foreach { r =>
        seen += 1
        summary.get(r.token) match {
          case Some(c) => summary(r.token) = c + 1
          case None if summary.size < capacity => summary(r.token) = 1L
          case None =>
            // the MG step: decrement every counter, drop the zeroed ones
            // (identical to the batch twin's per-partition pass)
            val dead = List.newBuilder[String]
            summary.foreachEntry { (key, c) =>
              if (c == 1L) dead += key else summary(key) = c - 1
            }
            dead.result().foreach(summary.remove)
        }
      }
      // deterministic state + emission order
      val snap = summary.toSeq.sortBy { case (t, c) => (-c, t) }
      st.update(MgState(snap.map(_._1), snap.map(_._2), seen))
      snap.iterator.map { case (t, c) => Hitter(shard, t, c, seen) }
    }
  }

  /** Sharded streaming heavy hitters: `capacity` counters per shard. */
  def topTokens(toks: Dataset[Tok], capacity: Int): Dataset[Hitter] = {
    import toks.sparkSession.implicits._
    toks.groupByKey(_.shard)
      .transformWithState(new MgProcessor(capacity), TimeMode.None(),
        OutputMode.Append())
  }
}
