package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventsStream
import graft.streaming.EventsStream.SessionEvent

/** Streaming throughput micro-bench: rows/sec through the three stateful
  * paths — the watermarked windowed aggregate (`hourlyRollup`), the
  * `flatMapGroupsWithState` session tracker, and its `transformWithState`
  * twin on the RocksDB state store. Events come from the testdata events
  * table (replicated across disjoint user spaces, Stress-style), are fed
  * through a MemoryStream in fixed-size batches, and the reported rate is
  * input rows / wall-clock over all micro-batches (`processAllAvailable`
  * per feed batch, so the rate includes state-store commit latency, which
  * is the point).
  *
  * Usage: runMain graft.StreamBench [sfDir] [replicas] [batchRows]
  * Prints one line per path: `[stream] <name> <rows> rows  <sec> s  <rows/s> rows/s`
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val replicas = if (args.length > 1) args(1).toInt else 10
    val batchRows = if (args.length > 2) args(2).toInt else 100000
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-streambench")
    import spark.implicits._
    implicit val sql: org.apache.spark.sql.SQLContext = spark.sqlContext

    // driver-side event feed: (ts, type, value, user) replicated across
    // disjoint user spaces; MemoryStream feeding is driver-side by nature,
    // so the collect here is the harness, not the operator under test
    val base = Tables.events(spark, sfDir)
      .select(col("ts"), col("event_type"),
        coalesce(col("value"), lit(0.0)).as("value"), col("user_id"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val feed: Array[(Timestamp, String, Double, Long)] =
      (0 until replicas).toArray.flatMap { rep =>
        base.map { case (ts, et, v, u) => (ts, et, v, u + rep * 1000000L) }
      }
    // session paths consume per-user time-ordered events; sort once so
    // batch boundaries are event-time-ordered (kafka-partition-like feed)
    val ordered = feed.sortBy(_._1.getTime)
    println(s"[stream] feed: ${ordered.length} events (x$replicas), batch $batchRows")

    def run(name: String)(build: () => (Seq[(Timestamp, String, Double, Long)] => Unit,
        org.apache.spark.sql.streaming.StreamingQuery)): Unit = {
      val (add, q) = build()
      val t0 = System.nanoTime()
      ordered.grouped(batchRows).foreach { chunk =>
        add(chunk.toSeq)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      q.stop()
      println(f"[stream] $name%-18s ${ordered.length} rows ${sec}%8.2f s  ${ordered.length / sec}%,12.0f rows/s")
    }

    run("hourly_rollup") { () =>
      val in = MemoryStream[(Timestamp, String, Double)]
      val q = EventsStream.hourlyRollup(in.toDF().toDF("ts", "event_type", "value"))
        .writeStream.format("memory").queryName("sb_hourly")
        .outputMode("append").start()
      (chunk => { in.addData(chunk.map(e => (e._1, e._2, e._3))): Unit }, q)
    }

    run("session_fmgws") { () =>
      val in = MemoryStream[SessionEvent]
      val q = EventsStream.sessionTracker(in.toDS(), gapMs = 1800L * 1000)
        .writeStream.format("memory").queryName("sb_fmgws")
        .outputMode("append").start()
      (chunk => { in.addData(chunk.map(e => SessionEvent(e._4, e._1.getTime))): Unit }, q)
    }

    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      run("session_tws") { () =>
        val in = MemoryStream[SessionEvent]
        val q = EventsStream.sessionTrackerTws(in.toDS(), gapMs = 1800L * 1000)
          .writeStream.format("memory").queryName("sb_tws")
          .outputMode("append").start()
        (chunk => { in.addData(chunk.map(e => SessionEvent(e._4, e._1.getTime))): Unit }, q)
      }
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    spark.stop()
  }
}
