package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream
import graft.streaming.EventsStream.{ClosedSession, SessionEvent}

class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-streaming-test")
  import spark.implicits._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("streaming hourly rollup matches the shared batch transform") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")

    val q = EventsStream.hourlyRollup(events)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0),
        (ts("2024-01-01 11:10:00"), "view", 5.0))
      q.processAllAvailable()
      // advance watermark far past hour 10 and 11 so both windows close
      input.addData((ts("2024-01-01 20:00:00"), "late", 0.0))
      q.processAllAvailable()

      val out = spark.table("hourly_out")
        .select("hour_start", "event_type", "n", "total")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(out.contains(("2024-01-01 10:00:00", "click", 2L, 3.0)))
      assert(out.contains(("2024-01-01 11:00:00", "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("spike detector over the streamed hourly rollup flags the storm hour") {
    // the deployment loop end-to-end: watermarked hourly rollup streams
    // into a sink; Quality.spikesFromHourly runs over the ACCUMULATED
    // sink table (hours x types) without re-touching raw events
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventsStream.hourlyRollup(events)
      .writeStream.format("memory").queryName("spike_hourly")
      .outputMode("append").start()
    try {
      // 9 quiet hours of exactly 10 clicks, then a 100-click storm hour
      val quiet = for (h <- 0 until 9; i <- 0 until 10)
        yield (ts(f"2024-01-01 $h%02d:00:${i}%02d"), "click", 1.0)
      val storm = (0 until 100).map(i =>
        (ts(f"2024-01-01 09:${i / 60}%02d:${i % 60}%02d"), "click", 1.0))
      input.addData(quiet ++ storm)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), "late", 0.0)) // close windows
      q.processAllAvailable()

      val sink = spark.table("spike_hourly")
        .withColumn("hour_ts", to_timestamp(col("hour_start")))
      val flagged = graft.operators.Quality.spikesFromHourly(
          sink, "event_type", "hour_ts", "n", trailing = 24, z = 3, minN = 8)
        .filter(col("is_spike"))
        .select("event_type", "hour_start").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(flagged.toSeq == Seq(("click", "2024-01-01 09:00:00")))
      // the MAD twin scores the SAME sink through the same seam (both
      // monitors deploy over one accumulating hourly rollup)
      val madFlagged = graft.operators.Quality.madFromHourly(
          sink, "event_type", "hour_ts", "n", trailing = 24, k = 5, minN = 8)
        .filter(col("is_anomaly"))
        .select("event_type", "hour_start").collect()
        .map(r => (r.getString(0), r.getString(1)))
      assert(madFlagged.toSeq == Seq(("click", "2024-01-01 09:00:00")))
    } finally q.stop()
  }

  test("seasonal monitor over the streamed hourly sink equals the batch flags") {
    // the seasonal z-test deploys over the SAME accumulating hourly
    // rollup as the spike/MAD/EWMA/trend family — only the partition
    // key differs (type#hour-of-day), computed from the sink's own
    // hour column; streaming == batch flag parity on a feed with a
    // daily 9AM ramp and one planted 3AM burst
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventsStream.hourlyRollup(events)
      .writeStream.format("memory").queryName("seasonal_hourly")
      .outputMode("append").start()
    try {
      val feed = for {
        day <- 1 to 4; h <- 0 until 24
        n = if (day == 4 && h == 3) 50 else if (h == 9) 25 else 5
        i <- 0 until n
      } yield (ts(f"2024-01-0$day $h%02d:${i / 60}%02d:${i % 60}%02d"), "click", 1.0)
      input.addData(feed)
      input.addData((ts("2024-01-05 12:00:00"), "late", 0.0)) // close windows
      q.processAllAvailable()

      def seasonal(hourly: org.apache.spark.sql.DataFrame, cnt: String) =
        graft.operators.Quality.spikesFromHourly(
            hourly.withColumn("season_key", concat(col("event_type"), lit("#"),
              lpad(hour(col("hour_ts")).cast("string"), 2, "0"))),
            "season_key", "hour_ts", cnt, trailing = 3, z = 3, minN = 2)
          .filter(col("is_spike")).select("season_key", "hour_start")
          .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
      val sink = spark.table("seasonal_hourly")
        .withColumn("hour_ts", to_timestamp(col("hour_start")))
      val streamed = seasonal(sink, "n")
      val batch = seasonal(
        feed.toDF("ts", "event_type", "value")
          .groupBy(date_trunc("hour", col("ts")).as("hour_ts"), col("event_type"))
          .agg(count(lit(1)).as("cnt")), "cnt")
      assert(streamed == batch, s"$streamed vs $batch")
      assert(streamed == Seq(("click#03", "2024-01-04 03:00:00")), streamed)
    } finally q.stop()
  }

  test("trend over the streamed hourly rollup equals the batch slope bitwise") {
    // the TREND monitor deploys over the SAME accumulating hourly sink
    // as the spike/MAD/EWMA family: trendFromBuckets scores the sink's
    // (type, hour, n) frame with the identical BIGINT sums, so slopes
    // match the batch computation exactly — including the shift
    // invariance (x = hours since the key's own first bucket)
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = EventsStream.hourlyRollup(events)
      .writeStream.format("memory").queryName("trend_hourly")
      .outputMode("append").start()
    try {
      // declining: 9,8,...,2 events across hours 0..7 (slope -1/hour);
      // split across two micro-batches to cross a batch boundary
      val rows = for (h <- 0 until 8; i <- 0 until (9 - h))
        yield (ts(f"2024-01-01 $h%02d:00:${i}%02d"), "dec", 1.0)
      input.addData(rows.take(20): _*)
      q.processAllAvailable()
      input.addData(rows.drop(20): _*)
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), "late", 0.0)) // close windows
      q.processAllAvailable()

      val sink = spark.table("trend_hourly")
        .withColumn("hour_ts", to_timestamp(col("hour_start")))
      def trendOf(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Quality.trendFromBuckets(
            df, "event_type", "hour_ts", "n")
          .filter(col("event_type") === "dec")
          .select("n_buckets", "slope_num", "slope_den", "slope", "declining")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getLong(4))).toSeq
      val streamed = trendOf(sink)
      val batch = trendOf(rows.toDF("ts", "event_type", "value")
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(org.apache.spark.sql.functions.lit(1)).as("n")))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.head._4 == -1.0 && streamed.head._5 == 1L)
    } finally q.stop()
  }

  test("dq rule suite runs on a stream in complete mode; final snapshot equals batch") {
    // the continuous ingest-acceptance gate: the stateless rule subset
    // (no Unique — distinct aggregates are unsupported in streaming)
    // evaluates as a complete-mode aggregate; after the last batch the
    // snapshot must equal the batch evaluator on the union of the feed
    import graft.operators.Quality.{Rule, checkRules}
    implicit val sql = spark.sqlContext
    val rules = Seq(Rule.NotNull("v"), Rule.InRange("v", 0.0, 100.0),
      Rule.Matches("st", "^[A-Z]"))
    val input = MemoryStream[(Option[Double], String)]
    val q = checkRules(input.toDF().toDF("v", "st"), rules)
      .writeStream.format("memory").queryName("rules_out")
      .outputMode("complete").start()
    try {
      val feed = Seq((Some(5.0), "Ok"), (Some(500.0), "bad"),
        (None, "Ok"), (Some(50.0), "Ok"))
      input.addData(feed.take(2): _*)
      q.processAllAvailable()
      input.addData(feed.drop(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("rules_out")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val batch = checkRules(feed.toDF("v", "st"), rules)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(batch.exists(r => r._1.startsWith("in_range") && r._3 == 1L))
    } finally q.stop()
  }

  test("drift over the streamed bucket counts matches the batch TV distance") {
    // the deployment loop: token-bucket counts accumulate as a streaming
    // aggregation (complete mode — buckets x sources state), and
    // driftFromCounts scores the ACCUMULATED sink table; identical
    // arithmetic path to the batch operator, so the doubles match bitwise
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val docs = input.toDF().toDF("source", "text")
    val q = EventsStream.driftCounts(docs, "source", "text", buckets = 64)
      .writeStream.format("memory").queryName("drift_counts")
      .outputMode("complete").start()
    try {
      val feed = Seq(
        ("s0", "alpha beta gamma delta"), ("s0", "alpha beta epsilon"),
        ("s1", "zeta zeta eta theta"), ("s1", "iota kappa"),
        ("s2", "alpha beta gamma delta epsilon"))
      // two micro-batches: the score must reflect the ACCUMULATED counts
      input.addData(feed.take(2): _*)
      q.processAllAvailable()
      input.addData(feed.drop(2): _*)
      q.processAllAvailable()

      val streamed = graft.operators.Quality.driftFromCounts(
          spark.table("drift_counts"), "source", "__b", "n_tok")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      val batch = graft.operators.Quality.drift(
          feed.toDF("source", "text"), "source", "text", buckets = 64)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(streamed.toSet == batch.toSet, s"streamed=${streamed.toSeq} batch=${batch.toSeq}")
      assert(streamed.length == 3)
    } finally q.stop()
  }

  test("KS over the streamed (group, value) counts equals the batch statistic bitwise") {
    // the KS monitor's streaming face: state = the distinct (group, value)
    // rollup (bounded by the value domain — the documented contract), and
    // ksFromCounts scores the ACCUMULATED sink. Summing accumulated 1s is
    // the identical aggregate the raw batch path runs, so d_num and the
    // final division match bit for bit.
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = EventsStream.valueCounts(
        input.toDF().toDF("event_type", "value"), "event_type", "value")
      .writeStream.format("memory").queryName("ks_counts")
      .outputMode("complete").start()
    try {
      // values on a 1/16 grid (the registered query's quantization);
      // click shifted right of view — two micro-batches so accumulated
      // partials must re-sum before scoring
      val feed = (0 until 40).map(i => ("click", (i % 8 + 4) / 16.0)) ++
        (0 until 30).map(i => ("view", (i % 8) / 16.0)) ++
        Seq(("click", 1.0), ("view", 0.25), ("error", 9.9))
      input.addData(feed.take(25): _*)
      q.processAllAvailable()
      input.addData(feed.drop(25): _*)
      q.processAllAvailable()

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      val streamed = rows(graft.operators.Quality.ksFromCounts(
        spark.table("ks_counts"), "event_type", "value", "n", "click", "view"))
      val batch = rows(graft.operators.Quality.ksStatistic(
        feed.toDF("event_type", "value"), "event_type", "value", "click", "view"))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // sanity: the planted shift is visible (D well away from 0)
      assert(streamed.head._6 > 0.3, streamed)
    } finally q.stop()
  }

  test("binned KS over an unbounded streamed domain: bounded state, batch parity, error bound") {
    // the exact streaming KS's state is the distinct (group, value)
    // rollup — bounded only by the value domain. Binning at INGEST
    // (Quality.ksBinCol: under/overflow sink bins) caps the sink at
    // groups × (nBins + 2) rows however wild the feed; the trade is the
    // property-tested sandwich D_binned <= D_exact <= D_binned + max bin
    // mass. Downstream of the quantizer the machinery IS ksFromCounts,
    // so streamed == batch ksBinnedStatistic bit for bit.
    implicit val sql = spark.sqlContext
    val nBins = 16
    val input = MemoryStream[(String, Double)]
    val binned = input.toDF().toDF("event_type", "value")
      .select(col("event_type"),
        graft.operators.Quality.ksBinCol(col("value"), 0.0, 10.0, nBins).as("bin"))
    val q = EventsStream.valueCounts(binned, "event_type", "bin")
      .writeStream.format("memory").queryName("ksb_counts")
      .outputMode("complete").start()
    try {
      // click sits right of view INSIDE the frame, plus an unbounded tail
      // (1e9, -1e6, …) that would grow exact-KS state without bound but
      // lands in the two sink bins here
      val feed = (0 until 60).map(i => ("click", 3.0 + (i % 10) * 0.61)) ++
        (0 until 50).map(i => ("view", (i % 10) * 0.53)) ++
        Seq(("click", 1.0e9), ("view", -1.0e6), ("click", 123456.789),
          ("view", Double.MaxValue), ("error", 42.0))
      input.addData(feed.take(40): _*)
      q.processAllAvailable()
      input.addData(feed.drop(40): _*)
      q.processAllAvailable()

      // bounded state: the accumulated sink can never exceed
      // groups × (nBins + 2) rows, whatever the value domain
      assert(spark.table("ksb_counts").count() <= 3L * (nBins + 2))
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      val streamed = rows(graft.operators.Quality.ksFromCounts(
        spark.table("ksb_counts"), "event_type", "bin", "n", "click", "view"))
      val batch = rows(graft.operators.Quality.ksBinnedStatistic(
        feed.toDF("event_type", "value"), "event_type", "value",
        "click", "view", 0.0, 10.0, nBins))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")

      // error sandwich vs the exact statistic on the same feed
      val dBinned = streamed.head._6
      val dExact = rows(graft.operators.Quality.ksStatistic(
        feed.toDF("event_type", "value"), "event_type", "value",
        "click", "view")).head._6
      val clicks = feed.filter(_._1 == "click").map(_._2)
      val views = feed.filter(_._1 == "view").map(_._2)
      def binOf(v: Double) =
        math.min(math.max(math.floor(v / (10.0 / nBins)), -1.0), nBins.toDouble)
      val maxMass = (clicks.groupBy(binOf).values.map(_.size.toDouble / clicks.size) ++
        views.groupBy(binOf).values.map(_.size.toDouble / views.size)).max
      assert(dBinned <= dExact + 1e-12, s"binned $dBinned > exact $dExact")
      assert(dExact <= dBinned + maxMass + 1e-12,
        s"exact $dExact > binned $dBinned + maxMass $maxMass")
    } finally q.stop()
  }

  test("streamed OHLC bars equal batch bars bitwise; partial sink rows recombine exactly") {
    // the positional-endpoint seam: open/close carry their (ts, id)
    // order keys, so the accumulated sink recombines via ohlcFromSink to
    // exactly the batch bar however the rows were micro-batched
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, Double)]
    val events = input.toDF().toDF("ts", "event_id", "event_type", "value")
    val q = EventsStream.ohlcState(events)
      .writeStream.format("memory").queryName("ohlc_sink")
      .outputMode("append").start()
    val feed = Seq(
      (ts("2024-01-01 10:05:00"), 1L, "click", 7.0),
      (ts("2024-01-01 10:01:00"), 2L, "click", 3.0), // true open (earliest ts)
      (ts("2024-01-01 10:59:00"), 3L, "click", 9.5), // true close + high
      (ts("2024-01-01 10:30:00"), 4L, "click", 1.5), // low
      (ts("2024-01-01 10:30:00"), 5L, "view", 2.0),
      (ts("2024-01-01 11:10:00"), 6L, "click", 4.0))
    try {
      input.addData(feed.take(3): _*)
      q.processAllAvailable()
      input.addData(feed.drop(3): _*)
      q.processAllAvailable()
      // advance the watermark so every bar closes
      input.addData((ts("2024-01-01 20:00:00"), 99L, "late", 0.0))
      q.processAllAvailable()
      def bars(df: org.apache.spark.sql.DataFrame) =
        df.select("event_type", "hour_start", "n", "open", "high", "low", "close")
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
          .toSet
      // the sentinel's own bar never emits (its window stays open), so
      // the closed-bar set equals the batch bars over the real feed
      val batch = bars(SparkEntry.ohlcBars(
        feed.toDF("ts", "event_id", "event_type", "value")))
      val streamed = bars(EventsStream.ohlcFromSink(spark.table("ohlc_sink")))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.contains(("click", "2024-01-01 10:00:00", 4L, 3.0, 9.5, 1.5, 9.5)))
      // re-sum safety without the stream: two half-feeds' partial bars,
      // unioned as sink rows, recombine to the whole feed's bars — the
      // backfill-beside-live-data case the seam exists for
      def half(rows: Seq[(Timestamp, Long, String, Double)]) =
        EventsStream.ohlcState(rows.toDF("ts", "event_id", "event_type", "value"))
      val partials = half(feed.take(3)).unionByName(half(feed.drop(3)))
      assert(bars(EventsStream.ohlcFromSink(partials)) == batch)
    } finally q.stop()
  }

  test("streamed TWAP contributions score to the batch TWAP bitwise") {
    // a contribution (value, holding time) finalizes when the successor
    // arrives: one state row per type, append-only sink, and the scorer's
    // decimal products make the score micro-batching-independent
    implicit val sql = spark.sqlContext
    import EventsStream.TwapEvent
    val input = MemoryStream[TwapEvent]
    val q = EventsStream.twapContributions(input.toDS())
      .toDF().writeStream.format("memory").queryName("twap_sink")
      .outputMode("append").start()
    def us(s: String): Long = ts(s).getTime * 1000L
    val feed = Seq(
      TwapEvent("click", us("2024-01-01 10:00:00"), 1L, 2.0),
      TwapEvent("click", us("2024-01-01 10:00:30"), 2L, 4.0),
      TwapEvent("view", us("2024-01-01 10:00:10"), 3L, 1.0),
      TwapEvent("click", us("2024-01-01 10:02:00"), 4L, 8.0),
      TwapEvent("view", us("2024-01-01 10:03:00"), 5L, 3.0),
      TwapEvent("click", us("2024-01-01 10:04:00"), 6L, 0.5))
    try {
      // split mid-type so a carried-state row finalizes across batches
      input.addData(feed.take(2): _*)
      q.processAllAvailable()
      input.addData(feed.drop(2): _*)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.select("event_type", "n_obs", "total_dt_us", "twap")
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
          .toSet
      val streamed = rows(
        EventsStream.twapFromContributions(spark.table("twap_sink")))
      val batch = rows(SparkEntry.twapTransform(
        feed.map(e => (new Timestamp(e.ts_us / 1000L), e.event_id,
            e.event_type, e.value))
          .toDF("ts", "event_id", "event_type", "value")))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // the in-flight last observation of each type carries no weight
      // yet — exactly the batch convention (count only finalized pairs)
      assert(streamed.find(_._1 == "click").get._2 == 3L)
    } finally q.stop()
  }

  test("exact quantiles over the streamed (group, value) counts equal batch percentile bitwise") {
    // the quantile family rides the SAME accumulating sink as KS/MWU/PSI:
    // Quantiles.exactFromCounts re-sums partial (group, value) rows and
    // scores exact interpolated percentiles without re-touching raw rows
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = EventsStream.valueCounts(
        input.toDF().toDF("event_type", "value"), "event_type", "value")
      .writeStream.format("memory").queryName("qt_counts")
      .outputMode("complete").start()
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p90" -> 0.9)
    try {
      val feed = (0 until 47).map(i => ("click", (i % 13) * 1.7)) ++
        (0 until 31).map(i => ("view", 3.0 + (i % 7) * 0.61)) ++
        Seq(("click", -2.5), ("error", 42.0))
      input.addData(feed.take(30): _*)
      q.processAllAvailable()
      input.addData(feed.drop(30): _*)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("event_type").collect().map(r =>
          (r.getString(0), r.getLong(1),
            Seq(2, 3, 4).map(i => java.lang.Double.doubleToRawLongBits(
              r.getDouble(i))))).toSeq
      val streamed = rows(graft.operators.Quantiles.exactFromCounts(
        spark.table("qt_counts"), "event_type", "value", "n", ps))
      val batch = rows(graft.operators.Quantiles.exactByKey(
        feed.toDF("event_type", "value"), "event_type", "value", ps))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // and both equal the buffered percentile aggregate bitwise
      val oracle = rows(feed.toDF("event_type", "value")
        .groupBy("event_type")
        .agg(count(col("value")).as("n"),
          ps.map { case (nm, p) =>
            expr(s"percentile(value, $p)").as(nm) }: _*))
      assert(streamed == oracle, s"streamed=$streamed oracle=$oracle")
    } finally q.stop()
  }

  test("bottom-k sketch over per-batch sink rows equals the one-shot batch sketch bitwise") {
    // the sketch's streaming face: each micro-batch appends ONE bounded
    // sketch row per key; the semilattice fold over the sink is EXACTLY
    // the batch sketch — no quantization grid needed for a continuous
    // domain (the advantage over the (group, value) counts sink)
    implicit val sql = spark.sqlContext
    val k = 16
    val dir = java.nio.file.Files.createTempDirectory("graft_sketch_sink_").toString
    val input = MemoryStream[(String, Long, Double)]
    val q = input.toDF().toDF("event_type", "event_id", "value")
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        EventsStream.sketchBatch(batch.toDF(), "event_type", "value",
            "event_id", k)
          .write.mode("append").parquet(dir))
      .start()
    try {
      val feed = (0 until 60).map(i =>
          ("click", i.toLong, ((i * 2654435761L) % 997L) / 10.0)) ++
        (0 until 40).map(i =>
          ("view", 1000L + i, 3.0 + ((i * 40503L) % 883L) / 25.0)) ++
        Seq(("error", 5000L, 42.0))
      input.addData(feed.take(25): _*)
      q.processAllAvailable()
      input.addData(feed.slice(25, 70): _*)
      q.processAllAvailable()
      input.addData(feed.drop(70): _*)
      q.processAllAvailable()
      def rows(df: org.apache.spark.sql.DataFrame) = df
        .select(col("event_type"), col("sketch.n"),
          col("sketch.hs").cast("string"), col("sketch.vs").cast("string"))
        .orderBy("event_type").collect().map(_.toSeq).toSeq
      val sink = spark.read.parquet(dir)
      // three batches appended -> up to 3 bounded rows per key
      assert(sink.count() <= 3L * 3L && sink.count() >= 3L)
      val streamed = rows(EventsStream.sketchFromSink(sink, "event_type", k))
      val batch = rows(graft.operators.Quantiles.sketchByKey(
        feed.toDF("event_type", "event_id", "value"),
        "event_type", "value", "event_id", k))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // compaction is lossless: fold the sink once, fold again, same row
      val compacted = EventsStream.sketchFromSink(sink, "event_type", k)
      assert(rows(EventsStream.sketchFromSink(compacted, "event_type", k))
        == streamed)
    } finally {
      q.stop()
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("MWU over the streamed (group, value) counts equals the batch U bitwise") {
    // Mann–Whitney rides the SAME accumulating (group, value) sink as KS
    // (one state, both rank/CDF monitors score it); re-summed partials
    // feed the identical distinct-value rollup, so u2 and the single AUC
    // division match bit for bit
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val q = EventsStream.valueCounts(
        input.toDF().toDF("event_type", "value"), "event_type", "value")
      .writeStream.format("memory").queryName("mwu_counts")
      .outputMode("complete").start()
    try {
      val feed = (0 until 40).map(i => ("click", (i % 8 + 4) / 16.0)) ++
        (0 until 30).map(i => ("view", (i % 8) / 16.0)) ++
        Seq(("click", 1.0), ("view", 0.25), ("error", 9.9))
      input.addData(feed.take(25): _*)
      q.processAllAvailable()
      input.addData(feed.drop(25): _*)
      q.processAllAvailable()

      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
      val streamed = rows(graft.operators.Quality.mwuFromCounts(
        spark.table("mwu_counts"), "event_type", "value", "n", "click", "view"))
      val batch = rows(graft.operators.Quality.mwuStatistic(
        feed.toDF("event_type", "value"), "event_type", "value", "click", "view"))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      // click planted right of view -> AUC decisively above 0.5
      assert(streamed.head._6 > 0.7, streamed)
    } finally q.stop()
  }

  test("PSI over the streamed bucket counts equals the batch score bitwise") {
    // PSI rides the SAME accumulating bucket-count sink as the TV drift
    // leg (one state, every distribution monitor scores it); the add-1
    // smoothed decimal-accumulated arithmetic is identical on the
    // re-summed counts, so the doubles match bitwise
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = EventsStream.driftCounts(
        input.toDF().toDF("source", "text"), "source", "text", buckets = 64)
      .writeStream.format("memory").queryName("psi_counts")
      .outputMode("complete").start()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    try {
      val feed = Seq(
        ("s0", "alpha beta gamma delta"), ("s0", "alpha beta epsilon"),
        ("s1", "zeta zeta eta theta iota"), ("s1", "iota kappa"),
        ("s2", "alpha beta gamma delta epsilon zeta"))
      input.addData(feed.take(2): _*)
      q.processAllAvailable()
      input.addData(feed.drop(2): _*)
      q.processAllAvailable()

      def rows(counts: org.apache.spark.sql.DataFrame) =
        graft.operators.Quality.psiFromCounts(counts, "source", "__b", "n_tok")
          .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
            r.getBoolean(3))).toSeq.sortBy(_._1)
      val streamed = rows(spark.table("psi_counts"))
      val batch = rows(
        graft.operators.Quality.tokenBuckets(
            feed.toDF("source", "text"), "source", "text", buckets = 64)
          .groupBy(col("source"), col("__b"))
          .agg(count(lit(1)).as("n_tok")))
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.map(_._1) == Seq("s0", "s1", "s2"))
    } finally {
      q.stop()
      val rdds = spark.sparkContext.getPersistentRDDs
      (rdds.keySet -- before).foreach(id => rdds(id).unpersist(blocking = false))
    }
  }

  test("a user-defined scorer rides the MonitorSeam; partial sink rows re-sum before scoring") {
    // the generalized accumulating-rollup + scorer seam: a NEW monitor is
    // just a (frame, key, hour, cnt) => flags function. The user scorer
    // here flags FLATLINE hours (count identical to the previous hour —
    // a stuck upstream emitting the exact same volume). The sink gets a
    // deliberate PARTIAL row pair for one hour (a backfill landing beside
    // live data); the seam's re-sum must score it as the single total.
    import graft.streaming.MonitorSeam
    import org.apache.spark.sql.expressions.Window
    def flatline(df: org.apache.spark.sql.DataFrame, key: String,
        hour: String, cnt: String): org.apache.spark.sql.DataFrame = {
      val w = Window.partitionBy(col(key)).orderBy(col(hour))
      df.withColumn("is_flat", col(cnt) === lag(col(cnt), 1).over(w))
        .filter(col("is_flat"))
        .select(col(key), date_format(col(hour), "yyyy-MM-dd HH:mm:ss").as("h"))
    }
    // sink shape = the streamed hourly rollup's (strings for hours), with
    // hour 02 split across two partial appends (6 + 4 = the 10 of hour 01)
    val sink = Seq(
      ("click", "2024-01-01 00:00:00", 7L),
      ("click", "2024-01-01 01:00:00", 10L),
      ("click", "2024-01-01 02:00:00", 6L),
      ("click", "2024-01-01 02:00:00", 4L),
      ("click", "2024-01-01 03:00:00", 9L),
      ("view", "2024-01-01 01:00:00", 3L),
      ("view", "2024-01-01 02:00:00", 5L)).toDF("event_type", "hour_start", "n")
    val got = MonitorSeam.scoreHourly(sink, "event_type", "hour_start", "n")(flatline)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq("click" -> "2024-01-01 02:00:00"), got)
    // and the BUILT-IN monitors ride the same seam unchanged: the spike
    // scorer through the seam equals calling spikesFromHourly directly
    // on pre-summed finals (bitwise — same operands after the re-sum)
    val viaSeam = MonitorSeam.scoreHourly(sink, "event_type", "hour_start", "n")(
        graft.operators.Quality.spikesFromHourly(_, _, _, _,
          trailing = 3, z = 1, minN = 2))
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2),
        r.getBoolean(r.fieldIndex("is_spike")))).toSet
    val direct = graft.operators.Quality.spikesFromHourly(
        sink.groupBy(col("event_type"),
            to_timestamp(col("hour_start")).as("h"))
          .agg(sum(col("n")).as("cnt")),
        "event_type", "h", "cnt", trailing = 3, z = 1, minN = 2)
      .collect().map(r => (r.getString(1), r.getString(0), r.getLong(2),
        r.getBoolean(r.fieldIndex("is_spike")))).toSet
    assert(viaSeam == direct, s"seam=$viaSeam direct=$direct")
  }

  test("stateful session tracker closes sessions across micro-batches") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val q = EventsStream.sessionTracker(input.toDS(), gapMs = 1000L)
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens a session with two events 500ms apart
      input.addData(SessionEvent(1L, 1000L), SessionEvent(1L, 1500L))
      q.processAllAvailable()
      assert(spark.table("sessions_out").count() == 0) // still open

      // batch 2: a gap > 1000ms closes it and opens a new one
      input.addData(SessionEvent(1L, 5000L))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[ClosedSession].collect()
      assert(closed.toSeq == Seq(ClosedSession(1L, 1000L, 1500L, 2L)))
    } finally q.stop()
  }

  test("session tracker batch mode matches the window-based sessionize") {
    val evs = Seq(
      SessionEvent(1L, 0L), SessionEvent(1L, 1000L),       // session A (closed by gap)
      SessionEvent(1L, 10_000_000L),                       // session B (stays open)
      SessionEvent(2L, 0L)                                 // session C (stays open)
    ).toDS()
    val closed = EventsStream.sessionTracker(evs, gapMs = 1800L * 1000L).collect()
    // only user 1's first session closes within the batch
    assert(closed.toSeq == Seq(ClosedSession(1L, 0L, 1000L, 2L)))
  }

  test("streaming dedup drops re-delivered keys within the watermark") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val q = EventsStream.dedupStream(
        input.toDF().toDF("ts", "event_id", "v"),
        Seq("event_id"), "ts", "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L, "a"), (ts("2024-01-01 10:00:00"), 1L, "a"))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 1L, "a"), (ts("2024-01-01 10:05:00"), 2L, "b"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L)) // the three deliveries of id 1 emit once
    } finally q.stop()
  }

  test("transformWithState session tracker mirrors flatMapGroupsWithState semantics") {
    implicit val sql = spark.sqlContext
    // transformWithState requires the RocksDB state store (its scale story:
    // disk-backed state, huge key spaces off-heap)
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[SessionEvent]
      val q = EventsStream.sessionTrackerTws(input.toDS(), gapMs = 1000L)
        .writeStream.format("memory").queryName("sessions_tws_out")
        .outputMode("append").start()
      try {
        input.addData(SessionEvent(1L, 1000L), SessionEvent(1L, 1500L))
        q.processAllAvailable()
        assert(spark.table("sessions_tws_out").count() == 0) // still open
        // gap > 1000ms closes user 1's session; user 2 opens
        input.addData(SessionEvent(1L, 5000L), SessionEvent(2L, 100L))
        q.processAllAvailable()
        val closed = spark.table("sessions_tws_out").as[ClosedSession].collect().toSet
        assert(closed == Set(ClosedSession(1L, 1000L, 1500L, 2L)))
        // state persists across micro-batches per user
        input.addData(SessionEvent(1L, 9000L), SessionEvent(2L, 5000L))
        q.processAllAvailable()
        val closed2 = spark.table("sessions_tws_out").as[ClosedSession].collect().toSet
        assert(closed2 == Set(
          ClosedSession(1L, 1000L, 1500L, 2L),
          ClosedSession(1L, 5000L, 5000L, 1L),
          ClosedSession(2L, 100L, 100L, 1L)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("timer-based tracker closes an IDLE user's session when the watermark passes") {
    import graft.streaming.EventsStream.TimedSessionEvent
    implicit val sql = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      def ev(user: Long, ms: Long) = TimedSessionEvent(user, ms, new Timestamp(ms))
      val input = MemoryStream[TimedSessionEvent]
      val q = EventsStream.sessionTrackerTimeout(input.toDS(), gapMs = 1000L)
        .writeStream.format("memory").queryName("sessions_timeout_out")
        .outputMode("append").start()
      try {
        input.addData(ev(1L, 1000L), ev(1L, 1500L))
        q.processAllAvailable()
        assert(spark.table("sessions_timeout_out").count() == 0) // open, wm at 1500
        // user 1 goes IDLE; only user 99's far-future event advances the
        // watermark past 1500 + gap — the no-timeout trackers would keep
        // user 1's session open forever here
        input.addData(ev(99L, 100_000L))
        q.processAllAvailable()
        input.addData(ev(99L, 200_000L)) // one more batch so timers fire post-wm-advance
        q.processAllAvailable()
        val closed = spark.table("sessions_timeout_out").as[ClosedSession].collect().toSet
        assert(closed.contains(ClosedSession(1L, 1000L, 1500L, 2L)), closed.toString)
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("warehouse sink generates the reference's upsert DML") {
    import graft.streaming.WarehouseSink
    assert(WarehouseSink.upsertSql("dim_player", Seq("k", "a", "b"), Seq("k"), doUpdate = false)
      == "INSERT INTO dim_player (k, a, b) VALUES (?, ?, ?) ON CONFLICT (k) DO NOTHING")
    assert(WarehouseSink.upsertSql("dim_player", Seq("k", "a", "b"), Seq("k"), doUpdate = true)
      == "INSERT INTO dim_player (k, a, b) VALUES (?, ?, ?) " +
        "ON CONFLICT (k) DO UPDATE SET a = EXCLUDED.a, b = EXCLUDED.b")
    intercept[IllegalArgumentException] {
      WarehouseSink.upsertSql("t", Seq("a"), Seq("missing"), doUpdate = true)
    }
  }

  test("warehouse sink writeBatch: per-key latest wins, re-delivery harmless") {
    import graft.streaming.WarehouseSink
    val store = StreamingSpec.warehouse
    store.clear()
    def write(rows: Seq[(Long, Long, String)]): Unit =
      WarehouseSink.writeBatch(rows.toDF("k", "ver", "v"), "t", Seq("k"), Seq("ver"),
        doUpdate = true, StreamingSpec.newExec _)
    write(Seq((1L, 1L, "old"), (2L, 1L, "b"), (1L, 2L, "mid"))) // batch dedups to ver=2
    write(Seq((1L, 3L, "new")))
    write(Seq((1L, 3L, "new"))) // re-delivered micro-batch: idempotent
    import scala.jdk.CollectionConverters._
    val out = store.asScala.toMap.map { case (k, row) => (k, row(2)) }
    assert(out == Map(1L -> "new", 2L -> "b"))
  }

  test("warehouse sink adapter drives a real foreachBatch stream") {
    import graft.streaming.WarehouseSink
    implicit val sql = spark.sqlContext
    val store = StreamingSpec.warehouse
    store.clear()
    val input = MemoryStream[(Long, Long, String)]
    val q = input.toDF().toDF("k", "ver", "v")
      .writeStream
      .foreachBatch(WarehouseSink.sink("t", Seq("k"), Seq("ver"),
        doUpdate = true, StreamingSpec.newExec _))
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, "old"), (2L, 1L, "b"))
      q.processAllAvailable()
      input.addData((1L, 2L, "new"))
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val out = store.asScala.toMap.map { case (k, row) => (k, row(2)) }
      assert(out == Map(1L -> "new", 2L -> "b"))
    } finally q.stop()
  }

  test("foreachBatch upsert sink is idempotent and latest-wins") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, Long, String)]
    val sink = new EventsStream.UpsertSink(Seq("k"), Seq("ver"))
    val q = input.toDF().toDF("k", "ver", "v")
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        sink.write(batch, id))
      .outputMode("append").start()
    try {
      input.addData((1L, 1L, "old"), (2L, 1L, "b"))
      q.processAllAvailable()
      input.addData((1L, 2L, "new"), (1L, 2L, "new")) // re-delivery within batch
      q.processAllAvailable()
      val out = sink.current.get.orderBy("k")
        .collect().map(r => (r.getLong(0), r.getString(2)))
      assert(out.toSeq == Seq((1L, "new"), (2L, "b")))
    } finally q.stop()
  }

  test("scd2 folds change micro-batches into the versioned dim (foreachBatch)") {
    // the deployment form of Star.scd2Apply: a CDC stream of attribute
    // snapshots folds into the history-keeping dimension one micro-batch
    // at a time — the same operator the batch query dim_scd2 gates
    implicit val sql = spark.sqlContext
    import graft.operators.Star
    import java.sql.Date
    val input = MemoryStream[(Long, String, Date)]
    @volatile var dim = Seq((1L, "A")).toDF("k", "seg")
      .withColumn("valid_from", to_date(lit("2020-01-01")))
      .withColumn("valid_to", lit(null).cast("date"))
      .localCheckpoint(true)
    val q = input.toDF().toDF("k", "seg", "ts")
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) => {
        val prev = dim
        dim = Star.scd2Apply(prev, batch.dropDuplicates("k"),
          "k", Seq("seg"), "ts").localCheckpoint(true)
        org.apache.spark.sql.graft.Bridge.unpersistCheckpoints(prev)
      })
      .outputMode("append").start()
    try {
      input.addData((1L, "A2", Date.valueOf("2021-01-01")),
        (5L, "E", Date.valueOf("2021-01-01")))
      q.processAllAvailable()
      input.addData((5L, "E2", Date.valueOf("2022-01-01")))
      q.processAllAvailable()
      val rows = dim.orderBy("k", "valid_from").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString,
          Option(r.getDate(3)).map(_.toString)))
      assert(rows.toSeq == Seq(
        (1L, "A", "2020-01-01", Some("2021-01-01")),
        (1L, "A2", "2021-01-01", None),
        (5L, "E", "2021-01-01", Some("2022-01-01")),
        (5L, "E2", "2022-01-01", None)))
    } finally q.stop()
  }

  test("streaming staged write lands y/m/d partitioned parquet incrementally") {
    import graft.sources.Staging
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_stage").toString
    // the reference's hourly staged S3 drop as a continuous partitioned
    // parquet sink: same y/m/d layout, same pruning on read-back
    val q = Staging.withDateParts(input.toDF().toDF("ts", "v"), "ts")
      .writeStream.format("parquet")
      .option("checkpointLocation", dir + "/_ckpt")
      .partitionBy("y", "m", "d")
      .outputMode("append").start(dir + "/data")
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-02 10:00:00"), 2L))
      q.processAllAvailable()
      assert(Staging.readStaged(spark, dir + "/data").count() == 2)
      assert(new java.io.File(dir + "/data/y=2024/m=1/d=1").exists)
      assert(new java.io.File(dir + "/data/y=2024/m=1/d=2").exists)
    } finally q.stop()
  }

  test("stream-static decontamination drops benchmark-overlapping docs at ingest") {
    implicit val sql = spark.sqlContext
    val bench = Seq((100L, "the secret eval question about geography today"))
      .toDF("doc_id", "text")
    val input = MemoryStream[(Long, String)]
    val q = EventsStream.decontaminateStream(
        input.toDF().toDF("doc_id", "text"), bench, "doc_id", "text")
      .select("doc_id")
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "the secret eval question about geography today rephrased"), // overlaps
        (2L, "a completely unrelated training document goes right here"))
      q.processAllAvailable()
      input.addData((3L, "another clean one arrives in a later micro batch"))
      q.processAllAvailable()
      val kept = spark.table("decon_out").as[Long].collect().sorted
      assert(kept.toSeq == Seq(2L, 3L))
      // parity: the same function over batch frames keeps exactly the docs
      // the batch audit marks clean
      val batchDocs = Seq(
        (1L, "the secret eval question about geography today rephrased"),
        (2L, "a completely unrelated training document goes right here"),
        (3L, "another clean one arrives in a later micro batch")).toDF("doc_id", "text")
      val streamed = EventsStream.decontaminateStream(batchDocs, bench, "doc_id", "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      val audited = graft.operators.Dedup.decontaminate(batchDocs, bench, "doc_id", "text")
        .filter(!col("contaminated")).select("doc_id").as[Long].collect().sorted.toSeq
      assert(streamed == audited && streamed == Seq(2L, 3L))
    } finally q.stop()
  }

  test("stream-static quality gate keeps exactly the batch filter's docs") {
    implicit val sql = spark.sqlContext
    val reference = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val rows = reference.orderBy("doc_id").limit(40)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val input = MemoryStream[(Long, String)]
    val q = EventsStream.qualityGateStream(
        input.toDF().toDF("doc_id", "text"), reference, "text")
      .select("doc_id")
      .writeStream.format("memory").queryName("qgate_out")
      .outputMode("append").start()
    try {
      input.addData(rows.take(20): _*)
      q.processAllAvailable()
      input.addData(rows.drop(20): _*)
      q.processAllAvailable()
      val kept = spark.table("qgate_out").as[Long].collect().sorted.toSeq
      // parity: batch gate with the SAME reference threshold over the
      // same docs keeps the identical set
      val batch = EventsStream.qualityGateStream(
          rows.toDF("doc_id", "text"), reference, "text")
        .select("doc_id").as[Long].collect().sorted.toSeq
      assert(kept == batch)
      assert(kept.nonEmpty && kept.size < rows.size) // the gate actually gates
    } finally q.stop()
  }

  test("stream-stream attribution join matches purchases to in-window clicks") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = EventsStream.attributionJoin(
        clicks.toDF().toDF("user_id", "click_id", "click_ts"),
        purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts"))
      .select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("attr_out")
      .outputMode("append").start()
    try {
      clicks.addData(
        (1L, 100L, ts("2024-01-01 10:00:00")),
        (2L, 200L, ts("2024-01-01 10:00:00")))
      purchases.addData(
        (1L, 900L, ts("2024-01-01 10:10:00")), // in window of click 100
        (1L, 901L, ts("2024-01-01 11:00:00")), // outside the 30-min window
        (3L, 902L, ts("2024-01-01 10:05:00"))) // no click for user 3
      q.processAllAvailable()
      val got = spark.table("attr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((900L, 100L)))
      // a later click joins a later purchase across micro-batches
      clicks.addData((2L, 201L, ts("2024-01-01 11:30:00")))
      purchases.addData((2L, 903L, ts("2024-01-01 11:45:00")))
      q.processAllAvailable()
      val got2 = spark.table("attr_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got2 == Set((900L, 100L), (903L, 201L)))
      // the join must run with state bounded by watermarks, not unbounded
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: in-horizon dups drop, post-horizon replays re-admit") {
    implicit val sql = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val q = EventsStream.dedupWithinWatermark(
        in.toDF().toDF("event_id", "ts"))
      .select("event_id", "ts")
      .writeStream.format("memory").queryName("dedup_wm_out")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2024-01-01 10:00:00")),
        (1L, ts("2024-01-01 10:01:00")), // in-batch duplicate
        (2L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 10:05:00"))) // in-horizon duplicate
      q.processAllAvailable()
      def n(id: Long): Long = spark.table("dedup_wm_out")
        .filter(col("event_id") === id).count()
      assert(n(1L) == 1 && n(2L) == 1)
      // advance the watermark far past event 1's fingerprint, then
      // replay it: the bounded-state contract re-admits the late replay
      in.addData((9L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      in.addData((1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      assert(n(1L) == 2, s"expected re-admission, got ${n(1L)}")
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("left-outer attribution emits unmatched purchases exactly once, on watermark timeout") {
    implicit val sql = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val q = EventsStream.attributionJoinOuter(
        clicks.toDF().toDF("user_id", "click_id", "click_ts"),
        purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts"))
      .select("purchase_id", "click_id")
      .writeStream.format("memory").queryName("attr_outer_out")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 100L, ts("2024-01-01 10:00:00")))
      purchases.addData(
        (1L, 900L, ts("2024-01-01 10:10:00")), // in window of click 100
        (3L, 902L, ts("2024-01-01 10:05:00"))) // no click for user 3 — ever
      q.processAllAvailable()
      def got(): Set[(Long, Option[Long])] = spark.table("attr_outer_out")
        .collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet
      // the matched row emits on arrival; the unmatched one must NOT —
      // a click for user 3 could still arrive inside the watermark
      assert(got() == Set((900L, Some(100L))))
      // push both watermarks far past 902's match interval: the engine
      // can now PROVE no click joins purchase 902 and emits the NULL row
      clicks.addData((9L, 999L, ts("2024-01-01 13:00:00")))
      purchases.addData((9L, 998L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      clicks.addData((9L, 1000L, ts("2024-01-01 14:00:00")))
      purchases.addData((9L, 997L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      assert(got().contains((902L, None)), got().toString)
      // exactly once — the timeout emission must not duplicate
      assert(spark.table("attr_outer_out")
        .filter(col("purchase_id") === 902L).count() == 1)
      assert(q.lastProgress.stateOperators.nonEmpty)
    } finally q.stop()
  }

  test("attribution join on batch frames equals the bucketized interval join") {
    // the SAME function body serves batch (watermark = no-op): parity with
    // Temporal.intervalJoin pins that stream and batch attribution agree
    val clicks = Seq(
      (1L, 100L, ts("2024-01-01 10:00:00")),
      (1L, 101L, ts("2024-01-01 10:20:00")),
      (2L, 200L, ts("2024-01-01 09:00:00"))).toDF("user_id", "click_id", "click_ts")
    val purchases = Seq(
      (1L, 900L, ts("2024-01-01 10:25:00")), // inside both click windows
      (1L, 901L, ts("2024-01-01 10:45:00")), // inside 101's window only
      (2L, 902L, ts("2024-01-01 09:30:00")), // exactly at window end: excluded
      (2L, 903L, ts("2024-01-01 09:29:59"))).toDF("user_id", "purchase_id", "purchase_ts")
    val streamShaped = EventsStream.attributionJoin(clicks, purchases)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchShaped = graft.operators.Temporal.intervalJoin(
        purchases, clicks
          .withColumn("end_ts", col("click_ts") + expr("INTERVAL 30 MINUTES")),
        "purchase_ts", "click_ts", "end_ts",
        binWidthUs = 600L * 1000000L, keys = Seq("user_id"))
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamShaped == batchShaped)
    assert(streamShaped == Set((900L, 100L), (900L, 101L), (901L, 101L), (903L, 200L)))
  }

  test("AvailableNow catch-up processes exactly the newly-arrived partitions") {
    import graft.sources.Staging
    val root = java.nio.file.Files.createTempDirectory("graft_catchup").toString
    val lake = root + "/lake"
    val ckpt = root + "/_ckpt"
    // run 1 of the staged lake: two day partitions land
    val e1 = Seq((ts("2024-01-10 10:00:00"), 1L), (ts("2024-01-11 10:00:00"), 2L))
      .toDF("ts", "event_id")
    Staging.writeSlice(e1, "ts", "2024-01-10", "2024-01-12", lake)
    val schema = spark.read.parquet(lake).schema // includes y/m/d partition cols
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    EventsStream.catchupOnce(spark, lake, schema, ckpt) { (df, _) =>
      seen ++= df.select("event_id").as[Long].collect()
    }
    assert(seen.sorted.toSeq == Seq(1L, 2L))
    // the sensor-cadence contract: a later catch-up sees ONLY what arrived
    // since the previous run's checkpoint (no reprocessing of old slices)
    seen.clear()
    Staging.writeSlice(
      Seq((ts("2024-01-12 10:00:00"), 3L)).toDF("ts", "event_id"),
      "ts", "2024-01-12", "2024-01-13", lake)
    EventsStream.catchupOnce(spark, lake, schema, ckpt) { (df, _) =>
      seen ++= df.select("event_id").as[Long].collect()
    }
    assert(seen.sorted.toSeq == Seq(3L))
    // and an immediate re-run with nothing new is a no-op
    seen.clear()
    EventsStream.catchupOnce(spark, lake, schema, ckpt) { (df, _) =>
      seen ++= df.select("event_id").as[Long].collect()
    }
    assert(seen.isEmpty)
  }

  test("full reference loop: stream -> hourly rollup -> warehouse upsert") {
    import graft.streaming.WarehouseSink
    implicit val sql = spark.sqlContext
    val store = StreamingSpec.hourlyWarehouse
    store.clear()
    val input = MemoryStream[(Timestamp, String, Double)]
    // the reference's whole hourly DAG in one streaming pipeline: ingest ->
    // windowed rollup (the SAME transform as the batch query) -> idempotent
    // ON CONFLICT warehouse load
    val q = EventsStream.hourlyRollup(input.toDF().toDF("ts", "event_type", "value"))
      .writeStream
      .foreachBatch(WarehouseSink.sink("hourly_rollup",
        keys = Seq("hour_start", "event_type"), latestBy = Seq("n"),
        doUpdate = true, StreamingSpec.newHourlyExec _))
      .outputMode("append").start()
    try {
      input.addData(
        (ts("2024-01-01 10:05:00"), "click", 1.0),
        (ts("2024-01-01 10:45:00"), "click", 2.0))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 20:00:00"), "late", 0.0)) // close hour 10
      q.processAllAvailable()
      import scala.jdk.CollectionConverters._
      val hour10 = store.asScala.collect {
        case (k, row) if k == Seq[Any]("2024-01-01 10:00:00", "click") => row
      }.toSeq
      assert(hour10.map(r => (r(2), r(3))) == Seq((2L, 3.0)))
    } finally q.stop()
  }

  test("file stream source reads the events parquet incrementally") {
    val sf = "/root/testdata/sf0.001"
    // file sources need a DIRECTORY of files (the incremental drop zone)
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_spec")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events_0.parquet"))
    // ts has shipped as ns-long and as us-NTZ across testdata generations;
    // mirror Tables.events' schema-driven conversion on the raw stream
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val batchDf = spark.read.parquet(s"$sf/events.parquet")
    val raw = EventsStream.fromParquetDir(spark, dir.toString, batchDf.schema)
    val stream = batchDf.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
    }
    assert(stream.isStreaming)
    val q = EventsStream.hourlyRollup(stream)
      .writeStream.format("memory").queryName("file_rollup")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode: windows at the tail are still open, so compare against
      // the batch transform restricted to closed windows
      val got = spark.table("file_rollup").count()
      assert(got > 0)
      val batch = SparkEntry.hourlyRollupTransform(Tables.events(spark, sf)).count()
      assert(got <= batch)
    } finally q.stop()
  }

  test("ensemble quality gate runs unchanged on a stream (stateless parity)") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val w = graft.operators.TextAnalysis.knuthWeights(64)
    val q = graft.operators.TextAnalysis
      .ensembleGate(input.toDF().toDF("doc_id", "text"), "doc_id", "text", w)
      .writeStream.format("memory").queryName("ensemble_out")
      .outputMode("append").start()
    try {
      val feed = Seq(
        (1L, "the quick brown fox and the lazy dog was on a hill of grass"),
        (2L, "spam spam spam spam spam spam spam spam"),
        (3L, ""))
      input.addData(feed.take(2): _*); q.processAllAvailable()
      input.addData(feed.drop(2): _*); q.processAllAvailable()
      val streamed = spark.table("ensemble_out").collect()
        .map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5))).toSet
      val batch = graft.operators.TextAnalysis
        .ensembleGate(feed.toDF("doc_id", "text"), "doc_id", "text", w)
        .collect().map(r => (r.getLong(0), r.getLong(4), r.getBoolean(5))).toSet
      assert(streamed == batch, s"streamed=$streamed batch=$batch")
      assert(streamed.size == 3)
    } finally q.stop()
  }

  test("streaming freshness equals batch over accumulated per-batch maxima") {
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val q = input.toDF().toDF("g", "ts")
      .groupBy(col("g")).agg(max(col("ts")).as("ts"))
      .writeStream.format("memory").queryName("latest_sink")
      .outputMode("update").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      val feed = Seq(
        ("a", ts("2024-01-01 00:00:00")), ("b", ts("2024-01-01 06:00:00")),
        ("a", ts("2024-01-01 11:58:59")))
      input.addData(feed.take(2): _*); q.processAllAvailable()
      input.addData(feed.drop(2): _*); q.processAllAvailable()
      // the update-mode sink has accumulated PER-MICRO-BATCH maxima (two
      // rows for 'a'); the batch face re-maxes, so partials score
      // identically to finals — the driftFromCounts re-aggregation design
      val sink = spark.table("latest_sink")
      assert(sink.count() >= 3, sink.count())
      def score(df: org.apache.spark.sql.DataFrame) =
        graft.operators.Quality.freshness(df, "g", "ts",
            "2024-01-01 12:00:00", maxLagMinutes = 60L)
          .collect()
          .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
          .toSet
      assert(score(sink) == score(feed.toDF("g", "ts")))
    } finally q.stop()
  }

  test("streaming EWMA equals the batch recurrence bitwise on the same feed") {
    import graft.streaming.MonitorStream
    import graft.streaming.MonitorStream.{Bucket, EwmaFlag}
    implicit val sql = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val feed = Seq(
        Bucket("a", 1000L, 10L), Bucket("a", 2000L, 11L),
        Bucket("a", 3000L, 40L), Bucket("a", 4000L, 12L),
        Bucket("b", 1000L, 5L), Bucket("b", 2000L, 5L))
      val input = MemoryStream[Bucket]
      val q = MonitorStream.ewmaFlags(input.toDS())
        .writeStream.format("memory").queryName("ewma_out")
        .outputMode("append").start()
      try {
        // split mid-key so the carry must cross a micro-batch boundary
        input.addData(feed.take(3): _*)
        q.processAllAvailable()
        input.addData(feed.drop(3): _*)
        q.processAllAvailable()
        val streamed = spark.table("ewma_out").as[EwmaFlag].collect()
          .map(f => (f.key, f.bucket_ms, f.n, f.ewma_scaled, f.spike)).toSet
        val batch = graft.operators.Quality.ewmaFromBuckets(
            feed.toDF("key", "bucket_ms", "n")
              .withColumn("b", timestamp_millis(col("bucket_ms")))
              .select(col("key"), col("b"), col("n")),
            "key", "b", "n")
          .as[(String, Timestamp, Long, Long, Boolean)].collect()
          .map(r => (r._1, r._2.getTime, r._3, r._4, r._5)).toSet
        assert(streamed == batch, s"streamed $streamed vs batch $batch")
        // the planted burst is flagged in both
        assert(streamed.exists(r => r._1 == "a" && r._2 == 3000L && r._5))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("streaming Misra-Gries: candidates survive batches, recall bound holds, state bounded") {
    import graft.streaming.HeavyHittersStream
    import graft.streaming.HeavyHittersStream.{Hitter, Tok}
    implicit val sql = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Tok]
      val q = HeavyHittersStream.topTokens(input.toDS(), capacity = 4)
        .writeStream.format("memory").queryName("mg_out")
        .outputMode("append").start()
      try {
        // shard 0: "hot" is heavy across BOTH batches (16 of 31 tokens);
        // long-tail fillers rotate so only the cross-batch state can see
        // hot's full mass. shard 1: a different heavy token, proving
        // shard isolation.
        def toks(s: Int, ts: (String, Int)*) =
          ts.flatMap { case (t, n) => Seq.fill(n)(Tok(s, t)) }
        input.addData(toks(0, ("hot", 8), ("a", 2), ("b", 2), ("c", 2),
          ("d", 1), ("e", 1)): _*)
        q.processAllAvailable()
        input.addData(toks(0, ("hot", 8), ("f", 2), ("g", 2), ("h", 1),
          ("i", 1), ("j", 1)): _*)
        input.addData(toks(1, ("other", 5), ("x", 1)): _*)
        q.processAllAvailable()
        val all = spark.table("mg_out").as[Hitter].collect()
        // latest snapshot per shard = rows at that shard's max n_seen
        val latest = all.groupBy(_.shard).map { case (s, rows) =>
          val mx = rows.map(_.n_seen).max
          s -> rows.filter(_.n_seen == mx)
        }
        val s0 = latest(0)
        assert(s0.map(_.n_seen).head == 31L)
        // MG recall: hot's true count 16 > 31/(4+1) -> must be a candidate,
        // with a lower bound within n/(capacity+1) of the true count
        val hot = s0.find(_.token == "hot").get
        assert(hot.lower_bound <= 16L && hot.lower_bound >= 16L - 31L / 5 - 1)
        // bounded state: never more than `capacity` candidates per shard
        assert(s0.length <= 4)
        assert(latest(1).exists(_.token == "other"))
        assert(!latest(1).exists(_.token == "hot")) // shard isolation
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("incremental IVF ingest assigns streamed vectors exactly as the batch path") {
    implicit val sql = spark.sqlContext
    // standing corpus around two poles; the quantizer trains ONCE on it
    val standing = Seq(
      (1L, Array(1.0f, 0.1f, 0.0f)), (2L, Array(0.9f, 0.0f, 0.1f)),
      (3L, Array(0.0f, 1.0f, 0.1f)), (4L, Array(0.1f, 0.9f, 0.0f)),
      (5L, Array(0.95f, 0.05f, 0.0f)), (6L, Array(0.05f, 0.95f, 0.1f)))
      .toDF("vec_id", "embedding")
    val centroids = graft.operators.Similarity.kmeansCentroids(
      standing, "vec_id", "embedding", k = 2, iters = 2)
    val arrivals = Seq(
      (100L, Array(0.8f, 0.2f, 0.0f)), (101L, Array(0.2f, 0.8f, 0.3f)),
      (102L, Array(0.6f, 0.4f, 0.0f)), (103L, Array(0.0f, 0.0f, 1.0f)))
    val input = MemoryStream[(Long, Array[Float])]
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = graft.streaming.VectorIngest.ivfIngest(
        input.toDF().toDF("vec_id", "embedding"), centroids, "embedding") {
      (batch, _) => got.synchronized {
        got ++= batch.select("vec_id", "cell").collect()
          .map(r => (r.getLong(0), r.getString(1)))
      }
    }.start()
    try {
      input.addData(arrivals.take(2)); q.processAllAvailable()
      input.addData(arrivals.drop(2)); q.processAllAvailable()
      // no stream-side state: ingest is a pure per-row kernel projection
      assert(q.lastProgress.stateOperators.isEmpty)
      // bitwise parity: streamed assignment == batch assignCells over the
      // same rows (the shared cellAssigner closure makes this structural)
      val batchAssigned = graft.operators.Similarity.assignCells(
          arrivals.toDF("vec_id", "embedding"), "embedding", centroids)
        .select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got.toSet == batchAssigned)
      assert(got.map(_._1).toSet == arrivals.map(_._1).toSet)
      // the assignment is a real partition (vectors split across cells)
      assert(got.map(_._2).toSet.size == 2)
    } finally q.stop()
  }
}

object StreamingSpec {
  /** In-memory "warehouse table": key -> row, honoring ON CONFLICT DO
    * UPDATE (shared across executor threads in local mode). */
  val warehouse = new java.util.concurrent.ConcurrentHashMap[Long, Seq[Any]]()

  /** Test SqlExecutor: stages rows, applies at commit, discards on
    * rollback — the transaction contract the JDBC binding has. */
  class MemExecutor(keyIdx: Int) extends graft.streaming.WarehouseSink.SqlExecutor {
    private var staged = List.empty[Seq[Any]]
    override def execute(sql: String, params: Seq[Any]): Unit = {
      assert(sql.contains("ON CONFLICT"), sql)
      staged ::= params
    }
    override def commit(): Unit =
      staged.reverse.foreach(p => warehouse.put(p(keyIdx).asInstanceOf[Long], p))
    override def rollback(): Unit = staged = Nil
    override def close(): Unit = ()
  }

  /** Executor factory shipped to partitions (references only this object —
    * nothing from the non-serializable suite instance). */
  def newExec(): graft.streaming.WarehouseSink.SqlExecutor = new MemExecutor(0)

  /** Composite-key warehouse for the hourly-rollup integration test:
    * key = (hour_start, event_type). */
  val hourlyWarehouse = new java.util.concurrent.ConcurrentHashMap[Seq[Any], Seq[Any]]()

  class HourlyExecutor extends graft.streaming.WarehouseSink.SqlExecutor {
    private var staged = List.empty[Seq[Any]]
    override def execute(sql: String, params: Seq[Any]): Unit = staged ::= params
    override def commit(): Unit =
      staged.reverse.foreach(p => hourlyWarehouse.put(p.take(2), p))
    override def rollback(): Unit = staged = Nil
    override def close(): Unit = ()
  }
  def newHourlyExec(): graft.streaming.WarehouseSink.SqlExecutor = new HourlyExecutor
}
