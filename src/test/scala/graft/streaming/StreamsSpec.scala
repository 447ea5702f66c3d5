package graft.streaming

import graft.SparkSpec
import graft.streaming.Streams.{CoverageAttempt, CoverageState}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(1700000000000L + minute * 60000L)

  test("T2 stream: windowed counts with watermark over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val events = input.toDF().toDF("ts", "event_type")
    val counts = Streams.windowedEventCounts(events, "ts",
      watermark = "10 minutes", windowLen = "60 minutes")
    // AvailableNow snapshots offsets at start — enqueue first, then run
    // to completion (the T1 sweep trigger pattern).
    input.addData((ts(0), "view"), (ts(5), "view"), (ts(61), "purchase"))
    val q = counts.writeStream
      .format("memory").queryName("windowed_counts")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    q.stop()
    val rows = spark.table("windowed_counts")
      .collect().map(r => (r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("view", 2L), ("purchase", 1L)))
  }

  test("trending: ranking closed stream windows matches the batch rank") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.expressions.Window
    // the events_trending_topk pattern: the COUNT stage streams (with
    // watermark), ranking applies per sealed window downstream —
    // here the key column doubles as the item key.
    val data = Seq((ts(0), "a"), (ts(1), "a"), (ts(2), "b"), (ts(3), "b"),
      (ts(4), "b"), (ts(5), "c"), (ts(61), "b"), (ts(62), "c"), (ts(63), "c"))
    def rank2(df: DataFrame): Set[(Timestamp, Int, String, Long)] = {
      val w = Window.partitionBy($"window_start")
        .orderBy($"n".desc, $"event_type")
      df.withColumn("rank", row_number().over(w)).filter($"rank" <= 2)
        .collect()
        .map(r => (r.getTimestamp(0), r.getInt(3), r.getString(1),
          r.getLong(2))).toSet
    }
    val input = MemoryStream[(Timestamp, String)]
    val counts = Streams.windowedEventCounts(
      input.toDF().toDF("ts", "event_type"), "ts",
      watermark = "10 minutes", windowLen = "60 minutes")
    input.addData(data: _*)
    val q = counts.writeStream.format("memory").queryName("trend_counts")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val streamed = rank2(spark.table("trend_counts"))
    val batch = rank2(Streams.windowedEventCounts(
      data.toDF("ts", "event_type"), "ts",
      watermark = "10 minutes", windowLen = "60 minutes"))
    assert(streamed == batch)
    assert(streamed.map { case (_, r, k, n) => (r, k, n) } ==
      Set((1, "b", 3L), (2, "a", 2L), (1, "c", 2L), (2, "b", 1L)))
  }

  test("stream-stream interval join: watermarked two-input join ≡ batch join") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.DataFrame
    // purchases ⋈ preceding views within 1 hour, same key
    val views = Seq((1L, ts(0), 100L, 1.0), (1L, ts(30), 101L, 2.0),
      (1L, ts(200), 102L, 3.0), (2L, ts(5), 103L, 4.0))
    val buys = Seq((1L, ts(45), 900L), (1L, ts(210), 901L), (3L, ts(50), 902L))
    def collect(df: DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(5)))
      .toSet
    val li = MemoryStream[(Long, Timestamp, Long)]
    val ri = MemoryStream[(Long, Timestamp, Long, Double)]
    val joined = Streams.intervalJoinStream(
      li.toDF().toDF("key", "lts", "l_id"),
      ri.toDF().toDF("key", "rts", "r_id", "r_value"))
    li.addData(buys: _*); ri.addData(views: _*)
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    q.stop()
    val streamed = collect(spark.table("ss_join"))
    val batch = collect(Streams.intervalJoinStream(
      buys.toDF("key", "lts", "l_id"),
      views.toDF("key", "rts", "r_id", "r_value")))
    assert(streamed == batch)
    // purchase 900 sees views 100+101 (within the hour), 901 sees only
    // 102 (100/101 are >1h before), 902 has no same-key view
    assert(batch == Set((1L, 900L, 100L, 1.0), (1L, 900L, 101L, 2.0),
      (1L, 901L, 102L, 3.0)))
  }

  test("streaming sessionize: session_window merges within gap, splits across") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val sessions = Streams.sessionizeStream(events, "ts", gap = "30 minutes")
    input.addData((1L, ts(0), 1.5), (1L, ts(10), 2.0), (1L, ts(50), 4.0),
                  (2L, ts(5), 7.25))
    val q = sessions.writeStream
      .format("memory").queryName("stream_sessions")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    q.stop()
    val rows = spark.table("stream_sessions")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3), r.getDouble(4)))
      .toSet
    // user 1: {t0,t10} one session (gap 10m < 30m), {t50} a second
    assert(rows == Set(
      (1L, ts(0), 2L, 3.5), (1L, ts(50), 1L, 4.0), (2L, ts(5), 1L, 7.25)))
  }

  test("T3 state machine: success wins, transient failures retry, then persist") {
    val transitions = Seq(
      // identifier a: fail, fail, success on third try
      Seq(CoverageAttempt("a", "resolve", success = false)),
      Seq(CoverageAttempt("a", "resolve", success = false)),
      Seq(CoverageAttempt("a", "resolve", success = true)),
      // identifier b: three failures -> persistent
      Seq(CoverageAttempt("b", "resolve", success = false)),
      Seq(CoverageAttempt("b", "resolve", success = false)),
      Seq(CoverageAttempt("b", "resolve", success = false)),
      // attempts after persistence don't resurrect
      Seq(CoverageAttempt("b", "resolve", success = false)))

    // Drive the state machine directly (same function the streaming
    // query runs) — deterministic, no clock.
    val state = scala.collection.mutable.Map[String, CoverageState]()
    transitions.flatten.foreach { a =>
      val cur = state.getOrElse(a.identifier,
        CoverageState(a.identifier, "REGISTERED", 0))
      val next = applyOne(cur, a)
      state(a.identifier) = next
    }
    assert(state("a").status == "SUCCESS" && state("a").attempts == 3)
    assert(state("b").status == "PERSISTENT_FAILURE")
  }

  private def applyOne(cur: CoverageState, a: CoverageAttempt): CoverageState =
    if (cur.status == "SUCCESS") cur
    else if (a.success) cur.copy(status = "SUCCESS", attempts = cur.attempts + 1)
    else {
      val n = cur.attempts + 1
      cur.copy(status = if (n >= Streams.MaxRetries) "PERSISTENT_FAILURE"
                        else "TRANSIENT_FAILURE", attempts = n)
    }

  test("T3 streaming: flatMapGroupsWithState over MemoryStream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[CoverageAttempt]
    val out = Streams.coverageStateMachine(input.toDS())
    val q = out.writeStream
      .format("memory").queryName("coverage_states")
      .outputMode("update")
      .start()
    input.addData(CoverageAttempt("x", "resolve", success = false))
    q.processAllAvailable()
    input.addData(CoverageAttempt("x", "resolve", success = true),
                  CoverageAttempt("y", "resolve", success = true))
    q.processAllAvailable()
    q.stop()
    val last = spark.table("coverage_states").as[CoverageState]
      .collect().groupBy(_.identifier)
      .map { case (k, vs) => k -> vs.maxBy(_.attempts) }
    assert(last("x").status == "SUCCESS" && last("x").attempts == 2)
    assert(last("y").status == "SUCCESS" && last("y").attempts == 1)
  }

  test("T3 streaming: file-source leg (staged parquet, AvailableNow, multi-batch fold)") {
    // The t3_queue_drain driver entry stages attempts to parquet and
    // streams them back as a FILE source — this pins that leg: two
    // staged files forced into two micro-batches (maxFilesPerTrigger
    // 1), so an identifier spanning both emits one update row per
    // batch and the final-state fold (max attempts) must reduce them.
    val dir = java.nio.file.Files.createTempDirectory("t3_file_leg").toString
    Seq(CoverageAttempt("f", "resolve", success = false),
        CoverageAttempt("f", "resolve", success = false))
      .toDS().write.parquet(s"$dir/part1.parquet")
    Seq(CoverageAttempt("f", "resolve", success = false),
        CoverageAttempt("f", "resolve", success = false),
        CoverageAttempt("s", "resolve", success = true))
      .toDS().write.parquet(s"$dir/part2.parquet")
    val attempts = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[CoverageAttempt].schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/*.parquet")
      .as[CoverageAttempt]
    val q = Streams.coverageStateMachine(attempts)
      .writeStream.format("memory").queryName("coverage_states_file")
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally q.stop()
    val rows = spark.table("coverage_states_file").as[CoverageState].collect()
    // multi-batch emission really happened (f appears once per batch)
    assert(rows.count(_.identifier == "f") >= 2)
    val last = rows.groupBy(_.identifier)
      .map { case (k, vs) => k -> vs.maxBy(_.attempts) }
    assert(last("f").status == "PERSISTENT_FAILURE" && last("f").attempts == 4)
    assert(last("s").status == "SUCCESS" && last("s").attempts == 1)
  }

  test("T1 sweep: batch leg folds processed statuses into the state table") {
    val records = Seq(
      ("i1", "REGISTERED", 0),
      ("i2", "TRANSIENT_FAILURE", 1),
      ("i3", "SUCCESS", 1),
      ("i4", "TRANSIENT_FAILURE", 3)) // exhausted, not retried
      .toDF("identifier", "status", "attempts")
    val processed = Streams.sweepOnce(records, needing =>
      // the "provider": i1 succeeds, i2 fails again
      needing.select(col("identifier"),
        when(col("identifier") === "i1", "SUCCESS")
          .otherwise("TRANSIENT_FAILURE").as("status"),
        (col("attempts") + 1).as("attempts")))
    val out = processed.collect()
      .map(r => (r.getString(0), (r.getString(1), r.getInt(2)))).toMap
    assert(out("i1") == ("SUCCESS", 1))
    assert(out("i2") == ("TRANSIENT_FAILURE", 2))
    assert(out("i3") == ("SUCCESS", 1))  // untouched
    assert(out("i4") == ("TRANSIENT_FAILURE", 3)) // exhausted, untouched
  }
}
