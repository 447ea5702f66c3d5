package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming/incremental layer (SURVEY.md §2.9). The reference has no
  * true streaming — sweeps (`monitor.py:30-96`) and a registered-queue
  * drain (`coverage_provider.py:346-354`) — so this module gives those
  * patterns their Structured-Streaming shape, plus the watermark/window
  * semantics the reference lacks (documented engine-side addition):
  *
  *  - T1 sweeps → `readStream` + `Trigger.AvailableNow` over the state
  *    table (run-to-completion batches on a schedule);
  *  - T2 updates feed → watermarked windowed aggregation;
  *  - T3 queue drain → `flatMapGroupsWithState` per-identifier state
  *    machine (REGISTERED → SUCCESS / retried transient failure).
  */
object Streams {

  /** T2-as-stream — event counts per (window, type) with late-data
    * bound. Works on both streaming and batch frames (same API). */
  def windowedEventCounts(events: DataFrame, tsCol: String,
                          watermark: String = "10 minutes",
                          windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"))

  /** T11 — the COUNT stage of streaming trending-top-k: watermarked
    * tumbling windows keyed by ITEM ([[windowedEventCounts]] with the
    * ranked key in place of event_type). Ranking is not
    * stream-incrementalizable, so production ranks each SEALED window
    * downstream (foreachBatch / a batch pass over the sink) — the
    * split the events_trending_topk batch entry documents; StreamsSpec
    * pins stream ≡ batch for the composed pattern.
    */
  def trendingCounts(events: DataFrame, tsCol: String, keyCol: String,
                     watermark: String = "10 minutes",
                     windowLen: String = "1 day"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col(keyCol), col("n"))

  /** Streaming exact dedup with bounded state (LLM-pipeline brief): a
    * document stream deduplicated on a content fingerprint, keeping
    * state only within the watermark horizon —
    * `dropDuplicatesWithinWatermark` evicts fingerprints older than the
    * event-time bound, so state is O(docs per watermark window), not
    * O(all history). Pair with `TextDedup.shingleFingerprint` for the
    * fingerprint column.
    */
  def streamingDedup(docs: DataFrame, tsCol: String, fingerprintCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    docs.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(fingerprintCol)

  /** Streaming leg of [[graft.operators.Sessionize]] (LLM-pipeline
    * brief): gap-based session aggregation with `session_window` —
    * Spark merges overlapping per-event windows into sessions in the
    * state store, and the watermark closes sessions once no on-time
    * event can extend them, so state is O(open sessions), not O(all
    * history). Works on batch frames too (same API).
    *
    * Boundary note vs the batch operator: `session_window` ends a
    * session at last-event + gap and starts a new one when the next
    * event does not overlap that horizon, so a gap of EXACTLY the
    * threshold splits here, while the batch operator's `gap > threshold`
    * keeps it — document, don't paper over.
    */
  def sessionizeStream(events: DataFrame, tsCol: String,
                       gap: String = "30 minutes",
                       watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col("user_id"), session_window(col(tsCol), gap))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("total_value"))
      .select(col("user_id"),
              col("session_window.start").as("session_start"),
              col("session_window.end").as("session_end"),
              col("n_events"), col("total_value"))

  /** Watermarked STREAM-STREAM interval join — the two-input join
    * Structured Streaming supports natively: each left event pairs
    * with right events for the same key within `[left.ts − horizon,
    * left.ts]` (an attribution/as-of-window shape, e.g. purchases ⋈
    * preceding views). Both inputs carry watermarks and the join
    * condition is TIME-BOUND in both directions, which is what lets
    * Spark evict buffered rows: state is O(events per horizon +
    * watermark), not O(stream history). Works identically on batch
    * frames (StreamsSpec pins stream ≡ batch on shared input).
    *
    * Column contract: left = (key, lts, l_id), right = (key, rts,
    * r_id, r_value); output one row per qualifying pair.
    */
  def intervalJoinStream(left: DataFrame, right: DataFrame,
                         horizon: String = "1 hour",
                         watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("lts", watermark)
    val r = right.withWatermark("rts", watermark)
    l.join(r,
      l("key") === r("key") &&
        r("rts") <= l("lts") &&
        r("rts") >= l("lts") - expr(s"INTERVAL $horizon"),
      "inner")
      .select(l("key"), col("l_id"), col("lts"), col("r_id"), col("rts"),
        col("r_value"))
  }

  /** Streaming decontamination (LLM-pipeline brief): documents arrive
    * as a stream and are flagged against a STATIC benchmark set. The
    * bench side compiles ONCE into
    * [[graft.operators.Decontaminate.BenchIndex]] — the broadcast
    * Bloom filter plus the exact gram relation — and every micro-batch
    * replays the batch operator's map-side prefilter + exact verify
    * through `foreachBatch` (the [[sweepOnce]] precedent: identical
    * code path for batch and stream). No stream state is keyed at all:
    * state is O(1) regardless of stream length, because the only
    * "state" is the static bench index.
    *
    * @param sink receives (flagged contaminated docs, batchId) per
    *             micro-batch — same schema as the batch operator.
    * @return the CONFIGURED writer — the caller picks the trigger and
    *         calls `.start()` (and later stops the returned query).
    */
  def decontaminateEachBatch(stream: DataFrame,
                             idx: graft.operators.Decontaminate.BenchIndex,
                             idCol: String, textCol: String, n: Int = 13)
                            (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      sink(graft.operators.Decontaminate
        .contaminatedWithIndex(batch, idx, idCol, textCol, n), batchId)
    }

  /** One coverage attempt arriving on the queue. */
  final case class CoverageAttempt(identifier: String, operation: String,
                                   success: Boolean)

  /** Durable per-identifier coverage state (ref CoverageRecord
    * REGISTERED/SUCCESS/TRANSIENT_FAILURE semantics,
    * `coverage_provider.py:301`, `controller.py:664-666`). */
  final case class CoverageState(identifier: String, status: String,
                                 attempts: Int)

  val MaxRetries = 3

  /** T3 — the queue-drain state machine: first success wins; failures
    * retry until MaxRetries then become persistent failures. Encoded as
    * `flatMapGroupsWithState` so state lives in the streaming state
    * store, sharded by identifier — no driver-side bookkeeping.
    */
  def coverageStateMachine(
      attempts: Dataset[CoverageAttempt]): Dataset[CoverageState] = {
    import attempts.sparkSession.implicits._
    attempts
      .groupByKey(_.identifier)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout)(updateCoverage)
  }

  private[streaming] def updateCoverage(
      identifier: String, batch: Iterator[CoverageAttempt],
      state: GroupState[CoverageState]): Iterator[CoverageState] = {
    var cur = state.getOption.getOrElse(CoverageState(identifier, "REGISTERED", 0))
    batch.foreach { a =>
      if (cur.status != "SUCCESS") {
        cur =
          if (a.success) cur.copy(status = "SUCCESS", attempts = cur.attempts + 1)
          else {
            val n = cur.attempts + 1
            cur.copy(
              status = if (n >= MaxRetries) "PERSISTENT_FAILURE" else "TRANSIENT_FAILURE",
              attempts = n)
          }
      }
    }
    state.update(cur)
    Iterator.single(cur)
  }

  /** T1/T3 batch leg — one provider sweep over the state table: rows
    * needing coverage (REGISTERED, or retriable TRANSIENT_FAILURE) are
    * processed by `process` and folded back into the table. The
    * streaming wrapper runs exactly this inside `foreachBatch`; batch
    * callers (cron sweeps, `Trigger.AvailableNow`) call it directly —
    * same code path, idempotent.
    */
  def sweepOnce(records: DataFrame, process: DataFrame => DataFrame): DataFrame = {
    val needing = records.filter(
      col("status") === "REGISTERED" ||
      (col("status") === "TRANSIENT_FAILURE" && col("attempts") < MaxRetries))
    val processed = process(needing)
      .select(col("identifier"), col("status").as("new_status"),
              col("attempts").as("new_attempts"))
    records.join(processed, Seq("identifier"), "left")
      .select(col("identifier"),
        coalesce(col("new_status"), col("status")).as("status"),
        coalesce(col("new_attempts"), col("attempts")).as("attempts"))
  }
}
