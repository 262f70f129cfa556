package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time streaming analytics over an `events`-shaped stream
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has NO event-time processing (its only "window" is
  * the CloudWatch scaling alarm, SURVEY.md §2.6); these are the
  * streaming twins of the batch queries q15/q16 — the SAME window
  * expressions run under `readStream` with watermarks, which is the
  * point: one declarative definition, batch and streaming execution.
  *
  * Watermark = bounded state: at 100 TB/day the state store only
  * keeps windows newer than the watermark horizon; without it a
  * streaming agg grows unboundedly.
  */
object EventStreams {

  /** Tumbling 1h counts per event_type (append mode after watermark). */
  def tumblingCounts(
      events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n"), col("v"))

  /** Sliding 30min/5min event counts. */
  def slidingCounts(
      events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "30 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Per-user running totals via explicit state
    * (flatMapGroupsWithState) — the §2.10 "stateful ops" surface for
    * logic `session_window`/windowed aggs can't express (custom
    * eviction, conditional emission). Emits an updated (user_id,
    * n_events, total_value) row whenever a user's cumulative value
    * crosses another multiple of `emitEvery`.
    *
    * State is per-key and partitioned by the shuffle on user_id —
    * exactly as scalable as a streaming agg; ProcessingTimeTimeout
    * would bound state lifetime in production.
    */
  def runningTotals(
      events: Dataset[(Long, Double)],
      emitEvery: Double = 100.0): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Double)],
         state: GroupState[(Long, Double)]) =>
          var (n, total) = state.getOption.getOrElse((0L, 0.0))
          val out = Seq.newBuilder[(Long, Long, Double)]
          rows.foreach { case (_, v) =>
            val crossed =
              (total / emitEvery).toLong != ((total + v) / emitEvery).toLong
            n += 1
            total += v
            if (crossed) out += ((user, n, total))
          }
          state.update((n, total))
          out.result().iterator
      }
  }

  /** Stream-stream INTERVAL join: each fact row (ts, user_id, …)
    * joins signal rows (rts, s_user_id, …) for the same user whose
    * event time falls in [ts - lookback, ts]. Both sides carry
    * watermarks, so Spark buffers only `lookback + watermark` worth
    * of state per side and evicts the rest — the bounded-state shape
    * stream-stream joins need to survive an unbounded feed (an
    * unconstrained join would buffer both streams forever).
    */
  def intervalJoin(
      facts: DataFrame, signals: DataFrame,
      lookback: String = "15 minutes",
      factsWatermark: String = "10 minutes",
      signalsWatermark: String = "20 minutes"): DataFrame = {
    val f = facts.withWatermark("ts", factsWatermark)
    val s = signals.withWatermark("rts", signalsWatermark)
    f.join(s, expr(
      s"""user_id = s_user_id AND
          rts BETWEEN ts - INTERVAL $lookback AND ts"""))
      .drop("s_user_id")
  }

  /** Streaming exact dedup: emit only the FIRST occurrence of each
    * content fingerprint; re-arrivals within the watermark horizon
    * are dropped. `dropDuplicatesWithinWatermark` is the only shape
    * that survives an unbounded stream — state for a fingerprint is
    * evicted once the watermark passes it, so the store holds one
    * horizon's worth of keys instead of growing forever (plain
    * `dropDuplicates` would). The streaming twin of `Dedup.exact`.
    */
  def dedupStream(
      docs: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp",
        graft.functions.TextFunctions.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** `runningTotals` on the transformWithState API — Spark 4's
    * arbitrary-state surface and the successor of
    * flatMapGroupsWithState: identical emit-on-threshold-crossing
    * semantics, expressed as a StatefulProcessor with a named, typed
    * ValueState handle. Requires the RocksDB state store provider
    * (StreamingSpec sets it per-query), which is the scale point:
    * state lives off-heap with changelog checkpointing instead of
    * filling executor heap, and the handle API adds per-state TTL and
    * schema evolution that the old (buffer, timeout) pair could not
    * express.
    */
  def runningTotalsTws(
      events: Dataset[(Long, Double)],
      emitEvery: Double = 100.0): Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new ThresholdTotalsProcessor(emitEvery),
        TimeMode.None(), OutputMode.Append())
  }

  private class ThresholdTotalsProcessor(emitEvery: Double)
      extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        org.apache.spark.sql.Encoders.product[(Long, Double)],
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      var (n, total) =
        if (totals.exists()) totals.get() else (0L, 0.0)
      val out = Seq.newBuilder[(Long, Long, Double)]
      rows.foreach { case (_, v) =>
        val crossed =
          (total / emitEvery).toLong != ((total + v) / emitEvery).toLong
        n += 1
        total += v
        if (crossed) out += ((key, n, total))
      }
      totals.update((n, total))
      out.result().iterator
    }
  }

  /** Gap-based sessions per user (30 min), same semantics as the
    * batch q16_sessionize.
    */
  def sessions(
      events: DataFrame, watermark: String = "30 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("session_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"), col("session_value"))
}
