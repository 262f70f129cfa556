package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

  /** Left-outer stream-stream interval join: every fact row emits.
    * Matched rows stream out immediately; an UNMATCHED fact emits
    * with null signal columns only once BOTH watermarks pass the
    * point where a matching signal could still arrive — outer
    * results are proofs of absence, and the state eviction that
    * produces them is the same mechanism that keeps join state
    * bounded at 100 TB/day rates (each side holds one watermark
    * horizon). Same join expression as [[intervalJoin]]; watermarks
    * are REQUIRED (an outer stream-stream join without them would
    * hold state forever and never emit the null side).
    */
  def intervalJoinOuter(
      facts: DataFrame, signals: DataFrame,
      lookback: String = "15 minutes",
      factsWatermark: String = "10 minutes",
      signalsWatermark: String = "20 minutes"): DataFrame = {
    val f = facts.withWatermark("ts", factsWatermark)
    val s = signals.withWatermark("rts", signalsWatermark)
    f.join(s, expr(
      s"""user_id = s_user_id AND
          rts BETWEEN ts - INTERVAL $lookback AND ts"""), "left_outer")
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

  /** Streaming heavy hitters — the unbounded twin of the batch CMS
    * pass (t09): per-token cumulative counts in ValueState, emitting
    * (token, count) exactly ONCE, at the moment a token's running
    * count first reaches `minCount`. Append-friendly (each key emits
    * at most one row ever), so the sink sees a monotonically growing
    * heavy set — the alerting contract ("tell me when a term becomes
    * hot"), not a changelog. State is one long per distinct token;
    * with the RocksDB provider that is the same budget as a streaming
    * distinct, and a TTL-horizon variant would bound it further.
    */
  def heavyHittersStream(
      tokens: Dataset[String], minCount: Long): Dataset[(String, Long)] = {
    import tokens.sparkSession.implicits._
    tokens.groupByKey(identity)
      .transformWithState(new HeavyHitterProcessor(minCount),
        TimeMode.None(), OutputMode.Append())
  }

  private class HeavyHitterProcessor(minCount: Long)
      extends StatefulProcessor[String, String, (String, Long)] {
    @transient private var count: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      count = getHandle.getValueState[Long]("count",
        org.apache.spark.sql.Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: String, rows: Iterator[String],
        timerValues: TimerValues): Iterator[(String, Long)] = {
      val before = if (count.exists()) count.get() else 0L
      val after = before + rows.size
      count.update(after)
      if (before < minCount && after >= minCount) Iterator((key, after))
      else Iterator.empty
    }
  }

  /** Streaming MinHash-LSH near-dup detection — the unbounded-ingest
    * twin of `Dedup.nearDupPairs`. Each arriving doc is banded into
    * `bands` (band, bucket) keys exactly as the batch `lshBuckets`
    * (same shingle/minhash/xxhash64 construction, so batch and stream
    * agree on candidates); per-bucket ListState holds the (id,
    * signature) of docs seen in that bucket, and a new arrival emits
    * one candidate pair per stored bucket-mate whose SIGNATURE
    * agreement fraction >= `threshold` (the MinHash estimate of
    * Jaccard — the streaming-honest choice: exact verification would
    * need full shingle sets in state, ~doc-sized; signatures are
    * fixed 1 KB).
    *
    * A pair that collides in several bands is emitted once per band
    * with the SAME estimate — `.dropDuplicates` downstream (or a
    * foreachBatch sink) collapses them, mirroring the batch
    * pipeline's bucket-union.
    *
    * State is bounded two ways: signatures are fixed-size, and `ttl`
    * (processing-time) expires bucket entries so the store holds one
    * horizon of docs — "dedup against the recent corpus", the only
    * tractable contract on an unbounded stream. Requires the RocksDB
    * state store provider, where a 100 TB-scale horizon lives
    * off-heap with changelog checkpointing.
    */
  def nearDupStream(
      docs: DataFrame, textCol: String, idCol: String,
      threshold: Double, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3,
      ttl: Option[java.time.Duration] = None,
      maxBucketSize: Int = 1000): Dataset[(Long, Long, Double)] = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    import docs.sparkSession.implicits._
    val r = numHashes / bands
    val sigs = docs.select(col(idCol).cast("long").as("id"),
      graft.functions.VectorFunctions.minhashSignature(
        graft.functions.VectorFunctions.shingleHashes(
          col(textCol), shingleSize), numHashes).as("sig"))
      .filter(col("sig").isNotNull)
    val banded = sigs
      .select(col("id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * r + 1, lit(r))))))
      .select(col("pos").as("band"), col("col").as("bucket"),
        col("id"), col("sig"))
      .as[(Int, Long, Long, Seq[Long])]
    banded.groupByKey(t => (t._1, t._2))
      .transformWithState(
        new LshBucketProcessor(threshold, ttl, maxBucketSize),
        if (ttl.isDefined) TimeMode.ProcessingTime() else TimeMode.None(),
        OutputMode.Append())
  }

  private class LshBucketProcessor(
      threshold: Double, ttl: Option[java.time.Duration],
      maxBucketSize: Int)
      extends StatefulProcessor[
        (Int, Long), (Int, Long, Long, Seq[Long]), (Long, Long, Double)] {
    @transient private var seen: ListState[(Long, Array[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[(Long, Array[Long])]("seen",
        org.apache.spark.sql.Encoders.product[(Long, Array[Long])],
        ttl.map(TTLConfig.apply).getOrElse(TTLConfig.NONE))

    override def handleInputRows(
        key: (Int, Long), rows: Iterator[(Int, Long, Long, Seq[Long])],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val stored = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
      if (seen.exists()) seen.get().foreach(stored += _)
      val out = Seq.newBuilder[(Long, Long, Double)]
      var warnedFull = false
      rows.foreach { case (_, _, id, sigSeq) =>
        val sig = sigSeq.toArray
        // Hot-bucket cap, mirroring the batch path's maxBucketSize: a
        // boilerplate flood without TTL would otherwise grow ListState
        // unboundedly and emit O(n) pairs per arrival (O(n^2)
        // cumulative). Past the cap the doc is neither paired nor
        // stored in THIS bucket — other (band, bucket) keys still
        // carry it, same recall trade the batch path makes. Safe for
        // exact-duplicate floods because exact dedup runs upstream.
        if (stored.length >= maxBucketSize) {
          if (!warnedFull) {
            System.err.println(
              s"[nearDupStream] bucket $key at maxBucketSize=" +
                s"$maxBucketSize; arrivals skipped in this bucket")
            warnedFull = true
          }
        } else if (!stored.exists(_._1 == id)) {
          // at-least-once replays re-deliver a doc: never pair an id
          // with itself, and don't store a second copy
          stored.foreach { case (oid, osig) =>
            var eq = 0
            var i = 0
            while (i < sig.length) {
              if (sig(i) == osig(i)) eq += 1
              i += 1
            }
            val est = eq.toDouble / sig.length
            if (est >= threshold)
              out += ((math.min(id, oid), math.max(id, oid), est))
          }
          stored += ((id, sig))
          seen.appendValue((id, sig))
        }
      }
      out.result().iterator
    }
  }

  /** Streaming funnel attribution — the unbounded twin of the batch
    * q42 fold: a per-user state machine (view -> click -> purchase,
    * each stage strictly after the previous in event time) that emits
    * one (user, stage, us) row the moment each stage is first
    * reached. State is three longs per user (Long.MinValue =
    * unreached — 0 and negative micros are legal event times), so
    * the store budget is that of a streaming distinct on user_id.
    * Changing this sentinel encoding is a state-format change:
    * checkpoints written under a different encoding must be
    * discarded or migrated, not resumed.
    *
    * Ordering contract: rows are sorted by (us, event_id) WITHIN each
    * micro-batch before folding, so the result equals the batch fold
    * whenever delivery is event-time-ordered across batches (the
    * job-queue contract here). Cross-batch late data would need the
    * watermark + ListState buffering pattern instead — that variant
    * trades the O(1) state for a horizon buffer; this one is the
    * arrival-order contract made explicit.
    */
  def funnelStream(
      events: Dataset[(Long, Long, Long, String)])
      : Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new FunnelProcessor(),
        TimeMode.None(), OutputMode.Append())
  }

  private class FunnelProcessor extends StatefulProcessor[
      Long, (Long, Long, Long, String), (Long, String, Long)] {
    @transient private var st: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long, Long)]("funnel",
        org.apache.spark.sql.Encoders.product[(Long, Long, Long)],
        TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[(Long, Long, Long, String)],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      // Long.MinValue = stage unreached: 0 or negative micros are
      // legal event times (epoch 1970 / pre-epoch), so they cannot
      // double as the sentinel without diverging from the batch
      // fold's null semantics
      val U = Long.MinValue
      var (v, c, p) = if (st.exists()) st.get() else (U, U, U)
      // Hot-key flood bound (the funnel's analog of nearDupStream's
      // maxBucketSize): a completed funnel drains arrivals with ZERO
      // buffering, and an incomplete one buffers only (stage, us)
      // pairs for stages still unreached — a bot replaying a finished
      // user or flooding one event type costs O(1) memory, not a
      // batch-slice sort. The sorted fold is replaced by the
      // equivalent min-scan: v = min(view us), c = min(click us > v),
      // p = min(purchase us > c) — first-reach semantics make the two
      // forms identical (each stage's fold value is the minimal
      // qualifying timestamp), which the batch-parity spec pins.
      if (p != U) return Iterator.empty
      val buf = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
      rows.foreach { case (_, us, _, t) =>
        t match {
          case "view" if v == U     => buf += ((0, us))
          case "click" if c == U    => buf += ((1, us))
          case "purchase" if p == U => buf += ((2, us))
          case _                    => ()
        }
      }
      def minOf(stage: Int, after: Long): Long = {
        var m = U
        buf.foreach { case (s, us) =>
          if (s == stage && us > after && (m == U || us < m)) m = us
        }
        m
      }
      val out = Seq.newBuilder[(Long, String, Long)]
      if (v == U) {
        val m = minOf(0, U)
        if (m != U) { v = m; out += ((key, "view", v)) }
      }
      if (v != U && c == U) {
        val m = minOf(1, v)
        if (m != U) { c = m; out += ((key, "click", c)) }
      }
      if (c != U && p == U) {
        val m = minOf(2, c)
        if (m != U) { p = m; out += ((key, "purchase", p)) }
      }
      st.update((v, c, p))
      out.result().iterator
    }
  }

  /** The LATE-DATA funnel: batch-equal answers under arbitrary
    * cross-batch disorder, where [[funnelStream]] is the O(1)-state
    * arrival-order contract. The trade is explicit and the reason
    * both variants exist: this one BUFFERS until the event-time
    * watermark closes the user's conversion window, so results are
    * emitted once per user at close (not eagerly per stage).
    *
    * Semantics: a user's funnel closes `windowMs` after their FIRST
    * view (the product-analytics conversion window). At close the
    * buffered events fold exactly like the batch q42: v = min(view),
    * c = min(click > v), p = min(purchase > c) — order-independent,
    * so ANY arrival order within the watermark yields the batch
    * answer. Events after close (or a replay of a closed user) are
    * dropped against a tombstone.
    *
    * Bounded state, by construction, not hope: the view slot stores
    * ONLY the running min (a late earlier view just lowers it);
    * clicks and purchases keep the `maxBuffered` SMALLEST timestamps
    * each (insertion keeps them sorted, the tail is dropped). The
    * fold is exact whenever a user has fewer than `maxBuffered`
    * clicks preceding their first view / purchases preceding their
    * first click — the pathological bot case beyond that degrades to
    * "stage unreached", never to a wrong earlier timestamp. Per-user
    * state is therefore <= 2*maxBuffered + 4 longs, the same flood
    * bound discipline as nearDupStream's maxBucketSize.
    *
    * TOTAL state is bounded too, not just per-key — an unbounded key
    * space must not accumulate rows forever:
    *  - A key with no view yet is evicted when the watermark passes
    *    `max(buffered event) + windowMs`. Exactness survives the
    *    eviction: a view accepted after that point has
    *    `ts > every evicted click/purchase`, and the fold only
    *    counts clicks AFTER the view — the evicted buffer could
    *    never have contributed to that view's funnel.
    *  - A closed funnel's tombstone lives `tombstoneTtlMs` past the
    *    close, then the key is deleted entirely. Within the TTL,
    *    post-close stragglers and replays drain silently; after it,
    *    only a fresh VIEW at least `tombstoneTtlMs` newer than the
    *    close could re-open the key (the one bounded deviation from
    *    batch, traded for total-state eviction — size the TTL to the
    *    sink's dedup horizon).
    */
  def funnelStreamLate(
      events: Dataset[(Long, Long, Long, String)],
      lateness: String = "10 minutes",
      windowMs: Long = 1000L,
      maxBuffered: Int = 64,
      tombstoneTtlMs: Long = 3600000L): Dataset[(Long, String, Long)] = {
    import events.sparkSession.implicits._
    events
      .toDF("user_id", "us", "event_id", "stage")
      .withColumn("ts", timestamp_micros(col("us")))
      .withWatermark("ts", lateness)
      .as[(Long, Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(
        new LateFunnelProcessor(windowMs, maxBuffered, tombstoneTtlMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** State: (done, minViewUs, timerAtMs, clicksUs, purchasesUs) —
    * clicks/purchases sorted ascending, capped at maxBuffered. The
    * timer slot holds whichever single timer the key owns: the close
    * (view seen), the view-less eviction deadline, or the tombstone
    * TTL (done) — `handleExpiredTimer` branches on the state, and a
    * firing that doesn't match the slot is a stale timer to ignore.
    */
  private class LateFunnelProcessor(
      windowMs: Long, maxBuffered: Int, tombstoneTtlMs: Long)
      extends StatefulProcessor[
        Long, (Long, Long, Long, String, java.sql.Timestamp),
        (Long, String, Long)] {
    private val U = Long.MinValue
    @transient private var st
        : ValueState[(Boolean, Long, Long, Seq[Long], Seq[Long])] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[
        (Boolean, Long, Long, Seq[Long], Seq[Long])]("lateFunnel",
        org.apache.spark.sql.Encoders
          .product[(Boolean, Long, Long, Seq[Long], Seq[Long])],
        TTLConfig.NONE)

    /** Insert keeping the smallest maxBuffered values, ascending. */
    private def bounded(xs: Seq[Long], v: Long): Seq[Long] = {
      if (xs.contains(v)) xs // at-least-once replay of the same event
      else {
        val (lo, hi) = xs.span(_ < v)
        ((lo :+ v) ++ hi).take(maxBuffered)
      }
    }

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Long, Long, String, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[(Long, String, Long)] = {
      var (done, v, timerAt, clicks, purchases) =
        if (st.exists()) st.get()
        else (false, U, U, Seq.empty[Long], Seq.empty[Long])
      if (done) return Iterator.empty // tombstone: closed funnels drain
      val hadView = v != U
      rows.foreach { case (_, us, _, stage, _) =>
        stage match {
          case "view"     => if (v == U || us < v) v = us
          case "click"    => clicks = bounded(clicks, us)
          case "purchase" => purchases = bounded(purchases, us)
          case _          => ()
        }
      }
      val wantTimer: Long =
        if (v != U) {
          // conversion window opens at the (possibly lowered) first
          // view; a LATE earlier view only moves the close EARLIER.
          // A view arriving on a key whose timer was the view-less
          // eviction deadline replaces it unconditionally.
          val close = v / 1000L + windowMs
          if (hadView && timerAt != U && timerAt < close) timerAt
          else close
        } else {
          // no view yet: evict when the watermark passes the newest
          // BUFFERED event + windowMs (+1 ms for the us->ms floor).
          // Any view accepted later is newer than everything evicted,
          // so nothing in this buffer could have counted for it.
          val mb = math.max(clicks.lastOption.getOrElse(U),
            purchases.lastOption.getOrElse(U))
          if (mb == U) U else mb / 1000L + windowMs + 1L
        }
      if (wantTimer != timerAt) {
        if (timerAt != U) getHandle.deleteTimer(timerAt)
        if (wantTimer != U) getHandle.registerTimer(wantTimer)
        timerAt = wantTimer
      }
      st.update((false, v, timerAt, clicks, purchases))
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[(Long, String, Long)] = {
      if (!st.exists()) return Iterator.empty
      val (done, v, timerAt, clicks, purchases) = st.get()
      // only the timer the state currently owns acts; anything else
      // is a superseded registration racing its deleteTimer
      if (expiredTimerInfo.getExpiryTimeInMs() != timerAt)
        return Iterator.empty
      if (done) { st.clear(); return Iterator.empty } // tombstone TTL up
      if (v == U) { st.clear(); return Iterator.empty } // view-less evict
      // the batch q42 fold, order-independent over the buffer
      val out = Seq.newBuilder[(Long, String, Long)]
      out += ((key, "view", v))
      val c = clicks.find(_ > v)
      c.foreach(cv => out += ((key, "click", cv)))
      val p = c.flatMap(cv => purchases.find(_ > cv))
      p.foreach(pv => out += ((key, "purchase", pv)))
      // tombstone (cheap: 4 longs, no buffers) so replays and
      // post-close stragglers drain without re-emitting — deleted
      // for good when the TTL timer fires
      val ttlAt = timerAt + tombstoneTtlMs
      getHandle.registerTimer(ttlAt)
      st.update((true, v, ttlAt, Seq.empty, Seq.empty))
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
