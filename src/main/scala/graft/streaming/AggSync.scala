package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IncrementalAgg

/** Continuously-maintained count/sum rollup — the streaming twin of
  * c31's batch fold, stored through TableSync so the view inherits
  * the bucketed snapshot+manifest machinery (atomic commit pointer,
  * crash replay, time travel, sub-table rewrite).
  *
  * Per micro-batch the work is proportional to the BATCH, never the
  * view: the batch delta-aggregates locally (map-side combine), the
  * current state is read for the touched keys' buckets only
  * (TableSync.readCurrentForKeys — <= min(|batch keys|, numBuckets)
  * bucket dirs), and the key-local merge upserts only those keys'
  * buckets back. At 100 TB of accumulated view this is the difference
  * between a rollup you can afford per micro-batch and one you
  * cannot: O(|delta| + touched buckets), not O(table).
  *
  * Exactly-once: the fold is NOT idempotent (re-folding a batch
  * double-counts), so the manifest's batch id is the commit point. A
  * foreachBatch replay after crash-after-swap finds its own id (or a
  * later one) already applied and skips; a replay after
  * crash-BEFORE-swap finds state at batchId-1 and folds normally —
  * the same discipline as the reference's visibility-timeout redelivery
  * (GetJobs.py:39 deletes the message only after the work committed).
  */
object AggSync {

  /** Start the maintenance sink over a streaming `events` frame.
    * `numBuckets`/`maxBucketBytes`/`splitsPerBatch` are TableSync's
    * bucket-scheme knobs: a maintained view grows without bound, so
    * arm `maxBucketBytes` and the storage widens itself by bounded
    * linear-hashing splits exactly like the DedupSync index.
    */
  def countSumSink(events: DataFrame, path: String, keyCol: String,
      valCol: String, checkpoint: String,
      numBuckets: Int = TableSync.DefaultBuckets,
      maxBucketBytes: Long = DedupSync.DefaultMaxBucketBytes,
      splitsPerBatch: Int = TableSync.DefaultSplitsPerBatch,
      maxGens: Int = TableSync.DefaultMaxGens): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDelta(batch, path, keyCol, valCol, batchId, numBuckets,
          maxBucketBytes, splitsPerBatch, maxGens)
      }
      .start()

  /** One fold step; also the batch/backfill entry. Safe to call again
    * with an already-applied batchId (no-op).
    */
  def applyDelta(batch: DataFrame, path: String, keyCol: String,
      valCol: String, batchId: Long,
      numBuckets: Int = TableSync.DefaultBuckets,
      maxBucketBytes: Long = DedupSync.DefaultMaxBucketBytes,
      splitsPerBatch: Int = TableSync.DefaultSplitsPerBatch,
      maxGens: Int = TableSync.DefaultMaxGens): Unit = {
    val spark = batch.sparkSession
    val applied = TableSync.committedVersions(spark, path)
    if (applied.exists(_ >= batchId)) {
      // replay no-op; loud below the high-water mark (fresh-checkpoint
      // restart drops data silently otherwise — see DedupSync)
      if (applied.max > batchId)
        println(s"[AggSync] skipping batch $batchId below the table's " +
          s"high-water mark ${applied.max} under $path — if this " +
          "stream was restarted on a FRESH checkpoint its batch ids " +
          "restarted and its data is being dropped; resume from the " +
          "original checkpoint or use a new table path")
      return
    }
    // The delta aggregate is <= |batch keys| rows but its lineage is
    // the whole batch scan, and FOUR downstream actions replay it
    // (touched-bucket collects, the state semi-join, the snapshot
    // write). Materialize once — the fold then reads the batch
    // exactly once, which is the O(|delta| + touched buckets)
    // contract (ladder-measured: the 10-key batch-1 fold read SLOWER
    // than the full seed before this).
    val delta = batch.groupBy(col(keyCol))
      .agg(count(lit(1)).as("dn"),
        sum(col(valCol).cast("decimal(12,2)")).as("ds"))
      .localCheckpoint()
    val state =
      if (applied.isEmpty)
        delta.select(col(keyCol), col("dn").as("n"), col("ds").as("tot"))
          .limit(0)
      else
        TableSync.readCurrentForKeys(
            spark, path, delta.select(col(keyCol)), keyCol)
          .join(delta.select(col(keyCol)), Seq(keyCol), "left_semi")
          .select(col(keyCol), col("n"), col("tot"))
    val merged = IncrementalAgg
      .mergeCountSum(state, delta, keyCol, keepDeaths = true)
    TableSync.applyBatch(merged.withColumn("ver", lit(batchId)),
      path, keyCol, "ver", batchId, numBuckets, maxBucketBytes,
      splitsPerBatch, maxGens)
  }

  /** The live view: tombstoned (count-zero) groups filtered out, the
    * storage version column dropped.
    */
  def readView(spark: SparkSession, path: String): DataFrame =
    TableSync.readCurrent(spark, path)
      .filter(col("n") > 0L)
      .drop("ver")

  // ------------------------------------------------------------------
  // Maintained DISTINCT-count view — q50's KMV bottom-k sketch as the
  // per-key state. count/sum above are trivially additive; distinct
  // count is the textbook NON-additive aggregate, and the bottom-k
  // set is its textbook mergeable state: bottom-k(A ∪ B) =
  // bottom-k(bottom-k(A) ∪ bottom-k(B)), so the fold is lossless —
  // the maintained sketch is bit-identical to a from-scratch pass
  // (c33's oracle proves exactly this). State is <= k int64s per key,
  // per-batch cost O(|delta| + touched buckets); KMV is INSERT-ONLY
  // (sketches cannot retract), unlike the count/sum fold above.
  // ------------------------------------------------------------------

  /** Start a maintained distinct-count-per-key sink: the view tracks
    * approx_count_distinct(`valCol`) per `keyCol`, exact below `k`.
    */
  def kmvDistinctSink(events: DataFrame, path: String, keyCol: String,
      valCol: String, checkpoint: String, k: Int = 64,
      numBuckets: Int = TableSync.DefaultBuckets,
      maxBucketBytes: Long = DedupSync.DefaultMaxBucketBytes,
      splitsPerBatch: Int = TableSync.DefaultSplitsPerBatch,
      maxGens: Int = TableSync.DefaultMaxGens): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyKmvDelta(batch, path, keyCol, valCol, batchId, k,
          numBuckets, maxBucketBytes, splitsPerBatch, maxGens)
      }
      .start()

  /** One KMV fold step; also the batch/backfill entry. Replay-safe
    * the same way [[applyDelta]] is: the manifest batch id is the
    * commit point.
    */
  def applyKmvDelta(batch: DataFrame, path: String, keyCol: String,
      valCol: String, batchId: Long, k: Int = 64,
      numBuckets: Int = TableSync.DefaultBuckets,
      maxBucketBytes: Long = DedupSync.DefaultMaxBucketBytes,
      splitsPerBatch: Int = TableSync.DefaultSplitsPerBatch,
      maxGens: Int = TableSync.DefaultMaxGens): Unit = {
    val applied = TableSync.committedVersions(batch.sparkSession, path)
    if (applied.exists(_ >= batchId)) {
      // replay no-op; loud below the high-water mark (see applyDelta)
      if (applied.max > batchId)
        println(s"[AggSync] skipping batch $batchId below the table's " +
          s"high-water mark ${applied.max} under $path — if this " +
          "stream was restarted on a FRESH checkpoint its batch ids " +
          "restarted and its data is being dropped; resume from the " +
          "original checkpoint or use a new table path")
      return
    }
    // <= |batch keys| * k longs; materialized once for the same
    // four-consumer reason as applyDelta's delta
    val delta = IncrementalAgg.kmvDelta(batch, keyCol, valCol, k)
      .localCheckpoint()
    val state =
      if (applied.isEmpty)
        delta.select(col(keyCol), col("dkmv").as("kmv")).limit(0)
      else
        TableSync.readCurrentForKeys(
            batch.sparkSession, path, delta.select(col(keyCol)), keyCol)
          .join(delta.select(col(keyCol)), Seq(keyCol), "left_semi")
          .select(col(keyCol), col("kmv"))
    val merged = IncrementalAgg.mergeKmv(state, delta, keyCol, k)
    TableSync.applyBatch(merged.withColumn("ver", lit(batchId)),
      path, keyCol, "ver", batchId, numBuckets, maxBucketBytes,
      splitsPerBatch, maxGens)
  }

  /** The live distinct-count view: (key, n_seen, kth_min, est) —
    * `est` exact while the sketch is unsaturated, the (k-1)*2^60/
    * kth_min estimator past it.
    */
  def readDistinctView(spark: SparkSession, path: String,
      k: Int = 64): DataFrame =
    TableSync.readCurrent(spark, path)
      .select(col("*"), size(col("kmv")).as("n_seen"))
      .withColumn("kth_min",
        when(col("n_seen") >= k, element_at(col("kmv"), k)))
      .withColumn("est", IncrementalAgg.kmvEstimate(col("kmv"), k))
      .drop("ver", "kmv")
}
