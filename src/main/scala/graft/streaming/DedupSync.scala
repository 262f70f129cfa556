package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Continuous corpus ingestion with ONLINE dedup — the streaming
  * composition of the d10 contract: every micro-batch of documents is
  * deduped against the persisted index of everything ingested before
  * it, its near-dup pairs append to a pairs table, and its own index
  * rows (fingerprint + shingle hashes + MinHash signature) append to
  * the index — both through TableSync storage, so the view inherits
  * the bucketed snapshot+manifest machinery (atomic commit pointer,
  * crash replay, time travel).
  *
  * Per-batch cost: the index side is ONE streaming scan (bucket keys
  * derive from STORED signatures — the corpus text is never re-read
  * or re-hashed, and the index never shuffles; incrementalNearDups'
  * contract) plus batch-proportional shuffles. An index scan per
  * micro-batch is the honest floor for global dedup — a new doc can
  * match anything ever ingested — and it is a scan, not a shuffle.
  *
  * Storage split, chosen by mutability: the INDEX needs keyed upsert
  * semantics (a re-ingested id replaces its row) and lives in
  * TableSync; PAIRS are immutable facts — a pair is emitted in
  * exactly the batch where its later doc arrives — so they are
  * APPEND-ONLY parquet, one directory per batch id. The first
  * DedupSync cut stored pairs through TableSync too, and the ladder
  * caught why that is wrong at scale: pair keys spread across every
  * bucket, so each batch's "upsert" re-read and rewrote the entire
  * accumulated pairs table (O(all pairs ever) per micro-batch). The
  * append-only form writes only the batch's own pairs.
  *
  * Exactly-once across TWO stores without a cross-store transaction:
  * the INDEX manifest's batch id is the outer commit point, and the
  * write order is pairs-first, index-second. Replay after
  * crash-after-index-commit: entry check sees the id applied, no-op.
  * Replay after crash-between (pairs written, index not): the
  * recompute sees the same pre-batch index, derives the same pairs
  * (all hashing deterministic and seeded), and overwrites the same
  * batch directory — idempotent. The same redelivery discipline as
  * the reference's visibility timeout (GetJobs.py:37-40 — ack only
  * after the work is durable). A source-level re-delivery of a doc
  * in a LATER batch can re-emit a pair; [[readPairs]] max-merges per
  * pair, so readers never see duplicates.
  */
object DedupSync {

  /** Start the online-dedup sink over a streaming (id, text) frame.
    *
    * `numBuckets` sizes the index's TableSync sub-table granularity
    * at BOOTSTRAP (the stored manifest wins afterwards) and is the
    * append-cost knob: a batch of B new ids touches ~B distinct
    * buckets, so each append rewrites ~B/numBuckets of the index —
    * size it so the expected batch is a small fraction. Dedup ids
    * are uniform — nothing co-locates them — so a batch of hundreds
    * of docs touches that many buckets. Ladder-measured extremes:
    * TableSync's 16-bucket default rewrote essentially the WHOLE
    * index per append, and 2048 buckets made the fixture-scale
    * bootstrap 7x slower on the per-bucket small-file floor; 256 is
    * the fixture sweet spot, and the right value grows with the
    * table (raise it once per-bucket parquet size clears a few MB).
    */
  def dedupSink(docs: DataFrame, indexPath: String, pairsPath: String,
      textCol: String, idCol: String, checkpoint: String,
      threshold: Double = 0.5, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3, maxBucketSize: Int = 1000,
      hasher: Dedup.MinHashFamily = Dedup.MinHashFamily.Xx,
      numBuckets: Int = 256): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDocs(batch, indexPath, pairsPath, textCol, idCol, batchId,
          threshold, numHashes, bands, shingleSize, maxBucketSize,
          hasher, numBuckets)
      }
      .start()

  /** One ingestion step; also the batch/backfill entry. Safe to call
    * again with an already-applied batchId (no-op).
    */
  def applyDocs(batch: DataFrame, indexPath: String, pairsPath: String,
      textCol: String, idCol: String, batchId: Long,
      threshold: Double = 0.5, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3, maxBucketSize: Int = 1000,
      hasher: Dedup.MinHashFamily = Dedup.MinHashFamily.Xx,
      numBuckets: Int = 256): Unit = {
    val spark = batch.sparkSession
    val applied = TableSync.versions(spark, indexPath)
    if (applied.exists(_ >= batchId)) return // replayed after commit
    // consumed by the pairs computation AND the index append
    val newIdx = Dedup.dedupIndex(batch, textCol, idCol, numHashes,
      shingleSize, hasher).localCheckpoint()
    val pairs =
      if (applied.isEmpty)
        // first batch: within-batch pairs only (nothing indexed yet)
        Dedup.nearDupPairs(batch, textCol, idCol, threshold, numHashes,
          bands, shingleSize, maxBucketSize, hasher = hasher)
      else
        Dedup.incrementalNearDups(
          TableSync.readCurrent(spark, indexPath).drop("ver"),
          batch, textCol, idCol, threshold, numHashes, bands,
          shingleSize, maxBucketSize, hasher = hasher)
    // pairs FIRST (append-only, overwrite of this batch's own
    // directory — idempotent under replay), index SECOND (the outer
    // commit point checked at entry)
    pairs.select(col("id_a"), col("id_b"), col("jaccard"))
      .write.mode("overwrite").parquet(s"$pairsPath/batch=$batchId")
    TableSync.applyBatch(newIdx.withColumn("ver", lit(batchId)),
      indexPath, "id", "ver", batchId, numBuckets)
  }

  /** The accumulated near-dup pairs view. Max-merged per pair: a
    * source-level re-delivery of a doc in a later batch re-emits its
    * pairs (identical values), and the merge collapses them.
    */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("id_a"), col("id_b"))
      .agg(max(col("jaccard")).as("jaccard"))

  /** The live index view (what the next batch probes). */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    TableSync.readCurrent(spark, path).drop("ver")
}
