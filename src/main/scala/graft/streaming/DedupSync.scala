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
  * Exactly-once across TWO tables without a cross-table transaction:
  * the INDEX manifest's batch id is the outer commit point, and the
  * write order is pairs-first, index-second. Replay after
  * crash-after-index-commit: entry check sees the id applied, no-op.
  * Replay after crash-between (pairs committed, index not): the
  * recompute sees the same pre-batch index, derives the same pairs
  * (all hashing deterministic and seeded), and the pairs write skips
  * on its own already-applied version — then the index commits. The
  * same redelivery discipline as the reference's visibility timeout
  * (GetJobs.py:37-40 — ack only after the work is durable).
  *
  * A re-ingested id (upstream replay or content update) REPLACES its
  * index row (TableSync upsert) and upserts its pairs by pair key —
  * deterministic, no duplicates.
  */
object DedupSync {

  /** Start the online-dedup sink over a streaming (id, text) frame. */
  def dedupSink(docs: DataFrame, indexPath: String, pairsPath: String,
      textCol: String, idCol: String, checkpoint: String,
      threshold: Double = 0.5, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3, maxBucketSize: Int = 1000,
      hasher: Dedup.MinHashFamily = Dedup.MinHashFamily.Xx)
      : StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyDocs(batch, indexPath, pairsPath, textCol, idCol, batchId,
          threshold, numHashes, bands, shingleSize, maxBucketSize, hasher)
      }
      .start()

  /** One ingestion step; also the batch/backfill entry. Safe to call
    * again with an already-applied batchId (no-op).
    */
  def applyDocs(batch: DataFrame, indexPath: String, pairsPath: String,
      textCol: String, idCol: String, batchId: Long,
      threshold: Double = 0.5, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3, maxBucketSize: Int = 1000,
      hasher: Dedup.MinHashFamily = Dedup.MinHashFamily.Xx): Unit = {
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
    // pairs FIRST (idempotent upsert by pair key, own version guard),
    // index SECOND (the outer commit point checked at entry)
    if (!TableSync.versions(spark, pairsPath).exists(_ >= batchId)) {
      TableSync.applyBatch(
        pairs.select(
          concat(col("id_a").cast("string"), lit(":"),
            col("id_b").cast("string")).as("pair_key"),
          col("id_a"), col("id_b"), col("jaccard"),
          lit(batchId).as("ver")),
        pairsPath, "pair_key", "ver", batchId)
    }
    TableSync.applyBatch(newIdx.withColumn("ver", lit(batchId)),
      indexPath, "id", "ver", batchId)
  }

  /** The accumulated near-dup pairs view. */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    TableSync.readCurrent(spark, path)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** The live index view (what the next batch probes). */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    TableSync.readCurrent(spark, path).drop("ver")
}
