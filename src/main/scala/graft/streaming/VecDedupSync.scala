package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Continuous EMBEDDING ingestion with online near-duplicate
  * detection — the vector twin of [[DedupSync]], composing the d13
  * batch contract ([[Dedup.incrementalVecPairs]]) under the same
  * two-store exactly-once discipline:
  *
  *  - the INDEX (one row per vector: id, vec, exact-dup group rep,
  *    deep hyperplane signature) lives in TableSync — keyed upsert
  *    (a re-ingested id replaces its row), bucketed snapshots,
  *    atomic commit pointer, time travel, and ONLINE BUCKET
  *    EVOLUTION armed by default (the storage layer widens as the
  *    corpus grows);
  *  - PAIRS (id_a, id_b, cosine) are immutable facts in the shared
  *    append-only [[PairsStore]] (one overwrite-idempotent directory
  *    per batch, max-merged on read, auto-compacted on a cadence).
  *
  * Write order pairs-first / index-second with the index manifest as
  * the outer commit point: a replay after crash-between recomputes
  * the same deterministic pairs (signatures are pure splitmix64
  * functions of the stored vectors), overwrites the same batch
  * directory, and commits the index — the reference's
  * ack-after-durable redelivery discipline (GetJobs.py:37-40).
  *
  * Per-batch cost mirrors the text sink: one streaming scan of the
  * index (bucket keys and refinement depths derive from STORED
  * signatures — vectors are never re-signed), batch-proportional
  * shuffles, and O(batch + splitsPerBatch) bucket rewrites. BOTH
  * growth axes are covered online: storage granularity via
  * TableSync's linear-hash splits, and LSH granularity via
  * per-bucket signature refinement (overfull base buckets subdivide
  * by deeper stored bits instead of being cap-dropped).
  */
object VecDedupSync {

  /** Start the online vector-dedup sink over a streaming (id, vec)
    * frame. Knob semantics match [[DedupSync.dedupSink]] (storage)
    * and [[Dedup.incrementalVecDups]] (LSH); `sigBits` is the stored
    * refinement headroom — it is fixed at bootstrap (recorded in the
    * index column metadata) and later batches sign at the STORED
    * depth, so changing the knob never diverges a live index.
    */
  def vecSink(vecs: DataFrame, indexPath: String, pairsPath: String,
      vecCol: String, idCol: String, checkpoint: String,
      threshold: Double, bits: Int = 4, tables: Int = 12,
      dim: Int = 64, maxBucketSize: Int = 10000, sigBits: Int = 16,
      numBuckets: Int = 256,
      maxBucketBytes: Long = DedupSync.DefaultMaxBucketBytes,
      splitsPerBatch: Int = TableSync.DefaultSplitsPerBatch,
      compactEvery: Int = DedupSync.DefaultCompactEvery): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyVecs(batch, indexPath, pairsPath, vecCol, idCol, batchId,
          threshold, bits, tables, dim, maxBucketSize, sigBits,
          numBuckets, maxBucketBytes, splitsPerBatch, compactEvery)
      }
      .start()

  /** One ingestion step; also the batch/backfill entry. Safe to call
    * again with an already-applied batchId (no-op). The batch's
    * vectors are signed exactly ONCE: the vec index built here feeds
    * the cross-corpus probe, the within-batch pairs, and the index
    * append. Pairs store canonical (id_a < id_b) through
    * [[PairsStore.writeBatch]].
    */
  def applyVecs(batch: DataFrame, indexPath: String, pairsPath: String,
      vecCol: String, idCol: String, batchId: Long,
      threshold: Double, bits: Int = 4, tables: Int = 12,
      dim: Int = 64, maxBucketSize: Int = 10000, sigBits: Int = 16,
      numBuckets: Int = 256,
      maxBucketBytes: Long = DedupSync.DefaultMaxBucketBytes,
      splitsPerBatch: Int = TableSync.DefaultSplitsPerBatch,
      compactEvery: Int = DedupSync.DefaultCompactEvery): Unit = {
    val spark = batch.sparkSession
    val applied = TableSync.versions(spark, indexPath)
    if (applied.exists(_ >= batchId)) return // replayed after commit
    // sign at the STORED depth when an index exists (a bootstrap knob
    // change must not diverge refined keys from stored signatures)
    val storedSigBits =
      if (applied.isEmpty) sigBits
      else {
        val cur = readIndex(spark, indexPath)
        cur.schema.fields.find(_.name == "sigs")
          .filter(_.metadata.contains("graft.lsh.sigbits"))
          .map(_.metadata.getLong("graft.lsh.sigbits").toInt)
          .getOrElse(bits)
      }
    val batchIdx = Dedup.vecDedupIndex(batch, vecCol, idCol, bits,
      tables, dim, storedSigBits).localCheckpoint()
    val pairs =
      if (applied.isEmpty)
        // first batch: within-batch pairs only (nothing indexed yet)
        Dedup.vecPairsFromIndex(batchIdx, threshold, bits, tables, dim,
          maxBucketSize)
      else
        Dedup.incrementalVecPairs(readIndex(spark, indexPath), batchIdx,
          threshold, bits, tables, dim, maxBucketSize)
    // pairs FIRST (idempotent overwrite of this batch's directory),
    // index SECOND (the outer commit point checked at entry)
    PairsStore.writeBatch(pairs, pairsPath, "cosine", batchId)
    TableSync.applyBatch(batchIdx.withColumn("ver", lit(batchId)),
      indexPath, "id", "ver", batchId, numBuckets, maxBucketBytes,
      splitsPerBatch)
    PairsStore.maybeCompact(spark, pairsPath, "cosine", compactEvery)
  }

  /** The accumulated near-dup pairs view (max-merged per pair). */
  def readPairs(spark: SparkSession, path: String): DataFrame =
    PairsStore.read(spark, path, "cosine")

  /** The live index view (what the next batch probes). */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    TableSync.readCurrent(spark, path).drop("ver")

  /** KEEP/DROP decisions over everything ingested: connected
    * components over accumulated pairs, min id per cluster keeps,
    * singletons keep themselves — identical to one-shot
    * `embeddingDupPairs`+clusterReps on the same corpus (spec-pinned).
    */
  def readKeepDecisions(spark: SparkSession, indexPath: String,
      pairsPath: String): DataFrame = {
    val ids = readIndex(spark, indexPath).select(col("id"))
    Dedup.clusterReps(ids, readPairs(spark, pairsPath))
      .select(col("id"), col("rep").as("keep"),
        (col("id") === col("rep")).as("is_rep"))
  }

  /** Maintenance fold for the pairs store (see
    * [[DedupSync.compactPairs]]).
    */
  def compactPairs(spark: SparkSession, path: String): Unit =
    PairsStore.compact(spark, path, "cosine")
}
