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
  * Per-batch cost mirrors the text sink: BATCH-proportional, not
  * index-proportional. The probe resolves the batch reps' signatures
  * through a [[VecLog]] sidecar — an append log partitioned by the
  * DEPTH-MASKED signature, the same refinement granularity the probe
  * matches at — to candidate rep ids, memberships through a
  * [[KeyedLog]], and reads only those index buckets
  * (TableSync.readCurrentForKeys). Refinement depths come from
  * [[OccStats]] — exact per-bucket rep counters maintained
  * incrementally (+ batch reps, - replaced reps) — so no stage
  * anywhere explodes the stored signature set. Vectors are never
  * re-signed; storage granularity still evolves via TableSync's
  * linear-hash splits, and LSH granularity via per-bucket signature
  * refinement (overfull base buckets subdivide by deeper stored bits
  * instead of being cap-dropped), with sidecar folds re-partitioning
  * at the then-current depth map.
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
      compactEvery: Int = DedupSync.DefaultCompactEvery,
      maxGens: Int = TableSync.DefaultMaxGens): StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyVecs(batch, indexPath, pairsPath, vecCol, idCol, batchId,
          threshold, bits, tables, dim, maxBucketSize, sigBits,
          numBuckets, maxBucketBytes, splitsPerBatch, compactEvery,
          maxGens)
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
      compactEvery: Int = DedupSync.DefaultCompactEvery,
      maxGens: Int = TableSync.DefaultMaxGens): Unit = {
    val spark = batch.sparkSession
    val applied = TableSync.versions(spark, indexPath)
    if (applied.exists(_ >= batchId)) return // replayed after commit
    val keysPath = DedupSync.sidecarPath(indexPath)
    val membersPath = indexPath.stripSuffix("/") + "_members"
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
    // An at-least-once source can redeliver the same id TWICE within
    // one micro-batch. The index upsert stores one row per id, but
    // everything derived per-ROW here — sidecar key rows and, most
    // critically, the OccStats INCREMENTS — would count the
    // duplicate, drifting the stored counters above the committed
    // index's true occupancy forever (replays read the stored file).
    // Dedup deterministically up front so every derivation sees
    // exactly the row the index will keep.
    val batchOne = batch.withColumn("__rn",
      row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol))
          .orderBy(xxhash64(to_json(struct(col(vecCol)))))))
      .filter(col("__rn") === 1).drop("__rn")
    val batchIdx = DedupSync.phase("v_hash_batch") {
      Dedup.vecDedupIndex(batchOne, vecCol, idCol, bits,
        tables, dim, storedSigBits).localCheckpoint()
    }
    // sidecar rows derived once: per-rep-per-table (tbl, sig, id) for
    // the bucket log, per-row (hash(keep), keep, id) for memberships
    val newVecKeys = DedupSync.phase("v_keys") {
      batchIdx.filter(col("id") === col("keep"))
        .select(col("id"), posexplode(col("sigs")))
        .select(col("pos").cast("int").as("tbl"), col("col").as("sig"),
          col("id"))
        .localCheckpoint() // probe collect + append + occ increments
    }
    val newMemberRows = batchIdx
      .select(xxhash64(col("keep")).as("bk"), col("keep"), col("id"))
    val baseMask = (1L << bits) - 1
    def bucketCounts(df: DataFrame): Map[(Int, Long), Long] =
      df.select(col("tbl"),
        col("sig").bitwiseAND(lit(baseMask)).as("b"))
        .groupBy(col("tbl"), col("b"))
        .agg(count(lit(1)).as("n"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val incs = bucketCounts(newVecKeys)
    val (pairs, newOcc) =
      if (applied.isEmpty)
        // first batch: within-batch pairs only (nothing indexed yet)
        (Dedup.vecPairsFromIndex(batchIdx, threshold, bits, tables,
          dim, maxBucketSize), incs)
      else {
        val lastVer = applied.max
        // exact committed-index occupancy — incremental counters, or
        // the one-shot aggregate (+ sidecar backfill) at migration
        val occ = DedupSync.phase("v_occ_read") {
          OccStats.read(spark, keysPath, lastVer).getOrElse(
            backfillSidecars(spark, indexPath, keysPath, membersPath,
              lastVer, bits, storedSigBits, maxBucketSize))
        }
        val depths = VecLog.Depths(bits, storedSigBits,
          Dedup.refineDepths(occ, maxBucketSize, bits, storedSigBits))
        val probes = newVecKeys.select(col("tbl"), col("sig"))
          .distinct().collect()
          .map(r => (r.getInt(0), r.getLong(1))).toSeq
        val batchIds = batchIdx.select(col("id")).distinct()
        val (prunedOpt, decSrc) =
          DedupSync.phase("v_veclog_read") {
            VecLog.readForKeys(spark, keysPath, probes, depths)
          } match {
            case None => (None, None) // empty committed index
            case Some(sc) =>
              // candidate-sized and consumed by FOUR subtrees (the
              // members kb collect + semi-join, the index bucket
              // collect + semi-join): materialize once, or the
              // VecLog multi-path scan re-executes per consumer
              val candReps = sc.select(col("id")).distinct()
                .localCheckpoint()
              def memberRead() = KeyedLog.readForKeys(spark,
                membersPath,
                candReps.select(xxhash64(col("id")).as("bk")), "bk")
                .map(_.join(
                  candReps.select(col("id").as("keep")),
                  Seq("keep"), "left_semi")
                  .select(col("id")))
              val memberIds = memberRead().getOrElse {
                // the members log is MISSING while keys/occ survive
                // (partial restore, manual cleanup): rebuild it from
                // the committed snapshot — treating membership as
                // empty would silently drop every cluster member's
                // pairs from this batch on, forever
                KeyedLog.appendBucketed(
                  readIndex(spark, indexPath)
                    .select(xxhash64(col("keep")).as("bk"),
                      col("keep"), col("id")),
                  membersPath, "bk", lastVer)
                memberRead().getOrElse(candReps.limit(0))
              }
              // ONE pruned index read serves the probe AND the
              // occupancy decrements (replaced rows are current rows
              // for the batch's own ids — the full probe would see
              // them too, so including them preserves equivalence)
              val allIds = candReps.unionByName(memberIds)
                .unionByName(batchIds).distinct()
                .localCheckpoint() // bucket collect + semi-join
              if (sys.env.contains("SPARK_GRAFT_PHASE_TIMING"))
                println(s"[phase] v_cand candReps=${candReps.count()} " +
                  s"members=${memberIds.count()} allIds=${allIds.count()}")
              val fetched = DedupSync.phase("v_pruned_read") {
                TableSync
                  .readCurrentForKeys(spark, indexPath, allIds, "id")
                  .join(allIds, Seq("id"), "left_semi")
                  .drop("ver")
                  .localCheckpoint() // candidate-sized; many consumers
              }
              (Some(fetched), Some(fetched))
          }
        val pruned = prunedOpt.getOrElse(
          readIndex(spark, indexPath).localCheckpoint())
        // decrements: rows the upsert replaces that were reps — their
        // buckets lose one rep each
        val decs = DedupSync.phase("v_decs") { decSrc.map { fetched =>
          bucketCounts(fetched
            .join(batchIds, Seq("id"), "left_semi")
            .filter(col("id") === col("keep"))
            .select(col("id"), posexplode(col("sigs")))
            .select(col("pos").cast("int").as("tbl"),
              col("col").as("sig")))
        }.getOrElse(Map.empty) }
        val merged = (occ.keySet ++ incs.keySet ++ decs.keySet).map {
          k => k -> (occ.getOrElse(k, 0L) + incs.getOrElse(k, 0L) -
            decs.getOrElse(k, 0L))
        }.filter(_._2 != 0L).toMap
        (Dedup.incrementalVecPairs(pruned, batchIdx, threshold, bits,
          tables, dim, maxBucketSize, occOverride = Some(occ)), merged)
      }
    // pairs FIRST (idempotent overwrite of this batch's directory),
    // then the sidecars + counters (all overwrite-idempotent; a
    // sidecar or counter file ahead of the index commit is benign —
    // phantom ids drop in the id semi-join, and the probe reads the
    // counter file OF the committed version), index LAST (the outer
    // commit point checked at entry)
    DedupSync.phase("v_pairs_write") {
      PairsStore.writeBatch(pairs, pairsPath, "cosine", batchId)
    }
    val newDepths = VecLog.Depths(bits, storedSigBits,
      Dedup.refineDepths(newOcc, maxBucketSize, bits, storedSigBits))
    DedupSync.phase("v_sidecar_write") {
      VecLog.append(newVecKeys, keysPath, batchId, newDepths)
      KeyedLog.append(newMemberRows, membersPath, batchId)
      OccStats.write(spark, keysPath, batchId, newOcc)
    }
    DedupSync.phase("v_index_commit") {
      TableSync.applyBatch(batchIdx.withColumn("ver", lit(batchId)),
        indexPath, "id", "ver", batchId, numBuckets, maxBucketBytes,
        splitsPerBatch, maxGens)
    }
    PairsStore.maybeCompact(spark, pairsPath, "cosine", compactEvery)
    VecLog.maybeCompact(spark, keysPath, newDepths)
    KeyedLog.maybeCompact(spark, membersPath, "bk")
  }

  /** Migration for an index that predates the sidecars: derive the
    * occupancy counters by the one-shot aggregate over the committed
    * snapshot, and seed BOTH sidecar logs from it as bucketed
    * segments — one O(index) pass, deterministic under replay
    * (committed state only).
    */
  private def backfillSidecars(spark: SparkSession, indexPath: String,
      keysPath: String, membersPath: String, lastVer: Long,
      bits: Int, sigBits: Int, maxBucketSize: Int)
      : Map[(Int, Long), Long] = {
    val full = readIndex(spark, indexPath)
    val vecKeys = full.filter(col("id") === col("keep"))
      .select(col("id"), posexplode(col("sigs")))
      .select(col("pos").cast("int").as("tbl"), col("col").as("sig"),
        col("id"))
      .localCheckpoint()
    val occ = vecKeys
      .select(col("tbl"),
        col("sig").bitwiseAND(lit((1L << bits) - 1)).as("b"))
      .groupBy(col("tbl"), col("b"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    VecLog.appendBucketed(vecKeys, keysPath, lastVer,
      VecLog.Depths(bits, sigBits,
        Dedup.refineDepths(occ, maxBucketSize, bits, sigBits)))
    KeyedLog.appendBucketed(
      full.select(xxhash64(col("keep")).as("bk"), col("keep"),
        col("id")),
      membersPath, "bk", lastVer)
    OccStats.write(spark, keysPath, lastVer, occ)
    occ
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
