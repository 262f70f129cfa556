package graft.streaming

import org.apache.hadoop.fs.{FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming upsert into a keyed snapshot table — the CDC-apply /
  * dimension-sync pattern: an update stream (key, version, attrs...)
  * folds into a table where the HIGHEST version per key wins, and
  * readers always see one consistent snapshot.
  *
  * Storage layout is snapshot-and-pointer: each micro-batch writes a
  * full new snapshot directory and then swaps the `_CURRENT` pointer
  * file. Two invariants make the pointer safe:
  *
  *   - FRESH-DIRECTORY RULE: a batch never writes into the directory
  *     the pointer currently resolves to. A replayed micro-batch
  *     (restart from a checkpoint whose commit never became durable —
  *     the pointer already names a `v<batchId>` variant) writes the
  *     next replay suffix `v<batchId>r<k>` instead of rewriting in
  *     place, so concurrent readers and a crash mid-write can never
  *     observe a half-written snapshot. The merge is idempotent
  *     (max-version-per-key over current ∪ batch), so every variant
  *     of a batch holds identical content — which is what upgrades
  *     foreachBatch's at-least-once to exactly-once table state.
  *   - ATOMIC OVERWRITE SWAP: the pointer is renamed over with
  *     `FileContext.rename(..., Options.Rename.OVERWRITE)` — a single
  *     atomic metadata operation. The previous delete-then-rename
  *     left a window with no `_CURRENT` at all; a crash there made
  *     the next batch silently rebuild the table from its own rows
  *     alone. If the pointer IS ever missing while snapshots exist,
  *     readers now fail loudly instead of guessing.
  *
  * The sink assumes a single writer; that assumption is CHECKED, not
  * trusted: the swap is conditional (re-read the pointer, require it
  * to still name the snapshot this batch merged from) and a detected
  * concurrent writer fails loudly rather than silently losing the
  * other writer's fold.
  *
  * Scale notes: this is the DIMENSION/state-table pattern (the table
  * is rewritten per batch — right when the table is MBs-to-GBs and
  * the stream is a trickle of changes); fact-scale streams go through
  * the append committer path instead. Production lakehouse formats
  * implement the same snapshot+pointer core with transactional
  * metadata layers; the previous two batches' snapshots are retained
  * so in-flight readers finish before GC.
  */
object TableSync {

  /** Snapshot directory names: `v<batchId>` or replay `v<batchId>r<k>`. */
  private val SnapName = """v(\d+)(?:r(\d+))?""".r

  private def batchOf(name: String): Option[Long] = name match {
    case SnapName(b, _) => Some(b.toLong)
    case _              => None
  }

  /** Start the upsert sink. `verCol` must be monotonically comparable
    * (ties are broken arbitrarily but deterministically only when the
    * tied rows are identical — use a strictly increasing version).
    */
  def upsertSink(
      updates: DataFrame, path: String, keyCol: String, verCol: String,
      checkpoint: String): StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(batch, path, keyCol, verCol, batchId)
      }
      .start()

  /** One merge step; also the batch-mode entry (backfill replays call
    * it directly with a synthetic batchId).
    */
  def applyBatch(
      batch: DataFrame, path: String, keyCol: String, verCol: String,
      batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prevName = currentName(spark, path)
    // Schema evolution, the additive half CDC streams actually hit:
    // an upstream that grows a column must not wedge the sink, so the
    // union tolerates missing columns on EITHER side (old snapshot
    // rows null-fill a new column; a source that dropped a column
    // null-fills it going forward rather than silently truncating
    // the table's history). Each snapshot is a fresh parquet write,
    // so the widened schema simply becomes the new table schema —
    // no in-place file surgery.
    val merged = prevName match {
      case Some(n) => spark.read.parquet(s"$path/$n")
        .unionByName(batch, allowMissingColumns = true)
      case None    => batch
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(verCol).desc)
    val snap = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // Fresh-directory rule: if the pointer already names a variant of
    // THIS batch (crash-after-swap replay), write the next replay
    // suffix — never the directory readers currently resolve. The
    // pointed-to snapshot also stays intact as the merge input, so no
    // read-then-overwrite-self plan exists on any path.
    val snapName = prevName.filter(n => batchOf(n).contains(batchId)) match {
      case Some(SnapName(_, r)) =>
        s"v${batchId}r${Option(r).map(_.toInt).getOrElse(0) + 1}"
      case _ => s"v$batchId"
    }
    snap.write.mode("overwrite").parquet(s"$path/$snapName")
    commitPointer(spark, path, prevName, snapName)
    // retain only this batch and the two previous (all variants of a
    // retained batch stay — a replay variant may be the pointed one)
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.listStatus(new Path(path))
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => batchOf(p.getName).exists(_ < batchId - 2))
      .foreach(fs.delete(_, true))
  }

  /** Conditional atomic pointer swap. Verifies the pointer still
    * names `expectedPrev` (what the caller merged from) and fails
    * loudly on mismatch — a concurrent writer's fold would otherwise
    * be silently discarded by a last-swap-wins race. The swap itself
    * is an overwrite-capable rename: one atomic metadata op, no
    * missing-pointer window.
    */
  private[streaming] def commitPointer(
      spark: SparkSession, path: String, expectedPrev: Option[String],
      snapName: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val nowName = currentName(spark, path)
    if (nowName != expectedPrev) throw new java.util.ConcurrentModificationException(
      s"concurrent writer detected under $path: pointer moved from " +
        s"${expectedPrev.getOrElse("<none>")} to " +
        s"${nowName.getOrElse("<none>")} since this batch read its " +
        "snapshot — refusing to swap (this sink is single-writer)")
    val tmp = fs.makeQualified(new Path(path, "_CURRENT.tmp"))
    val cur = fs.makeQualified(new Path(path, "_CURRENT"))
    val out = fs.create(tmp, true)
    try out.write(snapName.getBytes("UTF-8")) finally out.close()
    val fc = FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, cur, Options.Rename.OVERWRITE)
  }

  /** Retained snapshot batch ids (ascending, replay variants
    * deduped). The retention policy keeps the current batch plus the
    * two before it; older batches are GC'd by the next applyBatch.
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(path))) Seq.empty
    else fs.listStatus(new Path(path))
      .filter(_.isDirectory)
      .flatMap(s => batchOf(s.getPath.getName))
      .distinct.sorted.toSeq
  }

  /** Time-travel read of a specific retained snapshot — the audit /
    * reproduce-yesterday's-training-set path. Fails loudly when the
    * version fell out of retention (a silent fallback to current
    * would un-reproduce the run it exists to reproduce). If the
    * pointer names a replay variant of the requested batch, that
    * variant is read (it is the one guaranteed complete); all
    * variants of a batch hold identical content by idempotence.
    */
  def readVersion(
      spark: SparkSession, path: String, version: Long): DataFrame = {
    val name = currentName(spark, path)
      .filter(n => batchOf(n).contains(version))
      .getOrElse(s"v$version")
    val dir = new Path(path, name)
    val fs = dir.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dir)) throw new IllegalStateException(
      s"snapshot v$version not retained under $path " +
        s"(have: ${versions(spark, path).mkString(", ")})")
    spark.read.parquet(dir.toString)
  }

  /** The current consistent snapshot (errors if the table was never
    * written — callers own bootstrap).
    */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    readCurrentOpt(spark, path).getOrElse(
      throw new IllegalStateException(
        s"no _CURRENT pointer under $path — table never initialized"))

  private def readCurrentOpt(
      spark: SparkSession, path: String): Option[DataFrame] =
    currentName(spark, path).map(n => spark.read.parquet(s"$path/$n"))

  /** The snapshot-directory name the `_CURRENT` pointer resolves to.
    * None for a never-initialized table — which includes a batch-0
    * bootstrap in progress (v0 written, pointer not yet swapped; a
    * crash there replays batch 0 from scratch, correctly). A MISSING
    * pointer with batch>0 snapshots present, though, means a pointer
    * existed and something external deleted it (the atomic overwrite
    * swap never leaves this state); that fails loudly rather than
    * guessing a snapshot or, worse, letting the next batch silently
    * rebuild the table from its own rows alone.
    */
  private def currentName(
      spark: SparkSession, path: String): Option[String] = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val cur = new Path(path, "_CURRENT")
    if (!fs.exists(cur)) {
      val stray =
        if (!fs.exists(new Path(path))) Array.empty[String]
        else fs.listStatus(new Path(path))
          .filter(_.isDirectory)
          .map(_.getPath.getName)
          .filter(n => batchOf(n).exists(_ > 0))
      if (stray.nonEmpty) throw new IllegalStateException(
        s"_CURRENT pointer missing under $path but snapshots exist " +
          s"(${stray.sorted.mkString(", ")}) — refusing to guess; " +
          "restore the pointer to the intended snapshot")
      None
    } else {
      val len = fs.getFileStatus(cur).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(cur)
      try in.readFully(0, buf) finally in.close()
      Some(new String(buf, "UTF-8").trim)
    }
  }

  /** Enrich a micro-batch against the CURRENT dimension snapshot —
    * call from inside foreachBatch so each batch re-resolves the
    * pointer (a static DataFrame in a stream-static join binds ONE
    * snapshot for the whole query; slowly-changing dimensions need
    * the per-batch re-read). The dim side broadcasts.
    */
  def enriched(
      batch: DataFrame, dimPath: String, keys: Seq[String]): DataFrame =
    batch.join(
      broadcast(readCurrent(batch.sparkSession, dimPath)),
      keys, "left")
}
