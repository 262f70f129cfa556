package graft.streaming

import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming upsert into a keyed snapshot table — the CDC-apply /
  * dimension-sync pattern: an update stream (key, version, attrs...)
  * folds into a table where the HIGHEST version per key wins, and
  * readers always see one consistent snapshot.
  *
  * Storage layout is BUCKETED snapshot-and-manifest: the table is
  * hash-partitioned into `numBuckets` buckets by key (md5-prefix of
  * the key, the same content-derived sharding as c06), and a batch
  * rewrites ONLY the buckets its rows touch:
  *
  * {{{
  *   table/
  *     _CURRENT                  # manifest: bucket -> snapshot dir
  *     _MANIFEST_v<b>[r<k>]      # archived manifest per commit
  *     v<b>[r<k>]/__bucket=N/    # bucket data written by batch b
  * }}}
  *
  * Write amplification per micro-batch is O(touched buckets / total
  * buckets), not O(table): a 1-row update rewrites one bucket —
  * 1/numBuckets of the table — while every untouched bucket's files
  * are carried forward BY REFERENCE in the manifest (zero IO; the
  * spec asserts they stay byte-identical across a batch). At 100 TB,
  * widen `numBuckets` (4096) so a bucket is a few GB; the reference's
  * own commit point is O(1) per job (SQS `m.delete()`,
  * GetJobs.py:39) and sub-table rewrite is the table-sink analogue.
  *
  * Three invariants make the pointer safe:
  *
  *   - FRESH-DIRECTORY RULE: a batch never writes into a directory
  *     the current manifest references. A replayed micro-batch
  *     (restart from a checkpoint whose commit never became durable —
  *     the manifest already names a `v<batchId>` variant) writes the
  *     next replay suffix `v<batchId>r<k>` instead of rewriting in
  *     place, so concurrent readers and a crash mid-write can never
  *     observe a half-written snapshot. The merge is idempotent
  *     (max-version-per-key over current ∪ batch), so every variant
  *     of a batch holds identical content — which is what upgrades
  *     foreachBatch's at-least-once to exactly-once table state.
  *   - ATOMIC OVERWRITE SWAP: the pointer is renamed over with
  *     `FileContext.rename(..., Options.Rename.OVERWRITE)` — a single
  *     atomic metadata operation, no missing-pointer window. If the
  *     pointer IS ever missing while snapshots exist, readers fail
  *     loudly instead of guessing.
  *   - EXCLUSIVE COMMIT LOCK: the read-check-swap in `commitPointer`
  *     runs under an atomically created `_LOCK` file
  *     (`FileSystem.createNewFile`), so two racing writers cannot
  *     both pass the expected-pointer check — the loser fails loudly
  *     with a ConcurrentModificationException rather than silently
  *     discarding the winner's fold. A crash INSIDE the lock window
  *     leaves a stale `_LOCK`; the next writer refuses with a message
  *     naming the file (verify no writer is alive, delete it) — loud
  *     recovery, never silent lost updates. On stores without atomic
  *     create-exclusive (raw S3 without a consistency layer) this
  *     degrades to best-effort detection.
  *
  * Time travel reads the archived manifest for a batch: each bucket
  * resolves to the snapshot dir that last rewrote it AS OF that
  * batch. GC retains the manifests of the current and two previous
  * batches and deletes only snapshot dirs no retained manifest
  * references — an untouched bucket's data may legitimately live in
  * a directory many batches old.
  *
  * Scale notes: this is the DIMENSION/state-table pattern; fact-scale
  * streams go through the append committer path instead. Production
  * lakehouse formats implement the same bucketed-snapshot+manifest
  * core with transactional metadata layers; `Layout.compact` covers
  * the periodic small-file fold if batches are tiny.
  */
object TableSync {

  /** Default bucket count — sized for MB-to-GB dimension tables;
    * widen (256/4096) for larger tables. Recorded in the manifest at
    * bootstrap so every later batch and reader agrees.
    */
  val DefaultBuckets = 16

  /** Snapshot directory names: `v<batchId>` or replay `v<batchId>r<k>`. */
  private val SnapName = """v(\d+)(?:r(\d+))?""".r

  private def batchOf(name: String): Option[Long] = name match {
    case SnapName(b, _) => Some(b.toLong)
    case _              => None
  }

  /** (batch, replaySuffix) ordering key — newest snapshot last. */
  private def snapOrder(name: String): (Long, Int) = name match {
    case SnapName(b, r) => (b.toLong, Option(r).map(_.toInt).getOrElse(0))
    case _              => (-1L, -1)
  }

  private val ManifestPrefix = "_MANIFEST_"
  private val BucketCol = "__bucket"

  /** The pointer payload: which snapshot directory serves each
    * bucket. `name` is the snapshot this manifest's commit wrote;
    * buckets the batch did not touch keep their previous directory.
    */
  private[streaming] case class Manifest(
      name: String, numBuckets: Int, entries: Map[Int, String]) {
    def serialize: String =
      (s"$name $numBuckets" +:
        entries.toSeq.sortBy(_._1).map { case (b, s) => s"$b\t$s" })
        .mkString("\n")
  }

  private def parseManifest(text: String): Manifest = {
    val lines = text.trim.split("\n").map(_.trim).filter(_.nonEmpty)
    val head = lines.head.split(" ")
    Manifest(head(0), head(1).toInt,
      lines.tail.map(_.split("\t")).map(a => a(0).toInt -> a(1)).toMap)
  }

  /** Content-derived bucket of the key: first 4 hex digits of
    * md5(key as string), mod numBuckets — identical on any engine or
    * partitioning (the c06 sharding discipline), so replays of the
    * same rows always land in the same buckets. Null keys fold to
    * bucket 0 rather than a null partition.
    */
  private def bucketExpr(keyCol: String, n: Int) = coalesce(
    pmod(conv(substring(md5(col(keyCol).cast("string")), 1, 4), 16, 10)
      .cast("int"), lit(n)),
    lit(0))

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
    * it directly with a synthetic batchId). Only buckets present in
    * `batch` are merged and rewritten; the rest of the table is
    * carried forward by manifest reference. `numBuckets` seeds a NEW
    * table only — an existing table's manifest wins, so a restart
    * with a different parameter cannot split keys across bucket
    * schemes.
    */
  def applyBatch(
      batch: DataFrame, path: String, keyCol: String, verCol: String,
      batchId: Long, numBuckets: Int = DefaultBuckets): Unit = {
    val spark = batch.sparkSession
    val prev = currentManifest(spark, path)
    val nb = prev.map(_.numBuckets).getOrElse(numBuckets)
    val bucketed = batch.withColumn(BucketCol, bucketExpr(keyCol, nb))
    // Touched buckets: bounded by numBuckets (a parameter), never by
    // data volume — the one driver-side collect in this sink.
    val touched = bucketed.select(BucketCol).distinct()
      .collect().map(_.getInt(0)).sorted
    // Fresh-directory rule: if the manifest already names a variant
    // of THIS batch (crash-after-swap replay), write the next replay
    // suffix — never a directory the current manifest references.
    val snapName = prev.map(_.name)
      .filter(n => batchOf(n).contains(batchId)) match {
      case Some(SnapName(_, r)) =>
        s"v${batchId}r${Option(r).map(_.toInt).getOrElse(0) + 1}"
      case _ => s"v$batchId"
    }
    // Previous rows for the touched buckets only. Buckets served by
    // the same snapshot directory share one parquet write (one
    // schema), so they batch into one multi-path scan.
    val prevRows: Option[DataFrame] = prev.flatMap { m =>
      val groups = touched
        .flatMap(b => m.entries.get(b).map(snap => snap -> b))
        .groupBy(_._1)
      if (groups.isEmpty) None
      else Some(groups.toSeq.map { case (snap, bs) =>
        spark.read.parquet(
          bs.map { case (_, b) => s"$path/$snap/$BucketCol=$b" }: _*)
      }.reduce(_.unionByName(_, allowMissingColumns = true)))
    }
    // Schema evolution, the additive half CDC streams actually hit:
    // the union tolerates missing columns on EITHER side (old bucket
    // rows null-fill a new column; a source that dropped a column
    // null-fills it going forward rather than silently truncating
    // history). Old-schema-first keeps stable column order; buckets
    // rewritten later simply carry the widened schema, and readers
    // re-align by name.
    val merged = prevRows match {
      case Some(p) =>
        p.withColumn(BucketCol, bucketExpr(keyCol, nb))
          .unionByName(bucketed, allowMissingColumns = true)
      case None => bucketed
    }
    val w = Window.partitionBy(col(keyCol)).orderBy(col(verCol).desc)
    val snap = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    snap.write.mode("overwrite").partitionBy(BucketCol)
      .parquet(s"$path/$snapName")
    val entries0 = prev.map(_.entries).getOrElse(Map.empty[Int, String]) ++
      touched.map(_ -> snapName)
    // Empty FIRST batch (legitimate: a stream can open on a quiet
    // source, or a dedup pairs table can have nothing to say yet):
    // partitionBy of zero rows writes no bucket directory, which
    // would commit a zero-entry manifest no reader can serve — there
    // is no schema anywhere. Write bucket 0 explicitly as an empty
    // parquet dir so the manifest always references real files.
    val entries =
      if (entries0.nonEmpty) entries0
      else {
        snap.drop(BucketCol).write.mode("overwrite")
          .parquet(s"$path/$snapName/$BucketCol=0")
        Map(0 -> snapName)
      }
    commitPointer(spark, path, prev.map(_.name),
      Manifest(snapName, nb, entries))
    gc(spark, path, batchId)
  }

  /** Retention: keep the manifests of this batch and the two previous
    * (all replay variants), then delete only snapshot directories no
    * retained manifest references — untouched buckets keep old
    * directories alive for as long as a retained manifest points at
    * them.
    */
  private def gc(spark: SparkSession, path: String, batchId: Long): Unit = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val st = fs.listStatus(new Path(path))
    val manifests = st.filterNot(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith(ManifestPrefix))
    val (retained, expired) = manifests.partition(n =>
      batchOf(n.stripPrefix(ManifestPrefix)).exists(_ >= batchId - 2))
    val referenced: Set[String] = retained.flatMap { n =>
      val m = parseManifest(readSmallFile(fs, new Path(path, n)))
      m.entries.values.toSeq :+ m.name
    }.toSet
    expired.foreach(n => fs.delete(new Path(path, n), false))
    st.filter(_.isDirectory).map(_.getPath)
      .filter(p => batchOf(p.getName).exists(_ < batchId - 2) &&
        !referenced.contains(p.getName))
      .foreach(fs.delete(_, true))
  }

  /** Conditional atomic pointer swap under an exclusive lock.
    *
    * `FileSystem.createNewFile` on `_LOCK` is atomic
    * create-exclusive, so only one writer can be inside the
    * read-check-swap at a time; the expected-pointer check then
    * catches a writer whose merge predates another's committed fold.
    * Either failure mode throws — never last-swap-wins. The archived
    * `_MANIFEST_<snap>` copy (time travel) is written before the
    * `_CURRENT` swap; a crash between the two leaves an orphan
    * archive whose content a replay rewrites identically
    * (idempotence), never a torn pointer.
    */
  private[streaming] def commitPointer(
      spark: SparkSession, path: String, expectedPrev: Option[String],
      manifest: Manifest): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val fs = new Path(path).getFileSystem(conf)
    val lock = fs.makeQualified(new Path(path, "_LOCK"))
    if (!fs.createNewFile(lock))
      throw new java.util.ConcurrentModificationException(
        s"commit lock $lock already exists — another writer is " +
          "mid-commit, or a writer crashed inside its commit window; " +
          "verify no writer is alive, then delete the lock file " +
          "(this sink is single-writer)")
    try {
      val nowName = currentManifest(spark, path).map(_.name)
      if (nowName != expectedPrev)
        throw new java.util.ConcurrentModificationException(
          s"concurrent writer detected under $path: pointer moved from " +
            s"${expectedPrev.getOrElse("<none>")} to " +
            s"${nowName.getOrElse("<none>")} since this batch read its " +
            "snapshot — refusing to swap (this sink is single-writer)")
      val payload = manifest.serialize.getBytes("UTF-8")
      val archive = fs.makeQualified(
        new Path(path, ManifestPrefix + manifest.name))
      val arc = fs.create(archive, true)
      try arc.write(payload) finally arc.close()
      val tmp = fs.makeQualified(new Path(path, "_CURRENT.tmp"))
      val cur = fs.makeQualified(new Path(path, "_CURRENT"))
      val out = fs.create(tmp, true)
      try out.write(payload) finally out.close()
      val fc = FileContext.getFileContext(fs.getUri, conf)
      fc.rename(tmp, cur, Options.Rename.OVERWRITE)
    } finally fs.delete(lock, false)
  }

  /** Retained snapshot batch ids (ascending, replay variants deduped)
    * — from the archived manifests, the unit of time travel.
    */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    if (!fs.exists(new Path(path))) Seq.empty
    else fs.listStatus(new Path(path))
      .filterNot(_.isDirectory)
      .map(_.getPath.getName)
      .filter(_.startsWith(ManifestPrefix))
      .flatMap(n => batchOf(n.stripPrefix(ManifestPrefix)))
      .distinct.sorted.toSeq
  }

  /** Time-travel read of a specific retained snapshot — the audit /
    * reproduce-yesterday's-training-set path. Fails loudly when the
    * version fell out of retention (a silent fallback to current
    * would un-reproduce the run it exists to reproduce). Resolves the
    * archived manifest of that batch: each bucket reads from the
    * directory that last rewrote it AS OF the requested batch. If the
    * current pointer names a replay variant of the requested batch,
    * that variant's manifest is read; all variants hold identical
    * content by idempotence.
    */
  def readVersion(
      spark: SparkSession, path: String, version: Long): DataFrame = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val variants =
      if (!fs.exists(new Path(path))) Array.empty[String]
      else fs.listStatus(new Path(path))
        .filterNot(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith(ManifestPrefix))
        .map(_.stripPrefix(ManifestPrefix))
        .filter(n => batchOf(n).contains(version))
    if (variants.isEmpty) throw new IllegalStateException(
      s"snapshot v$version not retained under $path " +
        s"(have: ${versions(spark, path).mkString(", ")})")
    val cur = currentManifest(spark, path).map(_.name)
    val name = cur.filter(variants.contains)
      .getOrElse(variants.maxBy(snapOrder))
    readManifest(spark, path, parseManifest(
      readSmallFile(fs, new Path(path, ManifestPrefix + name))))
  }

  /** The current consistent snapshot (errors if the table was never
    * written — callers own bootstrap).
    */
  def readCurrent(spark: SparkSession, path: String): DataFrame =
    currentManifest(spark, path)
      .map(readManifest(spark, path, _))
      .getOrElse(throw new IllegalStateException(
        s"no _CURRENT pointer under $path — table never initialized"))

  /** Current rows for the BUCKETS the given keys hash to — the
    * sub-table READ that pairs with applyBatch's sub-table write: a
    * maintenance fold touching k keys scans <= min(k, numBuckets)
    * bucket directories, never the table. The result is a superset of
    * the requested keys (a bucket holds other keys too) — callers
    * key-filter it. The bucket collect is bounded by numBuckets, the
    * same bounded driver set applyBatch already collects.
    */
  def readCurrentForKeys(spark: SparkSession, path: String,
      keys: DataFrame, keyCol: String): DataFrame = {
    val m = currentManifest(spark, path)
      .getOrElse(throw new IllegalStateException(
        s"no _CURRENT pointer under $path — table never initialized"))
    val touched = keys
      .select(bucketExpr(keyCol, m.numBuckets).as(BucketCol))
      .distinct().collect().map(_.getInt(0)).toSet
    val groups = m.entries.toSeq
      .filter { case (b, _) => touched(b) }
      .groupBy(_._2).toSeq
      .sortBy { case (snap, _) => snapOrder(snap) }.reverse
      .map { case (snap, bs) =>
        spark.read.parquet(
          bs.map { case (b, _) => s"$path/$snap/$BucketCol=$b" }: _*)
      }
    if (groups.isEmpty) readCurrent(spark, path).limit(0)
    else groups.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Union the bucket directories a manifest references. Buckets
    * served by the same snapshot write share a schema and batch into
    * one multi-path scan (the common all-buckets-current case is a
    * single scan); groups union newest-schema-first so a widened
    * column leads the output order and older buckets null-fill.
    */
  private def readManifest(
      spark: SparkSession, path: String, m: Manifest): DataFrame =
    m.entries.toSeq.groupBy(_._2).toSeq
      .sortBy { case (snap, _) => snapOrder(snap) }.reverse
      .map { case (snap, bs) =>
        spark.read.parquet(
          bs.map { case (b, _) => s"$path/$snap/$BucketCol=$b" }: _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))

  private def readSmallFile(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8")
  }

  /** The manifest the `_CURRENT` pointer resolves to. None for a
    * never-initialized table — which includes a batch-0 bootstrap in
    * progress (v0 written, pointer not yet swapped; a crash there
    * replays batch 0 from scratch, correctly). A MISSING pointer with
    * batch>0 snapshots or archived manifests present, though, means a
    * pointer existed and something external deleted it (the atomic
    * overwrite swap never leaves this state); that fails loudly
    * rather than guessing a snapshot or, worse, letting the next
    * batch silently rebuild the table from its own rows alone.
    */
  private def currentManifest(
      spark: SparkSession, path: String): Option[Manifest] = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val cur = new Path(path, "_CURRENT")
    if (!fs.exists(cur)) {
      val stray =
        if (!fs.exists(new Path(path))) Array.empty[String]
        else fs.listStatus(new Path(path))
          .map(_.getPath.getName)
          .map(n => if (n.startsWith(ManifestPrefix))
            n.stripPrefix(ManifestPrefix) else n)
          .filter(n => batchOf(n).exists(_ > 0))
      if (stray.nonEmpty) throw new IllegalStateException(
        s"_CURRENT pointer missing under $path but snapshots exist " +
          s"(${stray.distinct.sorted.mkString(", ")}) — refusing to " +
          "guess; restore the pointer to the intended snapshot")
      None
    } else Some(parseManifest(readSmallFile(fs, cur)))
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
