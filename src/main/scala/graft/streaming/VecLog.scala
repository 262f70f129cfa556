package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tiered append log for the VECTOR dedup sidecar — [[KeyedLog]]'s
  * shape (L0 per-batch segments, tiered folds, merge-on-read) with a
  * STRUCTURE-AWARE partitioner: segments fold partitioned by the
  * DEPTH-MASKED hyperplane signature instead of an md5 hash.
  *
  * Why md5 bucketing cannot serve this side: text band keys are
  * high-cardinality (xxhash64 of a signature slice — one key names a
  * handful of docs), so hashing keys into buckets spreads load and a
  * probe key's bucket stays small. Vector base buckets are the
  * opposite — `tables x 2^bits` keys TOTAL (e.g. 192), each holding
  * corpus/2^bits reps, so any key-hashed layout puts an index-sized
  * row set behind every probe key. The granularity that keeps a
  * probe's read bounded is exactly the one the probe itself uses:
  * the occupancy-derived REFINEMENT depth (Dedup.vecCandidates) —
  * overfull base buckets subdivide by deeper stored signature bits
  * until each refined bucket is ~cap-sized. So compacted segments
  * partition by `table * 2^sigBits + (sig & mask(depth(table,
  * base)))` under the depth map CURRENT AT FOLD TIME (recorded in
  * the segment as `_DEPTHS`), and a probe reads, per segment, the
  * one partition its masked signature lands in — ~cap rows, however
  * large the corpus. Frozen segments never grow, so a partition
  * bounded at fold time stays bounded; as occupancy rises, later
  * folds re-partition at the deeper map.
  *
  * Depth drift between a segment's recorded map and the probe's
  * current map is handled on read: a segment COARSER than the probe
  * (the common growth direction) still serves one partition that
  * SUPERSETS the probe's bucket; a segment DEEPER than the probe
  * (occupancy shrank after re-ingestions) enumerates the
  * `2^(segDepth - probeDepth)` child partitions, intersected against
  * the segment's actual directory listing. Like KeyedLog, every read
  * is a key-filterable SUPERSET and stale rows (re-ingested ids) are
  * dropped downstream by the id semi-join against the current index.
  *
  * Row schema: `(tbl int, sig long, id)` — one row per (rep, table),
  * `sig` the FULL stored deep signature for that table (the mask is
  * applied by the partitioner, so re-partitioning at a deeper map
  * needs no re-derivation).
  */
object VecLog {

  val DefaultFanout: Int = KeyedLog.DefaultFanout

  private val KbCol = "__kb"
  private val SegPrefix = "seg_"
  private val SegName = """seg_(c?\d+)-L(\d+)""".r
  private val DepthsFile = "_DEPTHS"

  /** A refinement depth map: base depth for every bucket except the
    * recorded overfull ones. Serialized into each folded segment.
    */
  case class Depths(bits: Int, sigBits: Int,
      over: Map[(Int, Long), Int]) {
    def apply(tbl: Int, base: Long): Int = over.getOrElse((tbl, base), bits)
    def serialize: String =
      (s"$bits $sigBits" +:
        over.toSeq.sortBy(k => (k._1._1, k._1._2)).map {
          case ((t, b), d) => s"$t\t$b\t$d"
        }).mkString("\n")
  }

  private def parseDepths(text: String): Depths = {
    val lines = text.trim.split("\n").map(_.trim).filter(_.nonEmpty)
    val head = lines.head.split(" ")
    Depths(head(0).toInt, head(1).toInt,
      lines.tail.map(_.split("\t"))
        .map(a => (a(0).toInt, a(1).toLong) -> a(2).toInt).toMap)
  }

  private case class Seg(name: String, level: Int)

  private def parseSeg(dirName: String): Option[Seg] = dirName match {
    case SegName(_, l) => Some(Seg(dirName, l.toInt))
    case _             => None
  }

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private def listSegs(spark: SparkSession, path: String): Seq[Seg] = {
    val f = fs(spark, path)
    if (!f.exists(new Path(path))) Seq.empty
    else f.listStatus(new Path(path)).toSeq
      .filter(_.isDirectory)
      .flatMap(st => parseSeg(st.getPath.getName))
  }

  /** The partition value of (tbl, sig) under a depth map — collision-
    * free within one map: the masked value's low `bits` ARE the base
    * bucket, and the base bucket determines the depth.
    */
  private def kbOf(d: Depths)(tbl: Int, sig: Long): Long = {
    val base = sig & ((1L << d.bits) - 1)
    (tbl.toLong << d.sigBits) | (sig & ((1L << d(tbl, base)) - 1))
  }

  /** Append one batch's (tbl, sig, id) rows as an L0 segment —
    * O(batch), overwrite-idempotent. A batch past
    * [[KeyedLog.L0MaxRows]] (a seed/backfill that IS the corpus)
    * lands depth-partitioned instead, so later probes prune it
    * immediately rather than re-reading it whole until the fold
    * cadence catches up.
    */
  def append(df: DataFrame, path: String, segId: Long,
      depths: Depths): Unit = {
    val rows = df.count() // callers pass materialized frames
    if (rows == 0) return
    if (rows > KeyedLog.L0MaxRows) appendBucketed(df, path, segId, depths)
    else df.write.mode("overwrite")
      .parquet(s"$path/${SegPrefix}$segId-L0")
  }

  /** Write rows directly as a folded, depth-partitioned L1 segment —
    * the backfill path for an index that predates the sidecar.
    */
  def appendBucketed(df: DataFrame, path: String, segId: Long,
      depths: Depths): Unit = {
    if (df.isEmpty) return
    writePartitioned(df, path, s"${SegPrefix}$segId-L1", depths,
      staged = false)
  }

  /** All rows that MAY share a refined bucket with the probe tuples —
    * L0 segments whole, folded segments pruned to the partitions the
    * probes' masked signatures land in under each segment's recorded
    * map. `probes` is driver-side by design: the sinks already
    * collect batch-bounded sets, and (tbl, sig) tuples are 12 bytes
    * per batch rep per table. `cur` is the probe-time depth map (for
    * the deeper-segment enumeration only). Returns None at bootstrap.
    */
  def readForKeys(spark: SparkSession, path: String,
      probes: Seq[(Int, Long)], cur: Depths): Option[DataFrame] = {
    val segs = listSegs(spark, path)
    if (segs.isEmpty) return None
    val f = fs(spark, path)
    // ONE multi-path scan per segment (partitions share a schema —
    // hundreds of per-partition relations would make planning time
    // dominate the probe)
    val parts: Seq[Seq[String]] = segs.map { s =>
      if (s.level == 0) Seq(s"$path/${s.name}")
      else {
        val d = parseDepths(readSmall(f, new Path(s"$path/${s.name}",
          DepthsFile)))
        val listed: Set[Long] = f.listStatus(new Path(s"$path/${s.name}"))
          .filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(KbCol + "="))
          .map(_.getPath.getName.stripPrefix(KbCol + "=").toLong).toSet
        val kbs: Set[Long] = probes.flatMap { case (t, sig) =>
          val base = sig & ((1L << d.bits) - 1)
          val ds = d(t, base)
          val dc = cur(t, base)
          if (ds <= dc) Seq(kbOf(d)(t, sig))
          else {
            // segment deeper than the probe: the probe's bucket is a
            // PREFIX of 2^(ds-dc) segment partitions — enumerate and
            // intersect with what exists
            val lo = (t.toLong << d.sigBits) | (sig & ((1L << dc) - 1))
            (0L until (1L << (ds - dc))).map(e => lo | (e << dc))
          }
        }.toSet
        kbs.intersect(listed).toSeq.sorted
          .map(b => s"$path/${s.name}/$KbCol=$b")
      }
    }.filter(_.nonEmpty)
    if (parts.nonEmpty)
      Some(parts.map(ps => spark.read.parquet(ps: _*))
        .reduce(_.unionByName(_, allowMissingColumns = true)))
    else
      // segments exist but no probed partition does: EMPTY frame, not
      // None — None means "no sidecar" (callers backfill on it)
      segs.iterator.flatMap { s =>
        val kids = f.listStatus(new Path(s"$path/${s.name}"))
        if (s.level == 0) Iterator.single(s"$path/${s.name}")
        else kids.iterator.filter(st => st.isDirectory &&
            st.getPath.getName.startsWith(KbCol + "="))
          .map(st => s"$path/${s.name}/${st.getPath.getName}")
      }.nextOption()
        .map(p => spark.read.parquet(p).limit(0).drop(KbCol))
  }

  /** Tiered fold at the CURRENT depth map (see [[KeyedLog.compact]]
    * for the level/crash discipline — identical here; the one
    * difference is the partitioner and the `_DEPTHS` record, which is
    * staged INSIDE the segment directory so the rename publishes data
    * and map atomically).
    */
  def compact(spark: SparkSession, path: String, depths: Depths,
      fanout: Int = DefaultFanout): Unit = {
    val f = fs(spark, path)
    if (!f.exists(new Path(path))) return
    f.listStatus(new Path(path))
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("_compact_tmp_"))
      .foreach(st => f.delete(st.getPath, true))
    var done = false
    while (!done) {
      val segs = listSegs(spark, path)
      val byLevel = segs.groupBy(_.level)
      byLevel.keys.toSeq.sorted
        .find(l => byLevel(l).size >= fanout) match {
        case None => done = true
        case Some(l) =>
          val src = byLevel(l)
          val gen = segs.map(_.name)
            .collect { case SegName(g, _) if g.startsWith("c") =>
              g.drop(1).toLong }
            .maxOption.getOrElse(0L) + 1
          val name = s"${SegPrefix}c$gen-L${l + 1}"
          val merged = src
            .map(s => spark.read.parquet(s"$path/${s.name}").drop(KbCol))
            .reduce(_.unionByName(_, allowMissingColumns = true))
          writePartitioned(merged, path, name, depths, staged = true)
          src.foreach(s => f.delete(new Path(s"$path/${s.name}"), true))
      }
    }
  }

  /** Per-batch cadence trigger (call AFTER the outer commit). */
  def maybeCompact(spark: SparkSession, path: String, depths: Depths,
      fanout: Int = DefaultFanout): Unit = {
    val segs = listSegs(spark, path)
    if (segs.nonEmpty &&
        segs.groupBy(_.level).values.exists(_.size >= fanout))
      compact(spark, path, depths, fanout)
  }

  private def writePartitioned(df: DataFrame, path: String,
      name: String, depths: Depths, staged: Boolean): Unit = {
    val spark = df.sparkSession
    val f = fs(spark, path)
    val target = if (staged) s"_compact_tmp_$name" else name
    val baseMask = (1L << depths.bits) - 1
    // depth lookup as an expression: base depth everywhere, the
    // (small, parameter-bounded) overfull map as a chain of WHENs
    val base = col("sig").bitwiseAND(lit(baseMask))
    // per-bucket MASK literals via a WHEN chain over the (parameter-
    // bounded) overfull map — base-depth mask everywhere else
    val maskExpr = depths.over.foldLeft(
      lit((1L << depths.bits) - 1): org.apache.spark.sql.Column) {
      case (acc, ((t, b), dep)) =>
        when(col("tbl") === t && base === b,
          lit((1L << dep) - 1)).otherwise(acc)
    }
    val kb = shiftleft(col("tbl").cast("long"), depths.sigBits)
      .bitwiseOR(col("sig").bitwiseAND(maskExpr))
    df.withColumn(KbCol, kb)
      .write.mode("overwrite").partitionBy(KbCol)
      .parquet(s"$path/$target")
    val dp = f.create(new Path(s"$path/$target", DepthsFile), true)
    try dp.write(depths.serialize.getBytes("UTF-8")) finally dp.close()
    if (staged && !f.rename(new Path(path, target), new Path(path, name)))
      throw new IllegalStateException(
        s"VecLog fold rename failed under $path ($name)")
  }

  private def readSmall(f: org.apache.hadoop.fs.FileSystem,
      p: Path): String = {
    val len = f.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, "UTF-8")
  }
}

/** Exact per-(table, base bucket) REP occupancy counters of a vector
  * dedup index, maintained INCREMENTALLY next to the sidecar — the
  * "occupancy in the manifest" half of the pruned probe: the
  * refinement depth map used to derive both the probe's candidate
  * buckets and the sidecar's partitioning comes from these counters
  * instead of a per-batch aggregate that explodes the whole stored
  * signature set. The counter file is parameter-bounded
  * (tables x 2^bits lines at most) and versioned by the index batch
  * it describes: a probe reads the file for the LAST COMMITTED index
  * version, so replay derives the identical map (the deterministic-
  * name idempotence discipline); a missing file (pre-sidecar index,
  * or a crash between counter write and index commit) falls back to
  * the one-shot aggregate, which these counters must always equal —
  * the update rule is the aggregate's algebra: + new batch rep rows'
  * buckets, - replaced rows' buckets where the replaced row was a
  * rep.
  */
private[streaming] object OccStats {

  private val Prefix = "_occ_v"

  def path(dir: String, ver: Long) = new Path(dir, s"$Prefix$ver")

  def read(spark: SparkSession, dir: String, ver: Long)
      : Option[Map[(Int, Long), Long]] = {
    val f = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val p = path(dir, ver)
    if (!f.exists(p)) return None
    val len = f.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = f.open(p)
    try in.readFully(0, buf) finally in.close()
    Some(new String(buf, "UTF-8").trim.split("\n")
      .filter(_.nonEmpty).map(_.split("\t"))
      .map(a => (a(0).toInt, a(1).toLong) -> a(2).toLong).toMap)
  }

  /** Write the counters for index version `ver`; retains the last 3
    * versions (the TableSync manifest-retention discipline).
    */
  def write(spark: SparkSession, dir: String, ver: Long,
      occ: Map[(Int, Long), Long]): Unit = {
    val f = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val payload = occ.toSeq.sortBy(k => (k._1._1, k._1._2))
      .collect { case ((t, b), n) if n != 0 => s"$t\t$b\t$n" }
      .mkString("\n")
    val out = f.create(path(dir, ver), true)
    try out.write(payload.getBytes("UTF-8")) finally out.close()
    if (f.exists(new Path(dir)))
      f.listStatus(new Path(dir))
        .filterNot(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith(Prefix))
        .map(n => n.stripPrefix(Prefix).toLong)
        .filter(_ < ver - 2)
        .foreach(v => f.delete(path(dir, v), false))
  }
}
