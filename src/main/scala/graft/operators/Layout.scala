package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout operators for the 100 TB story: bucketing (shuffle
  * elimination for repeated co-located joins) and salting (manual
  * skew mitigation beyond what AQE's skew-join split handles).
  */
object Layout {

  /** Persist `df` as a bucketed+sorted table: rows are hash-
    * partitioned into `buckets` files by `key` at WRITE time, so every
    * subsequent equi-join or aggregation on `key` between tables
    * bucketed the same way runs with ZERO shuffle — the scan itself
    * reports the hash partitioning to Catalyst.
    *
    * At 100 TB this is the difference between re-shuffling the fact
    * table on every query and shuffling it once at ingest: bucket the
    * big fact tables on their join keys as the landing step.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // drop first: a previous run may have left an orphaned managed
    // location (e.g. a crash between mkdir and catalog commit), which
    // overwrite mode refuses to reuse
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two same-bucketed tables on their bucket key. With matching
    * bucket counts Catalyst plans a sort-merge join with NO Exchange
    * on either side (see LayoutSpec plan assertion).
    */
  def bucketedJoin(
      spark: SparkSession, leftTable: String, rightTable: String,
      key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Persist `df` hive-partitioned by `partCol` (one directory per
    * value). At 100 TB this is the other half of layout discipline
    * next to bucketing: equality/range predicates on the partition
    * column become PartitionFilters — pruned at PLANNING time, the
    * non-matching directories are never even listed into the scan.
    * Use low-cardinality columns (date, source, lang); high-cardinality
    * partitioning produces the small-files problem instead.
    */
  def writePartitioned(
      df: DataFrame, path: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Salted equi-join for pathological key skew: the skewed (big)
    * side gets a deterministic salt in [0, salts) derived from the
    * whole row; the dim side is replicated `salts` times. The join key
    * becomes (key, salt), splitting each hot key's rows across
    * `salts` reducers.
    *
    * Prefer AQE's skew-join (on by default in Engine.session) — it
    * splits oversized partitions without replicating the dim side.
    * Reach for manual salting when one KEY (not partition) is so hot
    * that even a split partition is a single straggler task, or when
    * the skewed side feeds an aggregation rather than a join.
    */
  def saltedJoin(
      skewed: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // The salt must be DETERMINISTIC IN ROW CONTENT: a positional
    // scheme (monotonically_increasing_id, rand) assigns different
    // salts when a lost map task is recomputed after shuffle-fetch
    // reordering, silently duplicating/dropping rows across (key,
    // salt) reduce partitions. Hash the key plus ONE extra column —
    // enough spread to split a hot key, without round 1's
    // 16-column-row hash (the q24 bench outlier).
    val saltedBig = skewed.withColumn("__salt",
      contentSalt(skewed, key, salts))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Deterministic per-row salt in [0, salts): xxhash64 of the group
    * key and the first non-key column (content-derived, so task retry
    * reproduces it — the shuffle-correctness requirement — yet only
    * two columns wide). Rows identical in both columns share a salt;
    * that only concedes skew-split uniformity, never correctness.
    */
  private[operators] def contentSalt(df: DataFrame, key: String, salts: Int) = {
    val extra = df.columns.filter(_ != key).take(1).map(col).toSeq
    pmod(xxhash64((col(key) +: extra): _*), lit(salts)).cast("int")
  }

  /** Spread the low 16 bits of `x` to the even bit positions of a
    * 32-bit value (the Morton-interleave half, classic magic-mask
    * ladder). Pure integer bit ops — codegen'd, and reproducible in
    * any SQL engine for the oracle.
    */
  private def spread16(x: Column): Column = {
    val v0 = x.cast("long")
    val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
    v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Morton (Z-order) value of two non-negative ints in [0, 2^16):
    * bits of `x` at even positions, `y` at odd. Nearby (x, y) points
    * get nearby z-values, so range-partitioning + sorting by zValue
    * clusters BOTH dimensions at once — the layout that makes
    * min/max data skipping work for 2-dimensional predicates where a
    * single-column sort only ever prunes one.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** Z-order clustering write: range-partition by zValue (so
    * partition boundaries cut the space-filling curve into compact
    * tiles), sort within partitions (so parquet row-group min/max
    * stats are tight), drop the helper column, write. At 100 TB this
    * is the landing-zone layout for fact tables queried by TWO
    * selective dimensions (e.g. part x supplier, user x date): every
    * file covers a small bounding box in both, so either predicate
    * prunes most files — see LayoutSpec's bounding-box assertion.
    * Columns must already be bounded to [0, 2^16); normalize first
    * (divide by max, as c11's query does) when they aren't.
    */
  def zorderWrite(
      df: DataFrame, path: String, cx: String, cy: String,
      partitions: Int): Unit =
    df.withColumn("__z", zValue(col(cx), col(cy)))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * count/sum per (key, salt), then final combine per key. Spark's
    * hash agg already does map-side partials; this additionally
    * splits a hot key ACROSS reducers, bounding the final combine to
    * `salts` rows per key.
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    // Content-derived salt (see contentSalt): deterministic under
    // task retry — a positional round-robin re-deals rows to
    // different (key, salt) partial groups when a map task is
    // recomputed, corrupting the partial sums. The hash mixes in a
    // third column beyond (key, value) because the common count-style
    // skew case has a CONSTANT value (e.g. 1) on the hot key — hashed
    // on (key, value) alone every hot row would land in one (key,
    // salt) group, silently defeating the split. Rows identical in
    // all three columns still share a salt: that only concedes
    // spread for fully-duplicate floods (dedup upstream), never
    // correctness.
    val extra = df.columns.filter(c => c != key && c != valueCol)
      .take(1).map(col).toSeq
    val salted = df.withColumn("__salt",
      pmod(xxhash64((col(key) +: col(valueCol) +: extra): _*), lit(salts)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }

  /** Bloom-prefiltered semi-join: keep the rows of `big` whose
    * `bigKey` appears in `keys.keyCol`, shuffling ONLY the rows that
    * survive a Bloom probe.
    *
    * Why not just broadcast? A 100M-key banlist is gigabytes as a
    * broadcast hash relation but ~100 MB as a 1%-fpp Bloom sketch —
    * the sketch travels in the task closure, the probe is a
    * codegen'd scan filter (zero shuffle of the 100 TB side), and
    * only Bloom survivors (true matches + ~fpp false positives) pay
    * the exact semi-join shuffle. False positives are REMOVED by
    * that exact join, so the result is identical to a plain
    * semi-join; false negatives cannot occur.
    *
    * The key-set side is scanned twice (count for sizing + filter
    * build) — negligible next to one avoided big-side shuffle.
    */
  def bloomSemiJoin(
      big: DataFrame, bigKey: String,
      keys: DataFrame, keyCol: String,
      fpp: Double = 0.01): DataFrame = {
    val ks = keys.select(xxhash64(col(keyCol)).as("__k")).distinct()
    val n = math.max(ks.count(), 1L)
    val bf = ks.stat.bloomFilter("__k", n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    bloomCandidates(big, bigKey, bytes)
      .join(keys.select(col(keyCol).as(bigKey)).distinct(),
        Seq(bigKey), "left_semi")
  }

  /** The prefilter stage of [[bloomSemiJoin]] alone (candidates may
    * include ~fpp false positives). Exposed so specs can measure the
    * Bloom stage's selectivity separately from the exact verify.
    */
  private[graft] def bloomCandidates(
      big: DataFrame, bigKey: String, bloomBytes: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.graft.expressions.bloom_might_contain
    big.where(bloom_might_contain(xxhash64(col(bigKey)), bloomBytes))
  }

  /** Small-file compaction: rewrite a parquet directory into files of
    * ~`targetBytes` each (post-compression), optionally re-clustered
    * on `sortCols` so min/max file skipping survives the rewrite.
    *
    * The small-files problem is the dominant ingest pathology at
    * 100 TB: a streaming or per-job producer (the reference writes
    * one output object per input object — GetJobs.py:57-60) lands
    * millions of KB-sized files, and every downstream scan pays a
    * task + open + footer-read per file. Compaction is the standing
    * repair: size the output file count from the INPUT's on-disk
    * bytes (already compressed, so the estimate transfers), then
    * one shuffle rewrites the directory.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compact(
      spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long = 128L << 20,
      sortCols: Seq[String] = Nil): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val summary = fs.getContentSummary(p)
    val nOut = math.max(1L,
      (summary.getLength + targetBytes - 1) / targetBytes).toInt
    val in = spark.read.parquet(inDir)
    val shaped =
      if (sortCols.nonEmpty)
        // range-partition on the cluster key: each output file covers
        // a compact key range -> parquet min/max skipping still prunes
        in.repartitionByRange(nOut, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else in.repartition(nOut)
    shaped.write.mode("overwrite").parquet(outDir)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outDir))
      .count(s => s.getPath.getName.endsWith(".parquet"))
    val inFiles = fs.listStatus(p)
      .count(s => s.getPath.getName.endsWith(".parquet"))
    (inFiles.toLong, outFiles.toLong)
  }
}
