package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
    // Any value in [0, salts) works for the big side (the dim side is
    // replicated across all salts); a per-row round-robin costs no
    // hashing at all — do NOT hash the whole row (16 cols of xxhash64
    // per row was the q24 bench outlier in round 1).
    val saltedBig = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (salted) aggregation for skewed group keys: partial
    * count/sum per (key, salt), then final combine per key. Spark's
    * hash agg already does map-side partials; this additionally
    * splits a hot key ACROSS reducers, bounding the final combine to
    * `salts` rows per key.
    */
  def saltedSumCount(
      df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    // Round-robin salt: splits a hot key uniformly across `salts`
    // partial groups with zero per-row hashing (the salt needs no
    // relationship to the data — it only has to be uniform).
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts)))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}
