package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling for training-data
  * pipelines.
  *
  * `df.sample(fraction, seed)` is NOT reproducible across runs whose
  * partitioning differs (the seed is mixed with the partition index),
  * which makes train/eval splits drift whenever the upstream layout
  * changes. Hash sampling keys the decision on the RECORD itself:
  * a row is in the sample iff a hex prefix of md5(key) falls below
  * the fraction threshold. Properties that matter at 100 TB:
  *
  *  - reproducible: same key => same decision, independent of
  *    partitioning, cluster size, or engine (the md5-prefix compare
  *    is plain string ordering — any SQL engine re-derives the split);
  *  - stable under appends: adding rows never flips existing
  *    membership (no re-shuffling of an RNG sequence);
  *  - composable: disjoint fraction BANDS give disjoint train/eval
  *    splits from one hash (sampleBand below);
  *  - one codegen'd scan, no shuffle, pushes down nothing extra.
  */
object Sampling {

  /** Number of hex chars of the md5 used for the threshold compare.
    * 6 hex digits = 24 bits: fraction resolution ~6e-8, collision
    * bias negligible.
    */
  private val HexDigits = 6
  private val Buckets = 1L << (4 * HexDigits)

  /** Lower-cased hex md5 prefix of the key column (string-cast). */
  def hashPrefix(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, HexDigits)

  /** Hex threshold string for a fraction in [0, 1]: rows with
    * hashPrefix < threshold are sampled. Exposed so oracle SQL can
    * inline the same literal.
    */
  def thresholdHex(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction")
    val t = math.min(Buckets, math.round(fraction * Buckets))
    // fraction 1.0 would need a 7th hex digit, which breaks the
    // fixed-width lexicographic compare ("ffffff" > "1000000"); "g"
    // sorts after every hex string in ASCII, in any engine
    if (t >= Buckets) "g"
    else ("%0" + HexDigits + "x").format(t)
  }

  /** Deterministic `fraction` sample keyed on `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double): DataFrame =
    df.filter(hashPrefix(col(keyCol)) < lit(thresholdHex(fraction)))

  /** Membership in the half-open hash band [lo, hi) — disjoint bands
    * form leak-free train/eval/test splits from the same key.
    */
  def sampleBand(
      df: DataFrame, keyCol: String, lo: Double, hi: Double): DataFrame = {
    require(lo <= hi, s"band [$lo, $hi)")
    val h = hashPrefix(col(keyCol))
    df.filter(h >= lit(thresholdHex(lo)) && h < lit(thresholdHex(hi)))
  }

  /** Per-row hex threshold for fraction = clamp(rate * weight, 0, 1):
    * the continuous generalization of `thresholdHex` (floor instead
    * of round — pick one and mirror it in the oracle). "g" handles
    * the fraction-1.0 width overflow exactly as thresholdHex does.
    */
  def weightedThresholdHex(weight: Column, rate: Double): Column = {
    val frac = least(greatest(weight * rate, lit(0.0)), lit(1.0))
    val t = floor(frac * Buckets).cast("long")
    when(t >= Buckets, lit("g"))
      .otherwise(lpad(lower(hex(t)), HexDigits, "0"))
  }

  /** Weight-proportional deterministic sampling: a row is kept iff
    * hashPrefix(key) < rate * weight, weight in [0, 1] — e.g. keep
    * documents with probability proportional to quality score, so
    * curation soft-prefers good data instead of hard-thresholding.
    * Same guarantees as hashSample: reproducible under any
    * partitioning, append-stable, engine-portable, zero shuffle.
    */
  def weightedHashSample(
      df: DataFrame, keyCol: String, weight: Column,
      rate: Double): DataFrame =
    df.filter(hashPrefix(col(keyCol)) < weightedThresholdHex(weight, rate))

  /** Domain-mix rebalancing: downsample every domain whose share of
    * the corpus exceeds `cap` to exactly that share (in expectation),
    * leaving under-represented domains whole — the standard LLM
    * training-mix repair ("CommonCrawl is 60% of tokens, cap it at
    * 25%"). rate_d = min(1, cap * N / n_d); a row survives iff
    * hashPrefix(key) clears the per-domain rate, so membership is a
    * pure function of (key, rate) — partitioning- and engine-stable —
    * and samples NEST across rate changes: when an append shifts a
    * domain's rate down, the new keep-set is a subset of the old one
    * (rows are only removed, never swapped), the property that keeps
    * incremental re-curation monotone.
    *
    * Scale shape: one groupBy over the domain column (tiny result:
    * one row per domain), rates broadcast back, corpus filtered in a
    * single scan — the 100 TB side never shuffles.
    */
  def capDomainShare(
      df: DataFrame, keyCol: String, domainCol: String,
      cap: Double): DataFrame = {
    require(cap > 0 && cap <= 1, s"cap $cap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy() // the frame is one row per domain — tiny
    val rates = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__rate",
        least(lit(1.0), lit(cap) * sum(col("__n")).over(w) / col("__n")))
      .drop("__n")
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashPrefix(col(keyCol)) <
        weightedThresholdHex(col("__rate"), 1.0))
      .drop("__rate")
  }

  /** Stratified deterministic sampling: per-stratum fractions (e.g.
    * downsample boilerplate sources, keep rare languages whole) —
    * the deterministic analog of `DataFrameStatFunctions.sampleBy`.
    * Strata absent from `fractions` default to 0 (dropped).
    */
  def stratifiedHashSample(
      df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double]): DataFrame = {
    val h = hashPrefix(col(keyCol))
    val thr = fractions.foldLeft(lit(thresholdHex(0.0))) {
      case (acc, (stratum, f)) =>
        when(col(strataCol) === stratum, lit(thresholdHex(f))).otherwise(acc)
    }
    df.filter(h < thr)
  }

  /** Leakage-free train/eval split: hash the dup-cluster
    * REPRESENTATIVE column, not the row key, so duplicate content
    * never straddles the boundary (a row-level split lets the eval
    * set score memorization). `repCol` must map every row to its
    * cluster representative — the fingerprint-group min id for exact
    * dups (c21's registration), or `Dedup.clusterReps` output for
    * near-dup clusters. Deterministic under repartitioning/appends
    * like every primitive here.
    */
  def leakFreeSplit(
      df: DataFrame, repCol: String,
      trainFrac: Double = 0.9): DataFrame =
    df.withColumn("split",
      when(hashPrefix(col(repCol)) < lit(thresholdHex(trainFrac)),
        lit("train")).otherwise(lit("eval")))

  /** Cluster-balanced (diversity) sampling: cap each k-means cell of
    * an embedding space at `perCluster` rows so dense regions stop
    * dominating the subset — the DCLM/SemDeDup-adjacent "balance the
    * corpus by semantic cluster" curation step.
    *
    * Scale shape: cell assignment is a MAP pass (the trained
    * centroids embed as plan literals via Similarity.probeCells — no
    * join, no shuffle); the per-cell cap is ONE shuffle on cell, and
    * the rank <= perCluster filter plans WindowGroupLimit, so each
    * map task forwards at most perCluster rows per cell it holds —
    * never the dense cell's full population. Within-cell order is
    * the md5-uniform hash of the id (deterministic pseudo-random,
    * id tie-break), so the kept subset is reproducible and
    * oracle-replayable; training is driver-bounded
    * (coarseCentroids' capped deterministic sample).
    */
  def clusterBalancedSample(
      df: DataFrame, vecCol: String, idCol: String,
      centroids: Seq[(Int, Seq[Double])], perCluster: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cell =
      element_at(Similarity.probeCells(col(vecCol), centroids, 1), 1)
    val w = Window.partitionBy(col("cell")).orderBy(
      graft.functions.PortableHash.uniform60(col("id").cast("string")),
      col("id"))
    df.select(col(idCol).as("id"), cell.as("cell"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= perCluster)
  }
}
