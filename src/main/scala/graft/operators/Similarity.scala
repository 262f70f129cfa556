package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over embedding columns.
  *
  * Two paths (builder brief):
  *  - `bruteForceTopK`: exact baseline. The query set is broadcast
  *    (it is small by definition); the corpus is scanned once,
  *    partition-parallel, through the codegen'd native cosine; only
  *    (qid, id, sim) tuples — not vectors — reach the top-k shuffle.
  *  - `lshTopK`: the scale path. Hyperplane-LSH signatures bucket the
  *    corpus; a query only scans its own bucket (and optional
  *    1-bit-flip probes to recover near-boundary misses). At 100 TB
  *    the bucket join replaces the full scan with a 1/2^bits slice
  *    per probe; signatures are deterministic seeded hashes, so the
  *    "index" is just a column — no model state, rebuildable by a
  *    single select.
  */
object Similarity {

  /** Exact top-k neighbors for each query vector.
    * Returns (qid, id, cosine, rank), rank 1..k, self-match excluded,
    * deterministic tie-break by id.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("cvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** LSH-bucketed approximate top-k: compare a query only against
    * corpus vectors sharing a bucket in any of `tables` signature
    * tables, each optionally widened by 1-bit-flip multi-probe.
    * Candidate fraction per query ~ tables * (1+bits*probeBits) /
    * 2^bits of the corpus — the knob that turns a full scan into a
    * slice at scale.
    *
    * Scale policy: grow `bits` with corpus size (candidate work per
    * query ~ n/2^bits per table) and recover recall with `tables` /
    * multi-probe — tables cost linearly, occupancy costs linearly in
    * candidates here (top-k probes, not pairs), so the trade is
    * gentler than the dedup self-join's.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int = 8, tables: Int = 8, probeBits: Int = 1, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scored = lshCandidates(corpus, queries, bits, tables, probeBits,
      dim, idCol, vecCol)
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cvec")),
        Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The DISTINCT (qid, id) candidate pairs of [[lshTopK]] — the
    * bucketing stage alone, exposed so compositions (hard-negative
    * mining, bitext margin) can score arbitrary expressions over the
    * same candidate universe. ids only through the exploded bucket
    * join and the candidate distinct(): the vectors would multiply
    * shuffle width by tables x dim floats; callers re-join them once
    * per side on the (small) distinct pair set — the
    * Dedup.embeddingDupPairs pattern.
    */
  def lshCandidates(
      corpus: DataFrame, queries: DataFrame,
      bits: Int = 8, tables: Int = 8, probeBits: Int = 1, dim: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      posexplode(VectorFunctions.hyperplaneSigs(col(vecCol), bits, tables, dim)))
      .select(col("id"), col("pos").as("table"), col("col").as("bucket"))
    val qsig = queries.select(col(idCol).as("qid"),
      posexplode(VectorFunctions.hyperplaneSigs(col(vecCol), bits, tables, dim)))
      .select(col("qid"), col("pos").as("table"), col("col").as("qbucket"))
    // multi-probe: each (table, sig) probes itself plus 1-bit flips
    val probes: Seq[org.apache.spark.sql.Column] =
      col("qbucket") +: (if (probeBits >= 1)
        (0 until bits).map(b => col("qbucket").bitwiseXOR(lit(1L << b)))
      else Seq.empty)
    val q = qsig.select(col("qid"), col("table"),
      explode(array_distinct(array(probes: _*))).as("bucket"))
    c.join(broadcast(q), Seq("table", "bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
      .distinct() // a pair can meet via several tables/probes
  }

  /** IVF (inverted-file) approximate top-k: a k-means coarse
    * quantizer partitions the corpus into `nlist` cells; each query
    * scans only its `nprobe` nearest cells.
    *
    * Complements the LSH path: IVF adapts to the data distribution
    * (centroids follow density; LSH planes are data-oblivious) at the
    * cost of a training pass. At scale: train on a sample, assignment
    * is one broadcast-centroid map pass, and the cell id becomes a
    * partition/sort key so a cell scan is a partition-pruned read —
    * the classic vector-index layout, expressed as plain columns.
    */
  /** Train the coarse k-means quantizer on a bounded DETERMINISTIC
    * sample and return the centroids as plain (cell, center) pairs.
    * k-means over the full corpus is the scale-killer at 100 TB
    * (centroid quality saturates long before 10^5 points), and the
    * hash sample keeps the trained cells reproducible run-to-run.
    * count() over parquet is a stats-only read, not a scan. The
    * result is driver-resident and tiny (nlist x dim doubles) — small
    * enough to inline as plan literals (`probeCells`).
    */
  def coarseCentroids(
      df: DataFrame, vecCol: String, idCol: String,
      nlist: Int, seed: Long, maxTrainRows: Long): Seq[(Int, Seq[Double])] = {
    // Bounded deterministic sample -> ONE collect -> driver-side
    // Lloyd's. The previous ml.KMeans.fit ran ~10 Spark jobs over the
    // same bounded sample — pure scheduler overhead at any scale,
    // since the sample is capped regardless of corpus size (it
    // dominated d09/s03 wall-clock at sf0.1). Same algorithm, same
    // determinism, zero jobs beyond the sample scan.
    val n = df.count()
    val trainSrc =
      if (n <= maxTrainRows) df
      else Sampling.hashSample(df, idCol, maxTrainRows.toDouble / n)
    // SORT the collected sample before Lloyd's: collect order is
    // partition order, so content-equal frames with different
    // physical layouts (a parquet-sourced live set vs a fresh union)
    // would otherwise train ulp-different centroids — enough to flip
    // borderline cell assignments and diverge a rebuilt index from a
    // manual build on the same rows. Lexicographic on the vector
    // makes training a pure function of the sample SET.
    import scala.math.Ordering.Implicits._
    val train = trainSrc
      .select(VectorFunctions.asDouble(col(vecCol)).as("dv"))
      .collect().map(_.getSeq[Double](0).toArray)
      .sortBy(_.toSeq)
    require(train.length >= nlist,
      s"training sample ${train.length} < nlist $nlist")
    lloyd(train, nlist, iters = 10, seed = seed)
      .zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
  }

  /** The `nprobe` best cells for a vector, computed entirely per-row:
    * the centroid table is embedded as plan literals, each cell is
    * scored through the native cosine, and the top-nprobe are taken
    * by sorting the (score, cell) structs in-register. ZERO shuffle,
    * zero join — cell assignment of a 100 TB corpus is a map pass.
    * Ties break toward the lower cell id (deterministic).
    */
  def probeCells(
      vec: Column, centroids: Seq[(Int, Seq[Double])], nprobe: Int): Column = {
    val scored = array(centroids.map { case (i, c) =>
      struct(VectorFunctions.cosineSim(vec, lit(c.toArray)).as("csim"),
        lit(i).as("cell"))
    }: _*)
    val best = array_sort(scored, (l, r) =>
      when(l.getField("csim") > r.getField("csim"), -1)
        .when(l.getField("csim") < r.getField("csim"), 1)
        .when(l.getField("cell") < r.getField("cell"), -1)
        .when(l.getField("cell") > r.getField("cell"), 1)
        .otherwise(0))
    transform(slice(best, 1, nprobe), s => s.getField("cell"))
  }

  /** Scalar-quantized (int8) top-k with exact rescore — the
    * memory-bandwidth path: candidate scoring runs over
    * `array<tinyint>` vectors (4x smaller than float32, so a 100 TB
    * corpus scans 25 TB), then only the top `k * refine` candidates
    * per query are rescored against the full-precision vectors.
    *
    * Quantization uses ONE global scale (corpus max |x|, a scalar
    * agg): uniform scaling preserves cosine exactly, so the only
    * candidate-stage error is int8 rounding (~1e-2 on cosine). A
    * per-dimension scale would pack range better but is a diagonal
    * transform — it CHANGES cosine ordering; correctness first.
    * Returns (qid, id, cosine, rank) like the other top-k paths.
    */
  /** The global int8 quantization scale: corpus max |component|. A
    * scalar agg, guarded against the empty-corpus case (agg of zero
    * rows yields one NULL row — `head.getDouble` would NPE at
    * plan-BUILD time with a message naming nothing).
    */
  private def corpusAbsMax(corpus: DataFrame, vecCol: String): Double = {
    val r = corpus
      .agg(max(array_max(transform(col(vecCol), x => abs(x.cast("double"))))))
      .head
    require(!r.isNullAt(0), "corpus is empty — nothing to quantize")
    val scale = r.getDouble(0)
    require(scale > 0, "corpus has no nonzero vector component")
    scale
  }

  /** Clamped int8 quantization. The clamp matters for QUERY vectors:
    * the scale derives from the corpus, so a query component with
    * |x| > corpus max would round past 127 — and Spark's non-ANSI
    * tinyint cast silently WRAPS (+130 -> -126, corrupting candidate
    * ranking) while an ANSI engine replaying the same SQL errors.
    * Clamping to [-127, 127] on both engine and oracle sides keeps
    * out-of-range queries merely saturated, never sign-flipped.
    */
  private def quantInt8(v: Column, scale: Double): Column =
    transform(v, x =>
      least(greatest(round(x.cast("double") / scale * 127),
        lit(-127.0)), lit(127.0)).cast("tinyint").cast("float"))

  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame, k: Int, refine: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scale = corpusAbsMax(corpus, vecCol)
    // int8 VALUES carried as float arrays: quantization error is the
    // tinyint rounding, but the in-flight representation feeds the
    // native cosine directly — a per-PAIR element cast here would
    // allocate two arrays for every candidate row (measured 3x on the
    // scan). The 4x-smaller array<tinyint> form is the STORAGE layout
    // (what a quantized index column would persist); cast it once per
    // row on read, exactly as this projection does.
    def quant(v: Column): Column = quantInt8(v, scale)
    val cq = corpus.select(col(idCol).as("id"), quant(col(vecCol)).as("cvq"))
    val qq = queries.select(col(idCol).as("qid"), quant(col(vecCol)).as("qvq"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("id"))
    val cand = cq.crossJoin(broadcast(qq))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvq"), col("qvq")).as("qcos"))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * refine)
      .select("qid", "id")
    // rescore the small candidate set at full precision
    val scored = cand
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cvec")),
        Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 3, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxTrainRows: Long = 100000L): DataFrame = {
    val spark = corpus.sparkSession
    val centroids =
      coarseCentroids(corpus, vecCol, idCol, nlist, seed, maxTrainRows)
    import spark.implicits._
    val centDf = centroids.toDF("cell", "cvec_center")
    def scoredCells(df: DataFrame, id: String) =
      df.crossJoin(broadcast(centDf))
        .select(col(id), col(vecCol), col("cell"),
          VectorFunctions.cosineSim(col(vecCol), col("cvec_center")).as("csim"))
    // Corpus assignment (probes=1) is an ARGMAX, not a ranking: one
    // map-side-combinable hash agg per vector — no window sort of the
    // whole corpus. Tie-break on lower cell id via (csim, -cell) max.
    val cells = scoredCells(corpus.select(col(idCol).as("id"), col(vecCol)), "id")
      .groupBy(col("id"))
      .agg(max_by(struct(col("cell"), col(vecCol).as("cvec")),
        struct(col("csim"), (col("cell") * -1).as("nc"))).as("best"))
      .select(col("id"), col("best.cvec").as("cvec"), col("best.cell").as("cell"))
    // Query probing genuinely needs top-nprobe: window over the tiny
    // (|queries| x nlist) scored set.
    val wq = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cell"))
    val probed = scoredCells(
      queries.select(col(idCol).as("qid"), col(vecCol)), "qid")
      .withColumn("crank", row_number().over(wq))
      .filter(col("crank") <= nprobe)
      .select(col("qid"), col(vecCol).as("qvec"), col("cell"))
    val scored = cells.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
      .distinct()
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Product-quantization top-k (PQ + ADC scan + exact rescore) —
    * the memory-layout endgame of the ANN ladder: each corpus vector
    * is stored as `m` sub-codebook codes (8 bytes at m=8 vs 256 for
    * float32 dim-64 — a 32x scan-byte reduction, vs int8's 4x), and
    * candidate scoring is `m` lookup-table reads per pair instead of
    * `dim` multiplies (asymmetric distance computation, Jégou et al.
    * 2011, "Product Quantization for Nearest Neighbor Search").
    *
    * Spark mapping of the classic pieces:
    *  - training: Lloyd's on the driver over a bounded deterministic
    *    hash-sample (same policy as d09's SemDeDup cells) — at 100 TB
    *    the codebook trains on a sample by definition; centroids
    *    embed as plan literals, so encode is a ZERO-shuffle map pass.
    *  - encode: per subspace, argmax of (s·c - |c|²/2) over the 16
    *    centroid literals (equivalent to min L2), sorted in-register —
    *    the `probeCells` pattern, no UDF.
    *  - ADC: each (broadcast) query row precomputes its m x ksub
    *    lookup table ONCE from the same literals; the scan then does
    *    `aggregate(zip_with(codes, luts, lut[code]))` per pair —
    *    m array reads, the true ADC inner loop, inside codegen.
    *  - rescore: top k*refine by approximate dot are re-scored with
    *    the exact native cosine; both sides L2-normalized first so
    *    PQ's dot-product approximation IS the cosine approximation.
    * Returns (qid, id, cosine, rank); rows-only at the driver (the
    * codebook is data-derived), recall + exact-rescore pinned in
    * SimilaritySpec.
    */
  def pqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      m: Int = 8, ksub: Int = 16, refine: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, maxTrainRows: Long = 20000L): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m

    // ---- normalized working frames (dot == cosine on unit vectors)
    def unitized(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        VectorFunctions.asDouble(col(vecCol)).as("dv"))
        .withColumn("nrm", VectorFunctions.l2Norm(col("dv")))
        .filter(col("nrm") > 0)
        .select(col(outId), transform(col("dv"), x => x / col("nrm")).as("uv"))
    val cU = unitized(corpus, "id")
    val qU = unitized(queries, "qid")

    // ---- codebook: Lloyd's per subspace on a bounded driver sample
    val codebook = pqCodebook(corpus, m, ksub, seed, maxTrainRows,
      idCol, vecCol, dim)

    // ---- encode: argmax (s·c - |c|²/2) per subspace, in-register
    val codes = cU.select(col("id"),
      pqEncodeExpr(codebook, dsub, col("uv")).as("codes"))

    // ---- per-query ADC lookup tables from the same literals
    val qLut = qU.select(col("qid"),
      pqLutExpr(codebook, dsub, col("uv")).as("luts"))

    // ---- ADC scan: m lookup-table reads per pair
    val approx = codes.crossJoin(broadcast(qLut))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        aggregate(zip_with(col("codes"), col("luts"),
          (cd, lut) => element_at(lut, cd + 1)),
          lit(0.0), (acc, x) => acc + x).as("adot"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("adot").desc, col("id"))
    val cand = approx.withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * refine)
      .select("qid", "id")

    // ---- exact rescore of the candidate slice
    val scored = cand
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cvec")),
        Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  private def pqSubVec(v: Column, sub: Int, dsub: Int): Column =
    slice(v, sub * dsub + 1, dsub)

  /** Per-subspace argmax encoding (s·c - |c|²/2, ties to the lower
    * centroid index) — [[pqTopK]]'s encode stage, shared with the
    * IVF×PQ composition so both paths (and their oracles) replay the
    * identical expression.
    */
  private[graft] def pqEncodeExpr(
      codebook: Array[Array[Array[Double]]], dsub: Int,
      v: Column): Column = array(codebook.indices.map { sub =>
    val scored = array(codebook(sub).zipWithIndex.map { case (c, i) =>
      val half = c.map(x => x * x).sum / 2.0
      struct((VectorFunctions.dotProduct(pqSubVec(v, sub, dsub), lit(c)) - half)
        .as("score"), lit(i).as("idx"))
    }: _*)
    val best = array_sort(scored, (l, r) =>
      when(l.getField("score") > r.getField("score"), -1)
        .when(l.getField("score") < r.getField("score"), 1)
        .when(l.getField("idx") < r.getField("idx"), -1)
        .when(l.getField("idx") > r.getField("idx"), 1)
        .otherwise(0))
    element_at(best, 1).getField("idx")
  }: _*)

  /** Per-query ADC lookup tables from the same codebook literals. */
  private[graft] def pqLutExpr(
      codebook: Array[Array[Array[Double]]], dsub: Int,
      v: Column): Column = array(codebook.indices.map { sub =>
    array(codebook(sub).map(c =>
      VectorFunctions.dotProduct(pqSubVec(v, sub, dsub), lit(c))): _*)
  }: _*)

  /** The trained PQ codebook alone — [[pqTopK]]'s training stage,
    * exposed so the Verify-time oracle generator can re-derive the
    * SAME frozen codebook (training is seeded, bounded, and collect-
    * order deterministic) and inline it as SQL literals. Shape:
    * codebook(sub)(centroid)(dim/m).
    */
  def pqCodebook(
      corpus: DataFrame, m: Int, ksub: Int, seed: Long,
      maxTrainRows: Long, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64)
      : Array[Array[Array[Double]]] = {
    val dsub = dim / m
    val cU = corpus.select(col(idCol).as("id"),
      VectorFunctions.asDouble(col(vecCol)).as("dv"))
      .withColumn("nrm", VectorFunctions.l2Norm(col("dv")))
      .filter(col("nrm") > 0)
      .select(col("id"), transform(col("dv"), x => x / col("nrm")).as("uv"))
    val n = corpus.count()
    val sampled =
      if (n <= maxTrainRows) cU
      else Sampling.hashSample(cU, "id", maxTrainRows.toDouble / n)
    val train: Array[Array[Double]] = sampled.select(col("uv"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(train.length >= ksub, s"training sample ${train.length} < ksub")
    Array.tabulate(m)(sub => lloyd(
      train.map(v => java.util.Arrays.copyOfRange(v, sub * dsub, (sub + 1) * dsub)),
      ksub, iters = 10, seed = seed + sub))
  }

  /** IVF×PQ — the coarse quantizer COMPOSED with the ADC scan: the
    * actual billion-vector ANN shape (FAISS's IVFADC; Jégou et al.
    * 2011 §V). [[ivfTopK]] prunes WHICH vectors a query meets
    * (nprobe/nlist of the corpus) but scores full vectors; [[pqTopK]]
    * shrinks the COST of meeting one (m lookup reads vs dim
    * multiplies) but meets everyone. Composed: each query reads only
    * its probed cells' PQ codes — cell pruning multiplies with the
    * 32x code-byte reduction, and the exact rescore still touches
    * only k*refine full vectors per query.
    *
    * Spark mapping: centroids AND codebook are bounded-sample trained
    * and embedded as plan literals, so corpus cell assignment + PQ
    * encoding is ONE zero-shuffle map pass ([[probeCells]] argmax +
    * [[pqEncodeExpr]]) — at 100 TB this projection is the stored
    * index layout (cell as partition key, codes as an 8-16 byte
    * column). The probe side broadcasts (qid, cell, lut) rows, the
    * ADC scan is a broadcast HASH join on cell (each corpus row lives
    * in exactly ONE cell, so no dedup is needed), and only (qid, id,
    * adot) triples leave the scan. Plan-asserted (PlanShapeSpec): the
    * ADC input is the probed-cell join, never a corpus cross join.
    *
    * Returns (qid, id, cosine, rank) like the other top-k paths.
    */
  def ivfPqTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 3, m: Int = 8, ksub: Int = 16,
      refine: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, maxTrainRows: Long = 100000L,
      maxTrainRowsPq: Long = 20000L): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val dsub = dim / m
    val centroids =
      coarseCentroids(corpus, vecCol, idCol, nlist, seed, maxTrainRows)
    val codebook = pqCodebook(corpus, m, ksub, seed, maxTrainRowsPq,
      idCol, vecCol, dim)
    // one projection = the persisted index layout: raw double vector
    // for cell assignment (cosine is scale-invariant; same argmax as
    // the ivfTopK oracle), unit vector for PQ (dot == cosine)
    def prepared(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId),
        VectorFunctions.asDouble(col(vecCol)).as("dv"))
        .withColumn("nrm", VectorFunctions.l2Norm(col("dv")))
        .filter(col("nrm") > 0)
        .select(col(outId), col("dv"),
          transform(col("dv"), x => x / col("nrm")).as("uv"))
    val codes = prepared(corpus, "id").select(col("id"),
      element_at(probeCells(col("dv"), centroids, 1), 1).as("cell"),
      pqEncodeExpr(codebook, dsub, col("uv")).as("codes"))
    // probe side: nprobe cells + the ADC lookup table per query, all
    // from plan literals — broadcast-sized by construction
    val probed = prepared(queries, "qid").select(col("qid"),
      pqLutExpr(codebook, dsub, col("uv")).as("luts"),
      explode(probeCells(col("dv"), centroids, nprobe)).as("cell"))
    val approx = codes.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        aggregate(zip_with(col("codes"), col("luts"),
          (cd, lut) => element_at(lut, cd + 1)),
          lit(0.0), (acc, x) => acc + x).as("adot"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("adot").desc, col("id"))
    val cand = approx.withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * refine)
      .select("qid", "id")
    val scored = cand
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cvec")),
        Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF×SQ — the coarse quantizer composed with [[quantizedTopK]]'s
    * int8 memory-bandwidth scan (the third composition of the same
    * coarse cells: s03 scans full vectors, s14 PQ codes, this one
    * int8 — FAISS's IVFSQ shape). Each query meets only its probed
    * cells' quantized vectors, so cell pruning multiplies with the
    * 4x scan-byte reduction; the exact rescore touches k*refine full
    * vectors per query. Same literals-and-map-pass layout discipline
    * as [[ivfPqTopK]]: (cell, int8 vector) is the persisted index
    * projection, the probe side broadcasts, and the scan is a hash
    * join on cell.
    */
  def ivfQuantizedTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      nlist: Int = 16, nprobe: Int = 3, refine: Int = 4,
      seed: Long = 42L, idCol: String = "vec_id",
      vecCol: String = "embedding", dim: Int = 64,
      maxTrainRows: Long = 100000L): DataFrame = {
    val centroids =
      coarseCentroids(corpus, vecCol, idCol, nlist, seed, maxTrainRows)
    val scale = corpusAbsMax(corpus, vecCol)
    def quant(v: Column): Column = quantInt8(v, scale)
    val cells = corpus.select(col(idCol).as("id"),
      element_at(probeCells(
        VectorFunctions.asDouble(col(vecCol)), centroids, 1), 1).as("cell"),
      quant(col(vecCol)).as("cvq"))
    val probed = queries.select(col(idCol).as("qid"),
      quant(col(vecCol)).as("qvq"),
      explode(probeCells(
        VectorFunctions.asDouble(col(vecCol)), centroids, nprobe))
        .as("cell"))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("id"))
    val cand = cells.join(broadcast(probed), Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvq"), col("qvq")).as("qcos"))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * refine)
      .select("qid", "id")
    val scored = cand
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cvec")),
        Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Johnson-Lindenstrauss two-stage top-k: scan in a `projDim`-dim
    * Achlioptas (+-1) random-projection sketch, keep an oversampled
    * shortlist per query, then exact-rescore only the shortlist in
    * the original space. The complement of the other ANN paths:
    * LSH/IVF prune WHICH vectors a query meets (sublinear candidate
    * sets); JL shrinks the COST of meeting one (dim -> projDim per
    * comparison, 4x here), with recall protected by oversampling +
    * exact rescore instead of bucket luck. At 100 TB the projected
    * corpus is the column you persist: a 16-double sketch beside a
    * 64-float vector reads 2x less and fuses into one codegen'd
    * scan; stage 1 ships only (qid, id) pairs out of the window.
    *
    * Deterministic end-to-end: planes are seeded plan literals and
    * both ranking stages tie-break on id.
    */
  def randProjTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      projDim: Int = 16, oversample: Int = 4, dim: Int = 64,
      seed: Int = 11,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(projDim >= 2 && projDim <= dim,
      s"projDim $projDim out of range [2, $dim]")
    val proj = (v: org.apache.spark.sql.Column) =>
      VectorFunctions.randProj(v, projDim, dim, seed)
    // stage 1: coarse scan in sketch space, ids only past the window
    val c = corpus.select(col(idCol).as("id"), proj(col(vecCol)).as("cp"))
    val q = queries.select(col(idCol).as("qid"), proj(col(vecCol)).as("qp"))
    val wCoarse = Window.partitionBy(col("qid"))
      .orderBy(col("pcos").desc, col("id"))
    val shortlist = c.crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cp"), col("qp")).as("pcos"))
      .withColumn("prank", row_number().over(wCoarse))
      .filter(col("prank") <= k * oversample)
      .select(col("qid"), col("id"))
    // stage 2: exact rescore of the shortlist only
    val scored = shortlist
      .join(corpus.select(col(idCol).as("id"), col(vecCol).as("cvec")),
        Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("cvec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** MMR (maximal-marginal-relevance) diversified top-k: rerank each
    * query's candidate slice so results trade relevance against
    * redundancy — score(x) = lambda*rel(x) - (1-lambda)*max sim(x, s)
    * over already-selected s (Carbonell & Goldstein 1998). The RAG
    * retrieval staple: plain top-k returns k near-copies of the best
    * match; MMR spends the same k across distinct regions.
    *
    * Scale shape: `mmrTopK` takes its candidates from the exact
    * top-(k*fetch) pass; at corpus scale call [[mmrRerank]] directly
    * with `lshTopK`/`pqTopK` output — any (qid, id, cosine) frame.
    * Either way the greedy runs over <= the candidate slice PER
    * QUERY inside flatMapGroups (incremental maxSim: O(k*n*d)) —
    * bounded work per key, distributed across queries, never an
    * all-pairs stage. Deterministic: ties break on id at both the
    * candidate cut and the greedy argmax.
    */
  def mmrTopK(
      corpus: DataFrame, queries: DataFrame, k: Int,
      fetch: Int = 4, lambda: Double = 0.7,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    mmrRerank(bruteForceTopK(corpus, queries, k * fetch, idCol, vecCol),
      corpus, k, lambda, idCol, vecCol)

  /** Rerank an arbitrary (qid, id, cosine) candidate frame with MMR —
    * the composition point the scale path needs: feed `lshTopK` /
    * `pqTopK` output here instead of paying `mmrTopK`'s exact scan.
    *
    * Precondition: every candidate id must resolve in `corpus` (the
    * vectors are re-joined for the diversity term). Candidates whose
    * ids are absent — a stale candidate set or a differently-filtered
    * corpus snapshot — are dropped by the inner join and the query
    * returns fewer than k rows; verify the frames come from the same
    * snapshot.
    */
  def mmrRerank(
      candidates: DataFrame, corpus: DataFrame, k: Int,
      lambda: Double = 0.7,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cand = candidates
      .join(corpus.select(col(idCol).as("id"),
        VectorFunctions.asDouble(col(vecCol)).as("cvec")), Seq("id"))
      .select(col("qid"), col("id"), col("cosine"), col("cvec"))
      .as[(Long, Long, Double, Seq[Double])]
    cand.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val items = it.toArray.sortBy(c => (-c._3, c._2))
      val n = items.length
      val vecs = items.map(_._4.toArray)
      // norms once; maxSim updated incrementally against only the
      // NEWEST selection each round -> O(k*n*d), not O(k^2*n*d)
      val norms = vecs.map { v =>
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        math.sqrt(s)
      }
      def sim(a: Int, b: Int): Double =
        if (norms(a) == 0 || norms(b) == 0) 0.0
        else {
          val va = vecs(a); val vb = vecs(b)
          var dot = 0.0; var i = 0
          while (i < va.length) { dot += va(i) * vb(i); i += 1 }
          dot / (norms(a) * norms(b))
        }
      val taken = new Array[Boolean](n)
      val maxSim = new Array[Double](n)
      val out = Seq.newBuilder[(Long, Long, Double, Int)]
      var rank = 0
      var done = false
      while (rank < math.min(k, n) && !done) {
        var bestIdx = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!taken(i)) {
            val score = lambda * items(i)._3 - (1 - lambda) * maxSim(i)
            // strict > with ascending scan = lowest id wins ties
            // (items are (-rel, id)-sorted)
            if (score > bestScore) { bestScore = score; bestIdx = i }
          }
          i += 1
        }
        if (bestIdx < 0) done = true // all remaining scores NaN
        else {
          taken(bestIdx) = true
          rank += 1
          out += ((qid, items(bestIdx)._2, items(bestIdx)._3, rank))
          var j = 0
          while (j < n) {
            if (!taken(j)) {
              val sv = sim(j, bestIdx)
              if (sv > maxSim(j)) maxSim(j) = sv
            }
            j += 1
          }
        }
      }
      out.result().iterator
    }.toDF("qid", "id", "cosine", "rank")
  }

  /** Deterministic driver-side Lloyd's iteration (bounded input by
    * construction — see pqTopK's sampling). Empty clusters keep their
    * previous centroid; init is a seeded shuffle of the sample.
    */
  private def lloyd(
      pts: Array[Array[Double]], k: Int, iters: Int,
      seed: Long): Array[Array[Double]] = {
    val d = pts.head.length
    val rnd = new scala.util.Random(seed)
    val cents = rnd.shuffle(pts.indices.toVector).take(k)
      .map(i => pts(i).clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      pts.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dd = 0.0; var j = 0
          while (j < d) { val t = p(j) - cents(c)(j); dd += t * t; j += 1 }
          if (dd < bestD) { bestD = dd; best = c }
          c += 1
        }
        var j = 0
        while (j < d) { sums(best)(j) += p(j); j += 1 }
        counts(best) += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var j = 0
          while (j < d) { cents(c)(j) = sums(c)(j) / counts(c); j += 1 }
        }
        c += 1
      }
      it += 1
    }
    cents
  }

  /** SPARSE similarity: TF-IDF cosine over token vectors via an
    * inverted-index self-join — the text-side complement of the dense
    * ANN paths above, and the shape that scales: documents never meet
    * unless they SHARE a (surviving) token, so the join is a shuffle
    * on token followed by a partial-aggregating sum of weight
    * products, not an all-pairs scan.
    *
    * The quadratic hazard is hot posting lists: a token in f% of docs
    * contributes (f*n)^2 pairs. `maxDfFrac` drops tokens whose
    * document frequency exceeds that corpus fraction — the classic
    * stop-token prune, which simultaneously caps the blowup AND
    * removes the tokens with the least discriminative weight (their
    * idf -> 0 anyway). Cosine is computed over the pruned vocabulary
    * on both sides of the normalization, so results are exact for
    * the pruned space; tf, idf = ln(N/df), and L2 normalization are
    * the standard construction, every step a hash agg or broadcast.
    *
    * Returns (id_a, id_b, cosine) for id_a < id_b, cosine > minSim.
    */
  def tfidfPairs(
      docs: DataFrame, textCol: String, idCol: String,
      maxDfFrac: Double = 0.2, minSim: Double = 0.0): DataFrame = {
    val toks = docs.select(col(idCol).as("doc"),
      explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("token"))
    val tf = toks.groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val w = tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") <= col("n_docs") * maxDfFrac)
      .select(col("doc"), col("token"),
        (col("tf") * log(col("n_docs") / col("df"))).as("w"))
    val nrm = w.groupBy(col("doc"))
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val wn = w.join(nrm, Seq("doc"))
      .select(col("doc"), col("token"), (col("w") / col("nrm")).as("wn"))
      // feeds both sides of the self-join: materialize once
      .localCheckpoint()
    val a = wn.select(col("token"), col("doc").as("id_a"), col("wn").as("wa"))
    val b = wn.select(col("token"), col("doc").as("id_b"), col("wn").as("wb"))
    a.join(b, Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa") * col("wb")).as("cosine"))
      .filter(col("cosine") > minSim)
  }

  /** Semantic (embedding-space) benchmark decontamination — the
    * third leg of the decontamination family (exact n-grams = c05,
    * fuzzy excerpts = c19): flag every corpus vector whose cosine to
    * ANY eval vector reaches `threshold`. Paraphrased contamination
    * that shares no n-gram still co-locates in embedding space.
    *
    * Scale shape: an eval benchmark is SMALL by definition (10^3-10^5
    * vectors), so the eval side broadcasts and the corpus is scanned
    * ONCE through a broadcast nested-loop join — exact (no LSH recall
    * gap: this is a drop decision, a miss is leaked contamination).
    * The threshold filter runs BEFORE the aggregation, so the only
    * shuffle carries flagged (corpus, eval) hits — a vanishing
    * fraction of the corpus — never the corpus itself.
    *
    * Output per flagged corpus id: hit count, max cosine (raw-double
    * max then round — comparison is exact, so round-after-max
    * replays), and the smallest hitting eval id (deterministic
    * witness).
    */
  def semanticDecontam(
      corpus: DataFrame, evalSet: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ev = evalSet.select(col(idCol).as("eval_id"),
      col(vecCol).as("evec"))
    corpus.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .crossJoin(broadcast(ev))
      .select(col("id"), col("eval_id"),
        VectorFunctions.cosineSim(col("vec"), col("evec")).as("cos"))
      .filter(col("cos") >= threshold)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_hits"),
        round(max(col("cos")), 4).as("max_cosine"),
        min(col("eval_id")).as("first_eval_id"))
  }
}
