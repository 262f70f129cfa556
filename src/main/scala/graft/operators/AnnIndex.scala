package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** PERSISTED IVF-SQ index — the build-once / probe-many artifact the
  * transient ANN paths were missing: s03/s14/s17 re-train centroids
  * and re-assign every corpus vector to a cell on EVERY execution,
  * which at 100 TB is the difference between an index and a scan
  * (training is bounded, but the cell-assignment map pass touches the
  * whole corpus per query run). This object materializes that
  * projection ONCE as the on-disk layout the transient paths'
  * Scaladoc already names — "(cell, int8 vector) is the persisted
  * index projection" — and serves every later query from it:
  *
  * {{{
  *   path/
  *     _META                 # dim, nlist, seed, int8 scale, row count
  *     centroids/            # parquet: (cell, cvec double[])
  *     codes/cell=<c>/       # parquet, PARTITIONED BY CELL:
  *                           #   (id, q int8-as-float[], vec float[])
  * }}}
  *
  * The probe reads `centroids/` (nlist rows -> plan literals), picks
  * nprobe cells per query in-register (Similarity.probeCells), and
  * scans `codes/` with `cell IN (probed)` — a PARTITION filter, so
  * Spark prunes unprobed cell directories at planning time and the
  * scan reads nprobe/nlist of the corpus BYTES, int8-quantized (4x
  * smaller than float32) with the full-precision vector column read
  * ONLY for the k*refine rescore rows (parquet is columnar — the
  * rescore is a second pruned scan projecting `vec`, not a wider
  * first scan). Results are BIT-IDENTICAL to the transient
  * [[Similarity.ivfQuantizedTopK]] at the same parameters: same
  * bounded-sample centroid training, same clamped quantization, same
  * tie-breaks — the index is a materialization, not a variant.
  *
  * Build is one bounded training pass + ONE corpus projection job
  * (assignment + quantization are per-row expressions over plan
  * literals — zero shuffle beyond the partitioned write). Rebuild to
  * retrain; the artifact is immutable between builds (ANN indexes
  * version like models, not like tables — a half-updated centroid set
  * scores garbage, so the unit of update is the whole index; for
  * continuous ingestion compose with the streaming dedup sinks and
  * rebuild on a cadence).
  */
object AnnIndex {

  private case class Meta(dim: Int, nlist: Int, seed: Long,
      scale: Double, rows: Long) {
    def serialize: String = s"$dim $nlist $seed $scale $rows"
  }

  private def parseMeta(s: String): Meta = {
    val a = s.trim.split(" ")
    Meta(a(0).toInt, a(1).toInt, a(2).toLong, a(3).toDouble, a(4).toLong)
  }

  private def quant(v: Column, scale: Double): Column =
    transform(v, x =>
      least(greatest(round(x.cast("double") / scale * 127),
        lit(-127.0)), lit(127.0)).cast("tinyint").cast("float"))

  /** Train + project + persist. One corpus projection job; the write
    * is `partitionBy(cell)` so probes prune directories.
    */
  def build(corpus: DataFrame, path: String,
      nlist: Int = 16, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding",
      dim: Int = 64, maxTrainRows: Long = 100000L): Unit = {
    val spark = corpus.sparkSession
    val centroids = Similarity.coarseCentroids(corpus, vecCol, idCol,
      nlist, seed, maxTrainRows)
    val r = corpus.agg(max(array_max(transform(col(vecCol),
      x => abs(x.cast("double")))))).head
    require(!r.isNullAt(0), "corpus is empty — nothing to index")
    val scale = r.getDouble(0)
    require(scale > 0, "corpus has no nonzero vector component")
    corpus.select(col(idCol).as("id"),
      element_at(Similarity.probeCells(
        VectorFunctions.asDouble(col(vecCol)), centroids, 1), 1)
        .as("cell"),
      quant(col(vecCol), scale).as("q"),
      col(vecCol).as("vec"))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$path/codes")
    import spark.implicits._
    centroids.map { case (c, v) => (c, v) }.toDF("cell", "cvec")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/centroids")
    val rows = corpus.count()
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val out = fs.create(new Path(path, "_META"), true)
    try out.write(Meta(dim, nlist, seed, scale, rows).serialize
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** Top-k over the persisted artifact: int8 candidate scan of the
    * probed cell PARTITIONS only, exact rescore of k*refine. Returns
    * (qid, id, cosine, rank) like every other top-k path.
    */
  def probe(spark: SparkSession, path: String, queries: DataFrame,
      k: Int, nprobe: Int = 3, refine: Int = 4,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val metaP = new Path(path, "_META")
    require(fs.exists(metaP), s"no ANN index at $path — run build()")
    val len = fs.getFileStatus(metaP).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(metaP)
    try in.readFully(0, buf) finally in.close()
    val meta = parseMeta(new String(buf, "UTF-8"))
    val centroids: Seq[(Int, Seq[Double])] =
      spark.read.parquet(s"$path/centroids").collect()
        .map(r => r.getInt(0) -> r.getSeq[Double](1))
        .sortBy(_._1).toSeq
    val probed = queries.select(col(idCol).as("qid"),
      quant(col(vecCol), meta.scale).as("qq"),
      col(vecCol).as("qvec"),
      explode(Similarity.probeCells(
        VectorFunctions.asDouble(col(vecCol)), centroids, nprobe))
        .as("cell"))
    // the probed cell set as LITERALS (bounded by nlist): an isin
    // partition filter prunes unprobed cell directories at planning
    // time — the join alone would not reach the parquet source
    val cells: Seq[Int] = probed.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    val codes = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*))
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("qcos").desc, col("id"))
    val cand = codes.select(col("cell"), col("id"), col("q"))
      .join(broadcast(probed.select(col("qid"), col("qq"), col("cell"))),
        Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("q"), col("qq")).as("qcos"))
      .withColumn("qrank", row_number().over(wq))
      .filter(col("qrank") <= k * refine)
      .select("qid", "id")
    // exact rescore: a SECOND pruned scan projecting only (id, vec) —
    // columnar, so the int8 candidate scan never read the wide column
    val full = spark.read.parquet(s"$path/codes")
      .filter(col("cell").isin(cells: _*))
      .select(col("id"), col("vec"))
    val scored = cand
      .join(full, Seq("id"))
      .join(broadcast(queries.select(col(idCol).as("qid"),
        col(vecCol).as("qvec"))), Seq("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("vec"), col("qvec")).as("cosine"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
