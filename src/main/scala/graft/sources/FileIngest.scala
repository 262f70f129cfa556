package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.JobSpec

/** Ingest side of the pipeline (reference SendJobs.py — S1/S2/S3 in
  * SURVEY.md §2.1): enumerate a directory of opaque files and produce
  * (a) the content DataFrame and (b) the job manifest.
  *
  * The reference enumerates with a non-recursive `os.listdir` and
  * uploads sequentially, one RPC pair per file. Here the scan itself
  * is distributed (`binaryFile` source splits the file list across
  * tasks) and options expose recursion/globbing the reference lacks.
  */
object FileIngest {

  /** Read a directory of files as (path, modificationTime, length,
    * content) — the engine's "dataset = set of objects" scan (S1).
    *
    * Spark's `binaryFile` source silently DROPS zero-length files
    * (they produce no scan splits), but the reference processes them
    * like any other object (`cp` of an empty file is an empty
    * output). We re-add empties from a metadata listing — the same
    * driver-side listing the file index performs anyway, so this
    * costs nothing extra at scale.
    */
  def readDir(
      spark: SparkSession, dir: String,
      glob: Option[String] = None,
      recursive: Boolean = false): DataFrame = {
    var r = spark.read.format("binaryFile")
    glob.foreach(g => r = r.option("pathGlobFilter", g))
    if (recursive) r = r.option("recursiveFileLookup", "true")
    val nonEmpty = r.load(dir)
    val empties = listEmptyFiles(spark, dir, glob, recursive)
    if (empties.isEmpty) nonEmpty
    else nonEmpty.unionByName(
      spark.createDataFrame(
        java.util.Arrays.asList(empties: _*), nonEmpty.schema))
  }

  private def listEmptyFiles(
      spark: SparkSession, dir: String,
      glob: Option[String], recursive: Boolean): Seq[org.apache.spark.sql.Row] = {
    import org.apache.hadoop.fs.{GlobFilter, Path}
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return Seq.empty
    val filter = glob.map(new GlobFilter(_))
    val out = Seq.newBuilder[org.apache.spark.sql.Row]
    val it = fs.listFiles(p, recursive)
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getLen == 0 &&
          filter.forall(_.accept(st.getPath))) {
        out += org.apache.spark.sql.Row(
          st.getPath.toString,
          new java.sql.Timestamp(st.getModificationTime),
          0L, Array.empty[Byte])
      }
    }
    out.result()
  }

  /** (key, content) view used by PipeTransform: key = bare file name,
    * the reference's record identity (SendJobs.py:22-23). For
    * RECURSIVE scans pass `baseDir` so the key is the base-relative
    * path — bare basenames would collapse `a/data.txt` and
    * `b/data.txt` into one key and the named sink would clobber one
    * output.
    */
  def keyed(files: DataFrame, baseDir: Option[String] = None): DataFrame = {
    val key = baseDir match {
      case Some(b) =>
        // Scan paths are fully-qualified URIs (file:/..., s3a://...).
        // Qualify baseDir through the same FileSystem so the prefix
        // matches EXACTLY at position 0 — a relative or repeated
        // base-dir segment must never cause a mid-path (or greedy
        // last-occurrence) strip that collapses `a/data.txt` and
        // `b/data.txt` onto one key.
        val p = new org.apache.hadoop.fs.Path(b)
        val fs = p.getFileSystem(
          files.sparkSession.sessionState.newHadoopConf())
        val qb = fs.makeQualified(p).toString.stripSuffix("/") + "/"
        // A path outside the qualified base dir means the
        // qualification disagrees with the scan's URI rendering —
        // fail LOUDLY. The tempting basename fallback silently
        // collapses `a/data.txt` and `b/data.txt` onto one key for
        // EVERY file, and the named sink would then overwrite
        // distinct outputs.
        when(col("path").startsWith(qb),
          col("path").substr(lit(qb.length + 1), length(col("path"))))
          .otherwise(raise_error(concat(
            lit(s"[graft] scan path outside base dir '$qb': "),
            col("path"))))
      case None => element_at(split(col("path"), "/"), -1)
    }
    files.select(key.as("key"), col("content"))
  }

  /** Build the job manifest (S3): one JobSpec row per file, with the
    * reference's positional-JSON envelope attached for wire fidelity.
    */
  def manifest(
      files: DataFrame, bucket: String,
      inputPrefix: String, outputPrefix: String): DataFrame = {
    val f = element_at(split(col("path"), "/"), -1)
    files.select(
      lit("process").as("action"),
      lit(bucket).as("bucket"),
      lit(inputPrefix).as("inputPrefix"),
      lit(outputPrefix).as("outputPrefix"),
      f.as("fileName"),
      JobSpec.toEnvelope(
        lit("process"), lit(bucket), lit(inputPrefix),
        lit(outputPrefix), f).as("envelope"))
  }
}
