package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic-name output sink (S6, reference GetJobs.py:57-60):
  * each record is published as `<outDir>/<key><ext>` — the naming
  * contract `f ↦ f + ext` the reference exposes to its users
  * (README.md:124).
  *
  * Spark's own writers randomize part-file names, so exact naming
  * needs a `foreachPartition` writer. Idempotence under task retries
  * (the at-least-once story, SURVEY.md §1.4): write to a task-unique
  * temp file, then rename — a duplicate execution overwrites with
  * identical bytes instead of interleaving, upgrading the reference's
  * mid-write clobber race to last-writer-wins.
  *
  * Filesystem access goes through the Hadoop `FileSystem` API (the
  * reference's output contract is an object-store PUT), so `outDir`
  * may be any supported URI — `file:///`, `hdfs://`, `s3a://` — not
  * just a local path. The driver's Hadoop conf is shipped to
  * executors as a plain property list (public-API-only equivalent of
  * SerializableConfiguration), so credentials/endpoint settings
  * apply on the task side too.
  *
  * Scale note: one output object per record is the REFERENCE's
  * contract (object-store fan-out, no shuffle, embarrassingly
  * parallel); when exact names are not contractual, callers should
  * prefer `df.write.parquet` and let the committer handle naming.
  */
object NamedSink {

  /** Write (key, output) rows as individual files. Returns nothing;
    * runs as a distributed action.
    */
  def write(results: DataFrame, outDir: String, ext: String): Unit = {
    val spark = results.sparkSession
    val driverConf = spark.sessionState.newHadoopConf()
    // Serialize the conf as (key, value) pairs: Hadoop Configuration
    // itself is not java-serializable.
    val confProps: Array[(String, String)] =
      driverConf.iterator().asScala.map(e => (e.getKey, e.getValue)).toArray
    val dir = new Path(outDir)
    dir.getFileSystem(driverConf).mkdirs(dir)
    val dirStr = outDir
    results.select(col("key"), col("output"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val conf = new Configuration(false)
          confProps.foreach { case (k, v) => conf.set(k, v) }
          val d = new Path(dirStr)
          val fs = d.getFileSystem(conf)
          // LocalFileSystem is checksummed by default and would strew
          // .crc sidecars next to every published object
          fs.setWriteChecksum(false)
          fs.setVerifyChecksum(false)
          it.foreach { row =>
            val key = row.getString(0)
            val bytes = row.getAs[Array[Byte]](1)
            if (bytes != null)
              writeAtomic(fs, conf, d, sanitize(key) + ext, bytes)
          }
        }
      }
  }

  /** The reference stages/publishes by raw fileName, allowing path
    * traversal via keys containing separators; we percent-encode the
    * separators (and every char that is URI-special to Hadoop `Path`,
    * plus the escape char itself) — unlike a plain
    * replace-with-underscore, encoding is injective, so distinct keys
    * can never collide onto one output file.
    */
  private[graft] def sanitize(key: String): String = {
    val sb = new StringBuilder(key.length)
    key.foreach {
      case '%'  => sb.append("%25")
      case '/'  => sb.append("%2F")
      case '\\' => sb.append("%5C")
      case ':'  => sb.append("%3A")
      case '#'  => sb.append("%23")
      case '?'  => sb.append("%3F")
      case c    => sb.append(c)
    }
    sb.toString
  }

  /** Create under a task-unique temp name, then atomically
    * rename-with-overwrite into place (graft.AtomicFiles — one
    * metadata op on HDFS, POSIX rename(2) on the local FS): a
    * duplicate/zombie execution overwrites with identical bytes via
    * last-writer-wins, never interleaves, and a reader never sees a
    * missing or half-replaced destination. On object stores rename is
    * copy+delete and the PUT itself is atomic.
    */
  private def writeAtomic(fs: FileSystem, conf: Configuration,
      dir: Path, name: String, bytes: Array[Byte]): Unit = {
    val tmp = new Path(dir,
      s".$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val dest = new Path(dir, name)
    var renamed = false
    try {
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      graft.FaultPoints.reach("NamedSink.tmp")
      graft.AtomicFiles.renameOverwrite(fs, conf, tmp, dest)
      renamed = true
    } finally {
      if (!renamed) fs.delete(tmp, false)
      ()
    }
  }
}
