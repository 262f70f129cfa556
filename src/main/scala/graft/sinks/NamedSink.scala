package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

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
  * temp file, then atomic rename — a duplicate execution overwrites
  * with identical bytes instead of interleaving, upgrading the
  * reference's mid-write clobber race to last-writer-wins-atomically.
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
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val dirStr = out.toString
    results.select(col("key"), col("output"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val dir = Paths.get(dirStr)
        it.foreach { row =>
          val key = row.getString(0)
          val bytes = row.getAs[Array[Byte]](1)
          if (bytes != null) writeAtomic(dir, sanitize(key) + ext, bytes)
        }
      }
  }

  /** The reference stages/publishes by raw fileName, allowing path
    * traversal via keys containing separators; we percent-encode the
    * separators (and the escape char itself) — unlike a plain
    * replace-with-underscore, encoding is injective, so distinct keys
    * can never collide onto one output file.
    */
  private def sanitize(key: String): String =
    key.replace("%", "%25").replace("/", "%2F").replace("\\", "%5C")

  private def writeAtomic(dir: Path, name: String, bytes: Array[Byte]): Unit = {
    val tmp = Files.createTempFile(dir, s".$name.", ".tmp")
    try {
      Files.write(tmp, bytes)
      Files.move(tmp, dir.resolve(name),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(tmp)
  }
}
