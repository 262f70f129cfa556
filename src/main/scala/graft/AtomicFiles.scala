package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** Atomic small-file writes for live metadata the engine reads on
  * its serving paths (index `_META`/`_SEGROWS`/`_RECALL0`, sidecar
  * parameter markers): write a sibling tmp file, then
  * `FileContext.rename(..., OVERWRITE)` — a single metadata op on
  * HDFS-style filesystems, so no reader (or post-crash restart) can
  * ever observe a truncated file where a torn `fs.create(overwrite)`
  * would park one. The TableSync `_CURRENT` / AnnIndex `_GEN`
  * pointer-swap discipline, shared.
  *
  * NOT for version-addressed files (OccStats `_occ_v<N>`, per-batch
  * segments, archived manifests): those are only ever read at the
  * COMMITTED version, so a torn uncommitted write is invisible and
  * the replay overwrites it — rename would buy nothing.
  */
private[graft] object AtomicFiles {
  private val seq = new java.util.concurrent.atomic.AtomicLong()

  def write(fs: FileSystem, conf: Configuration, dest: Path,
      payload: Array[Byte]): Unit = {
    // unique tmp name per write: a FIXED sibling would let two
    // concurrent writers of the same dest truncate each other's
    // open tmp and publish a torn dest through the rename — the
    // exact state this helper exists to rule out. pid+counter keeps
    // names collision-free across processes AND threads; a stranded
    // tmp from a crash is swept by the owning store's hygiene pass
    // (or harmlessly ignored).
    val tmp = fs.makeQualified(new Path(dest.getParent,
      s"${dest.getName}.${ProcessHandle.current().pid()}-" +
        s"${seq.incrementAndGet()}.tmp"))
    val out = fs.create(tmp, true)
    try out.write(payload) finally out.close()
    FileContext.getFileContext(fs.getUri, conf)
      .rename(tmp, fs.makeQualified(dest), Options.Rename.OVERWRITE)
  }
}
