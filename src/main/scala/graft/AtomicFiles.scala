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
  * Version-addressed files a caller only ever WRITES at uncommitted
  * versions (per-batch segments, archived manifests) may stay plain
  * writes — a torn uncommitted write is invisible at the committed
  * read point and the replay overwrites it. But the exemption is a
  * property of the WRITE SITE, not the file family: OccStats
  * `_occ_v<N>` moved here because its migration path writes at the
  * last COMMITTED version, where a torn create is read by the very
  * next probe.
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
