package graft

import org.apache.hadoop.fs.{FileSystem, Path}

/** Writer-liveness heartbeats for the strand sweeps.
  *
  * TarShards and AnnIndex sweep stranded write artifacts (attempt
  * tmps, segment stage dirs) that a crashed writer will never clean.
  * The original gate was mtime age ("presumed dead past 1 h"), which
  * silently assumed a live writer's tmp mtime keeps advancing — TRUE
  * only on the local FS. On HDFS (and most object-store semantics) a
  * file's modification time is set at create and updated at CLOSE, so
  * a shard or parquet segment that streams longer than the threshold
  * (8 GiB shards on slow storage, large index appends) could be swept
  * from under its live writer, failing the publish rename — the exact
  * dueling-writer breakage the gate was added to prevent.
  *
  * The heartbeat closes that hole without trusting in-flight mtimes:
  * a writer invocation creates a zero-byte `_live-<id>` marker next
  * to its strands and RE-CREATES it every [[BeatMs]] (create →
  * close, so the marker's mtime advances per beat on every mtime
  * semantics, including close-time stores). Strand names embed the
  * owner id; the sweep consults the marker:
  *
  *   - marker fresh (younger than [[StaleAfterMs]])  → owner live,
  *     KEEP the strand no matter how old it is;
  *   - marker stale → owner dead (beats stopped), sweep strand AND
  *     marker — crashes are collected in ~10 min instead of 1 h;
  *   - marker absent (legacy strands, or the owner finished and
  *     removed it before its failed-attempt tmps were listed) → fall
  *     back to the old mtime age gate.
  *
  * Markers are underscore-prefixed, so parquet/FileInputFormat
  * readers never list them. They are liveness advice, not locks — no
  * reader blocks on one, and losing a marker is safe (the age-gate
  * fallback still bounds strand lifetime); hence no
  * FaultPoints.lockAcquired/lockReleased routing.
  *
  * Driver-side use (AnnIndex.publishSegment — the parquet write it
  * brackets is synchronous): `val b = Liveness.start(...); try ...
  * finally b.close()`. Task-side use (TarShards shard writers — the
  * job executes wherever the returned manifest is materialized):
  * start in the partition function and stop from a
  * TaskContext completion listener, which runs on success AND task
  * failure; only an executor kill skips it, and that is precisely the
  * stale-marker case.
  */
object Liveness {

  /** Marker rewrite period. */
  val BeatMs: Long = 30000L

  /** A marker older than this means its owner stopped beating ≥20
    * periods ago: dead. 20× leaves generous room for beat-thread
    * scheduling delay and cross-host FS clock skew.
    */
  val StaleAfterMs: Long = 600000L

  def marker(dir: Path, id: String): Path = new Path(dir, s"_live-$id")

  /** Begin beating `_live-<id>` under `dir` (created immediately —
    * create the marker BEFORE the first strand so no sweep can see an
    * owned strand without its marker). `close()` stops the beat and
    * removes the marker; call it after the owned tmps are published
    * or cleaned.
    */
  def start(fs: FileSystem, dir: Path, id: String): AutoCloseable = {
    val p = marker(dir, id)
    def beat(): Unit = fs.create(p, true).close()
    beat()
    @volatile var stopped = false
    val t = new Thread(
      () => {
        while (!stopped) {
          try Thread.sleep(BeatMs)
          catch { case _: InterruptedException => () }
          if (!stopped) {
            try beat()
            catch { case _: Throwable => () } // next beat retries
          }
        }
      },
      s"graft-liveness-$id")
    t.setDaemon(true)
    t.start()
    () => {
      stopped = true
      t.interrupt()
      t.join(5000)
      try { fs.delete(p, false); () }
      catch { case _: Throwable => () } // stale-marker path collects it
    }
  }

  // Sweep-side consultation lives with the sweeps (TarShards
  // call-time sweep, AnnIndex.sweepOrphans): both work off the ONE
  // directory listing they already hold (marker name -> mtime map),
  // so a per-id getFileStatus helper here would only add round trips.
  // The shared contract is the three-way decision documented above:
  // fresh marker keeps, stale marker collects strand AND marker,
  // markerless falls back to the age gate.
}
