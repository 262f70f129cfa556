package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** Crash-injection registry for the storage layer's PUBLISH
  * boundaries — the systematic form of the manual crash-consistency
  * review that found torn-state bugs three rounds running (the lens:
  * "what committed-readable state can a crash at instruction X leave,
  * and does any later read trust it").
  *
  * Every committed-readable write boundary in the engine calls
  * [[reach]] with a STRING-LITERAL site name immediately after its
  * durable operation lands (and before the next one starts). Unarmed
  * — production — a reach is two volatile reads and nothing else.
  * The fault-injection spec (CrashFaultInjectionSpec) enumerates the
  * site inventory PROGRAMMATICALLY by scanning the source tree for
  * `FaultPoints.reach("...")` literals, records how often each
  * scenario crosses each site, then re-runs every scenario with a
  * crash armed at each (site, occurrence) and asserts the standing
  * invariants on the re-opened store: replay converges, probe ≡
  * oracle, no wedge. A new publish site without a covering scenario
  * fails the inventory test — coverage is bounded by the write-site
  * inventory, not by reviewer attention.
  *
  * Fidelity note: an armed reach throws [[InjectedCrash]], which
  * UNWINDS — `finally` blocks run, unlike a real `kill -9`. For
  * advisory LOCK FILES that gap is closed by ABANDON MODE
  * ([[enableAbandonMode]]): every engine lock routes its acquire and
  * release through [[lockAcquired]]/[[lockReleased]] (two volatile
  * reads in production), and when an armed crash fires in abandon
  * mode the locks the dying "process" holds are marked LEAKED — their
  * `finally` release is suppressed, so the lock file stays on disk
  * exactly as a kill -9 leaves it, and the harness walks the
  * stale-lock recovery contract (loud refusal naming the file, then
  * operator deletion, then convergent replay) at every lock-guarded
  * (site, occurrence). The last fidelity gap — output streams closed
  * by the unwind's `finally`, flushing buffered tails a real kill
  * never flushes — is closed by the subprocess SIGKILL harness
  * (KillMinus9Spec + [[pulse]]): a child JVM is parked MID-WRITE with
  * streams open and killed with a real `kill -9`, one representative
  * site per store family. Everything BETWEEN durable operations — the
  * class the manual reviews kept finding — is modeled faithfully
  * either way: operations after the armed site never run.
  *
  * Reference semantics being protected: the ack-on-success commit
  * point (reference GetJobs.py:37-40 — delete-after-upload; a crash
  * between upload and delete redelivers, never drops).
  */
object FaultPoints {

  /** Thrown by an armed [[reach]]; simulates the writer dying right
    * after the named durable operation. Extends Error so generic
    * `catch NonFatal` recovery paths in the engine cannot swallow a
    * simulated crash and "handle" it.
    */
  final class InjectedCrash(val site: String, val occurrence: Long)
      extends Error(s"injected crash at $site (occurrence $occurrence)")

  private final case class Arm(site: String, occurrence: Long,
      counter: AtomicLong)

  @volatile private var arm: Arm = null
  @volatile private var recording: ConcurrentHashMap[String, AtomicLong] =
    null

  /** Mark a publish boundary: the durable operation just before this
    * call is on disk; nothing after it has run. Site names MUST be
    * string literals (the spec's source scan enforces it).
    */
  def reach(site: String): Unit = {
    val rec = recording
    if (rec != null)
      rec.computeIfAbsent(site, _ => new AtomicLong()).incrementAndGet()
    val a = arm
    if (a != null && a.site == site &&
        a.counter.incrementAndGet() == a.occurrence) {
      // abandon mode: the dying writer takes its held locks with it —
      // their finally-release is suppressed (lockReleased), so the
      // lock files stay on disk exactly as kill -9 leaves them
      if (abandonMode) held.forEach(l => { leaked.add(l); () })
      throw new InjectedCrash(site, a.occurrence)
    }
  }

  // ---------------------------------------------------------------
  // subprocess SIGKILL harness hooks (round-18 order #3)
  // ---------------------------------------------------------------

  /** Park-capable MID-STREAM points for the subprocess kill -9
    * harness (KillMinus9Spec). Unlike [[reach]], a pulse site is NOT
    * a publish boundary — nothing durable is promised on either side
    * — and is deliberately excluded from the crash-walk inventory
    * scan (which greps for `reach("` literals). It exists so a CHILD
    * JVM can be parked with its output streams OPEN and buffers
    * UNFLUSHED, then killed with a real SIGKILL: the one writer state
    * the in-process InjectedCrash cannot produce (unwinding runs
    * `finally` stream closes, flushing buffered tails, so tmps look
    * cleaner than a kill -9 leaves them).
    *
    * Armed only via system properties at JVM start (the child is a
    * fresh process; there is no test API):
    *   -Dgraft.faultpoints.park=<site>      touch the sentinel, then
    *     park forever at the site (streams open) until the SIGKILL
    *   -Dgraft.faultpoints.signal=<site>    touch the sentinel and
    *     CONTINUE — for killing a beat into a long write the site
    *     immediately precedes (a parked thread never starts it)
    *   -Dgraft.faultpoints.sentinel=<file>  the parent's kill trigger
    * Production cost: two static null comparisons.
    */
  def pulse(site: String): Unit = {
    if (signalSite != null && signalSite == site) touchSentinel()
    if (parkSite != null && parkSite == site) {
      touchSentinel()
      while (true) Thread.sleep(60000L) // parked until SIGKILL
    }
  }

  private def touchSentinel(): Unit =
    if (parkSentinel != null) {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(parkSentinel), Array.empty[Byte])
        ()
      } catch { case _: Throwable => () }
    }

  private val parkSite: String =
    System.getProperty("graft.faultpoints.park")
  private val signalSite: String =
    System.getProperty("graft.faultpoints.signal")
  private val parkSentinel: String =
    System.getProperty("graft.faultpoints.sentinel")

  // ---------------------------------------------------------------
  // abandon (no-unwind / leaked-lock) mode
  // ---------------------------------------------------------------

  @volatile private var abandonMode: Boolean = false
  private val held =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val leaked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Engine hook — an advisory lock file was atomically created.
    * Unarmed this is one volatile read; in abandon mode the id joins
    * the held set a firing crash will leak.
    */
  def lockAcquired(id: String): Unit =
    if (abandonMode) { held.add(id); () }

  /** Engine hook — run `release` (the `finally` lock deletion) UNLESS
    * an abandon-mode crash leaked this lock, in which case the file
    * must stay on disk: a killed process cannot run its finally.
    */
  def lockReleased(id: String)(release: => Unit): Unit = {
    if (abandonMode) {
      held.remove(id)
      if (leaked.contains(id)) return
    }
    release
  }

  /** Test API — make the next armed crashes leak held locks. */
  def enableAbandonMode(): Unit = { abandonMode = true }

  /** Test API — leave abandon mode, clearing all tracking. */
  def disableAbandonMode(): Unit = {
    abandonMode = false
    held.clear()
    leaked.clear()
  }

  /** Test API — the lock ids the last crash leaked; cleared so the
    * harness can delete the files and replay.
    */
  def drainLeakedLocks(): Set[String] = {
    import scala.jdk.CollectionConverters._
    val out = leaked.asScala.toSet
    leaked.clear()
    out
  }

  /** Test API — record which sites a scenario crosses. */
  def startRecording(): Unit =
    recording = new ConcurrentHashMap[String, AtomicLong]()

  /** Stop recording and return site -> times reached. */
  def stopRecording(): Map[String, Long] = {
    val rec = recording
    recording = null
    if (rec == null) Map.empty
    else {
      import scala.jdk.CollectionConverters._
      rec.asScala.map { case (k, v) => k -> v.get() }.toMap
    }
  }

  /** Test API — arm a crash at the nth (1-based) reach of `site`. */
  def armCrash(site: String, occurrence: Long): Unit = {
    require(occurrence >= 1, s"occurrence must be >= 1: $occurrence")
    arm = Arm(site, occurrence, new AtomicLong())
  }

  /** Whether an armed crash has fired (or is still pending). */
  def armedFired: Boolean = {
    val a = arm
    a != null && a.counter.get() >= a.occurrence
  }

  def disarm(): Unit = arm = null
}
