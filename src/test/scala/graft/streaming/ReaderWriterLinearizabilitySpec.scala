package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.AnnIndex

/** Concurrent reader-vs-writer linearizability walk (round-17 order
  * #3). Round 16 proved writer-vs-writer; readers appeared only as
  * single post-crash or mid-swap probes. Here a CONTINUOUS reader
  * loop runs against a LIVE writer through delta appends, maxGens
  * folds, linear-hashing splits, a rebucket re-base, and an AnnIndex
  * generation-rotating rebuild, asserting the visibility contract the
  * atomic pointer swap exists for:
  *
  *  - every successfully observed snapshot is EXACTLY the state of
  *    SOME committed batch (no torn read, no phantom, no mixed-batch
  *    content) — observed states are matched against the precomputed
  *    sequence of committed states;
  *  - observations are MONOTONE per reader (the pointer never goes
  *    backward);
  *  - a read that loses the retention race (its manifest's snapshot
  *    dirs GC'd mid-scan, or a rebuild rotation deleting the old
  *    generation mid-probe) fails LOUDLY mid-flight and is retried —
  *    fail-stop, never a silently mixed result. The spec classifies
  *    those failures strictly: only missing-file/missing-path errors
  *    are retryable; anything else (missing pointer, content drift)
  *    fails the walk.
  *
  * Protects the reference's read-your-committed-writes expectation
  * (GetJobs.py:51-60 serves objects only after their PUT completed).
  */
class ReaderWriterLinearizabilitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Missing-file class (possibly wrapped): the documented loud
    * fail-stop of a reader racing retention/rotation cleanup.
    */
  private def isMissingFileRace(t: Throwable): Boolean = {
    var c: Throwable = t
    var hops = 0
    while (c != null && hops < 32) {
      val m = Option(c.getMessage).getOrElse("")
      if (c.isInstanceOf[java.io.FileNotFoundException] ||
        m.contains("PATH_NOT_FOUND") || m.contains("does not exist") ||
        m.contains("No such file") ||
        // a rotation deleting the old generation UNDER a reader that
        // already resolved it surfaces as schema-inference failure on
        // the vanished directory (Spark logs "was it deleted very
        // recently?") — same missing-file fail-stop, different class
        m.contains("UNABLE_TO_INFER_SCHEMA") ||
        // ...and a retention slide deleting snapshot files between a
        // reader's PLAN and its SCAN surfaces as Spark 4's
        // execution-time read failure (the task-side
        // FileNotFoundException is flattened into the message)
        m.contains("FAILED_READ_FILE"))
        return true
      c = c.getCause
      hops += 1
    }
    false
  }

  test("TableSync: continuous readCurrent against a live writer " +
    "(deltas, folds, splits, rebucket) observes only committed " +
    "states, monotonically") {
    import spark.implicits._
    val path = Files.createTempDirectory("rwlin-ts-").toString
    val nBatches = 18
    // batch b upserts keys [3b, 3b+6) mod 24 at version b — every
    // batch overlaps its neighbours, so folds and splits constantly
    // rewrite shared buckets while readers scan them
    def rowsOf(b: Int): Seq[(Long, Long, String)] =
      (0 until 6).map(i => (((3 * b + i) % 24).toLong, b.toLong,
        s"v$b-${(3 * b + i) % 24}"))
    // committed state after batch b: highest version per key
    val states: Vector[Map[Long, String]] =
      (0 until nBatches).scanLeft(Map.empty[Long, String]) {
        case (m, b) => m ++ rowsOf(b).map(r => r._1 -> r._3)
      }.toVector.drop(1)
    assert(states.distinct.length == states.length,
      "fixture broken: committed states must be pairwise distinct")
    val writerDone = new AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val successes = new AtomicInteger(0)
    val retries = new AtomicInteger(0)
    val deadline = System.nanoTime() + 180L * 1000000000L
    val reader = new Thread(() => {
      var lastIdx = -1
      while ((!writerDone.get() || lastIdx < 0) &&
          System.nanoTime() < deadline) {
        try {
          val got = TableSync.readCurrent(spark, path).collect()
            .map(r => r.getLong(0) -> r.getString(2)).toMap
          val idx = states.indexOf(got)
          if (idx < 0)
            failures.add(s"observed state matches NO committed batch " +
              s"(torn/mixed read): $got")
          else if (idx < lastIdx)
            failures.add(s"pointer went BACKWARD: batch $idx after " +
              s"$lastIdx")
          else lastIdx = idx
          successes.incrementAndGet()
          ()
        } catch {
          case t: Throwable if isMissingFileRace(t) =>
            retries.incrementAndGet() // documented fail-stop race
            ()
          case t: Throwable if t.getMessage != null &&
              t.getMessage.contains("no _CURRENT pointer") &&
              lastIdx < 0 =>
            () // table not bootstrapped yet — reader started first
          case t: Throwable =>
            failures.add(s"reader died on a non-race error: " +
              s"${t.getClass.getName}: ${t.getMessage}")
            writerDone.set(true) // abort
        }
      }
    })
    reader.start()
    try {
      (0 until nBatches).foreach { b =>
        TableSync.applyBatch(rowsOf(b).toDF("k", "ver", "v"), path,
          "k", "ver", b.toLong, numBuckets = 2,
          maxBucketBytes = 4096L, splitsPerBatch = 1, maxGens = 2)
        if (b == 9) // one-shot re-base under live readers
          TableSync.rebucket(spark, path, "k", 5)
      }
    } finally {
      writerDone.set(true)
      reader.join(60000)
    }
    assert(failures.isEmpty,
      s"${failures.size} linearizability violations:\n  " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          failures.iterator()).asScala.mkString("\n  "))
    assert(successes.get() >= 10,
      s"reader starved: only ${successes.get()} successful reads " +
        s"(${retries.get()} retention-race retries)")
    // the final observation is the final committed state
    val fin = TableSync.readCurrent(spark, path).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(fin == states.last)
  }

  test("TableSync: concurrent readVersion time travel under a live " +
    "writer serves exact committed states or refuses loudly " +
    "(retention/phantom), never mixed content") {
    import spark.implicits._
    val path = Files.createTempDirectory("rwlin-tt-").toString
    val nBatches = 12
    def rowsOf(b: Int): Seq[(Long, Long, String)] =
      (0 until 4).map(i => (((2 * b + i) % 10).toLong, b.toLong,
        s"v$b-${(2 * b + i) % 10}"))
    val states: Vector[Map[Long, String]] =
      (0 until nBatches).scanLeft(Map.empty[Long, String]) {
        case (m, b) => m ++ rowsOf(b).map(r => r._1 -> r._3)
      }.toVector.drop(1)
    val writerDone = new AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val successes = new AtomicInteger(0)
    val rnd = new scala.util.Random(42)
    val reader = new Thread(() => {
      while (!writerDone.get()) {
        val vs =
          try TableSync.committedVersions(spark, path)
          catch { case _: Throwable => Seq.empty[Long] }
        if (vs.nonEmpty) {
          val v = vs(rnd.nextInt(vs.length))
          try {
            val got = TableSync.readVersion(spark, path, v).collect()
              .map(r => r.getLong(0) -> r.getString(2)).toMap
            if (got != states(v.toInt))
              failures.add(s"readVersion($v) drifted from the " +
                s"committed state: $got vs ${states(v.toInt)}")
            successes.incrementAndGet()
            ()
          } catch {
            case t: Throwable if isMissingFileRace(t) => ()
            case t: IllegalStateException
                if t.getMessage.contains("not retained") ||
                  t.getMessage.contains("NOT committed") ||
                  t.getMessage.contains("NOT on the commit chain") =>
              () // loud refusals are the contract under a live writer
            case t: Throwable =>
              failures.add(s"readVersion($v) non-race error: " +
                s"${t.getClass.getName}: ${t.getMessage}")
              writerDone.set(true)
          }
        }
      }
    })
    reader.start()
    try {
      (0 until nBatches).foreach { b =>
        TableSync.applyBatch(rowsOf(b).toDF("k", "ver", "v"), path,
          "k", "ver", b.toLong, numBuckets = 2, maxGens = 2)
      }
    } finally {
      writerDone.set(true)
      reader.join(60000)
    }
    assert(failures.isEmpty,
      s"${failures.size} time-travel violations:\n  " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          failures.iterator()).asScala.mkString("\n  "))
    assert(successes.get() >= 5,
      s"time-travel reader starved: ${successes.get()} reads")
  }

  test("KeyedLog: continuous commit-gated readForKeys against a live " +
    "append+compact writer never LOSES a committed row (duplicates " +
    "are the documented superset contract; loss never)") {
    import spark.implicits._
    val path = Files.createTempDirectory("rwlin-klog-").toString
    val nSegs = 10
    def rowsOf(s: Int): Seq[(Long, Long)] =
      (0 until 8).map(i => ((s * 8 + i).toLong, (s * 8 + i) * 10L))
    // floor after segment s committed: everything appended so far
    val floors: Vector[Set[(Long, Long)]] =
      (1 to nSegs).scanLeft(Set.empty[(Long, Long)]) {
        case (acc, s) => acc ++ rowsOf(s)
      }.toVector
    val probeKeys = (8L until 88L).toDF("bk").localCheckpoint()
    val writerDone = new AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val successes = new AtomicInteger(0)
    // the production probe gates on the last COMMITTED batch id
    // (maxSeg) — in-flight segments are excluded at the source, so
    // the reader models exactly that contract. The read may still
    // observe MORE than its gate's floor: a concurrent fold legally
    // carries later committed segments' rows (folds are supersets of
    // their sources) — so the invariant is "some floor AT OR ABOVE
    // the gate", monotone, never a partial segment.
    val committed = new AtomicInteger(0)
    val reader = new Thread(() => {
      var lastFloor = -1
      while (!writerDone.get()) {
        val gate = committed.get()
        if (gate > 0) {
          try {
            KeyedLog.readForKeys(spark, path, probeKeys, "bk",
              maxSeg = gate.toLong)
              .foreach { df =>
                val got = df.select("bk", "payload").distinct()
                  .collect().map(r => (r.getLong(0), r.getLong(1)))
                  .toSet
                  .filter(p => p._1 >= 8L && p._1 < 88L)
                val idx = floors.indexOf(got)
                if (idx < 0)
                  failures.add(s"read matches NO committed floor " +
                    s"(lost or partial rows): ${got.size} rows at " +
                    s"gate $gate; missing vs full=" +
                    s"${(floors.last -- got).take(5)}")
                else if (idx < gate)
                  failures.add(s"read LOST committed rows: floor " +
                    s"$idx below gate $gate")
                else if (idx < lastFloor)
                  failures.add(s"floor went BACKWARD: $idx after " +
                    s"$lastFloor")
                else lastFloor = idx
                successes.incrementAndGet()
                ()
              }
            ()
          } catch {
            case t: Throwable if isMissingFileRace(t) => ()
            case t: Throwable =>
              failures.add(s"reader died on a non-race error: " +
                s"${t.getClass.getName}: ${t.getMessage}")
              writerDone.set(true)
          }
        }
      }
    })
    reader.start()
    try {
      (1 to nSegs).foreach { s =>
        KeyedLog.append(rowsOf(s).toDF("bk", "payload"), path, s.toLong)
        committed.set(s) // durable => committed (the sink's contract)
        // fold cascades run concurrently with the reader loop
        if (s % 2 == 0) KeyedLog.compact(spark, path, "bk", fanout = 2)
      }
    } finally {
      writerDone.set(true)
      reader.join(60000)
    }
    assert(failures.isEmpty,
      s"${failures.size} log-read violations:\n  " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          failures.iterator()).asScala.mkString("\n  "))
    assert(successes.get() >= 5,
      s"log reader starved: ${successes.get()} reads")
    // final state is the complete corpus
    val fin = KeyedLog.readForKeys(spark, path, probeKeys, "bk")
      .get.select("bk", "payload").distinct().count()
    assert(fin == 80L)
  }

  test("AnnIndex: continuous probes against a live lifecycle writer " +
    "(build, appends, deletes, generation-rotating rebuild) observe " +
    "only committed index states, monotonically") {
    import spark.implicits._
    // four clean clusters; member (c, j) sits at rank j from cluster
    // c's center, strictly ordered (deltas far above the int8
    // quantization step), so every lifecycle op below VISIBLY changes
    // each query's top-3
    def member(c: Int, j: Int, off: Float): Seq[Float] =
      (0 until 8).map(d =>
        if (d == c) 3f else if (d == c + 4) off else 0f)
    val corpus = (for {
      c <- 0 until 4; j <- 1 to 6
    } yield ((c * 100 + j).toLong, member(c, j, j * 0.15f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val closer = (0 until 4).map(c =>
      ((c * 100 + 7).toLong, member(c, 7, 0.05f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val closest = (0 until 4).map(c =>
      ((c * 100 + 8).toLong, member(c, 8, 0.02f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    // delete the original rank-1 members: top-3 visibly reshuffles
    val dead = (0 until 4).map(c => (c * 100 + 1).toLong)
      .toDF("vec_id").localCheckpoint()
    val queries = (0 until 4).map(c =>
      ((900 + c).toLong, member(c, 0, 0f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    def ops(path: String): Seq[() => Unit] = Seq(
      () => AnnIndex.build(corpus, path, nlist = 4, dim = 8),
      () => AnnIndex.append(closer, path, segId = 1L),
      () => AnnIndex.delete(dead, path, segId = 2L),
      () => AnnIndex.append(closest, path, segId = 3L),
      // the rotation: new generation built + swapped + OLD DELETED.
      // Content equals the live rows of the previous state, so its
      // fingerprint may legitimately EQUAL the previous one —
      // adjacent-equal is allowed below.
      () => { AnnIndex.maybeRebuild(spark, path, sample = 8, k = 3,
        minChangedFraction = 0.0, tolerance = -1.0); () })
    def fp(path: String): Seq[String] =
      AnnIndex.probe(spark, path, queries, k = 3)
        .select("qid", "id", "rank")
        .collect().map(_.toString).sorted.toSeq
    // precompute each committed state's probe fingerprint on a side
    // path — build/probe are deterministic (seeded centroids, integer
    // quantization), so the live path must reproduce them exactly
    val side = Files.createTempDirectory("rwlin-ann-side-").toString
    val expected: Vector[Seq[String]] =
      ops(side).map { op => op(); fp(side) }.toVector
    // equal fingerprints must be ADJACENT only (a rebuild reproducing
    // its predecessor's content) — indexOf-based monotonicity below
    // is sound exactly under that shape
    expected.indices.foreach { i =>
      val first = expected.indexOf(expected(i))
      assert((first to i).forall(j => expected(j) == expected(i)),
        s"fixture broken: states $first and $i share a fingerprint " +
          "with a different state between them")
    }
    assert(expected.distinct.length >= 4,
      s"fixture broken: expected >=4 distinct lifecycle states, got " +
        s"${expected.distinct.length}")
    val path = Files.createTempDirectory("rwlin-ann-").toString
    val writerDone = new AtomicBoolean(false)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val successes = new AtomicInteger(0)
    val retries = new AtomicInteger(0)
    val reader = new Thread(() => {
      var lastIdx = -1
      while (!writerDone.get()) {
        try {
          val got = fp(path)
          val idx = expected.indexOf(got)
          if (idx < 0)
            failures.add(s"probe observed a state matching NO " +
              s"committed lifecycle point (torn/mixed): $got")
          else if (idx < lastIdx)
            failures.add(s"index went BACKWARD: state $idx after " +
              s"$lastIdx")
          else lastIdx = idx
          successes.incrementAndGet()
          ()
        } catch {
          case t: Throwable if isMissingFileRace(t) =>
            retries.incrementAndGet() // rotation cleanup / bootstrap race
            ()
          case t: Throwable if t.getMessage != null &&
              t.getMessage.contains("no ANN index") =>
            // not bootstrapped yet, or the rotation cleanup deleted
            // the pre-rotation root _META under a reader that had
            // already resolved the old root — fail-stop, retry
            retries.incrementAndGet()
            ()
          case t: Throwable =>
            failures.add(s"probe died on a non-race error: " +
              s"${t.getClass.getName}: ${t.getMessage}")
            writerDone.set(true)
        }
      }
    })
    reader.start()
    try ops(path).foreach(op => op())
    finally {
      writerDone.set(true)
      reader.join(120000)
    }
    assert(failures.isEmpty,
      s"${failures.size} probe linearizability violations:\n  " +
        scala.jdk.CollectionConverters.IteratorHasAsScala(
          failures.iterator()).asScala.mkString("\n  "))
    assert(successes.get() >= 3,
      s"probe reader starved: only ${successes.get()} successes " +
        s"(${retries.get()} rotation-race retries)")
    assert(fp(path) == expected.last)
  }

  // ----------------------------------------------------------------
  // COMBINED crash x concurrent reader (round-18 order #2): rounds
  // 16-17 proved writer-vs-writer, reader-vs-writer, and crash-replay
  // SEPARATELY. These two legs compose them: the reader loops run
  // THROUGH an armed crash and its recovery replay, in unwind AND
  // abandon (kill -9 lock fidelity) modes, at the TableSync commit
  // window and the AnnIndex publish/rotation sites. Invariants:
  // every observation during the crash-recovery window is still SOME
  // committed state (never torn), observations stay monotone through
  // the window, and a leaked commit/rebuild lock refuses the WRITER
  // loudly while READERS keep serving committed state (the stale-lock
  // contract is reader-visible as loud-for-writers, invisible-for-
  // readers — never as a torn read).
  // ----------------------------------------------------------------

  private def isLockRefusal(t: Throwable): Boolean = {
    var c: Throwable = t
    var hops = 0
    while (c != null && hops < 32) {
      if (c.isInstanceOf[java.util.ConcurrentModificationException] &&
          c.getMessage != null && c.getMessage.contains("lock"))
        return true
      c = c.getCause
      hops += 1
    }
    false
  }

  private def deleteLockFile(id: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(id)
    p.getFileSystem(spark.sessionState.newHadoopConf())
      .delete(p, false)
    ()
  }

  test("COMBINED walk, TableSync: readCurrent loops THROUGH armed " +
    "commit-window crashes and their recovery replay (unwind AND " +
    "abandon) - every observation is a committed state, monotone; " +
    "the leaked commit lock refuses the writer loudly while readers " +
    "keep serving") {
    import spark.implicits._
    val path = Files.createTempDirectory("rwlin-crash-ts-").toString
    def rowsOf(b: Int): Seq[(Long, Long, String)] =
      (0 until 6).map(i => (((3 * b + i) % 24).toLong, b.toLong,
        s"v$b-${(3 * b + i) % 24}"))
    def apply(b: Int): Unit =
      TableSync.applyBatch(rowsOf(b).toDF("k", "ver", "v"), path,
        "k", "ver", b.toLong, numBuckets = 2, maxGens = 2)
    def readMap(): Map[Long, String] =
      TableSync.readCurrent(spark, path).collect()
        .map(r => r.getLong(0) -> r.getString(2)).toMap
    apply(0)
    var before = rowsOf(0).map(r => r._1 -> r._3).toMap
    assert(readMap() == before)
    // the three commit-window boundaries: snapshot durable (pre-
    // lock), archive durable (pre-swap), pointer swapped (pre-gc) -
    // each walked in unwind mode then abandon mode
    val phases = for {
      abandon <- Seq(false, true)
      site <- Seq("TableSync.snap", "TableSync.commit.archive",
        "TableSync.commit.swap")
    } yield (site, abandon)
    phases.zipWithIndex.foreach { case ((site, abandon), i) =>
      val b = i + 1
      val after = before ++ rowsOf(b).map(r => r._1 -> r._3)
      assert(after != before, "fixture: every batch must change state")
      val observed =
        new java.util.concurrent.ConcurrentLinkedQueue[Map[Long, String]]()
      val readerErrors =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val stop = new AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try { observed.add(readMap()); () }
          catch {
            case t: Throwable if isMissingFileRace(t) => ()
            case t: Throwable =>
              readerErrors.add(s"${t.getClass.getName}: ${t.getMessage}")
              stop.set(true)
          }
        }
      })
      reader.start()
      try {
        if (abandon) graft.FaultPoints.enableAbandonMode()
        graft.FaultPoints.armCrash(site, 1L)
        intercept[graft.FaultPoints.InjectedCrash] { apply(b) }
        graft.FaultPoints.disarm()
        val leaked =
          if (abandon) graft.FaultPoints.drainLeakedLocks()
          else Set.empty[String]
        if (leaked.nonEmpty) {
          // the stale-lock window, reader side: reads are lock-free
          // and keep serving SOME committed state
          val mid = readMap()
          assert(mid == before || mid == after,
            s"stale-lock-window read must be a committed state " +
              s"($site): $mid")
          // writer side: the replay refuses LOUDLY, naming the lock
          val refused =
            try { apply(b); false }
            catch { case t: Throwable if isLockRefusal(t) => true }
          assert(refused,
            s"replay over the leaked commit lock must refuse ($site)")
          leaked.foreach(deleteLockFile)
          apply(b)
        } else apply(b) // restarted-stream recovery: replay the batch
      } finally {
        if (abandon) graft.FaultPoints.disableAbandonMode()
        graft.FaultPoints.disarm()
        stop.set(true)
        reader.join(60000)
      }
      assert(readerErrors.isEmpty,
        s"reader died during crash phase $site/abandon=$abandon: " +
          s"$readerErrors")
      var seenAfter = false
      scala.jdk.CollectionConverters
        .IteratorHasAsScala(observed.iterator()).asScala.foreach { m =>
          if (m == after) seenAfter = true
          else if (m == before)
            assert(!seenAfter, s"pointer went BACKWARD through the " +
              s"crash window ($site, abandon=$abandon)")
          else fail(s"TORN observation during crash phase $site " +
            s"(abandon=$abandon): $m (expected $before or $after)")
        }
      assert(readMap() == after,
        s"recovery must converge after $site (abandon=$abandon)")
      before = after
    }
  }

  test("COMBINED walk, AnnIndex: probes loop THROUGH armed " +
    "publish/rotation crashes and recovery (unwind AND abandon) - " +
    "every successful probe matches a committed lifecycle point; " +
    "the leaked rebuild lock refuses the rebuilder loudly while " +
    "probes keep serving") {
    import spark.implicits._
    def member(c: Int, j: Int, off: Float): Seq[Float] =
      (0 until 8).map(d =>
        if (d == c) 3f else if (d == c + 4) off else 0f)
    val corpus = (for {
      c <- 0 until 4; j <- 1 to 6
    } yield ((c * 100 + j).toLong, member(c, j, j * 0.15f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val closer = (0 until 4).map(c =>
      ((c * 100 + 7).toLong, member(c, 7, 0.05f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val closest = (0 until 4).map(c =>
      ((c * 100 + 8).toLong, member(c, 8, 0.02f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val queries = (0 until 4).map(c =>
      ((900 + c).toLong, member(c, 0, 0f)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val path = Files.createTempDirectory("rwlin-crash-ann-").toString
    def fp(): Seq[String] =
      AnnIndex.probe(spark, path, queries, k = 3)
        .select("qid", "id", "rank")
        .collect().map(_.toString).sorted.toSeq
    AnnIndex.build(corpus, path, nlist = 4, dim = 8)
    var before = fp()
    def rebuild(): Unit = {
      AnnIndex.maybeRebuild(spark, path, sample = 8, k = 3,
        minChangedFraction = 0.0, tolerance = -1.0)
      ()
    }
    // (site, abandon, writer op, idempotent replay of the same op).
    // Appends crash at the segment-publish boundary (lock-free - no
    // leak to drain, but the abandon leg still walks the no-unwind
    // path); rotations crash before and after the pointer swap and
    // hold the rebuild lock, so their abandon legs exercise the
    // leaked-lock refusal under live probes.
    val phases: Seq[(String, Boolean, () => Unit)] = Seq(
      ("AnnIndex.seg.staged", false,
        () => AnnIndex.append(closer, path, segId = 1L)),
      ("AnnIndex.seg.staged", true,
        () => AnnIndex.append(closest, path, segId = 2L)),
      ("AnnIndex.rotate.built", false, () => rebuild()),
      ("AnnIndex.rotate.built", true, () => rebuild()),
      ("AnnIndex.rotate.swap", false, () => rebuild()),
      ("AnnIndex.rotate.swap", true, () => rebuild()))
    phases.foreach { case (site, abandon, op) =>
      val observed =
        new java.util.concurrent.ConcurrentLinkedQueue[Seq[String]]()
      val readerErrors =
        new java.util.concurrent.ConcurrentLinkedQueue[String]()
      val stop = new AtomicBoolean(false)
      val reader = new Thread(() => {
        while (!stop.get()) {
          try { observed.add(fp()); () }
          catch {
            case t: Throwable if isMissingFileRace(t) => ()
            case t: Throwable if t.getMessage != null &&
                t.getMessage.contains("no ANN index") => ()
            case t: Throwable =>
              readerErrors.add(s"${t.getClass.getName}: ${t.getMessage}")
              stop.set(true)
          }
        }
      })
      reader.start()
      try {
        if (abandon) graft.FaultPoints.enableAbandonMode()
        graft.FaultPoints.armCrash(site, 1L)
        intercept[graft.FaultPoints.InjectedCrash] { op() }
        graft.FaultPoints.disarm()
        val leaked =
          if (abandon) graft.FaultPoints.drainLeakedLocks()
          else Set.empty[String]
        if (leaked.nonEmpty) {
          // probes are lock-free: they must keep SERVING (not throw)
          // while the rebuild lock lies leaked on disk; the result
          // joins the recording and is validated post-hoc against
          // the committed fingerprints like every other observation
          observed.add(fp())
          val refused =
            try { op(); false }
            catch { case t: Throwable if isLockRefusal(t) => true }
          assert(refused,
            s"replay over the leaked rebuild lock must refuse ($site)")
          leaked.foreach(deleteLockFile)
          op()
        } else op() // replay: same segId no-ops data, rotation re-runs
      } finally {
        if (abandon) graft.FaultPoints.disableAbandonMode()
        graft.FaultPoints.disarm()
        stop.set(true)
        reader.join(60000)
      }
      assert(readerErrors.isEmpty,
        s"prober died during crash phase $site/abandon=$abandon: " +
          s"$readerErrors")
      val after = fp() // quiesced post-recovery fingerprint
      var seenAfter = false
      scala.jdk.CollectionConverters
        .IteratorHasAsScala(observed.iterator()).asScala.foreach { m =>
          if (m == after) seenAfter = true
          else if (m == before)
            assert(!seenAfter || before == after,
              s"probe went BACKWARD through the crash window ($site)")
          else fail(s"TORN probe during crash phase $site " +
            s"(abandon=$abandon): $m")
        }
      before = after
    }
    // the walk must have actually CHANGED the index along the way
    // (appends reshuffle every query's top-3) - guards a vacuous pass
    assert(fp().nonEmpty)
  }
}
