package graft.streaming

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import scala.util.{Failure, Success, Try}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.AnnIndex

/** REAL interleaved two-writer races (round-16 order #2): round 15's
  * single-writer defenses — the rebuild lock, the commit lock, the
  * pid-unique AtomicFiles tmp names, the under-lock re-validation —
  * were spec'd only as held-lock refusals; none of those specs ever
  * ran two writers concurrently. These do: two threads released by
  * one latch, bounded joins (no sleeps-as-sync), repeated a few times
  * to vary the interleaving. The invariant is never "who wins" (any
  * serialization is legal) but "the artifact is intact and every
  * loser fails LOUDLY" — no torn state, no silent lost update.
  */
class ConcurrentWritersSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Release both thunks simultaneously; return their outcomes. */
  private def race[A](a: () => A, b: () => A): (Try[A], Try[A]) = {
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def wrap(f: () => A) = pool.submit(() => {
      gate.await(10, TimeUnit.SECONDS); Try(f())
    })
    val (fa, fb) = (wrap(a), wrap(b))
    gate.countDown()
    val ra = fa.get(120, TimeUnit.SECONDS)
    val rb = fb.get(120, TimeUnit.SECONDS)
    pool.shutdown()
    (ra, rb)
  }

  private def vec(i: Long): Seq[Float] =
    (0 until 8).map(d =>
      ((i % 5) - 2).toFloat + (if (d == (i % 8).toInt) 2f else 0f))

  test("two concurrent AnnIndex bootstrap builds: one winner, loud " +
    "loser, intact artifact") {
    import spark.implicits._
    val corpus = (0L until 30L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val queries = (100L until 103L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    (0 until 3).foreach { round =>
      val path = Files.createTempDirectory(s"race-boot-$round-").toString
      val (ra, rb) = race(
        () => AnnIndex.build(corpus, path, nlist = 4, dim = 8),
        () => AnnIndex.build(corpus, path, nlist = 4, dim = 8))
      val failures = Seq(ra, rb).collect { case Failure(t) => t }
      // both may serialize cleanly (loser sees _META under its lock
      // and rotates — same content), or the loser refuses loudly at
      // the held lock; what may NOT happen is a silent interleaved
      // bootstrap
      failures.foreach(t => assert(
        t.isInstanceOf[java.util.ConcurrentModificationException],
        s"unexpected failure class: $t"))
      assert(failures.size <= 1, s"both writers failed: $failures")
      val got = AnnIndex.probe(spark, path, queries, k = 3)
        .groupBy(col("qid")).count().collect().map(_.getLong(1)).toSeq
      assert(got.nonEmpty && got.forall(_ == 3L),
        s"artifact torn after bootstrap race (round $round): $got")
      // lock released by both paths
      val fs = new Path(path).getFileSystem(
        spark.sessionState.newHadoopConf())
      assert(!fs.exists(new Path(path, "_REBUILD_LOCK")),
        "rebuild lock leaked")
    }
  }

  test("two concurrent maybeRebuild calls (forced drift): artifact " +
    "intact, losers loud or skipped, generations within the " +
    "retention window") {
    import spark.implicits._
    val corpus = (0L until 30L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val more = (30L until 40L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    val queries = (100L until 103L).map(i => (i, vec(i)))
      .toDF("vec_id", "embedding").localCheckpoint()
    (0 until 3).foreach { round =>
      val path = Files.createTempDirectory(s"race-rb-$round-").toString
      AnnIndex.build(corpus, path, nlist = 4, dim = 8)
      AnnIndex.append(more, path, segId = 1L)
      // tolerance < 0 makes driftCheck always recommend;
      // minChangedFraction 0 disables the churn gate — both threads
      // WANT to rebuild, so the lock and the under-lock re-validation
      // are actually contended
      def rb() = AnnIndex.maybeRebuild(spark, path, sample = 8, k = 3,
        tolerance = -1.0, minChangedFraction = 0.0)
      val (ra, rb2) = race(() => rb(), () => rb())
      // legal loud losses: the lock refusal, or a transient read loss
      // (the loser's driftCheck scanned the old generation while the
      // winner swapped and deleted it — readers re-resolve per call,
      // so a RETRY heals it; assert that convergence below)
      def acceptable(t: Throwable): Boolean = {
        def chain(c: Throwable, hops: Int): Boolean =
          c != null && hops < 16 && (
            c.isInstanceOf[java.util.ConcurrentModificationException] ||
            c.isInstanceOf[java.io.FileNotFoundException] ||
            (c.getMessage != null &&
              (c.getMessage.contains("does not exist") ||
                c.getMessage.contains("no ANN index"))) ||
            chain(c.getCause, hops + 1))
        chain(t, 0)
      }
      val losses = Seq(ra, rb2).collect { case Failure(t) => t }
      losses.foreach(t =>
        assert(acceptable(t), s"unexpected failure class: $t"))
      if (losses.nonEmpty) rb() // the retry converges
      val got = AnnIndex.probe(spark, path, queries, k = 3)
        .groupBy(col("qid")).count().collect().map(_.getLong(1)).toSeq
      assert(got.nonEmpty && got.forall(_ == 3L),
        s"artifact torn after rebuild race (round $round): $got")
      val fs = new Path(path).getFileSystem(
        spark.sessionState.newHadoopConf())
      assert(!fs.exists(new Path(path, "_REBUILD_LOCK")),
        "rebuild lock leaked")
      // a later no-op maybeRebuild (high churn bar) sweeps any orphan
      // generation debt; after it, only the pointed generation and
      // its reader-grace predecessor may remain (rotation retention)
      AnnIndex.maybeRebuild(spark, path, sample = 4, k = 3,
        tolerance = 10.0, minChangedFraction = 10.0)
      val pointed = {
        val p = new Path(path, "_GEN")
        val len = fs.getFileStatus(p).getLen.toInt
        val buf = new Array[Byte](len)
        val in = fs.open(p)
        try in.readFully(0, buf) finally in.close()
        new String(buf, "UTF-8").trim
      }
      val ordinal = pointed.stripPrefix("g").toLong
      val allowed =
        if (ordinal >= 2) Set(pointed, s"g${ordinal - 1}")
        else Set(pointed)
      val gens = fs.listStatus(new Path(path))
        .filter(st => st.isDirectory &&
          st.getPath.getName.matches("g\\d+"))
        .map(_.getPath.getName).toSet
      assert(gens.contains(pointed) && gens.subsetOf(allowed),
        s"generations $gens outside the retention window $allowed")
    }
  }

  test("concurrent AtomicFiles writers to one destination: final " +
    "content is exactly one writer's payload, no stranded tmps") {
    val conf = spark.sessionState.newHadoopConf()
    val dir = Files.createTempDirectory("race-atomic-").toString
    val fs = new Path(dir).getFileSystem(conf)
    val dest = new Path(dir, "_POINTER")
    val threads = 8
    val writes = 25
    val payloads = (0 until threads).map(t =>
      s"writer-$t-payload-${"x" * (10 + t)}")
    val pool = Executors.newFixedThreadPool(threads)
    val gate = new CountDownLatch(1)
    val futures = (0 until threads).map { t =>
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          gate.await(10, TimeUnit.SECONDS)
          var i = 0
          while (i < writes) {
            graft.AtomicFiles.write(fs, conf, dest,
              payloads(t).getBytes("UTF-8"))
            i += 1
          }
          true
        }
      })
    }
    gate.countDown()
    futures.foreach(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    val len = fs.getFileStatus(dest).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(dest)
    try in.readFully(0, buf) finally in.close()
    val got = new String(buf, "UTF-8")
    assert(payloads.contains(got),
      s"destination holds an interleaved/torn payload: '$got'")
    val stranded = fs.listStatus(new Path(dir))
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(stranded.isEmpty, s"stranded tmps: ${stranded.toSeq}")
  }

  test("two concurrent TableSync commits: any serialization is " +
    "legal, losers are loud, final table matches the winners") {
    import spark.implicits._
    (0 until 3).foreach { round =>
      val path = Files.createTempDirectory(s"race-ts-$round-").toString
      TableSync.applyBatch(
        Seq(("seed", 0L, "s0")).toDF("k", "ver", "v"),
        path, "k", "ver", 0L, numBuckets = 4)
      def commit(b: Long, key: String) = () =>
        TableSync.applyBatch(
          Seq((key, b, s"$key$b")).toDF("k", "ver", "v"),
          path, "k", "ver", b, numBuckets = 4)
      val (ra, rb) = race(commit(1L, "a"), commit(2L, "b"))
      val outcomes = Seq("a" -> ra, "b" -> rb)
      outcomes.collect { case (_, Failure(t)) => t }.foreach(t =>
        assert(
          t.isInstanceOf[java.util.ConcurrentModificationException],
          s"unexpected failure class (round $round): $t"))
      val won = outcomes.collect { case (k, Success(_)) => k }.toSet
      assert(won.nonEmpty, s"both commits failed loudly (round $round)")
      val keys = TableSync.readCurrent(spark, path)
        .select("k").collect().map(_.getString(0)).toSet
      assert(keys == won + "seed",
        s"table keys $keys != successful writers $won + seed " +
          s"(round $round) — a silent lost or phantom update")
    }
  }

  test("two concurrent writeShards over one outDir (dueling-zombie " +
    "overlap): BOTH succeed, published artifacts intact and readable") {
    // the supported overlap the byte-determinism tiebreaker exists
    // for: identical data, two invocations. Before the age-gated tmp
    // sweep, the younger invocation's call-time hygiene deleted the
    // elder's IN-FLIGHT attempt tmps and its publish rename failed
    // loudly — a supported overlap turned job failure (r16 advice).
    import spark.implicits._
    import graft.sources.TarShards
    val data = (0 until 40).map(i =>
      (s"m$i.bin", Array.tabulate(64)(j => (i * j).toByte),
        s"s${i % 4}"))
      .toDF("name", "bytes", "shard").localCheckpoint()
    (0 until 3).foreach { round =>
      val out = Files.createTempDirectory(s"race-tar-$round-").toString
      val (ra, rb) = race(
        () => TarShards.writeShards(data, "name", "bytes", "shard",
          out).collect().length,
        () => TarShards.writeShards(data, "name", "bytes", "shard",
          out).collect().length)
      // identical deterministic bytes => last-rename-wins keeps every
      // .tar/.idx pair consistent and NEITHER invocation may fail
      assert(ra.isSuccess && rb.isSuccess,
        s"dueling writeShards failed (round $round): $ra / $rb")
      val back = TarShards.readShards(spark, out)
      assert(back.count() == 40, s"round $round: member loss")
      // selective reads through the sidecars stay byte-consistent
      val sel = TarShards.readMembersByName(spark, out,
        Seq("m7.bin", "m33.bin")).collect()
      assert(sel.length == 2 && sel.forall(r =>
        java.util.Arrays.equals(r.getAs[Array[Byte]](3),
          Array.tabulate(64)(j =>
            (r.getString(2).drop(1).stripSuffix(".bin").toInt * j)
              .toByte))),
        s"round $round: selective read drifted after the duel")
    }
  }
}
