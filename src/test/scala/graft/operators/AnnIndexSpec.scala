package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // deterministic pseudo-random 16-dim corpus (splitmix-ish mixing,
  // no RNG state): enough rows that cells are non-trivial
  private def corpus = {
    import spark.implicits._
    (0L until 400L).map { i =>
      val v = (0 until 16).map { d =>
        val x = i * 2654435761L + d * 40503L
        (((x ^ (x >>> 13)) % 1000L).toFloat / 500f) - 1f
      }
      (i, v)
    }.toDF("vec_id", "embedding")
  }

  private def topk(df: org.apache.spark.sql.DataFrame) =
    df.select(col("qid"), col("id"), round(col("cosine"), 6).as("c"),
      col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet

  test("probe over the persisted artifact is BIT-IDENTICAL to the " +
    "transient IVFxSQ path at the same parameters") {
    val path = Files.createTempDirectory("annix-").toString
    val c = corpus
    val q = c.filter(col("vec_id") % 40 === 0)
    AnnIndex.build(c, path, nlist = 8, dim = 16)
    val persisted = topk(AnnIndex.probe(spark, path, q, k = 5,
      nprobe = 2, refine = 4))
    val transient = topk(Similarity.ivfQuantizedTopK(c, q, k = 5,
      nlist = 8, nprobe = 2, refine = 4, dim = 16))
    assert(persisted == transient,
      s"persisted\n$persisted\nvs transient\n$transient")
    assert(persisted.nonEmpty && persisted.groupBy(_._1).forall(_._2.size == 5))
  }

  test("the artifact is self-contained and immutable between builds: " +
    "probing after the corpus frame is gone works; a build over an " +
    "existing artifact ROTATES generations (never overwrites " +
    "geometry in place); probing a missing index fails loudly") {
    val path = Files.createTempDirectory("annix2-").toString
    AnnIndex.build(corpus, path, nlist = 4, dim = 16)
    import spark.implicits._
    val q = Seq((7L, (0 until 16).map(d => (d + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val r1 = AnnIndex.probe(spark, path, q, k = 3, nprobe = 2)
    assert(r1.count() == 3)
    // out-of-corpus-range query components saturate (clamped int8),
    // never wrap: top-1 by the exact rescore is still the true
    // nearest within probed cells, and cosines are in [-1, 1]
    assert(r1.collect().forall(r => math.abs(r.getDouble(2)) <= 1.0))
    AnnIndex.build(corpus.limit(100), path, nlist = 4, dim = 16)
    assert(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2)
      .collect().forall(_.getLong(1) < 100L),
      "rebuild must fully replace the artifact")
    // the rebuild landed as a generation swap: an in-place overwrite
    // lands codes/centroids/_META in sequence, so a crash mid-build
    // would leave cross-geometry state that scores silently wrong
    val fsG = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    assert(fsG.exists(new org.apache.hadoop.fs.Path(path, "_GEN")),
      "build over an existing artifact must rotate, not overwrite")
    // READER GRACE: the pre-rotation root files are RETAINED for one
    // rotation cycle (a probe that resolved the old layout before the
    // swap keeps its files); the pointer serves g1
    assert(fsG.exists(new org.apache.hadoop.fs.Path(path, "_META")) &&
      fsG.exists(new org.apache.hadoop.fs.Path(path, "g1/_META")),
      "pre-rotation root files retained as the reader-grace " +
        "predecessor; g1 live")
    assert(!fsG.exists(
      new org.apache.hadoop.fs.Path(path, "_REBUILD_LOCK")),
      "the rotation's lock must release")
    // a third build rotates again: g2 live, g1 retained as grace, the
    // TWO-BEHIND root files now swept
    AnnIndex.build(corpus.limit(50), path, nlist = 4, dim = 16)
    assert(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2)
      .collect().forall(_.getLong(1) < 50L))
    assert(!fsG.exists(new org.apache.hadoop.fs.Path(path, "_META")) &&
      fsG.exists(new org.apache.hadoop.fs.Path(path, "g1/_META")) &&
      fsG.exists(new org.apache.hadoop.fs.Path(path, "g2/_META")),
      "two-behind root files swept; g1 retained; g2 live")
    // CRASHED-ROTATION RECOVERY: strand a half-built g3 whose inner
    // _META already landed (crash between the nested build and the
    // pointer swap). Without the entry sweep the next build would
    // compute the SAME gen ordinal, see the stranded _META, and
    // rotate NESTED inside g3 (g3/g1 + g3/_GEN) — unreachable through
    // the single-level pointer resolution. The sweep must clear it
    // and the rotation land cleanly.
    fsG.mkdirs(new org.apache.hadoop.fs.Path(path, "g3/codes"))
    val mOut = fsG.create(
      new org.apache.hadoop.fs.Path(path, "g3/_META"), true)
    mOut.write("16 4 42 1.0 5".getBytes("UTF-8")); mOut.close()
    AnnIndex.build(corpus.limit(25), path, nlist = 4, dim = 16)
    assert(!fsG.exists(new org.apache.hadoop.fs.Path(path, "g3/g1")) &&
      !fsG.exists(new org.apache.hadoop.fs.Path(path, "g3/_GEN")),
      "nested rotation inside a stranded generation dir")
    assert(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2)
      .collect().forall(_.getLong(1) < 25L),
      "rebuild over the stranded generation must serve the new corpus")
    assert(!fsG.exists(new org.apache.hadoop.fs.Path(path, "g1")) &&
      fsG.exists(new org.apache.hadoop.fs.Path(path, "g2/_META")) &&
      fsG.exists(new org.apache.hadoop.fs.Path(path, "g3/_META")),
      "retention window slides: g1 two-behind swept, g2 grace, g3 live")
    val missing = Files.createTempDirectory("annix3-").toString
    val e = intercept[IllegalArgumentException] {
      AnnIndex.probe(spark, missing, q, k = 3)
    }
    assert(e.getMessage.contains("run build()"))
  }

  test("append ingests through the FROZEN geometry: appended near-" +
    "duplicates surface as top-1, a replayed segment never " +
    "duplicates candidates, and rebuild clears appended segments") {
    import spark.implicits._
    val path = Files.createTempDirectory("annix4-").toString
    val c = corpus
    AnnIndex.build(c, path, nlist = 8, dim = 16)
    // appended batch: exact copies of two corpus vectors under fresh
    // ids — with frozen centroids they land in the SAME cell as their
    // twins, so any probe of the twin must now rank the copy first
    val dup = c.filter(col("vec_id").isin(40L, 160L))
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    AnnIndex.append(dup, path, segId = 1L)
    val q = c.filter(col("vec_id").isin(40L, 160L))
    val got = topk(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2))
    assert(got.filter(_._4 == 1).map(t => (t._1, t._2)) ==
      Set((40L, 10040L), (160L, 10160L)),
      s"appended exact twin must be top-1: $got")
    assert(got.forall(t => t._4 != 1 || math.abs(t._3 - 1.0) < 1e-6))
    // replayed append (same segId, same rows) overwrites in place:
    // identical result set, no duplicated candidate rows
    AnnIndex.append(dup, path, segId = 1L)
    assert(topk(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2))
      == got, "replayed segment must be invisible")
    // per-(qid, id) uniqueness even at k past the dup count
    val wide = AnnIndex.probe(spark, path, q, k = 10, nprobe = 2)
      .select("qid", "id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.distinct.length == wide.length)
    // rebuild = full replace: the seg=1 rows are gone
    AnnIndex.build(c, path, nlist = 8, dim = 16)
    assert(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2)
      .collect().forall(_.getLong(1) < 10000L),
      "rebuild must clear appended segments")
    // appending to a missing index fails loudly
    val none = Files.createTempDirectory("annix5-").toString
    val err = intercept[IllegalArgumentException] {
      AnnIndex.append(dup, none, segId = 1L)
    }
    assert(err.getMessage.contains("run build()"))
  }

  test("DELETE lifecycle: tombstones suppress earlier copies from " +
    "candidates AND rescore, a later append re-adds, rebuild clears " +
    "tombstones and converges") {
    import spark.implicits._
    val path = Files.createTempDirectory("annix7-").toString
    val c = corpus
    AnnIndex.build(c, path, nlist = 8, dim = 16)
    // exact twins of two corpus vectors under fresh ids — both top-1
    // for their twins' queries pre-delete
    val dup = c.filter(col("vec_id").isin(40L, 160L))
      .select((col("vec_id") + 10000L).as("vec_id"), col("embedding"))
    AnnIndex.append(dup, path, segId = 1L)
    val q = c.filter(col("vec_id").isin(40L, 160L))
    def top1() = topk(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2))
      .filter(_._4 == 1).map(t => (t._1, t._2))
    assert(top1() == Set((40L, 10040L), (160L, 10160L)))
    // delete one twin: its query's top-1 must change, the other stays
    AnnIndex.delete(Seq(10040L).toDF("vec_id"), path, segId = 2L)
    val afterDel = top1()
    assert(!afterDel.contains((40L, 10040L)),
      s"deleted id still ranked: $afterDel")
    assert(afterDel.contains((160L, 10160L)))
    // a deleted id must vanish from ALL ranks, not just top-1
    val all = AnnIndex.probe(spark, path, q, k = 10, nprobe = 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(!all.contains(10040L))
    // replayed delete (same segId) is a no-op
    AnnIndex.delete(Seq(10040L).toDF("vec_id"), path, segId = 2L)
    assert(top1() == afterDel)
    // RE-ADD after delete: a later segment outranks the tombstone
    AnnIndex.append(dup.filter(col("vec_id") === 10040L), path,
      segId = 3L)
    assert(top1() == Set((40L, 10040L), (160L, 10160L)),
      "re-added id must be probeable again")
    // per-(qid,id) uniqueness even though 10040 was stored twice
    // (seg 1 suppressed, seg 3 live)
    val wide = AnnIndex.probe(spark, path, q, k = 10, nprobe = 2)
      .select("qid", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.distinct.length == wide.length)
    // rebuild = clean slate: tombstones cleared, only the rebuilt
    // corpus is probeable
    AnnIndex.build(c, path, nlist = 8, dim = 16)
    assert(AnnIndex.probe(spark, path, q, k = 3, nprobe = 2)
      .collect().forall(_.getLong(1) < 10000L))
  }

  test("driftCheck: baseline recorded on first call; a distribution-" +
    "shifting append degrades sampled recall and recommends rebuild; " +
    "rebuilding restores it") {
    import spark.implicits._
    val path = Files.createTempDirectory("annix8-").toString
    AnnIndex.build(corpus, path, nlist = 8, dim = 16)
    val d0 = AnnIndex.driftCheck(spark, path, sample = 16, k = 5)
    assert(d0.recall == d0.baseline && !d0.rebuildRecommended)
    // appended mass from a SHIFTED distribution (all-positive
    // quadrant, magnitudes 2-4 — diverse but directionally clumped):
    // the frozen centroids were never trained on it, so these crowd
    // into the few positive-leaning cells and sampled recall over
    // the merged corpus drops; magnitudes stay moderate so the int8
    // scale still resolves the original vectors after a retrain
    val shifted = (0L until 400L).map { i =>
      val v = (0 until 16).map { d =>
        val x = i * 48271L + d * 69621L
        2f + (((x ^ (x >>> 11)) % 100L).toFloat / 50f)
      }
      (20000L + i, v)
    }.toDF("vec_id", "embedding")
    AnnIndex.append(shifted, path, segId = 1L)
    val d1 = AnnIndex.driftCheck(spark, path, sample = 16, k = 5)
    assert(d1.baseline == d0.baseline,
      "baseline must persist across calls")
    assert(d1.rebuildRecommended,
      s"shifted mass must degrade recall: $d1 vs baseline ${d0.baseline}")
    // retrain on the full merged corpus: recall recovers, a fresh
    // baseline is recorded
    val merged = corpus.unionByName(shifted)
    AnnIndex.build(merged, path, nlist = 8, dim = 16)
    val d2 = AnnIndex.driftCheck(spark, path, sample = 16, k = 5)
    assert(d2.recall == d2.baseline && !d2.rebuildRecommended)
    assert(d2.recall > d1.recall,
      s"rebuild must restore recall: $d2 vs $d1")
  }

  test("driftCheck recall is duplicate-safe: an id stored LIVE twice " +
    "(re-appended, no suppressing tombstone) must not fan the joint " +
    "hits/denom aggregate out — recall equals the semi-join-semantics " +
    "reference computed from the same probe and exact frames") {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.expressions.Window
    val path = Files.createTempDirectory("annix-dup-").toString
    val c = corpus
    AnnIndex.build(c, path, nlist = 8, dim = 16)
    // re-ingest a slice WITHOUT deleting: append stores the ids AGAIN
    // (segments are never read there), so `live` now holds duplicate
    // (id, vec) rows and the probe may surface a qid's neighbor twice
    AnnIndex.append(c.filter(col("vec_id") % 25 === 0), path, segId = 1L)
    val d = AnnIndex.driftCheck(spark, path, sample = 16, k = 5)
    assert(d.recall >= 0.0 && d.recall <= 1.0, s"recall out of range: $d")
    // reference: the SAME exact/approx frames driftCheck derives,
    // reduced on the driver with semi-join semantics — exact rows
    // keep multiplicity (denominator), approx matches as a SET
    val live = spark.read.parquet(s"$path/codes")
      .select(col("id"), col("vec"))
    val queries = live.orderBy(xxhash64(col("id")), col("id"))
      .limit(16)
      .select(col("id").as("vec_id"), col("vec").as("embedding"))
      .localCheckpoint()
    val approxSet = AnnIndex.probe(spark, path, queries, k = 5,
      nprobe = 3, refine = 4)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wq = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("id"))
    val exactRows = live
      .join(broadcast(queries.select(col("vec_id").as("qid"),
        col("embedding").as("qvec"))), col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        VectorFunctions.cosineSim(col("vec"), col("qvec")).as("cosine"))
      .withColumn("rank", row_number().over(wq))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(exactRows.distinct.length < exactRows.length,
      "fixture must actually produce duplicate (qid,id) exact rows — " +
        "the duplicate-bearing corpus is the point of this spec")
    val refRecall =
      exactRows.count(approxSet.contains).toDouble / exactRows.length
    assert(math.abs(d.recall - refRecall) < 1e-12,
      s"driftCheck recall ${d.recall} != duplicate-safe reference " +
        s"$refRecall (fan-out regression)")
  }

  test("legacy artifact without _SEGROWS backfills PER-SEGMENT " +
    "counts: a replayed earlier segment never double-counts into " +
    "the row total") {
    import spark.implicits._
    val path = Files.createTempDirectory("annix6-").toString
    val c = corpus
    AnnIndex.build(c, path, nlist = 4, dim = 16)
    val segA = c.limit(10)
      .select((col("vec_id") + 20000L).as("vec_id"), col("embedding"))
    val segB = c.limit(5)
      .select((col("vec_id") + 30000L).as("vec_id"), col("embedding"))
    AnnIndex.append(segA, path, segId = 1L)
    AnnIndex.append(segB, path, segId = 2L)
    def metaRows(): Long = {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sessionState.newHadoopConf())
      val p = new org.apache.hadoop.fs.Path(path, "_META")
      val len = fs.getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, buf) finally in.close()
      new String(buf, "UTF-8").trim.split(" ").last.toLong
    }
    assert(metaRows() == 415L)
    // simulate a legacy multi-segment artifact: drop the accounting
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SEGROWS"), false)
    // the REPLAY of segment 1 (same rows) must backfill per-segment
    // counts — the old lump-to-seg-0 fallback counted seg 1's rows
    // inside the build entry AND as the replayed segment: 425, not 415
    AnnIndex.append(segA, path, segId = 1L)
    assert(metaRows() == 415L,
      "legacy backfill must not double-count a replayed segment")
  }

  test("maybeRebuild closes the drift loop: no-op within tolerance; " +
    "on drift it retrains on the LIVE rows into a new generation, " +
    "swaps the pointer atomically, equals a manual rebuild, and " +
    "clears tombstones + baseline per the build contract") {
    import spark.implicits._
    val path = Files.createTempDirectory("annix-mr-").toString
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    AnnIndex.build(corpus, path, nlist = 8, dim = 16)
    val d0 = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5)
    assert(!d0.rebuildRecommended &&
      !fs.exists(new org.apache.hadoop.fs.Path(path, "_GEN")),
      "within tolerance: no rotation")
    // shifted mass (the driftCheck fixture) + a tombstoned slice
    val shifted = (0L until 400L).map { i =>
      val v = (0 until 16).map { d =>
        val x = i * 48271L + d * 69621L
        2f + (((x ^ (x >>> 11)) % 100L).toFloat / 50f)
      }
      (20000L + i, v)
    }.toDF("vec_id", "embedding")
    AnnIndex.append(shifted, path, segId = 1L)
    AnnIndex.delete(corpus.filter(col("vec_id") % 10 === 7)
      .select(col("vec_id")), path, segId = 2L)
    val d1 = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5)
    assert(d1.rebuildRecommended, s"fixture must drift: $d1")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "_GEN")),
      "rotation must write the generation pointer")
    // the rebuilt artifact equals a MANUAL build on the live rows
    val live = corpus.filter(col("vec_id") % 10 =!= 7)
      .unionByName(shifted)
    val manual = Files.createTempDirectory("annix-mr2-").toString
    AnnIndex.build(live, manual, nlist = 8, dim = 16)
    val q = corpus.filter(col("vec_id") % 40 === 0)
    val viaRebuild = topk(AnnIndex.probe(spark, path, q, k = 5))
    val viaManual = topk(AnnIndex.probe(spark, manual, q, k = 5))
    assert(viaRebuild == viaManual,
      s"rebuild\n$viaRebuild\nvs manual\n$viaManual")
    // tombstoned ids are GONE (not merely suppressed) and the
    // baseline is fresh: an immediate second check sees no drift
    assert(!viaRebuild.exists(t => t._2 < 20000L && t._2 % 10 == 7))
    val d2 = AnnIndex.driftCheck(spark, path, sample = 16, k = 5)
    assert(d2.recall == d2.baseline && !d2.rebuildRecommended,
      s"post-rebuild baseline must be fresh: $d2")
    // lifecycle continues THROUGH the pointer: append + probe land in
    // the current generation
    AnnIndex.append(corpus.filter(col("vec_id") % 10 === 7)
      .limit(5).select((col("vec_id") + 90000L).as("vec_id"),
        col("embedding")), path,
      segId = 1L)
    assert(AnnIndex.probe(spark, path, q, k = 5).count() > 0)
  }

  test("rebuild COST GOVERNANCE: churn is reported in the drift " +
    "report, minChangedFraction blocks a low-churn rebuild, and the " +
    "entry sweep reclaims orphaned generations a crash stranded") {
    import spark.implicits._
    val path = Files.createTempDirectory("annix-gov-").toString
    val hp = new org.apache.hadoop.fs.Path(path)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    AnnIndex.build(corpus, path, nlist = 8, dim = 16)
    val d0 = AnnIndex.driftCheck(spark, path, sample = 16, k = 5)
    assert(d0.changedFraction == 0.0 && d0.rebuildCostRows == 400L,
      s"as-built churn accounting: $d0")
    // the driftCheck fixture's shifted mass: 400 appended rows on 400
    // built = changedFraction 1.0 — recommended AND churn-cleared
    val shifted = (0L until 400L).map { i =>
      val v = (0 until 16).map { d =>
        val x = i * 48271L + d * 69621L
        2f + (((x ^ (x >>> 11)) % 100L).toFloat / 50f)
      }
      (20000L + i, v)
    }.toDF("vec_id", "embedding")
    AnnIndex.append(shifted, path, segId = 1L)
    // a floor above the actual churn BLOCKS the rewrite: drift is
    // reported (the operator can still rebuild manually) but the
    // pointer does not move — recall drift alone must not be able to
    // trigger back-to-back full rewrites
    val blocked = AnnIndex.maybeRebuild(spark, path, sample = 16,
      k = 5, minChangedFraction = 2.0)
    assert(blocked.rebuildRecommended &&
      blocked.changedFraction == 1.0 &&
      !fs.exists(new org.apache.hadoop.fs.Path(path, "_GEN")),
      s"guarded: $blocked")
    // default floor (0.1) clears at churn 1.0: rotation proceeds and
    // the pointer is a well-formed rename target (no stranded tmp)
    val d1 = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5)
    assert(d1.rebuildRecommended && d1.changedFraction == 1.0)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .exists(_.getPath.getName.endsWith(".tmp")),
      "no stranded pointer tmp after the swap")
    assert(fs.exists(new org.apache.hadoop.fs.Path(path, "g1/_META")))
    // crash-debris simulation: strand a fake g0 (never a legitimate
    // generation — ordinals start at 1) and pre-rotation root files;
    // the NEXT call (no drift — fresh baseline) must sweep the
    // garbage generation even though it returns early, while the
    // root files are RETAINED at pointer g1 (they are the
    // reader-grace predecessor — see rotateInto)
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "g0/codes"))
    val strayMeta = new org.apache.hadoop.fs.Path(path, "_META")
    val out = fs.create(strayMeta, true)
    try out.write("stale".getBytes("UTF-8")) finally out.close()
    val d2 = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5)
    assert(!d2.rebuildRecommended, s"fresh baseline: $d2")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(path, "g0")),
      "orphaned generation must be swept")
    assert(fs.exists(strayMeta),
      "root files retained as reader grace while the pointer is at g1")
    assert(AnnIndex.probe(spark, path,
      corpus.filter(col("vec_id") % 40 === 0), k = 5).count() > 0)
    // a SECOND rotation slides the window: the root files become
    // two-behind and the sweep reclaims them
    AnnIndex.append(shifted.withColumn("vec_id", col("vec_id") + 10000L),
      path, segId = 2L)
    val dRot = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5,
      tolerance = -1.0, minChangedFraction = 0.0)
    assert(dRot.rebuildRecommended, s"forced second rotation: $dRot")
    assert(!fs.exists(strayMeta) &&
      fs.exists(new org.apache.hadoop.fs.Path(path, "g1/_META")) &&
      fs.exists(new org.apache.hadoop.fs.Path(path, "g2/_META")),
      "after the second rotation: root files swept, g1 grace, g2 live")
    // rebuilds are single-writer: a held (or crashed) lock fails the
    // next triggered rebuild LOUDLY instead of interleaving two
    // trainings into the same generation directory — on a FRESH
    // artifact driven through the proven drift fixture
    val p2 = Files.createTempDirectory("annix-lock-").toString
    AnnIndex.build(corpus, p2, nlist = 8, dim = 16)
    AnnIndex.driftCheck(spark, p2, sample = 16, k = 5) // baseline
    AnnIndex.append(shifted, p2, segId = 1L)
    val lock = new org.apache.hadoop.fs.Path(p2, "_REBUILD_LOCK")
    fs.createNewFile(lock)
    try {
      val ex = intercept[java.util.ConcurrentModificationException] {
        AnnIndex.maybeRebuild(spark, p2, sample = 16, k = 5)
      }
      assert(ex.getMessage.contains("_REBUILD_LOCK"))
    } finally fs.delete(lock, false)
    // lock cleared: the same call succeeds and rotates
    val d3 = AnnIndex.maybeRebuild(spark, p2, sample = 16, k = 5)
    assert(d3.rebuildRecommended &&
      fs.exists(new org.apache.hadoop.fs.Path(p2, "_GEN")))
  }

  test("segment-stage sweep consults the publisher's liveness " +
    "heartbeat: a >threshold-old stage with a beating owner survives; " +
    "a stale-marker owner's stage and marker are collected; " +
    "markerless strands keep the age-gate fallback") {
    import org.apache.hadoop.fs.Path
    val path = Files.createTempDirectory("annix-beat-").toString
    AnnIndex.build(corpus, path, nlist = 4, dim = 16)
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val codes = new Path(path, "codes")
    val old = System.currentTimeMillis() - 2L * 3600000L
    def stage(segId: Int, owner: String): Path = {
      val p = new Path(codes, s"_stage-seg-$segId-$owner")
      fs.mkdirs(p)
      // HDFS shape: dir mtime does not advance while a long parquet
      // segment write streams into it
      fs.setTimes(p, old, -1)
      p
    }
    val liveOwner = java.util.UUID.randomUUID().toString
    val liveStage = stage(5, liveOwner)
    fs.create(new Path(codes, s"_live-$liveOwner"), true).close()
    val deadOwner = java.util.UUID.randomUUID().toString
    val deadStage = stage(6, deadOwner)
    val deadMarker = new Path(codes, s"_live-$deadOwner")
    fs.create(deadMarker, true).close()
    fs.setTimes(deadMarker, old, -1)
    val legacyStage = stage(7, java.util.UUID.randomUUID().toString)
    // no-drift maybeRebuild: sweeps under the lock, never rotates
    val d = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5)
    assert(!d.rebuildRecommended, s"fixture must not drift: $d")
    assert(fs.exists(liveStage),
      "a 2h-old stage whose owner still beats must survive the sweep")
    assert(fs.exists(new Path(codes, s"_live-$liveOwner")),
      "the fresh marker must survive")
    assert(!fs.exists(deadStage),
      "a stale-marker owner's stage must be collected")
    assert(!fs.exists(deadMarker),
      "the stale marker itself must be collected")
    assert(!fs.exists(legacyStage),
      "markerless strands keep the age-gate fallback (2h > 1h)")
    // the index still serves through all of it
    assert(AnnIndex.probe(spark, path,
      corpus.filter(col("vec_id") % 40 === 0), k = 3).count() > 0)
  }

  test("markerStaleMs is the caller's paused-publisher grace knob: " +
    "a marker stale by the default bound keeps its stage when the " +
    "caller widens the bound, and is collected under the default") {
    import org.apache.hadoop.fs.Path
    val path = Files.createTempDirectory("annix-wide-").toString
    AnnIndex.build(corpus, path, nlist = 4, dim = 16)
    val fs = new Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val codes = new Path(path, "codes")
    // a publisher paused ~30 min: beats stopped, marker frozen —
    // dead by the 10-min default, alive by a widened 1h bound
    val halfHourAgo = System.currentTimeMillis() - 30L * 60000L
    val owner = java.util.UUID.randomUUID().toString
    val stage = new Path(codes, s"_stage-seg-9-$owner")
    fs.mkdirs(stage)
    fs.setTimes(stage, halfHourAgo, -1)
    val marker = new Path(codes, s"_live-$owner")
    fs.create(marker, true).close()
    fs.setTimes(marker, halfHourAgo, -1)
    val d = AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5,
      markerStaleMs = 3600000L)
    assert(!d.rebuildRecommended, s"fixture must not drift: $d")
    assert(fs.exists(stage) && fs.exists(marker),
      "a paused publisher inside the widened bound must keep its " +
        "stage and marker")
    AnnIndex.maybeRebuild(spark, path, sample = 16, k = 5)
    assert(!fs.exists(stage) && !fs.exists(marker),
      "under the default bound the same owner is dead")
  }
}
