package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class VecLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val bits = 2
  private val sigBits = 8
  private def D(over: ((Int, Long), Int)*) =
    VecLog.Depths(bits, sigBits, over.toMap)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("tbl"), col("sig"), col("id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("append + readForKeys roundtrip; L0 segments are read whole; " +
    "missing log reads None; empty probe result is an empty frame, " +
    "not None") {
    import spark.implicits._
    val path = Files.createTempDirectory("vlog-rw-").toString
    assert(VecLog.readForKeys(spark, path, Seq((0, 5L)), D()).isEmpty)
    VecLog.append(Seq((0, 0x35L, 100L), (1, 0x22L, 200L))
      .toDF("tbl", "sig", "id"), path, 0L, D())
    val got = VecLog.readForKeys(spark, path, Seq((0, 1L)), D()).get
    // L0 read whole: both rows visible regardless of probe
    assert(rows(got) == Set((0, 0x35L, 100L), (1, 0x22L, 200L)))
  }

  test("fold partitions by the depth-masked signature: probes read " +
    "one partition per (tbl, refined bucket); coarser and deeper " +
    "segment maps both stay complete") {
    import spark.implicits._
    val path = Files.createTempDirectory("vlog-cp-").toString
    // 8 single-row L0 segs in table 0: sigs spread over base bucket 1
    // (sig & 3 == 1) with distinct deeper bits
    val sigs = Seq(0x01L, 0x05L, 0x09L, 0x0dL, 0x11L, 0x15L, 0x19L, 0x1dL)
    sigs.zipWithIndex.foreach { case (s, i) =>
      VecLog.append(Seq((0, s, 100L + i)).toDF("tbl", "sig", "id"),
        path, i.toLong, D())
    }
    // fold at depth 4 for (t=0, base=1): partitions split sig&15
    val dFold = D((0, 1L) -> 4)
    VecLog.compact(spark, path, dFold, fanout = 8)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).toSeq
    assert(segs.size == 1 && segs.head.endsWith("-L1"), s"got $segs")
    val parts = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/${segs.head}"))
      .map(_.getPath.getName).filter(_.startsWith("__kb=")).sorted.toSeq
    // sig&15 over the 8 sigs: {1, 5, 9, 13} each twice -> 4 partitions
    assert(parts.size == 4, s"expected 4 depth-4 partitions, got $parts")
    // probe at the SAME map: sig 0x21 masks to 1 -> exactly the rows
    // with sig&15 == 1 (0x01, 0x11)
    val same = VecLog.readForKeys(spark, path, Seq((0, 0x21L)), dFold).get
    assert(rows(same) == Set((0, 0x01L, 100L), (0, 0x11L, 104L)))
    // probe DEEPER than the segment (current map depth 6): the one
    // depth-4 partition still supersets the depth-6 bucket
    val deeper = VecLog.readForKeys(spark, path, Seq((0, 0x01L)),
      D((0, 1L) -> 6)).get
    assert(rows(deeper) == Set((0, 0x01L, 100L), (0, 0x11L, 104L)))
    // probe SHALLOWER than the segment (current map: base depth —
    // occupancy shrank): enumeration over the segment's deeper
    // partitions recovers the FULL base bucket
    val shallower = VecLog.readForKeys(spark, path, Seq((0, 0x01L)),
      D()).get
    assert(rows(shallower).map(_._3) == (100L to 107L).toSet,
      "base-depth probe must enumerate all deeper partitions")
  }

  test("fold-after-SHRINK: re-folding at a SHALLOWER current map " +
    "(occupancy dropped) restores the small-store partition floor " +
    "and a base-depth probe reads its one partition again") {
    import spark.implicits._
    val path = Files.createTempDirectory("vlog-sh-").toString
    val sigs = Seq(0x01L, 0x05L, 0x09L, 0x0dL, 0x11L, 0x15L, 0x19L, 0x1dL)
    sigs.zipWithIndex.foreach { case (s, i) =>
      VecLog.append(Seq((0, s, 100L + i)).toDF("tbl", "sig", "id"),
        path, i.toLong, D())
    }
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    def parts(): Int = {
      val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .map(_.getPath.getName).filter(_.startsWith("seg_"))
        .filterNot(_.endsWith("-L0")).toSeq
      assert(segs.size == 1, s"got $segs")
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$path/${segs.head}"))
        .count(_.getPath.getName.startsWith("__kb="))
    }
    // grown store folds DEEP (overfull bucket refined to depth 4)
    VecLog.compact(spark, path, D((0, 1L) -> 4), fanout = 8)
    assert(parts() == 4)
    // occupancy shrinks (the map is no longer overfull): the next
    // fold re-partitions at the CURRENT shallow map — the partition
    // count recovers the base floor, and a base-depth probe reads
    // ONE partition instead of enumerating four. Force the fold via
    // a cascade (fanout-1 loops by construction, guarded).
    VecLog.append(Seq((0, 0x21L, 108L)).toDF("tbl", "sig", "id"),
      path, 20L, D())
    VecLog.append(Seq((0, 0x31L, 109L)).toDF("tbl", "sig", "id"),
      path, 21L, D())
    VecLog.compact(spark, path, D(), fanout = 2)
    assert(parts() == 1,
      "fold at the shallow map must right-size partitions down")
    val got = VecLog.readForKeys(spark, path, Seq((0, 0x01L)), D()).get
    assert(rows(got).map(_._3) == (100L to 109L).toSet,
      "content must stay complete across the shrink fold")
  }

  test("TOMBSTONE purge discipline: a full fold (sources = every " +
    "segment) drops winning tombstones; a partial fold keeps them " +
    "(an older live row may sit in an unfolded segment)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val path = Files.createTempDirectory("vlog-tb-").toString
    val collapse: (org.apache.spark.sql.DataFrame, Boolean) =>
        org.apache.spark.sql.DataFrame = { (df, full) =>
      val w = Window.partitionBy(col("tbl"), col("id"), col("sig"))
        .orderBy(col("ver").desc, col("del").asc)
      val top = df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
      if (full) top.filter(!col("del")) else top
    }
    def seg(id: Long, ver: Long, del: Boolean, segId: Long): Unit =
      VecLog.append(Seq((0, 0x01L, id, ver, del))
        .toDF("tbl", "sig", "id", "ver", "del"), path, segId, D())
    // live row at L1 (folded early), tombstone arrives later at L0
    seg(100L, 0L, del = false, 0L)
    seg(101L, 0L, del = false, 1L)
    VecLog.compact(spark, path, D(), fanout = 2, collapse)
    seg(100L, 1L, del = true, 2L)
    seg(102L, 1L, del = false, 3L)
    seg(103L, 1L, del = false, 4L)
    // PARTIAL fold: the three L0 segments fold (fanout 3) but the L1
    // segment holding the tombstone's TARGET stays out (L1 then has
    // 2 < 3) — the winning tombstone must survive the fold
    VecLog.compact(spark, path, D(), fanout = 3, collapse)
    def all() = VecLog.readForKeys(spark, path, Seq((0, 0x01L)), D())
      .get.collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getBoolean(4))).toSet
    assert(all().contains((100L, 1L, true)),
      s"partial fold must keep the winning tombstone: ${all()}")
    // FULL fold (both L1 segments fold together = every segment):
    // the tombstone wins its group and purges WITH its target
    VecLog.compact(spark, path, D(), fanout = 2, collapse)
    assert(all() == Set((101L, 0L, false), (102L, 1L, false),
      (103L, 1L, false)),
      s"full fold must purge the tombstone and its target: ${all()}")
  }

  test("depth maps serialize with the segment atomically; replayed " +
    "append overwrites; maybeCompact folds only when owed") {
    import spark.implicits._
    val path = Files.createTempDirectory("vlog-mt-").toString
    VecLog.appendBucketed(
      Seq((0, 0x07L, 1L), (1, 0x0bL, 2L)).toDF("tbl", "sig", "id"),
      path, 9L, D((1, 3L) -> 5))
    val got = VecLog.readForKeys(spark, path, Seq((1, 0x2bL)),
      D((1, 3L) -> 5)).get
    assert(rows(got) == Set((1, 0x0bL, 2L)),
      "masked probe through a recorded per-bucket depth")
    VecLog.append(Seq((0, 0x03L, 3L)).toDF("tbl", "sig", "id"), path,
      10L, D())
    VecLog.append(Seq((0, 0x03L, 3L)).toDF("tbl", "sig", "id"), path,
      10L, D())
    VecLog.maybeCompact(spark, path, D(), fanout = 8) // not owed
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).sorted.toSeq
    assert(segs == Seq("seg_10-L0", "seg_9-L1"), s"got $segs")
  }

  test("kbsLocal equals probeKbs expression for expression over " +
    "random probes and maps (coarser, equal, deeper segments) — the " +
    "driver fast path's completeness rides on this identity") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    (0 until 20).foreach { trial =>
      val tables = 3
      def randOver(): Map[(Int, Long), Int] =
        (0 until tables).flatMap { t =>
          (0L until (1L << bits)).flatMap { b =>
            if (rnd.nextBoolean()) None
            else Some((t, b) -> (bits + 1 + rnd.nextInt(sigBits - bits)))
          }
        }.toMap
      val dSeg = VecLog.Depths(bits, sigBits, randOver())
      val dCur = VecLog.Depths(bits, sigBits, randOver())
      val probes: Set[(Int, Long)] = (0 until 30).map(_ =>
        (rnd.nextInt(tables), rnd.nextLong() & ((1L << sigBits) - 1)))
        .toSet
      val viaSpark = VecLog.probeKbs(
        probes.toSeq.toDF("tbl", "sig"), dSeg, dCur)
      val viaScala = VecLog.kbsLocal(probes, dSeg, dCur)
      assert(viaScala == viaSpark,
        s"trial $trial: local ${viaScala -- viaSpark} vs " +
          s"spark ${viaSpark -- viaScala}\nseg=$dSeg\ncur=$dCur")
    }
  }

  test("readForKeysLocal serves the same rows as readForKeys for the " +
    "same probes, with and without an explicit schema") {
    import spark.implicits._
    val path = Files.createTempDirectory("vlog-loc-").toString
    val sigs = Seq(0x01L, 0x05L, 0x09L, 0x0dL, 0x11L, 0x15L, 0x19L, 0x1dL)
    sigs.zipWithIndex.foreach { case (s, i) =>
      VecLog.append(Seq((0, s, 100L + i)).toDF("tbl", "sig", "id"),
        path, i.toLong, D())
    }
    VecLog.compact(spark, path, D((0, 1L) -> 4), fanout = 4)
    val probes: Set[(Int, Long)] = Set((0, 0x21L), (0, 0x05L))
    val dist = rows(VecLog.readForKeys(spark, path,
      probes.toSeq.toDF("tbl", "sig"), D((0, 1L) -> 4)).get)
    val loc = rows(VecLog.readForKeysLocal(spark, path, probes,
      D((0, 1L) -> 4)).get)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("tbl",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("sig",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val locSch = rows(VecLog.readForKeysLocal(spark, path, probes,
      D((0, 1L) -> 4), Some(schema)).get)
    assert(loc == dist && locSch == dist,
      s"local $loc / schema $locSch vs distributed $dist")
  }

  test("appendBucketed publishes ATOMICALLY: a crashed attempt's " +
    "staging dir is invisible to readers (backfill re-runs and " +
    "converges), the published segment carries _DEPTHS, and a " +
    "replay over a completed segment converges to one segment") {
    import spark.implicits._
    val path = Files.createTempDirectory("vlog-at-").toString
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    // simulate a crash mid-publish: only the staging dir exists (the
    // pre-fix failure mode was the FINAL name existing without
    // _DEPTHS, which wedged every later probe on a FileNotFound)
    fs.mkdirs(new org.apache.hadoop.fs.Path(
      s"$path/_compact_tmp_seg_7-L1"))
    assert(VecLog.readForKeys(spark, path, Seq((0, 1L)), D()).isEmpty,
      "a staging dir must read as 'no sidecar' so the backfill re-runs")
    // the re-run backfill (same deterministic segId) converges
    VecLog.appendBucketed(
      Seq((0, 0x05L, 1L), (1, 0x09L, 2L)).toDF("tbl", "sig", "id"),
      path, 7L, D())
    def segDirs() = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).sorted.toSeq
    assert(segDirs() == Seq("seg_7-L1"), s"got ${segDirs()}")
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$path/seg_7-L1/_DEPTHS")),
      "_DEPTHS must publish WITH the data (atomic rename)")
    // replay over the completed segment (crash after publish, before
    // the caller's counter write): still one readable segment
    VecLog.appendBucketed(
      Seq((0, 0x05L, 1L), (1, 0x09L, 2L)).toDF("tbl", "sig", "id"),
      path, 7L, D())
    assert(segDirs() == Seq("seg_7-L1"), s"replay diverged: ${segDirs()}")
    val got = rows(VecLog.readForKeys(spark, path, Seq((0, 0x05L)),
      D()).get)
    assert(got.contains((0, 0x05L, 1L)), s"got $got")
  }

  test("OccStats.write is atomic + idempotent: read-back equals the " +
    "map, an overwrite at the same version serves the new map, no " +
    ".tmp survives, and retention sweeps old versions and stranded " +
    "tmps without tripping on their names") {
    val dir = Files.createTempDirectory("vlog-occ-").toString
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    // a stranded tmp from a crashed atomic write must neither break
    // the retention parse nor survive the next write's hygiene pass
    val stranded = new org.apache.hadoop.fs.Path(dir,
      "_occ_v1.12345-6.tmp")
    val o = fs.create(stranded, true)
    o.write("torn".getBytes("UTF-8")); o.close()
    val m1 = Map((0, 1L) -> 5L, (2, 3L) -> 7L)
    OccStats.write(spark, dir, 1L, m1)
    assert(OccStats.read(spark, dir, 1L).contains(m1))
    // replay overwrite at the same version (migration path re-run)
    val m2 = Map((0, 1L) -> 6L)
    OccStats.write(spark, dir, 1L, m2)
    assert(OccStats.read(spark, dir, 1L).contains(m2))
    OccStats.write(spark, dir, 3L, m1)
    OccStats.write(spark, dir, 5L, m1) // retention: versions < 3 swept
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).filter(_.startsWith("_occ_v")).sorted.toSeq
    assert(names == Seq("_occ_v3", "_occ_v5"), s"got $names")
  }
}
