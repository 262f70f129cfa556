package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class KeyedLogSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("bk"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def keyDf(ks: Long*) = {
    import spark.implicits._
    ks.toDF("bk")
  }

  test("append + readForKeys: requested keys always present, result " +
    "is a key-filterable superset, missing log reads None") {
    import spark.implicits._
    val path = Files.createTempDirectory("klog-rw-").toString
    assert(KeyedLog.readForKeys(spark, path, keyDf(1L), "bk").isEmpty)
    KeyedLog.append(
      Seq((10L, 100L), (20L, 200L), (30L, 300L)).toDF("bk", "id"),
      path, segId = 0L)
    KeyedLog.append(
      Seq((10L, 101L), (40L, 400L)).toDF("bk", "id"),
      path, segId = 1L)
    val got = KeyedLog.readForKeys(spark, path, keyDf(10L, 40L), "bk").get
    val exact = rows(got.join(keyDf(10L, 40L), Seq("bk"), "left_semi"))
    assert(exact == Set((10L, 100L), (10L, 101L), (40L, 400L)))
    // replayed append overwrites its own segment — no duplicate rows
    KeyedLog.append(
      Seq((10L, 101L), (40L, 400L)).toDF("bk", "id"),
      path, segId = 1L)
    val again = KeyedLog.readForKeys(spark, path, keyDf(10L), "bk").get
      .filter(col("bk") === 10L).collect()
    assert(again.length == 2)
  }

  test("tiered compaction: fanout L0 segments fold into one bucketed " +
    "L1 segment, reads stay complete and PRUNED (a probe touches a " +
    "strict subset of buckets); folds cascade across levels") {
    import spark.implicits._
    val path = Files.createTempDirectory("klog-cp-").toString
    val all = (0L until 64L).map(k => (k, k * 10))
    all.grouped(8).zipWithIndex.foreach { case (g, i) =>
      KeyedLog.append(g.toDF("bk", "id"), path, segId = i.toLong)
    }
    // 8 L0 segs at fanout 8 -> one fold pass moves them all to L1;
    // force several buckets with a tiny target
    KeyedLog.compact(spark, path, "bk", fanout = 8,
      targetBucketBytes = 4096)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).toSeq
    assert(segs.size == 1 && segs.head.contains("-L1-nb"),
      s"expected one L1 segment, got $segs")
    val nb = segs.head.split("-nb")(1).toInt
    assert(nb > 1, "tiny target should force multiple buckets")
    // completeness after fold
    val got = KeyedLog.readForKeys(spark, path, keyDf(3L, 42L), "bk").get
    assert(rows(got.join(keyDf(3L, 42L), Seq("bk"), "left_semi")) ==
      Set((3L, 30L), (42L, 420L)))
    // pruning: a one-key probe reads fewer buckets than the segment
    // holds (it cannot union every kb dir)
    val bucketDirs = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$path/${segs.head}"))
      .count(_.getPath.getName.startsWith("__kb="))
    assert(bucketDirs == nb)
    // cascade: 8 more L0 folds -> L1 has 2 segs; with fanout 2 the
    // fold cascades L1 -> L2 in one compact() call
    (8L until 16L).foreach { i =>
      KeyedLog.append(Seq((1000L + i, i)).toDF("bk", "id"), path, i)
    }
    KeyedLog.compact(spark, path, "bk", fanout = 8,
      targetBucketBytes = 4096)
    KeyedLog.compact(spark, path, "bk", fanout = 2,
      targetBucketBytes = 1L << 20)
    val segs2 = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).toSeq
    assert(segs2.size == 1 && segs2.head.contains("-L2-"),
      s"expected one cascaded L2 segment, got $segs2")
    // CONTRACTION: nb is re-derived from the folded BYTES each fold,
    // never inherited — the L1 generations were forced wide (tiny
    // target), but this fold's roomy target must land back at the
    // single-bucket floor, so a store that shrinks (or was over-split
    // by an earlier cadence) recovers its small-table read cost
    assert(segs2.head.endsWith("-nb1"),
      s"roomy-target fold must right-size DOWN to nb1, got $segs2")
    val all2 = KeyedLog.readAll(spark, path).get
    assert(all2.count() == 72)
  }

  test("crash hygiene: stale _compact_tmp_ staged dirs are swept at " +
    "the next fold; sources + fold coexisting (crash between rename " +
    "and deletes) only duplicates rows, never loses them") {
    import spark.implicits._
    val path = Files.createTempDirectory("klog-cr-").toString
    (0L until 8L).foreach { i =>
      KeyedLog.append(Seq((i, i * 10)).toDF("bk", "id"), path, i)
    }
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    fs.mkdirs(new org.apache.hadoop.fs.Path(path, "_compact_tmp_junk"))
    KeyedLog.compact(spark, path, "bk", fanout = 8)
    assert(!fs.exists(
      new org.apache.hadoop.fs.Path(path, "_compact_tmp_junk")))
    // simulate crash-between: re-append a source segment next to the
    // fold (same rows) — reads see duplicates, key filter + distinct
    // (the caller contract) is unaffected, and re-folding converges
    KeyedLog.append(Seq((3L, 30L)).toDF("bk", "id"), path, 3L)
    val got = KeyedLog.readForKeys(spark, path, keyDf(3L), "bk").get
      .filter(col("bk") === 3L).distinct().collect()
    assert(got.length == 1)
    KeyedLog.compact(spark, path, "bk", fanout = 2)
    assert(KeyedLog.readAll(spark, path).get.distinct().count() == 8)
  }

  test("fold-after-SHRINK: a collapse that drops most rows " +
    "right-sizes the store back toward the small-store floor within " +
    "one extra fold (nb derives from real bytes, never inherited)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val path = Files.createTempDirectory("klog-sh-").toString
    // 8 segments x 1000 versioned rows for the SAME 10 ids: the live
    // set is 10 rows, the raw log 8000
    (0L until 8L).foreach { i =>
      KeyedLog.append(
        (0L until 1000L).map(k => (k % 10, k % 10, i))
          .toDF("bk", "id", "ver"),
        path, segId = i)
    }
    val collapse: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame = { df =>
      val w = Window.partitionBy(col("bk"), col("id"))
        .orderBy(col("ver").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    // first fold: nb derives from the PRE-collapse source bytes
    // (8000 rows) — wide; the collapsed content is 80 rows
    KeyedLog.compact(spark, path, "bk", fanout = 8,
      targetBucketBytes = 8192, collapse = collapse)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    def nbOf(): Int = {
      val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .map(_.getPath.getName).filter(_.startsWith("seg_"))
        .filterNot(_.endsWith("-L0")).toSeq
      assert(segs.size == 1, s"got $segs")
      segs.head.split("-nb")(1).toInt
    }
    val nb1 = nbOf()
    // force a second fold via a cascade (two tiny L0 segments fold
    // into L1, which then holds 2 >= fanout and folds on): nb
    // re-derives from the POST-collapse bytes and lands at the
    // small-store floor
    KeyedLog.append(Seq((900L, 900L, 9L)).toDF("bk", "id", "ver"),
      path, segId = 20L)
    KeyedLog.append(Seq((901L, 901L, 9L)).toDF("bk", "id", "ver"),
      path, segId = 21L)
    KeyedLog.compact(spark, path, "bk", fanout = 2,
      targetBucketBytes = 8192, collapse = collapse)
    val nb2 = nbOf()
    // the floor is bytes-derived: the collapsed content is ~80 rows
    // but the SOURCE bytes still carry the previous fold's per-file
    // parquet overhead, so one extra fold lands within a file or two
    // of the floor rather than exactly at nb1 == 1
    assert(nb2 < nb1 && nb2 <= 2,
      s"shrunk store must right-size down: nb $nb1 -> $nb2")
    // content: exactly the live rows, replay-stable
    val all = KeyedLog.readAll(spark, path).get.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(all.size == 12,
      s"collapse must keep exactly the newest rows: ${all.size}")
    assert(all.filter(_._1 < 10L).forall(_._3 == 7L))
  }

  test("appendBucketed (backfill path) writes a pruned L1 segment " +
    "directly; maybeCompact only folds when a level is owed") {
    import spark.implicits._
    val path = Files.createTempDirectory("klog-bf-").toString
    KeyedLog.appendBucketed(
      (0L until 1000L).map(k => (k, k)).toDF("bk", "id"),
      path, "bk", segId = 7L, approxRowBytes = 24,
      targetBucketBytes = 2048)
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).toSeq
    assert(segs.size == 1 && segs.head.startsWith("seg_7-L1-nb"))
    val got = KeyedLog.readForKeys(spark, path, keyDf(999L), "bk").get
    assert(rows(got.join(keyDf(999L), Seq("bk"), "left_semi")) ==
      Set((999L, 999L)))
    KeyedLog.maybeCompact(spark, path, "bk") // 1 seg: not owed, no-op
    val segs2 = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_")).toSeq
    assert(segs2 == segs)
  }

  test("readForHashes with driver-evaluated keyHashCol serves the " +
    "same rows as readForKeys — the micro-batch fast path's pruning " +
    "identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("klog-hash-").toString
    val rows = (1L to 500L).map(i => (i * 7919L, i))
    KeyedLog.append(rows.toDF("bk", "id"), path, 0L)
    KeyedLog.append(rows.take(100).toDF("bk", "id"), path, 1L)
    KeyedLog.compact(spark, path, "bk", fanout = 2,
      targetBucketBytes = 1L << 10) // force a multi-bucket fold
    val probe = Seq(7919L, 15838L, 791900L)
    val dist = KeyedLog.readForKeys(spark, path,
      probe.toDF("bk"), "bk").get
      .select(col("bk"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hashes: Set[Long] = probe.toDF("bk")
      .select(KeyedLog.keyHashCol(col("bk")).as("h"))
      .collect().map(_.getLong(0)).toSet
    val loc = KeyedLog.readForHashes(spark, path, hashes).get
      .select(col("bk"), col("id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loc == dist, s"local $loc vs distributed $dist")
    assert(dist.exists(_._1 == 7919L), "probe keys must resolve")
  }

  test("resizeKeyCol sizes the folded segment from POST-collapse " +
    "bytes: a churned versioned log reaches its floor bucket count " +
    "in ONE fold, not one fold late") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files
      .createTempDirectory("klog-resize-").toString
    // 8000 rows over 12 live ids (667 superseded versions each)
    (0 until 4).foreach { seg =>
      KeyedLog.append(
        (0 until 2000).map(i => (i % 12L, (seg * 2000 + i).toLong))
          .toDF("id", "ver"),
        path, seg.toLong, keyCol = "id")
    }
    val newestPerId: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame = { df =>
      val w = Window.partitionBy(col("id")).orderBy(col("ver").desc)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    KeyedLog.compact(spark, path, "id", fanout = 4,
      targetBucketBytes = 1L << 10, collapse = newestPerId,
      resizeKeyCol = Some("id"))
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      spark.sessionState.newHadoopConf())
    val segs = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.startsWith("seg_c")).toSeq
    assert(segs.size == 1, s"one folded segment expected, got $segs")
    // 12 surviving rows: source-bytes sizing would keep ~dozens of
    // 1 KB buckets; post-collapse sizing reaches the floor now
    val nb = segs.head.split("-nb").last.toInt
    assert(nb == 1, s"floor bucket count in ONE fold, got nb=$nb")
    val got = KeyedLog.readAll(spark, path).get
      .select(col("id"), col("ver")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (0 until 12).map(i =>
      (i.toLong, (6000 + 1988 + i).toLong)).toSet
    assert(got.size == 12 && got.map(_._1) == expect.map(_._1),
      s"12 newest rows expected, got $got")
  }
}
