package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("zValue matches the reference bit interleave") {
    import spark.implicits._
    def ref(x: Int, y: Int): Long = {
      var z = 0L
      for (b <- 0 until 16) {
        z |= ((x >> b) & 1).toLong << (2 * b)
        z |= ((y >> b) & 1).toLong << (2 * b + 1)
      }
      z
    }
    val pts = Seq((0, 0), (1, 0), (0, 1), (1, 1), (65535, 0), (0, 65535),
      (65535, 65535), (12345, 54321), (255, 256))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue(col("x"), col("y")).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == ref(x, y), s"($x,$y)")
    }
  }

  test("z-order partitioning prunes on BOTH dimensions; x-sort only on x") {
    import spark.implicits._
    // 64x64 uniform grid, 8 range partitions. A selective predicate on
    // y (y < 8) must skip most z-ordered partitions (each is a compact
    // tile bounded in both dims) but can never skip an x-sorted one
    // (each spans the full y extent). This partition-level bounding
    // box IS what parquet min/max file skipping sees at scale.
    val pts = for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)
    val df = pts.toDF("x", "y")
    def intersecting(d: org.apache.spark.sql.DataFrame): Long =
      d.groupBy(spark_partition_id())
        .agg(min(col("y")).as("ymin"), max(col("y")).as("ymax"))
        .filter(col("ymin") < 8)
        .count()
    val byZ = df.repartitionByRange(8,
      Layout.zValue(col("x"), col("y")))
    val byX = df.repartitionByRange(8, col("x"))
    assert(intersecting(byX) == 8, "x-sorted baseline should never prune y")
    assert(intersecting(byZ) <= 4,
      s"z-order should bound y per partition (got ${intersecting(byZ)}/8)")
  }

  test("zorderWrite round-trips the data and drops the helper column") {
    import spark.implicits._
    val pts = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    Layout.zorderWrite(pts, dir, "x", "y", partitions = 4)
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet == Set("x", "y"))
    assert(back.count() == 32 * 32)
    assert(back.select(sum(col("x") * 10000 + col("y"))).head.getLong(0) ==
      pts.select(sum(col("x") * 10000 + col("y"))).head.getLong(0))
  }

  test("bucketed join on matching buckets plans zero Exchange") {
    val t = graft.Engine.Tables(spark, "/root/testdata/sf0.001")
    Layout.writeBucketed(
      t.orders.select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 4)
    Layout.writeBucketed(
      t.lineitem.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "b_lineitem", "o_orderkey", 4)
    // force the non-broadcast path: the point of bucketing is the big
    // fact⋈fact case where broadcasting is impossible
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Layout.bucketedJoin(spark, "b_orders", "b_lineitem",
        "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      // and it is still correct
      val o = t.orders
      val l = t.lineitem
      val expected = o.join(l, o("o_orderkey") === l("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted join matches plain join results under heavy key skew") {
    import spark.implicits._
    // 10k rows all sharing one hot key + a tail
    val big = ((1 to 10000).map(i => (1L, s"row$i")) ++
      (1 to 100).map(i => (i.toLong + 1, s"tail$i"))).toDF("k", "payload")
    val dim = (1 to 200).map(i => (i.toLong, s"dim$i")).toDF("k", "attr")
    val plain = big.join(dim, "k")
    val salted = Layout.saltedJoin(big, dim, "k", salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.columns.toSet == plain.columns.toSet)
    // hot key actually split across salts (the impl's own salt expr)
    val saltSpread = big.withColumn("__salt",
      Layout.contentSalt(big, "k", 8))
      .filter($"k" === 1L).select("__salt").distinct().count()
    assert(saltSpread > 4, s"salt spread only $saltSpread")
  }

  test("salt is a pure function of row content (retry/partitioning-safe)") {
    import spark.implicits._
    // monotonically_increasing_id-style salts change with partition
    // layout — exactly what corrupts a shuffle under partial stage
    // retry. The content salt must assign every row the same salt no
    // matter how the input is partitioned.
    val df = (1 to 2000).map(i => (i.toLong % 7, s"p$i")).toDF("k", "payload")
    def salts(parts: Int): Seq[(Long, String, Int)] = {
      val d = df.repartition(parts)
      d.withColumn("s", Layout.contentSalt(d, "k", 8))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
        .toSeq.sorted
    }
    assert(salts(3) == salts(11))
  }

  test("AQE splits a skewed join partition (skew=true in final plan)") {
    import spark.implicits._
    // one hot key with fat payloads vs a uniform remainder — the case
    // Engine.session's default AQE skew-join must handle WITHOUT
    // manual salting. Thresholds are lowered to make the tiny local
    // fixture register as skewed; the knobs under test are the same
    // ones that act at 100 TB.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pay = "x" * 200
      val big = ((1 to 50000).map(_ => (1L, pay)) ++
        (1 to 5000).map(i => (i.toLong % 97 + 2, pay))).toDF("k", "p")
      val dim = (1L to 100L).map(i => (i, s"d$i")).toDF("k", "name")
      val joined = big.join(dim, "k")
      // execute THIS frame (count() would be a separate query
      // execution and leave this one's adaptive plan unfinalized)
      assert(joined.collect().length == 55000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"AQE did not split the skew:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("salted sum/count equals plain aggregation") {
    import spark.implicits._
    val df = ((1 to 5000).map(_ => ("hot", 1.0)) ++
      (1 to 50).map(i => (s"k$i", 2.0))).toDF("k", "v")
    val plain = df.groupBy("k").agg(
      sum("v").as("sum_v"), count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val salted = Layout.saltedSumCount(df, "k", "v", salts = 16)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(salted == plain)
  }

  test("partitioned layout: equality predicate becomes a PartitionFilter") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-part-").toString + "/t"
    val df = (1 to 300).map(i => (i.toLong, s"src${i % 3}", i * 1.5))
      .toDF("id", "source", "v")
    Layout.writePartitioned(df, dir, "source")
    val q = spark.read.parquet(dir).filter(col("source") === "src1")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("src1"),
      s"predicate did not prune partitions:\n$plan")
    // pruning is planning-time: only the matching directory's files scan
    def scannedFiles(d: org.apache.spark.sql.DataFrame): Long = {
      d.collect() // drive THIS queryExecution (count() builds another)
      d.queryExecution.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.get
    }
    val pruned = scannedFiles(q)
    val all = scannedFiles(spark.read.parquet(dir))
    assert(pruned < all, s"scanned $pruned of $all files — no pruning")
    assert(q.count() == 100)
  }

  test("dynamic partition pruning fires on a partitioned fact x " +
    "filtered dim join") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dpp-").toString + "/fact"
    val fact = (1 to 3000).map(i => (i.toLong, i % 20, i * 2.0))
      .toDF("id", "part_key", "v")
    Layout.writePartitioned(fact, dir, "part_key")
    // selective dim: only 2 of 20 partition values survive the filter.
    // The partition predicate is only knowable at RUNTIME (it comes
    // through the join), so static pruning can't help — DPP inserts a
    // dynamicpruning subquery on the scan, the lever that keeps a
    // 100 TB partitioned fact from full-scanning under star joins.
    // The dim must be source-backed: on a LocalRelation the filter
    // constant-folds away at planning and DPP sees no selective
    // predicate to justify the subquery.
    val dimDir = java.nio.file.Files
      .createTempDirectory("graft-dpp-dim-").toString + "/dim"
    (0 until 20).map(k => (k, if (k < 2) "keep" else "drop"))
      .toDF("part_key", "tag").write.parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    val joined = spark.read.parquet(dir)
      .join(dim.filter(col("tag") === "keep"), Seq("part_key"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no DPP subquery on the fact scan:\n$plan")
    assert(joined.count() == 300)
  }

  test("bloomSemiJoin matches the exact semi-join bit for bit") {
    import spark.implicits._
    val big = (0 until 20000).map(i => (s"k${i % 5000}", i)).toDF("key", "v")
    val keys = (0 until 5000 by 7).map(i => s"k$i").toDF("key")
    val got = Layout.bloomSemiJoin(big, "key", keys, "key")
      .as[(String, Int)].collect().sorted
    val want = big.join(keys, Seq("key"), "left_semi")
      .as[(String, Int)].collect().sorted
    assert(got.length == want.length && got.sameElements(want))
  }

  test("bloom prefilter: zero false negatives, bounded FPs, no shuffle") {
    import spark.implicits._
    val members = (0 until 1000).map(i => s"m$i")
    val ks = members.toDF("key").select(xxhash64(col("key")).as("__k"))
    val bf = ks.stat.bloomFilter("__k", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    // parquet-backed probe: over a LocalRelation the optimizer folds
    // the whole filter at planning time and there is no plan to assert
    val probeDir = java.nio.file.Files.createTempDirectory("bloom").toString
    (members ++ (0 until 20000).map(i => s"x$i")).toDF("key")
      .write.mode("overwrite").parquet(probeDir)
    val probe = spark.read.parquet(probeDir)
    val cands = Layout.bloomCandidates(probe, "key", bos.toByteArray)
    val kept = cands.as[String].collect().toSet
    assert(members.forall(kept.contains),
      "a Bloom filter must never drop a member")
    val fps = kept.size - members.size
    assert(fps < 20000 * 0.05, s"$fps false positives of 20000 probes")
    // the probe is a scan-level filter: the candidate stage plans with
    // no Exchange at all — that's the whole point at 100 TB
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("compact rewrites many small files into the computed target count") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("frag").toString
    val outDir = java.nio.file.Files.createTempDirectory("compacted").toString
    (0 until 20000).map(i => (i, s"doc $i payload"))
      .toDF("id", "text").repartition(64)
      .write.mode("overwrite").parquet(inDir)
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inBytes = fs.getContentSummary(p).getLength
    val target = inBytes / 4 + 1 // aim for ~4 output files
    val (before, after) = Layout.compact(spark, inDir, outDir, target)
    assert(before == 64)
    assert(after == (inBytes + target - 1) / target, s"got $after files")
    assert(after < 8)
    val back = spark.read.parquet(outDir)
    assert(back.count() == 20000)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 20000L * 19999 / 2)
  }

  test("compact with sortCols keeps files range-disjoint (skipping survives)") {
    import spark.implicits._
    val inDir = java.nio.file.Files.createTempDirectory("frag2").toString
    val outDir = java.nio.file.Files.createTempDirectory("compacted2").toString
    (0 until 20000).map(i => (i, s"doc $i")).toDF("id", "text")
      .repartition(32).write.mode("overwrite").parquet(inDir)
    val p = new org.apache.hadoop.fs.Path(inDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inBytes = fs.getContentSummary(p).getLength
    Layout.compact(spark, inDir, outDir, inBytes / 4 + 1, sortCols = Seq("id"))
    // per-FILE id ranges must not overlap: that is what parquet
    // min/max footer skipping sees after the rewrite
    val ranges = spark.read.parquet(outDir)
      .groupBy(input_file_name()).agg(min("id").as("lo"), max("id").as("hi"))
      .collect().map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 < lo2, ranges.mkString(","))
      case _ =>
    }
  }
}
