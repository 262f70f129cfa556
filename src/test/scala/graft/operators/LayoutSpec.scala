package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

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
}
