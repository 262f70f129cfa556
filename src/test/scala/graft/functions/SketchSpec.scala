package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the Count-Min sketch surface: the native cms_estimate probe
  * and the t09 heavy-hitters query's contract vs exact counts.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cms_estimate never undercounts; exact on a wide-enough sketch") {
    import org.apache.spark.sql.graft.expressions.cms_estimate
    import spark.implicits._
    // item i appears i+1 times, i in [0, 100)
    val rows = (0 until 100).flatMap(i => Seq.fill(i + 1)(i.toLong))
    val df = rows.toDF("v")
    val cms = df.stat.countMinSketch("v", eps = 0.0001, confidence = 0.999,
      seed = 7)
    val bos = new java.io.ByteArrayOutputStream()
    cms.writeTo(bos)
    val est = df.distinct()
      .select(col("v"), cms_estimate(col("v"), bos.toByteArray).as("e"))
      .as[(Long, Long)].collect().toMap
    (0 until 100).foreach { i =>
      assert(est(i.toLong) >= i + 1, s"undercount at $i")
      // eps 1e-4 over 5050 adds < 1: estimates are exact here
      assert(est(i.toLong) == i + 1, s"overcount at $i on a wide sketch")
    }
  }

  test("t09 heavy hitters: superset of exact, est >= exact, bounded size") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val got = graft.SparkEntry.queries("t09_heavy_hitters")(spark, dir)
      .as[(String, Long)].collect().toMap
    val toks = graft.Engine.Tables(spark, dir).documents
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))
    val total = toks.count()
    val exact = toks.groupBy("token").count()
      .as[(String, Long)].collect().toMap
    val support = math.max(1L, total / 200)
    val trueHeavy = exact.filter(_._2 >= support)
    assert(trueHeavy.nonEmpty)
    trueHeavy.keys.foreach { t =>
      assert(got.contains(t), s"CMS dropped true heavy hitter '$t'")
    }
    got.foreach { case (t, est) =>
      assert(est >= exact.getOrElse(t, 0L), s"undercount for '$t'")
    }
    // overcount can pull near-threshold tokens in, but not the tail
    assert(got.size <= 2 * trueHeavy.size + 10,
      s"${got.size} results for ${trueHeavy.size} true heavy hitters")
  }

  test("q46 approximate quantiles stay within the GK rank-error bound") {
    val dir = "/root/testdata/sf0.001"
    val row = graft.SparkEntry.queries("q46_approx_quantiles")(spark, dir)
      .head()
    val approx = Seq(row.getDouble(0), row.getDouble(1), row.getDouble(2))
    val n = row.getLong(3)
    val sorted = graft.Engine.Tables(spark, dir).lineitem
      .select(col("l_extendedprice")).orderBy(col("l_extendedprice"))
      .collect().map(_.getDouble(0))
    assert(sorted.length == n)
    // accuracy 10000 => rank error <= n/10000; allow one extra rank
    // for the floor/ceil convention at the target rank itself
    val tol = n / 10000 + 2
    Seq(0.5, 0.9, 0.99).zipWithIndex.foreach { case (p, i) =>
      val target = (p * n).toLong
      val lo = sorted(math.max(0L, target - tol).toInt)
      val hi = sorted(math.min(n - 1, target + tol).toInt)
      assert(approx(i) >= lo && approx(i) <= hi,
        s"p=$p approx=${approx(i)} outside rank window [$lo, $hi]")
    }
  }

  test("q49 hash-checked HLL: raw estimator within the m=256 error " +
    "envelope of the exact distinct count") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val est = graft.SparkEntry.queries("q49_hll_sketch")(spark, dir)
      .select(col("l_returnflag"), col("est_raw"))
      .as[(String, Double)].collect().toMap
    val exact = graft.Engine.Tables(spark, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(est.keySet == exact.keySet)
    exact.foreach { case (flag, n) =>
      // HLL standard error at m=256 is 1.04/sqrt(256) ~ 6.5%; the RAW
      // LogLog estimator (no small-range correction — ln is excluded
      // by the oracle-exactness rules) carries extra bias, so pin a
      // conservative 3-sigma-ish envelope. Cardinalities here are
      // ~10^4 per flag — far from the small-range regime where the
      // missing correction would matter.
      assert(n > 2000, s"fixture drift: flag $flag only $n distinct")
      val rel = math.abs(est(flag) - n) / n.toDouble
      assert(rel < 0.20,
        s"flag $flag: est ${est(flag)} vs exact $n (rel err $rel)")
    }
  }

  test("q50 KMV: merge row is lossless vs a from-data bottom-k, and " +
    "estimates sit in the k=64 error envelope") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val out = graft.SparkEntry.queries("q50_kmv_sketch")(spark, dir)
      .select(col("grp"), col("k_used"), col("kth_min"),
        col("xor_check"), col("est_raw"))
      .as[(String, Int, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // The 'ALL' row was merged from per-group sketches; recompute the
    // global bottom-64 straight from the data — kth_min and the
    // membership xor must agree bit-for-bit (KMV's union property).
    val li = graft.Engine.Tables(spark, dir).lineitem
    val hv = conv(substring(
      md5(col("l_partkey").cast("string")), 1, 15), 16, 10).cast("long")
    val global = li.select(hv.as("hv")).distinct()
      .orderBy(col("hv")).limit(64)
      .as[Long].collect()
    val (kUsed, kth, xor, est) = out("ALL")
    assert(kUsed == 64 && kth == global.max &&
      xor == global.reduce(_ ^ _),
      "merged ALL sketch differs from the from-data bottom-64")
    // KMV std err ~ 1/sqrt(k-2) = 12.7% at k=64; pin ~3 sigma.
    val exactAll = li.select(col("l_partkey")).distinct().count()
    assert(math.abs(est - exactAll) / exactAll.toDouble < 0.38,
      s"ALL est $est vs exact $exactAll")
    out.filterNot(_._1 == "ALL").foreach { case (g, (_, _, _, e)) =>
      val exact = li.filter(col("l_returnflag") === g)
        .select(col("l_partkey")).distinct().count()
      assert(math.abs(e - exact) / exact.toDouble < 0.38,
        s"grp $g est $e vs exact $exact")
    }
  }

  test("m10 caption alignment matches the closed-form frame grid") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val out = graft.SparkEntry.queries("m10_caption_align")(spark, dir)
      .select(col("doc_id"), col("cap_idx"), col("cap_ts_us"),
        col("frame_idx"))
      .as[(Long, Int, Long, Int)].collect()
    assert(out.nonEmpty)
    val nf = graft.Engine.Tables(spark, dir).documents
      .select(col("doc_id"), (octet_length(col("text")) / 32).cast("int"))
      .as[(Long, Int)].collect().toMap
    out.foreach { case (doc, k, ts, f) =>
      assert(ts == k * 97000L + 13L)
      // regular 40 ms grid -> the as-of answer has a closed form:
      // floor(ts / 40000) clamped to the last existing frame
      val expect = math.min(ts / 40000L, nf(doc) - 1L)
      assert(f.toLong == expect,
        s"doc $doc cap $k: frame $f, expected $expect (nf=${nf(doc)})")
    }
    // and docs with zero frames contribute no pairs
    assert(out.forall { case (doc, _, _, _) => nf(doc) >= 1 })
  }
}
