package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("hashSample hits the target fraction within tolerance") {
    val n = 20000
    val got = Sampling.hashSample(ids(n), "id", 0.1).count()
    assert(math.abs(got.toDouble / n - 0.1) < 0.02, s"got $got of $n")
  }

  test("membership is invariant to partitioning (unlike df.sample)") {
    val df = ids(5000)
    val a = Sampling.hashSample(df.repartition(3), "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df.repartition(17), "id", 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("appending rows never flips existing membership") {
    val before = Sampling.hashSample(ids(1000), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    val after = Sampling.hashSample(ids(2000), "id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(before.subsetOf(after))
  }

  test("disjoint bands partition the keyspace with no leak") {
    val df = ids(3000)
    val train = Sampling.sampleBand(df, "id", 0.0, 0.8)
      .collect().map(_.getLong(0)).toSet
    val eval = Sampling.sampleBand(df, "id", 0.8, 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(train.intersect(eval).isEmpty)
    assert(train.size + eval.size == 3000)
  }

  test("stratified rates apply per stratum; missing strata drop") {
    val df = (1 to 6000).map(i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "zh" else "xx"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedHashSample(df, "id", "lang",
      Map("en" -> 0.5, "zh" -> 1.0))
      .groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("zh") == 2000L)
    assert(math.abs(got("en") - 1000L) < 100, s"en=${got("en")}")
    assert(!got.contains("xx"))
  }

  test("weighted sampling: rate proportional to weight, exact at 0 and 1") {
    import org.apache.spark.sql.functions.{col, lit}
    val df = (1 to 6000).map(i =>
      (i.toLong, (i % 3) * 0.5)).toDF("id", "w") // weights 0.0/0.5/1.0
    val got = Sampling.weightedHashSample(df, "id", col("w"), rate = 1.0)
      .groupBy("w").count()
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(!got.contains(0.0), "weight 0 must drop every row")
    assert(got(1.0) == 2000L, "weight 1 x rate 1 must keep every row")
    assert(math.abs(got(0.5) - 1000L) < 100, s"w=0.5 kept ${got(0.5)}")
    // subset-monotone in rate: halving the rate only removes rows
    val half = Sampling.weightedHashSample(df, "id", col("w"), rate = 0.5)
      .collect().map(_.getLong(0)).toSet
    val full = Sampling.weightedHashSample(df, "id", col("w"), rate = 1.0)
      .collect().map(_.getLong(0)).toSet
    assert(half.subsetOf(full))
  }

  test("capDomainShare: over-cap domain downsampled to cap, rest whole") {
    // 8000 rows: domain A has 6000 (75%), B 1500, C 500
    val df = (1 to 8000).map { i =>
      (i.toLong, if (i <= 6000) "A" else if (i <= 7500) "B" else "C")
    }.toDF("id", "domain")
    val kept = Sampling.capDomainShare(df, "id", "domain", cap = 0.25)
      .groupBy("domain").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rate_A = 0.25 * 8000 / 6000 = 1/3 -> ~2000 of 6000 kept
    assert(math.abs(kept("A") - 2000L) < 150, s"A kept ${kept("A")}")
    // B (18.75%) and C (6.25%) are under the cap: kept whole
    assert(kept("B") == 1500L && kept("C") == 500L, s"got $kept")
    // nested under a tighter cap: only removals, never swaps
    val tight = Sampling.capDomainShare(df, "id", "domain", cap = 0.10)
      .select("id").collect().map(_.getLong(0)).toSet
    val loose = Sampling.capDomainShare(df, "id", "domain", cap = 0.25)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(tight.subsetOf(loose))
  }

  test("clusterBalancedSample: dense cells capped, sparse kept whole, " +
    "membership deterministic under repartitioning") {
    import org.apache.spark.sql.functions._
    // Two well-separated planted clusters: 200 vectors near e1 (the
    // dense region) and 7 near e2 — plus centroids trained as the
    // planted centers themselves, so assignment is unambiguous.
    val rnd = new scala.util.Random(3)
    def jitter(base: Array[Double]) =
      base.map(_ + (rnd.nextDouble() - 0.5) * 0.01)
    val e1 = Array(1.0, 0.0, 0.0, 0.0)
    val e2 = Array(0.0, 1.0, 0.0, 0.0)
    val rows = (1 to 200).map(i => (i.toLong, jitter(e1).toSeq)) ++
      (201 to 207).map(i => (i.toLong, jitter(e2).toSeq))
    val df = rows.toDF("vec_id", "embedding")
    val cents = Seq(0 -> e1.toSeq, 1 -> e2.toSeq)
    val kept = Sampling.clusterBalancedSample(
      df, "embedding", "vec_id", cents, perCluster = 10)
    val byCell = kept.groupBy("cell").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byCell(0) == 10L, s"dense cell not capped: $byCell")
    assert(byCell(1) == 7L, s"sparse cell not kept whole: $byCell")
    assert(kept.filter(col("rk") > 10).count() == 0)
    val a = kept.select("id").collect().map(_.getLong(0)).toSet
    val b = Sampling.clusterBalancedSample(
      df.repartition(13), "embedding", "vec_id", cents, perCluster = 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == b, "kept set must not depend on partitioning")
  }
}
