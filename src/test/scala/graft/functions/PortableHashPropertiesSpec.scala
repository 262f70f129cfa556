package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.TestSpark

/** Property suite for the portable-hash family (raw ScalaCheck,
  * fixed seeds — the offline pattern of the other property specs).
  * ExpressionSpec pins the bit-level contracts against reference
  * compositions; this sweeps the STATISTICAL properties the MinHash
  * pipeline's correctness rests on: the two digest halves behave as
  * independent uniform values, and the Kirsch–Mitzenmacher
  * permutations of a key are pairwise distinct unless h2 = 0 (the
  * documented 2^-60 caveat).
  */
class PortableHashPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private def u60(s: String): Long =
    org.apache.spark.sql.graft.Md5Util.uniform60(UTF8String.fromString(s))
  private def u60t(s: String): Long =
    org.apache.spark.sql.graft.Md5Util
      .uniform60Tail(UTF8String.fromString(s))

  test("head and tail halves never collide as a pair, and neither " +
    "half is degenerate, over 20k random keys") {
    val keys = (0 until 20000).map(i => s"key:$i:${i * 2654435761L}")
    val pairs = keys.map(k => (u60(k), u60t(k)))
    assert(pairs.distinct.length == keys.length, "pair collision")
    // both halves spread: no value owns more than a sliver
    val headTop = pairs.groupBy(_._1).values.map(_.size).max
    val tailTop = pairs.groupBy(_._2).values.map(_.size).max
    assert(headTop <= 2 && tailTop <= 2, s"($headTop, $tailTop)")
    // halves are not correlated copies of each other
    assert(pairs.count { case (a, b) => a == b } == 0)
  }

  // Precision note: distinctness of 128 permutations needs more than
  // h2 != 0 — perm_i = perm_j requires (i-j)*h2 ≡ 0 mod 2^60, i.e.
  // h2 divisible by 2^53 (probability ~2^-53 for a uniform h2; exact
  // for odd h2, which is invertible mod 2^60). The sweep uses random
  // h2 and so exercises the overwhelming case; h2 = 0 is the
  // documented degenerate.
  test("KM permutations of one key are pairwise distinct for random " +
    "h2 != 0 (and provably constant for h2 = 0)") {
    import spark.implicits._
    val gen = for {
      h1 <- Gen.chooseNum(0L, (1L << 60) - 1)
      h2 <- Gen.chooseNum(1L, (1L << 60) - 1)
    } yield (h1, h2)
    val cases = (0 until 300).map(i => sample(gen, 1000L + i))
    val perms = cases.toDF("h1", "h2")
      .select(col("h1"), col("h2"),
        transform(sequence(lit(0), lit(127)),
          i => PortableHash.permuteFrom(col("h1"), col("h2"), i))
          .as("ps"))
      .collect()
    perms.foreach { r =>
      val ps = r.getSeq[Long](2)
      assert(ps.distinct.length == 128,
        s"collision for (${r.getLong(0)}, ${r.getLong(1)})")
      // values stay in [0, 2^60)
      assert(ps.forall(p => p >= 0 && p < (1L << 60)))
    }
    // i < 2^30 and h2 odd => distinctness is exact (h2 odd is
    // invertible mod 2^60); h2 = 0 is the documented degenerate
    val z = Seq((42L, 0L)).toDF("h1", "h2")
      .select(transform(sequence(lit(0), lit(127)),
        i => PortableHash.permuteFrom(col("h1"), col("h2"), i)).as("ps"))
      .head().getSeq[Long](0)
    assert(z.distinct == Seq(42L))
  }

  test("per-permutation uniformity: each permutation's min over n " +
    "keys concentrates near 2^60/(n+1) (the MinHash estimator's " +
    "load-bearing property)") {
    val n = 5000
    val keys = (0 until n).map(i => s"doc:$i")
    val pairs = keys.map(k => (u60(k), u60t(k)))
    val mask30 = (1L << 30) - 1
    def km(h1: Long, h2: Long, i: Long): Long = {
      val hi = h2 >>> 30
      val lo = h2 & mask30
      (h1 + ((i * hi) & mask30) * (1L << 30) + i * lo) &
        ((1L << 60) - 1)
    }
    val expected = (1L << 60).toDouble / (n + 1)
    (0 until 16).foreach { i =>
      val m = pairs.map { case (a, b) => km(a, b, i.toLong) }.min
      // min of n uniforms: P(min > 8x expected) = (1-8/n)^n ~ e^-8
      assert(m.toDouble < expected * 8,
        s"perm $i min $m vs expected ~$expected")
    }
  }
}
