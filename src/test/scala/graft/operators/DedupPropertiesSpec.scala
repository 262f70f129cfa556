package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property suite for the graph/layout kernels, raw ScalaCheck with
  * fixed seeds (same offline pattern as PipelinePropertiesSpec):
  *
  *  - connected-component labels from the union-find fast path and
  *    the pointer-doubling loop agree on ARBITRARY random graphs (the
  *    unit tests pin hand-built shapes; this sweeps merge orders and
  *    topologies the hand cases miss);
  *  - the Morton zValue is injective over its 16-bit x 16-bit domain
  *    (distinct points never collide — required for range-partition
  *    boundaries to be well defined).
  */
class DedupPropertiesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("union-find and pointer-doubling agree on random graphs") {
    val genGraph: Gen[(Int, List[(Long, Long)])] = for {
      n <- Gen.choose(5, 40)
      nEdges <- Gen.choose(0, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(1L, n.toLong)
        // b drawn from [1, n-1] then shifted past a: distinct without
        // a filter (filtered Gens can exhaust retries -> None)
        b0 <- Gen.choose(1L, (n - 1).toLong)
      } yield (a, if (b0 >= a) b0 + 1 else b0))
    } yield (n, edges)
    (0 until 8).foreach { i =>
      val (n, edges) = sample(genGraph, 1000L + i)
      val ids = (1L to n.toLong).toDF("id")
      val pairs =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      def asMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fast = asMap(Dedup.clusterReps(ids, pairs))
      val loop = asMap(Dedup.clusterReps(ids, pairs, smallGraphPairs = 0L))
      withClue(s"seed=${1000 + i} n=$n edges=$edges") {
        assert(fast == loop)
        // labels are component minima: every rep is <= its member and
        // is its own rep (idempotent labeling)
        fast.foreach { case (id, rep) =>
          assert(rep <= id)
          assert(fast(rep) == rep)
        }
      }
    }
  }

  test("zValue is injective over random 16-bit point sets") {
    import org.apache.spark.sql.functions.col
    val genPts: Gen[List[(Int, Int)]] =
      Gen.listOfN(500, for {
        x <- Gen.choose(0, 65535)
        y <- Gen.choose(0, 65535)
      } yield (x, y))
    (0 until 4).foreach { i =>
      val pts = sample(genPts, 2000L + i).distinct
      val zs = pts.toDF("x", "y")
        .select(Layout.zValue(col("x"), col("y")).as("z"))
        .collect().map(_.getLong(0))
      withClue(s"seed=${2000 + i}") {
        assert(zs.length == pts.length)
        assert(zs.distinct.length == pts.length, "z collision")
        // range check: 32 interleaved bits
        assert(zs.forall(z => z >= 0L && z < (1L << 32)))
      }
    }
  }
}
