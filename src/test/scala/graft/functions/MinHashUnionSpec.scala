package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

class MinHashUnionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("union signature == signature of concatenated docs (monoid law)") {
    val docs = Seq(
      (1L, "g", "the quick brown fox jumps over the lazy dog"),
      (2L, "g", "a completely different second document with more words here"),
      (3L, "solo", "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "grp", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 32, 2)
      .join(docs.select(col("doc_id").as("id"), col("grp")), Seq("id"))
    val grouped = sigs.groupBy(col("grp"))
      .agg(MinHashUnion(col("sig"), 32).as("gsig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

    // group of one == its own signature
    val solo = sigs.filter(col("id") === 3).select("sig")
      .head().getSeq[Long](0)
    assert(grouped("solo") == solo)

    // group signature == signature over the union of shingles:
    // every element is the min of the members'
    val members = sigs.filter(col("grp") === "g").select("sig")
      .collect().map(_.getSeq[Long](0))
    val expected = members.map(_.toVector).toVector.transpose.map(_.min)
    assert(grouped("g") == expected)
  }

  test("source-level overlap estimate: identical 1.0, disjoint ~0") {
    val base = "the quick brown fox jumps over the lazy dog by the river"
    val other = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho"
    val docs = Seq(
      (1L, "a", base), (2L, "a", other),
      (3L, "b", base), (4L, "b", other),   // b == a exactly
      (5L, "c", "wholly unrelated corpus about columnar engines and code"))
      .toDF("doc_id", "src", "text")
    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id", 64, 2)
      .join(docs.select(col("doc_id").as("id"), col("src")), Seq("id"))
      .groupBy("src").agg(MinHashUnion(col("sig"), 64).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    def est(x: Seq[Long], y: Seq[Long]) =
      x.zip(y).count { case (p, q) => p == q }.toDouble / x.length
    assert(est(sigs("a"), sigs("b")) == 1.0)
    assert(est(sigs("a"), sigs("c")) < 0.2)
  }

  test("map-side combine: result invariant to partitioning") {
    val docs = (1L to 40L).map(i => (i, "g", s"doc number $i with shared words alpha beta gamma"))
      .toDF("doc_id", "grp", "text")
    def unioned(parts: Int) =
      Dedup.minhashSignatures(docs.repartition(parts), "text", "doc_id", 16, 2)
        .withColumn("grp", lit("g"))
        .groupBy("grp").agg(MinHashUnion(col("sig"), 16).as("u"))
        .head().getSeq[Long](1)
    assert(unioned(1) == unioned(7))
  }
}
