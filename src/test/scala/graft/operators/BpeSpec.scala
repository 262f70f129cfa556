package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learnMerges reproduces the textbook merge sequence exactly") {
    // Sennrich et al.'s worked example: vocab {low:5, lower:2,
    // newest:6, widest:3}. Hand-computed first five merges:
    //   1 (e,s,9)    es/st/t</w> tie at 9 -> lexicographic smallest
    //   2 (es,t,9)   "es"<"t" beats (t,</w>)
    //   3 (est,</w>,9)
    //   4 (l,o,7)    lo/ow tie at 7 -> (l,o)
    //   5 (lo,w,7)
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val got = Bpe.learnMerges(df, "text", numMerges = 5)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got === Array(
      (1, "e", "s", 9L),
      (2, "es", "t", 9L),
      (3, "est", "</w>", 9L),
      (4, "l", "o", 7L),
      (5, "lo", "w", 7L)))
  }

  test("merge loop stops early when no pairs remain") {
    // single word "ab": (a,b) then (ab,</w>) exhausts every pair
    val df = Seq((1L, "ab")).toDF("doc_id", "text")
    val got = Bpe.learnMerges(df, "text", numMerges = 10).collect()
    assert(got.length == 2)
  }

  test("tokenize applies merges in rank order (textbook segmentations)") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val corpus = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(corpus, "text", numMerges = 5)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val probe = Seq((1L, "low"), (2L, "newest"), (3L, "lowest"))
      .toDF("doc_id", "text")
    val got = Bpe.tokenize(probe, "doc_id", "text", merges)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    // after merges es, est, est</w>, lo, low:
    assert(got(1L) == List("low", "</w>"))
    assert(got(2L) == List("n", "e", "w", "est</w>"))
    // "lowest": l o w e s t </w> -> es -> est -> est</w> -> lo ->
    // (lo,w) fuses -> low, est</w>
    assert(got(3L) == List("low", "est</w>"))
  }

  test("deterministic on the real fixture (run-to-run equality)") {
    val docs = graft.Engine
      .Tables(spark, "/root/testdata/sf0.001").documents
    def run() = Bpe.learnMerges(docs, "text", numMerges = 8)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val a = run()
    assert(a.length == 8)
    assert(a == run())
    assert(a.forall(_._4 > 0))
  }
}
