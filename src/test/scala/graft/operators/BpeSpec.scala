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

  test("supplementary-plane characters stay whole symbols (no surrogate halves)") {
    // 🎉 (U+1F389) and 𝕏 (U+1D54F) are outside the BMP: two UTF-16
    // units each. UTF-16-unit splitting would make the symbol alphabet
    // unpaired surrogate halves — malformed strings on write-out.
    // Code-point splitting keeps each emoji one symbol: in "🎉🎉🎉"×4
    // the pair (🎉,🎉) counts 8 (two per word) vs 4 for (🎉,</w>),
    // strictly the top merge — no tie-break subtleties.
    val text = (Seq.fill(4)("🎉🎉🎉") ++
      Seq.fill(2)("𝕏!")).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Bpe.learnMerges(df, "text", numMerges = 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(merges(0) == ((1, "🎉", "🎉", 8L)), s"got ${merges.toSeq}")
    // every learned symbol must be well-formed: no code point in the
    // surrogate range, and exact UTF-8 round-trip
    merges.foreach { case (_, l, r, _) =>
      Seq(l, r).foreach { s =>
        assert(s.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF),
          s"lone surrogate in symbol '$s'")
        assert(new String(s.getBytes("UTF-8"), "UTF-8") == s,
          s"symbol '$s' corrupts through UTF-8")
      }
    }
    // tokenize shares the alphabet: merge 1 fuses the first two emoji
    // ([🎉,🎉,🎉,</w>] -> [🎉🎉, 🎉, </w>]) and all emitted tokens
    // survive a UTF-8 round trip
    val toks = Bpe.tokenize(df, "doc_id", "text",
      merges.map(m => (m._2, m._3)).toSeq)
      .collect().head.getSeq[String](1)
    toks.foreach { t =>
      assert(t.codePoints().toArray.forall(cp => cp < 0xD800 || cp > 0xDFFF),
        s"lone surrogate in token '$t'")
      assert(new String(t.getBytes("UTF-8"), "UTF-8") == t,
        s"token '$t' corrupts through UTF-8")
    }
    assert(toks.contains("🎉🎉"), s"expected fused emoji token, got $toks")
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

  test("incremental merge loop == naive recount-everything reference " +
    "on random histograms (exact sequence, counts included)") {
    // the naive loop this spec pins against is the pre-round-7
    // implementation: full pair recount + full vocab rewrite per merge
    def naiveSymbols(w: String): Array[String] = {
      val out = Array.newBuilder[String]
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        out += new String(Character.toChars(cp))
        i += Character.charCount(cp)
      }
      out += Bpe.EndOfWord
      out.result()
    }
    def naive(hist: Seq[(String, Long)],
        numMerges: Int): Vector[(Int, String, String, Long)] = {
      var vocab: Array[(Array[String], Long)] =
        hist.map { case (w, c) => (naiveSymbols(w), c) }.toArray
      val merges = Vector.newBuilder[(Int, String, String, Long)]
      var rank = 1
      var exhausted = false
      while (rank <= numMerges && !exhausted) {
        val counts = scala.collection.mutable.HashMap
          .empty[(String, String), Long]
        vocab.foreach { case (syms, cnt) =>
          var i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            counts.update(k, counts.getOrElse(k, 0L) + cnt)
            i += 1
          }
        }
        if (counts.isEmpty) exhausted = true
        else {
          val ((l, r), c) = counts.minBy { case ((a, b), n) => (-n, a, b) }
          merges += ((rank, l, r, c))
          val fused = l + r
          vocab = vocab.map { case (syms, cnt) =>
            if (syms.length < 2) (syms, cnt)
            else {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += fused; i += 2
                } else { out += syms(i); i += 1 }
              }
              (out.result(), cnt)
            }
          }
          rank += 1
        }
      }
      merges.result()
    }
    // tiny alphabet -> dense shared pairs and constant count ties, the
    // regime where a selection-order bug would surface; supplementary-
    // plane char mixed in to exercise multi-unit symbols
    val rnd = new scala.util.Random(42)
    val alphabet = Array("a", "b", "c", "🎉")
    (0 until 15).foreach { trial =>
      val words = (0 until 40).map { _ =>
        (0 until 1 + rnd.nextInt(6))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val hist = words.groupBy(identity).toSeq
        .map { case (w, g) => (w, (g.size + rnd.nextInt(5)).toLong) }
        .sortBy(_._1)
      val n = 5 + rnd.nextInt(46)
      val got = Bpe.learnMergesFromHist(hist, n)
      val want = naive(hist, n)
      assert(got == want,
        s"trial $trial (numMerges=$n): incremental ${got.take(8)}... " +
          s"!= naive ${want.take(8)}...")
    }
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
