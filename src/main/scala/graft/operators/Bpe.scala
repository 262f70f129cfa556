package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Distributed BPE (byte-pair-encoding) merge learning — tokenizer
  * induction from the corpus itself.
  *
  * Shape: the ONLY corpus-scale step is the word-count aggregation
  * (one explode + one shuffle); merge induction then runs on the
  * word HISTOGRAM, which is vocabulary-bounded — the same split
  * every production BPE trainer uses (trainers consume word counts,
  * not raw text, because pair statistics are identical and the
  * histogram is ~10^5 rows where the corpus is 10^11). At 100 TB
  * the histogram for natural language saturates in the low millions
  * of distinct words; `maxVocab` caps the driver copy by dropping
  * the frequency tail (rarest words contribute least to pair counts
  * — the standard trainer cutoff), with a deterministic
  * (count desc, word) cut so runs are reproducible.
  *
  * Merge loop semantics (Sennrich et al. 2016): words are symbol
  * sequences (characters + a terminal `</w>` marker); each round
  * counts adjacent symbol pairs weighted by word frequency, merges
  * the most frequent pair (ties -> lexicographically smallest
  * (left, right), so induction is total-order deterministic), and
  * rewrites the histogram. Stops early if no pair remains.
  *
  * The loop is INCREMENTAL (the subword-nmt/fastBPE optimization):
  * pair counts live in a stats map maintained by exact deltas, an
  * inverted index maps each pair to the histogram words containing
  * it so a merge rewrites only the words it touches, and selection
  * is a lazy max-heap (entries are (count, pair) snapshots,
  * re-pushed when a pair's count changes and validated against the
  * live stats map on pop). Per merge the cost is
  * O(affected words * word length + log heap), independent of
  * vocabulary size — what makes realistic merge counts (1k-32k, real
  * tokenizer vocabularies) a driver-side afterthought instead of a
  * quadratic rebuild. Selection order is IDENTICAL to the naive
  * recount-everything loop (BpeSpec pins equivalence on random
  * histograms and Sennrich's worked example).
  */
object Bpe {

  /** End-of-word marker symbol (kept distinct from any character). */
  val EndOfWord = "</w>"

  /** Initial symbol sequence of a word: one symbol per Unicode CODE
    * POINT plus the terminal marker. Splitting by UTF-16 unit (the
    * naive `String.map`) would break supplementary-plane characters
    * (emoji, rare CJK) into unpaired surrogate halves — deterministic
    * but malformed symbols that corrupt on write-out or cross-engine
    * compare. learnMerges and tokenize MUST share this alphabet.
    */
  private def symbols(w: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out += EndOfWord
    out.result()
  }

  /** Learn `numMerges` merges; returns (rank, left, right,
    * pair_count) with rank 1..n in merge order.
    */
  def learnMerges(
      df: DataFrame, textCol: String, numMerges: Int,
      maxVocab: Int = 65536): DataFrame = {
    val spark = df.sparkSession
    require(numMerges >= 1, "numMerges must be >= 1")

    // corpus-scale step: whitespace word histogram, bounded
    // deterministically by (count desc, word)
    val hist = df
      .select(explode(split(TextFunctions.normText(col(textCol)), " "))
        .as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

    toDf(spark, learnMergesFromHist(hist, numMerges))
  }

  /** The driver-side merge loop over a word histogram — public so the
    * equivalence spec can drive it directly against a naive reference
    * without a SparkSession.
    */
  def learnMergesFromHist(
      hist: Seq[(String, Long)],
      numMerges: Int): Vector[(Int, String, String, Long)] = {
    type Pair = (String, String)
    val vocab: Array[(Array[String], Long)] =
      hist.map { case (w, cnt) => (symbols(w), cnt) }.toArray

    val stats = scala.collection.mutable.HashMap.empty[Pair, Long]
    // pair -> histogram indices of words that (at some point)
    // contained it. Entries go stale when a word is rewritten and may
    // repeat; consumers re-verify adjacency against the live word and
    // dedupe per merge, so staleness costs a check, never correctness.
    val indices =
      scala.collection.mutable.HashMap.empty[Pair, scala.collection.mutable.ArrayBuffer[Int]]

    def addWordPairs(i: Int, syms: Array[String], cnt: Long,
        dirty: scala.collection.mutable.HashSet[Pair]): Unit = {
      var j = 0
      while (j < syms.length - 1) {
        val p = (syms(j), syms(j + 1))
        stats.update(p, stats.getOrElse(p, 0L) + cnt)
        indices.getOrElseUpdate(p,
          scala.collection.mutable.ArrayBuffer.empty[Int]) += i
        if (dirty ne null) dirty += p
        j += 1
      }
    }

    {
      var i = 0
      while (i < vocab.length) {
        addWordPairs(i, vocab(i)._1, vocab(i)._2, null)
        i += 1
      }
    }

    // Lazy max-heap of (count, left, right) snapshots: max count
    // wins, ties -> lexicographically SMALLEST (left, right) — the
    // exact ordering of the naive loop's minBy((-n, a, b)).
    val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String),
            y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val l = y._2.compareTo(x._2)
            if (l != 0) l else y._3.compareTo(x._3)
          }
        }
      }
    val heap =
      scala.collection.mutable.PriorityQueue.empty[(Long, String, String)](heapOrd)
    stats.foreach { case ((l, r), n) => heap.enqueue((n, l, r)) }

    val merges = Vector.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    val seen = scala.collection.mutable.HashSet.empty[Int]
    val dirty = scala.collection.mutable.HashSet.empty[Pair]
    while (rank <= numMerges && !exhausted) {
      // pop until the snapshot matches the live count (stale entries
      // from earlier pushes validate-fail and drop)
      var best: Pair = null
      var bestCnt = 0L
      while ((best eq null) && heap.nonEmpty) {
        val (n, l, r) = heap.dequeue()
        if (n > 0 && stats.getOrElse((l, r), 0L) == n) {
          best = (l, r); bestCnt = n
        }
      }
      if (best eq null) exhausted = true
      else {
        val (l, r) = best
        merges += ((rank, l, r, bestCnt))
        val fused = l + r
        seen.clear(); dirty.clear()
        val affected = indices.remove(best)
          .getOrElse(scala.collection.mutable.ArrayBuffer.empty[Int])
        affected.foreach { i =>
          if (seen.add(i)) {
            val (syms, cnt) = vocab(i)
            // re-verify: the index entry may predate a rewrite that
            // removed the adjacency
            var has = false
            var j = 0
            while (!has && j < syms.length - 1) {
              has = syms(j) == l && syms(j + 1) == r
              j += 1
            }
            if (has) {
              // exact deltas: retract every old adjacency, rewrite,
              // add back every new one (unchanged pairs cancel)
              var j2 = 0
              while (j2 < syms.length - 1) {
                val p = (syms(j2), syms(j2 + 1))
                stats.update(p, stats(p) - cnt)
                dirty += p
                j2 += 1
              }
              val out = Array.newBuilder[String]
              var k = 0
              while (k < syms.length) {
                if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
                  out += fused; k += 2
                } else { out += syms(k); k += 1 }
              }
              val ns = out.result()
              vocab(i) = (ns, cnt)
              addWordPairs(i, ns, cnt, dirty)
            }
          }
        }
        stats.remove(best)
        dirty -= best
        // one push per pair whose count changed this merge, at its
        // settled value (push-per-delta would flood the heap with
        // snapshots that can never validate)
        dirty.foreach { p =>
          val n = stats.getOrElse(p, 0L)
          if (n > 0) heap.enqueue((n, p._1, p._2))
        }
        rank += 1
      }
    }
    merges.result()
  }

  private def toDf(
      spark: SparkSession,
      rows: Vector[(Int, String, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("rank", "left", "right", "pair_count")
  }

  /** Apply a learned merge list (in rank order — the standard BPE
    * apply) and return one row per doc with its subword tokens and
    * count. The merge table rides the closure (it is tokenizer-sized:
    * tens of KB for real vocabularies), so tokenization is a single
    * embarrassingly-parallel map over the corpus — no shuffle, no
    * state, deterministic.
    *
    * Per word the apply is greedy-by-rank: repeatedly merge all
    * occurrences of the lowest-ranked pair present (rank lookup is a
    * hash map), which is order-equivalent to the textbook
    * sweep-the-merge-list-in-rank-order form — a merge can only
    * CREATE adjacencies involving its fused symbol, and every learned
    * pair containing that symbol has a LATER rank, so once ranks
    * < k are absent they stay absent — but costs O(len^2) hash
    * lookups per word instead of O(numMerges * len): at realistic
    * merge counts (1k-32k) the sweep form is 100-1000x more work per
    * word. Segmentations are additionally MEMOIZED per distinct word
    * within a partition (the token distribution is Zipfian; the cache
    * is vocabulary-bounded, same argument as the histogram).
    */
  def tokenize(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeArr: Array[(String, String)] = merges.toArray
    df.select(col(idCol).cast("long"),
      split(TextFunctions.normText(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val ranks = new java.util.HashMap[(String, String), Int](
          mergeArr.length * 2)
        var ri = 0
        while (ri < mergeArr.length) {
          // first (lowest) rank wins for a repeated pair
          ranks.putIfAbsent(mergeArr(ri), ri)
          ri += 1
        }
        val cache = new java.util.HashMap[String, Array[String]]()
        def segment(w: String): Array[String] = {
          var syms: Array[String] = symbols(w)
          var done = false
          while (!done && syms.length >= 2) {
            var bestRank = Int.MaxValue
            var j = 0
            while (j < syms.length - 1) {
              val r = ranks.getOrDefault((syms(j), syms(j + 1)), Int.MaxValue)
              if (r < bestRank) bestRank = r
              j += 1
            }
            if (bestRank == Int.MaxValue) done = true
            else {
              val (l, r) = mergeArr(bestRank)
              val out = Array.newBuilder[String]
              var k = 0
              while (k < syms.length) {
                if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
                  out += (l + r); k += 2
                } else { out += syms(k); k += 1 }
              }
              syms = out.result()
            }
          }
          syms
        }
        it.map { case (id, ws) =>
          val toks = Vector.newBuilder[String]
          ws.iterator.filter(_.nonEmpty).foreach { w =>
            var s = cache.get(w)
            if (s eq null) {
              s = segment(w)
              // Zipf makes the hit rate the point; the cap only
              // guards the adversarial all-unique-words partition
              if (cache.size < (1 << 20)) cache.put(w, s)
            }
            toks ++= s
          }
          val ts = toks.result()
          (id, ts, ts.length.toLong)
        }
      }
      .toDF(idCol, "bpe_tokens", "n_bpe_tokens")
  }
}
