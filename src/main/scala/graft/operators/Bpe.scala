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

    // bounded driver loop over the histogram
    var vocab: Array[(Array[String], Long)] = hist.map { r =>
      (symbols(r.getString(0)), r.getLong(1))
    }
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
        val ((l, r), c) = counts.minBy { case ((a, b), n) =>
          (-n, a, b) // max count, then lexicographic (left, right)
        }
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
    toDf(spark, merges.result())
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
    */
  def tokenize(
      df: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeList = merges.toArray
    df.select(col(idCol).cast("long"),
      split(TextFunctions.normText(col(textCol)), " ").as("ws"))
      .as[(Long, Seq[String])]
      .map { case (id, ws) =>
        val toks = Vector.newBuilder[String]
        ws.iterator.filter(_.nonEmpty).foreach { w =>
          var syms: Array[String] = symbols(w)
          mergeList.foreach { case (l, r) =>
            if (syms.length >= 2) {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                  out += (l + r); i += 2
                } else { out += syms(i); i += 1 }
              }
              syms = out.result()
            }
          }
          toks ++= syms
        }
        val ts = toks.result()
        (id, ts, ts.length.toLong)
      }
      .toDF(idCol, "bpe_tokens", "n_bpe_tokens")
  }
}
