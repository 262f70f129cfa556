package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Behavioral pins for the per-document curation passes c08–c10 —
  * properties the DuckDB oracle can't express (redaction completeness
  * is "no PII survives", not "matches this output") plus the
  * zero-shuffle plan shape all three promise.
  */
class CurationRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("c08: no e-mail, IPv4, or long digit run survives redaction") {
    val rows = run("c08_pii_redact").collect()
    assert(rows.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}".r
    val num = "[0-9]{6,}".r
    rows.foreach { r =>
      val clean = r.getAs[String]("clean")
      assert(email.findFirstIn(clean).isEmpty, s"email survived: $clean")
      assert(ip.findFirstIn(clean).isEmpty, s"ip survived: $clean")
      assert(num.findFirstIn(clean).isEmpty, s"digit run survived: $clean")
    }
  }

  test("c08: redaction counts follow the deterministic injection") {
    run("c08_pii_redact").collect().foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[Int]("n_email") == (if (id % 3 == 0) 1 else 0))
      assert(r.getAs[Int]("n_ip") == (if (id % 2 == 0) 1 else 0))
      assert(r.getAs[Int]("n_num") == 1) // the planted 9-digit ref
    }
  }

  test("c09: signals are in-range and the verdict matches its rules") {
    val rows = run("c09_quality_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val alpha = r.getAs[Double]("alpha_ratio")
      val sym = r.getAs[Double]("sym_ratio")
      assert(alpha >= 0.0 && alpha <= 1.0)
      assert(sym >= 0.0)
      val expect = r.getAs[Int]("n_words") >= 30 &&
        r.getAs[Int]("n_words") <= 10000 &&
        r.getAs[Double]("mean_wl") >= 3.0 && r.getAs[Double]("mean_wl") <= 10.0 &&
        r.getAs[Int]("stop_hits") >= 2 && alpha >= 0.8 && sym <= 0.1
      assert(r.getAs[Int]("passes") == (if (expect) 1 else 0))
    }
    // the rule set must discriminate on real data, not rubber-stamp
    val passed = rows.count(_.getAs[Int]("passes") == 1)
    assert(passed > 0 && passed < rows.length,
      s"verdict is constant ($passed/${rows.length})")
  }

  test("c10: rep_ratio is exactly (n_grams - n_uniq) / n_grams") {
    val rows = run("c10_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getAs[Int]("n_grams")
      val uniq = r.getAs[Int]("n_uniq")
      assert(uniq <= total)
      val expect = if (total == 0) 0.0 else (total - uniq).toDouble / total
      assert(r.getAs[Double]("rep_ratio") == expect)
    }
  }

  test("c08/c09/c10 are single map passes: no exchange in the plan") {
    Seq("c08_pii_redact", "c09_quality_rules", "c10_repetition").foreach { q =>
      val p = run(q).queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"), s"$q shuffles:\n$p")
    }
  }

  test("c21: no duplicate cluster straddles the train/eval boundary") {
    val rows = run("c21_leakfree_split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(rows.nonEmpty)
    // every member of a rep-group carries the group's single split
    rows.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.map(_._3).toSet.size == 1,
        s"cluster $rep straddles: ${members.toSeq}")
    }
    // the hash band is ~90/10 over distinct clusters
    val byRep = rows.groupBy(_._2).map { case (_, ms) => ms.head._3 }
    val evalFrac = byRep.count(_ == "eval").toDouble / byRep.size
    assert(evalFrac > 0.02 && evalFrac < 0.3, s"eval fraction $evalFrac")
  }

  test("c19: every eval excerpt is traced back to its source doc") {
    // the eval set is by construction an 80%-token excerpt of each
    // %97 corpus doc: fuzzy decon must flag AT LEAST the (source,
    // its-own-excerpt) pair for every eval doc, at high jaccard
    val d = graft.Engine.Tables(spark, dir).documents
    val evalIds = d.filter(
      org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val hits = run("c19_fuzzy_decontam").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val selfHits = hits.filter { case (src, ev, _) => src == ev }
    assert(selfHits.map(_._1).toSet == evalIds,
      s"sources not all traced: got ${selfHits.map(_._1).toSet}, " +
        s"want $evalIds")
    // an 80% prefix excerpt shares ~80% of trigram shingles
    selfHits.foreach { case (_, _, j) => assert(j >= 0.5, s"jaccard $j") }
    // and nothing is flagged against an eval doc it doesn't resemble:
    // all hits must verify at the threshold
    hits.foreach { case (_, _, j) => assert(j >= 0.5) }
  }

  test("c29: BPE-priced budget fill equals c20 when pricing agrees, " +
    "and long rare words genuinely cost more subwords") {
    import spark.implicits._
    // Planted corpus over four 2-char words: 20 merges fully fuse
    // every word ((x,y) then (xy,</w>) per word = 8 merges), so
    // n_bpe_tokens == whitespace tokenCount for EVERY doc and the
    // BPE-priced fill must select exactly c20's doc set.
    val words = Array("ab", "cd", "ef", "gh")
    val planted = (1L to 24L).map { i =>
      val n = 3 + (i % 7).toInt * 4
      val text = (0 until n).map(j => words(((i + j) % 4).toInt))
        .mkString(" ")
      (i, text, "en", "planted", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-c29-").toString
    planted.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    def ids(name: String) = SparkEntry.queries(name)(spark, tmp)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bpeSel = ids("c29_bpe_token_budget")
    val wsSel = ids("c20_token_budget")
    assert(bpeSel.nonEmpty, "fill selected nothing")
    assert(bpeSel == wsSel,
      s"fully-fused pricing must reproduce c20: $bpeSel vs $wsSel")

    // Divergence half: a rare 20-char word stays unfused under merges
    // learned from a corpus dominated by the short words, so its BPE
    // price is several subwords where whitespace counts 1 — the
    // boundary genuinely moves at scale.
    val rare = "abcdefghijklmnopqrst"
    val mixed = planted.union(
      Seq((99L, s"$rare $rare $rare", "en", "planted", 62L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val merges = graft.operators.Bpe
      .learnMerges(mixed, "text", numMerges = 20)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val priced = graft.operators.Bpe
      .tokenize(mixed, "doc_id", "text", merges)
      .filter($"doc_id" === 99L).head()
    assert(priced.getLong(2) > 3L,
      s"rare long word should cost >1 subword per use, " +
        s"got ${priced.getLong(2)} for 3 uses")
  }
}
