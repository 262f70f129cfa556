package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

class DedupSyncSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // Small corpus with planted near-dups that STRADDLE batch
  // boundaries (ids mod 3 split): 1/4/7 share a template with small
  // edits, 2/5 are exact dups, the rest are distinct filler.
  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (7L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "an entirely different document about spark shuffles and joins"),
      (5L, "an entirely different document about spark shuffles and joins"),
      (3L, "filler alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (6L, "unrelated text regarding parquet column pruning and predicate pushdown"),
      (8L, "completely separate content on broadcast hash joins and skew"),
      (9L, "yet another standalone doc mentioning watermarks and state stores"))
      .toDF("doc_id", "text")
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id_a"), col("id_b"),
      round(col("jaccard"), 6).as("j"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("3-batch stream equals the one-shot batch run (pairs straddle " +
    "every boundary)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ix = Files.createTempDirectory("dsync-ix-").toString
    val pr = Files.createTempDirectory("dsync-pr-").toString
    val ck = Files.createTempDirectory("dsync-ck-").toString
    val q = DedupSync.dedupSink(mem.toDF().toDF("doc_id", "text"),
      ix, pr, "text", "doc_id", ck, threshold = 0.3)
    val rows = corpus.collect()
      .map(r => (r.getLong(0), r.getString(1)))
    (0 until 3).foreach { b =>
      mem.addData(rows.filter(_._1 % 3 == b).toSeq: _*)
      q.processAllAvailable()
    }
    q.stop()
    val streamed = pairSet(DedupSync.readPairs(spark, pr))
    val oneShot = pairSet(Dedup.nearDupPairs(
      corpus, "text", "doc_id", threshold = 0.3))
    assert(streamed == oneShot,
      s"stream $streamed\nvs batch $oneShot")
    assert(streamed.exists(p => p._1 == 2L && p._2 == 5L),
      "cross-batch exact pair (2,5) missing")
    assert(streamed.exists(p => p._1 == 1L && p._2 == 4L),
      "cross-batch near pair (1,4) missing")
    // the accumulated index holds every ingested doc exactly once
    assert(DedupSync.readIndex(spark, ix).count() == 9)
  }

  test("replay after commit is a no-op; replay after pairs-committed-" +
    "index-not recomputes and converges") {
    val ix = Files.createTempDirectory("dsync2-ix-").toString
    val pr = Files.createTempDirectory("dsync2-pr-").toString
    val b0 = corpus.filter(col("doc_id") % 3 === 0)
    val b1 = corpus.filter(col("doc_id") % 3 === 1)
    DedupSync.applyDocs(b0, ix, pr, "text", "doc_id", batchId = 0L,
      threshold = 0.3)
    // full replay of batch 0 after its commit: nothing changes
    val v0 = TableSync.versions(spark, ix)
    val p0 = pairSet(DedupSync.readPairs(spark, pr))
    DedupSync.applyDocs(b0, ix, pr, "text", "doc_id", batchId = 0L,
      threshold = 0.3)
    assert(TableSync.versions(spark, ix) == v0)
    assert(pairSet(DedupSync.readPairs(spark, pr)) == p0)
    // crash-between simulation for batch 1: ONLY the pairs directory
    // is written (what a crash after the first write leaves behind),
    // then the redelivered applyDocs must overwrite it idempotently,
    // commit the index, and land on the uninterrupted end state
    val idx0 = DedupSync.readIndex(spark, ix)
    val pairs1 = Dedup.incrementalNearDups(idx0, b1, "text", "doc_id",
      threshold = 0.3)
    pairs1.select(col("id_a"), col("id_b"), col("jaccard"))
      .write.mode("overwrite").parquet(s"$pr/batch=1")
    DedupSync.applyDocs(b1, ix, pr, "text", "doc_id", batchId = 1L,
      threshold = 0.3)
    assert(TableSync.versions(spark, ix).max == 1L)
    assert(DedupSync.readIndex(spark, ix).count() == 6)
    // end state equals a fresh uninterrupted run of both batches
    val ix2 = Files.createTempDirectory("dsync3-ix-").toString
    val pr2 = Files.createTempDirectory("dsync3-pr-").toString
    DedupSync.applyDocs(b0, ix2, pr2, "text", "doc_id", 0L, 0.3)
    DedupSync.applyDocs(b1, ix2, pr2, "text", "doc_id", 1L, 0.3)
    assert(pairSet(DedupSync.readPairs(spark, pr)) ==
      pairSet(DedupSync.readPairs(spark, pr2)))
  }

  test("dedupSink survives a kill + restart from checkpoint " +
    "(arrivals while down replay into the same end state)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val ix = Files.createTempDirectory("dsync5-ix-").toString
    val pr = Files.createTempDirectory("dsync5-pr-").toString
    val ck = Files.createTempDirectory("dsync5-ck-").toString
    def startQuery() = DedupSync.dedupSink(
      mem.toDF().toDF("doc_id", "text"), ix, pr, "text", "doc_id", ck,
      threshold = 0.3)
    val rows = corpus.collect().map(r => (r.getLong(0), r.getString(1)))
    val q1 = startQuery()
    mem.addData(rows.filter(_._1 % 3 == 0).toSeq: _*)
    q1.processAllAvailable()
    q1.stop()
    // arrivals while the sink is down — including doc 4, whose only
    // near-dups (1 and 7) arrive in DIFFERENT batches around the kill
    mem.addData(rows.filter(_._1 % 3 == 1).toSeq: _*)
    val q2 = startQuery()
    q2.processAllAvailable()
    mem.addData(rows.filter(_._1 % 3 == 2).toSeq: _*)
    q2.processAllAvailable()
    q2.stop()
    val streamed = pairSet(DedupSync.readPairs(spark, pr))
    val oneShot = pairSet(Dedup.nearDupPairs(
      corpus, "text", "doc_id", threshold = 0.3))
    assert(streamed == oneShot, s"stream $streamed\nvs batch $oneShot")
    assert(DedupSync.readIndex(spark, ix).count() == 9)
  }

  test("re-ingested id replaces its index row and pairs stay " +
    "duplicate-free") {
    import spark.implicits._
    val ix = Files.createTempDirectory("dsync4-ix-").toString
    val pr = Files.createTempDirectory("dsync4-pr-").toString
    val b0 = corpus.filter(col("doc_id") <= 5)
    DedupSync.applyDocs(b0, ix, pr, "text", "doc_id", 0L, 0.3)
    // doc 2 re-arrives (upstream replay) in a later batch, unchanged
    val again = Seq((2L,
      "an entirely different document about spark shuffles and joins"))
      .toDF("doc_id", "text")
    DedupSync.applyDocs(again, ix, pr, "text", "doc_id", 1L, 0.3)
    val idx = DedupSync.readIndex(spark, ix)
    assert(idx.filter(col("id") === 2L).count() == 1)
    val pairs = DedupSync.readPairs(spark, pr).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.distinct.length == pairs.length, s"dups in $pairs")
    // the (2,5) exact pair survives with jaccard 1.0 exactly once
    assert(pairs.count(p => p == ((2L, 5L))) == 1)
  }
}
