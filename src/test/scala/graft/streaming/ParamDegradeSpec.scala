package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Metadata
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.Dedup

/** The mixed-history parameter DEGRADE path is loud (round-16 order
  * #5): when an index has lost its derivation metadata in BOTH
  * sources (the sampled generation AND the full union schema — a
  * legacy or metadata-stripped index), the engine falls back to the
  * passed knobs. That fallback used to be silent, while the
  * knob-mismatch path warned — yet a restart with drifted knobs on
  * such an index reproduces exactly the silent-divergence pair loss
  * the metadata freeze was built to kill. These specs pin the loud
  * warning on every degrade path (batch text, batch vec, streaming
  * sink), that results still compute correctly under matching knobs,
  * and that the sink's full-schema consult is CACHED (the r15 advice:
  * a legacy index must not re-plan the full snapshot every batch).
  */
class ParamDegradeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def captureOut[A](body: => A): (A, String) = {
    val bos = new ByteArrayOutputStream()
    val r = Console.withOut(bos)(body)
    (r, bos.toString("UTF-8"))
  }

  private def strip(df: DataFrame): DataFrame =
    df.select(df.schema.fieldNames.map(n =>
      col(n).as(n, Metadata.empty)): _*)

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (4L, "the quick brown fox jumps over the lazy dog again and again tonight"),
      (9L, "an entirely different document about spark shuffles and joins"),
      (5L, "an entirely different document about spark shuffles and joins"),
      (3L, "filler alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
  }

  test("batch text degrade: metadata-stripped index warns loudly and " +
    "still pairs correctly under matching knobs") {
    val index = Dedup.dedupIndex(docs.filter(col("doc_id") =!= 5L),
      "text", "doc_id").localCheckpoint()
    import spark.implicits._
    val batch = docs.filter(col("doc_id") === 5L)
    val clean = Dedup.incrementalNearDups(index, batch, "text",
      "doc_id", threshold = 0.5)
      .collect().map(_.toString).sorted.toSeq
    val (got, out) = captureOut {
      Dedup.incrementalNearDups(strip(index), batch, "text", "doc_id",
        threshold = 0.5).collect().map(_.toString).sorted.toSeq
    }
    assert(out.contains("no stored derivation metadata"),
      s"degrade warning missing; captured: '$out'")
    assert(out.contains("numHashes=128"), s"knobs not named: '$out'")
    assert(got == clean)
  }

  test("batch vec degrade: metadata-stripped index warns loudly and " +
    "still pairs correctly under matching knobs") {
    import spark.implicits._
    val vecs = Seq(
      1L -> Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f, 8f),
      9L -> Seq(8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f),
      3L -> Seq(1f, 1f, 1f, 1f, -1f, -1f, -1f, -1f))
      .toDF("vec_id", "embedding")
    val batch = Seq(5L -> Seq(8f, 7f, 6f, 5f, 4f, 3f, 2f, 1f))
      .toDF("vec_id", "embedding")
    val index = Dedup.vecDedupIndex(vecs, "embedding", "vec_id",
      dim = 8).localCheckpoint()
    val clean = Dedup.incrementalVecDups(index, batch, "embedding",
      "vec_id", threshold = 0.9, dim = 8)
      .collect().map(_.toString).sorted.toSeq
    val (got, out) = captureOut {
      Dedup.incrementalVecDups(strip(index), batch, "embedding",
        "vec_id", threshold = 0.9, dim = 8)
        .collect().map(_.toString).sorted.toSeq
    }
    assert(out.contains("no stored geometry metadata"),
      s"degrade warning missing; captured: '$out'")
    assert(got == clean)
  }

  test("sink degrade: legacy index warns loudly ONCE per JVM (the " +
    "full-schema consult is cached), results stay correct") {
    import spark.implicits._
    val ix = Files.createTempDirectory("degrade-ix-").toString
    val pr = Files.createTempDirectory("degrade-pr-").toString
    // a legacy index: batch 0's rows land through TableSync directly
    // with the metadata stripped, so NO generation carries it
    val idx0 = strip(Dedup.dedupIndex(
      docs.filter(col("doc_id").isin(1L, 9L, 3L)), "text", "doc_id"))
      .withColumn("ver", lit(0L))
    TableSync.applyBatch(idx0, ix, "id", "ver", 0L, numBuckets = 8)
    val (_, out1) = captureOut {
      DedupSync.applyDocs(docs.filter(col("doc_id") === 4L),
        ix, pr, "text", "doc_id", 1L, threshold = 0.5,
        driverProbeMinIndexBytes = 0L)
    }
    assert(out1.contains("NO stored derivation metadata"),
      s"sink degrade warning missing; captured: '$out1'")
    val (_, out2) = captureOut {
      DedupSync.applyDocs(docs.filter(col("doc_id") === 5L),
        ix, pr, "text", "doc_id", 2L, threshold = 0.5,
        driverProbeMinIndexBytes = 0L)
    }
    assert(!out2.contains("NO stored derivation metadata"),
      s"degrade warning repeated — full-schema consult not cached: " +
        s"'$out2'")
    // cross-boundary pairs still flow under the (matching) passed
    // knobs: 4 pairs with 1 (template A), 5 with 9 (exact)
    val pairs = DedupSync.readPairs(spark, pr)
      .select(col("id_a"), col("id_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L), (5L, 9L)), s"pairs: $pairs")
  }

  test("sink degrade cache: an index deleted and recreated at the " +
    "same path re-consults (bootstrap token, not path, keys the cache)") {
    import spark.implicits._
    val ix = Files.createTempDirectory("reborn-ix-").toString
    val pr = Files.createTempDirectory("reborn-pr-").toString
    def bootstrapStripped(): Unit = {
      val idx0 = strip(Dedup.dedupIndex(
        docs.filter(col("doc_id").isin(1L, 9L)), "text", "doc_id"))
        .withColumn("ver", lit(0L))
      TableSync.applyBatch(idx0, ix, "id", "ver", 0L, numBuckets = 8)
    }
    bootstrapStripped()
    val (_, first) = captureOut {
      DedupSync.applyDocs(docs.filter(col("doc_id") === 4L),
        ix, pr, "text", "doc_id", 1L, threshold = 0.5,
        driverProbeMinIndexBytes = 0L)
    }
    assert(first.contains("NO stored derivation metadata"),
      s"first consult should warn: '$first'")
    val tokenA = TableSync.bootstrapToken(spark, ix)
    // delete + recreate at the SAME path in the SAME JVM — the exact
    // shape that used to be served the previous index's cached params
    // because the JVM-lifetime cache was keyed by path alone
    def rm(dir: String): Unit = {
      val p = java.nio.file.Paths.get(dir)
      if (Files.exists(p))
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Files.delete(f); () })
      Files.createDirectories(p)
      ()
    }
    rm(ix); rm(pr)
    bootstrapStripped()
    val tokenB = TableSync.bootstrapToken(spark, ix)
    assert(tokenA != tokenB,
      "recreated table must carry a fresh bootstrap token")
    val (_, reborn) = captureOut {
      DedupSync.applyDocs(docs.filter(col("doc_id") === 4L),
        ix, pr, "text", "doc_id", 1L, threshold = 0.5,
        driverProbeMinIndexBytes = 0L)
    }
    assert(reborn.contains("NO stored derivation metadata"),
      "recreated index was served the stale cached consult — the " +
        s"degrade warning did not re-fire: '$reborn'")
  }
}
