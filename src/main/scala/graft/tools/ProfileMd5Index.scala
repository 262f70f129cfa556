package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** Dev profiling harness for the Md5-family dedupIndex /
  * incrementalNearDups path (c19/d10's shape).
  */
object ProfileMd5Index {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "profile-md5-index")
    val docs = Engine.widenIfNarrow(Engine.Tables(spark, dir).documents)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    docs.count() // warm

    val corpus = docs.filter(col("doc_id") % 5 =!= 0)
    val batch = docs.filter(col("doc_id") % 5 === 0)

    time("shingleHashes scan (corpus)")(noop(
      corpus.select(col("doc_id"),
        Dedup.MinHashFamily.Md5.shingleHashes(col("text"), 3))))

    // decomposed dedupIndex: checkpoint of the hashed frame, the
    // signature fold, the join-back
    val hashed = time("hashed (fp+shset) ckpt")(
      corpus.select(col("doc_id").as("id"),
        graft.functions.TextFunctions.fingerprint(col("text")).as("fp"),
        Dedup.MinHashFamily.Md5.shingleHashes(col("text"), 3).as("shset"))
        .localCheckpoint())
    time("md5Signatures fold only")(noop(
      Dedup.md5Signatures(hashed.select(col("id"), col("shset")),
        "id", 24)))

    val idx = time("dedupIndex(Md5) build+checkpoint")(
      Dedup.dedupIndex(corpus, "text", "doc_id",
        numHashes = 24, hasher = Dedup.MinHashFamily.Md5)
        .localCheckpoint())

    time("incrementalNearDups")(noop(
      Dedup.incrementalNearDups(idx, batch, "text", "doc_id",
        threshold = 0.5, numHashes = 24, bands = 8,
        hasher = Dedup.MinHashFamily.Md5)))

    // decomposed: where does incrementalNearDups spend it?
    val newIdx = time("batch dedupIndex(Md5)+ckpt")(
      Dedup.dedupIndex(batch, "text", "doc_id",
        numHashes = 24, hasher = Dedup.MinHashFamily.Md5)
        .localCheckpoint())
    time("corpus buckets from stored sigs")(noop(
      Dedup.lshBuckets(idx.select(col("id"), col("sig")), 8, 24)))
    time("batch buckets")(noop(
      Dedup.lshBuckets(newIdx.select(col("id"), col("sig")), 8, 24)))
    spark.stop()
  }
}
