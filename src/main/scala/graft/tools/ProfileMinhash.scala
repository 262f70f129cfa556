package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** Dev profiling harness for the MinHash pipeline stages. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "profile-minhash")
    val docs = Engine.Tables(spark, dir).documents

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val sigs = Dedup.minhashSignatures(docs, "text", "doc_id").persist()
    time("signatures")(sigs.count())
    val buckets = Dedup.lshBuckets(sigs, 32, 128).persist()
    time("buckets")(println("  buckets=" + buckets.count()))
    val cands = time("candidates") {
      val c = Dedup.candidatePairs(buckets).persist()
      println("  cands=" + c.count()); c
    }
    time("verify")(println("  verified=" +
      Dedup.verifyJaccard(cands, docs, "text", "doc_id")
        .filter(col("jaccard") >= 0.5).count()))
    spark.stop()
  }
}
