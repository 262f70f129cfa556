package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** Dev profiling harness for the vecDedupIndex / incrementalVecDups
  * path (d13's shape).
  */
object ProfileVecIndex {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "profile-vec-index")
    val e = Engine.widenIfNarrow(Engine.Tables(spark, dir).embeddings)

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    e.count() // warm
    val corpus = e.filter(col("vec_id") % 5 =!= 0)
    val batch = e.filter(col("vec_id") % 5 === 0)
    time("vecDedupIndex (warmup run)")(noop(
      Dedup.vecDedupIndex(corpus, "embedding", "vec_id")))
    time("vecDedupIndex")(noop(
      Dedup.vecDedupIndex(corpus, "embedding", "vec_id")))
    val idx = time("vecDedupIndex ckpt")(
      Dedup.vecDedupIndex(corpus, "embedding", "vec_id").localCheckpoint())
    time("incrementalVecDups")(noop(
      Dedup.incrementalVecDups(idx, batch, "embedding", "vec_id",
        threshold = 0.35)))
    time("incrementalVecDups again")(noop(
      Dedup.incrementalVecDups(idx, batch, "embedding", "vec_id",
        threshold = 0.35)))
    time("embeddingDupPairs(batch) alone")(noop(
      Dedup.embeddingDupPairs(batch, "embedding", "vec_id",
        threshold = 0.35)))
    time("embeddingDupPairs(batch) again")(noop(
      Dedup.embeddingDupPairs(batch, "embedding", "vec_id",
        threshold = 0.35)))
    // A/B: d13 exactly as registered (index NOT checkpointed)
    time("d13 shape: no-ckpt index")(noop(
      Dedup.incrementalVecDups(
        Dedup.vecDedupIndex(corpus, "embedding", "vec_id"),
        batch, "embedding", "vec_id", threshold = 0.35)))
    time("d13 shape: no-ckpt index again")(noop(
      Dedup.incrementalVecDups(
        Dedup.vecDedupIndex(corpus, "embedding", "vec_id"),
        batch, "embedding", "vec_id", threshold = 0.35)))
    spark.stop()
  }
}
