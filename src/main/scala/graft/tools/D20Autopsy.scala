package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine

/** A/B attribution for the d20 bench entry (the vec twin of
  * [[D23Autopsy]]): the exact d20 workload — 3 id-striped embedding
  * batches through VecDedupSync with forced splits — under both probe
  * arms, order-alternated. The vec side has no committed-bytes floor
  * yet; this tool measures whether d20's ~1.2 MB store wants one.
  *
  * `sbt "runMain graft.tools.D20Autopsy [sfDir] [reps]"`
  */
object D20Autopsy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.session(appName = "graft-d20-autopsy")
    val e = Engine.widenIfNarrow(Engine.Tables(spark, sfDir).embeddings)

    def runOnce(label: String, smallRows: Int): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory("d20_autopsy").toString
      val t0 = System.nanoTime()
      (0L to 2L).foreach { b =>
        graft.streaming.VecDedupSync.applyVecs(
          e.filter(pmod(col("vec_id"), lit(3)) === b),
          s"$root/ix", s"$root/pr", "embedding", "vec_id", b,
          threshold = 0.35, numBuckets = 8, maxBucketBytes = 1L,
          splitsPerBatch = 4, smallBatchRows = smallRows)
      }
      val n = graft.streaming.VecDedupSync.readPairs(spark, s"$root/pr")
        .count()
      println(f"[autopsy] $label%-18s rows=$n%8d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      Engine.releaseCheckpoints(spark)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(root))
    }

    (1 to reps).foreach { i =>
      runOnce(s"distributed#$i", 0)
      runOnce(s"driver_path#$i", 4096)
    }
    spark.stop()
  }
}
