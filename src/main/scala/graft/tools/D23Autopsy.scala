package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** A/B attribution for the d23 bench entry: the exact d23 workload
  * (3 id-striped batches through DedupSync with forced splits) run in
  * one JVM under BOTH probe arms — the driver-resolved micro-batch
  * path (smallBatchRows default: d23's batches are ~1.7k rows, under
  * the 4096 gate) and the distributed path (smallBatchRows = 0) —
  * interleaved A/B/A/B so JIT warmup lands on both arms equally.
  *
  * `sbt "runMain graft.tools.D23Autopsy [sfDir] [reps]"`
  */
object D23Autopsy {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Engine.session(appName = "graft-d23-autopsy")
    val d = Engine.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))

    // floor 0 on the driver arm: the committed-bytes gate would
    // otherwise send BOTH arms down the distributed path on this
    // 3.3 MB store (that gate is the fix this tool measured into
    // existence); the A/B stays an A/B
    def runOnce(label: String, smallRows: Int): Unit = {
      val root = java.nio.file.Files
        .createTempDirectory("d23_autopsy").toString
      val t0 = System.nanoTime()
      (0L to 2L).foreach { b =>
        graft.streaming.DedupSync.applyDocs(
          d.filter(pmod(col("doc_id"), lit(3)) === b),
          s"$root/ix", s"$root/pr", "text", "doc_id", b,
          threshold = 0.5, numHashes = 24, bands = 8,
          hasher = Dedup.MinHashFamily.Md5,
          numBuckets = 8, maxBucketBytes = 1L, splitsPerBatch = 4,
          smallBatchRows = smallRows, driverProbeMinIndexBytes = 0L)
      }
      val n = graft.streaming.DedupSync.readPairs(spark, s"$root/pr")
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
