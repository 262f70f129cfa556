package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.Dedup

/** Scratch probe: committed TableSync index bytes for the d23-shaped
  * store (5k docs / 3 batches, forced splits) vs the dsyncp-shaped
  * store (50k distinct docs) — sizes the driver-probe floor.
  */
object IndexBytesProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "graft-index-bytes")
    val d = Engine.Tables(spark, sfDir).documents
      .select(col("doc_id"), col("text"))
    def bytesOf(path: String): Long = {
      val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
        spark.sessionState.newHadoopConf())
      val cur = new org.apache.hadoop.fs.Path(path, "_CURRENT")
      val len = fs.getFileStatus(cur).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(cur)
      try in.readFully(0, buf) finally in.close()
      new String(buf, "UTF-8").split("\n").drop(1)
        .map(_.split("\t")).filter(_.length > 2)
        .filter(_(2) != "?").map(_(2).toLong).sum
    }
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("ixbytes_d23").toString
      (0L to 2L).foreach { b =>
        graft.streaming.DedupSync.applyDocs(
          d.filter(pmod(col("doc_id"), lit(3)) === b),
          s"$root/ix", s"$root/pr", "text", "doc_id", b,
          threshold = 0.5, numHashes = 24, bands = 8,
          hasher = Dedup.MinHashFamily.Md5,
          numBuckets = 8, maxBucketBytes = 1L, splitsPerBatch = 4)
      }
      println(s"[ixbytes] d23-store = ${bytesOf(s"$root/ix")}")
    }
    locally {
      val root = java.nio.file.Files
        .createTempDirectory("ixbytes_dsyncp").toString
      val k = 10
      val distinct = (0 until k).map { i =>
        d.select((col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", "$1z" + i).as("text"))
      }.reduce(_ unionByName _)
      graft.streaming.DedupSync.applyDocs(
        distinct, s"$root/ix", s"$root/pr", "text", "doc_id", 0L,
        threshold = 0.5, numHashes = 24, bands = 8,
        maxBucketBytes = Long.MaxValue,
        payloadBucketBytes = 64L << 10)
      println(s"[ixbytes] dsyncp-store = ${bytesOf(s"$root/ix")}")
    }
    spark.stop()
  }
}
