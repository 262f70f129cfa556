package graft.streaming

import org.apache.spark.sql.functions._

/** Forked-writer entry point for [[KillMinus9Spec]] — runs ONE store
  * family's write in a fresh JVM so the parent can SIGKILL it for
  * real. The pulse sites it parks/signals at are armed purely via
  * the `graft.faultpoints.park` / `.signal` / `.sentinel` system
  * properties the spec passes on the command line; unarmed, every
  * family runs to completion (the spec's clean-oracle twin runs the
  * same ops in-process instead).
  */
object KillWriterChild {
  def main(args: Array[String]): Unit = {
    val family = args(0)
    val dir = args(1)
    val spark = graft.Engine.session(master = "local[2]",
      shufflePartitions = 2, appName = s"graft-kill-child-$family")
    import spark.implicits._
    family match {
      case "atomicfiles" =>
        // parks at AtomicFiles.midwrite — the archived-manifest write
        // inside the commit window, UNDER the real commit lock, with
        // the tmp stream open and its payload still buffered
        TableSync.applyBatch(
          Seq((1L, 1L, "a1"), (2L, 1L, "b1")).toDF("k", "ver", "attr"),
          dir, "k", "ver", 1L, numBuckets = 2)
      case "tarshards" =>
        // parks at TarShards.midstream — archive + sidecar streams
        // open mid-shard, liveness marker freshly beaten
        val df = (0 until 64)
          .map(i => (f"m$i%04d", Array.fill(1024)(i.toByte), "s0"))
          .toDF("name", "bytes", "shard")
        graft.sources.TarShards
          .writeShards(df, "name", "bytes", "shard", dir).collect()
        ()
      case "annindex" =>
        // signals at AnnIndex.seg.prewrite and CONTINUES into a
        // deliberately slowed parquet stage write (15 ms per row,
        // ~3 s per task) so the parent's SIGKILL lands mid-write:
        // the stage dir dies half-filled with task files
        val slow = udf((i: Long) => { Thread.sleep(15L); i })
        val rows = spark.range(0L, 400L).select(
          (col("id") + 1000L).as("vec_id"),
          array((0 until 8).map(d =>
            ((slow(col("id")) % 7L + d.toLong) / 7.0).cast("float")): _*)
            .as("embedding"))
        graft.operators.AnnIndex.append(rows, dir, segId = 1L)
      case other => sys.error(s"unknown family: $other")
    }
    spark.stop()
  }
}
