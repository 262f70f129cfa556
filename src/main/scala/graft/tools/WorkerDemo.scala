package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.streaming.Trigger

import graft.Engine
import graft.streaming.JobStream

/** End-to-end demo of the streaming worker (reference §3.2 lifecycle):
  * builds a file-queue of job envelopes + an input dir, runs the
  * worker with `cp`, prints what got published and quarantined.
  * `sbt "runMain graft.tools.WorkerDemo"`.
  */
object WorkerDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-worker-demo")
    val queue = Files.createTempDirectory("demo-queue-")
    val in = Files.createTempDirectory("demo-in-")
    val out = Files.createTempDirectory("demo-out-").toString
    val ckpt = Files.createTempDirectory("demo-ckpt-").toString

    Files.write(in.resolve("alpha.txt"), "first payload".getBytes)
    Files.write(in.resolve("beta.bin"), Array[Byte](0, 1, 2, -1))
    Files.write(queue.resolve("jobs.jsonl"),
      ("""["process","b","in/","out/","alpha.txt"]""" + "\n" +
        """["process","b","in/","out/","beta.bin"]""" + "\n" +
        """["process","b","in/","out/","gone.txt"]""" + "\n" +
        """["explode","b","in/","out/","alpha.txt"]""").getBytes)

    val q = JobStream.runWorker(spark, queue.toString, in.toString, out,
      ckpt, Seq("cp"), trigger = Trigger.AvailableNow())
    q.awaitTermination(120000)
    JobStream.stopGracefully(q)

    println("[demo] published: " +
      Paths.get(out).toFile.list().sorted.mkString(", "))
    println("[demo] quarantine:")
    spark.read.parquet(out + "_quarantine")
      .select("key", "exitCode", "error").show(false)
    spark.stop()
  }
}
