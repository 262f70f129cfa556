package graft.tools

import java.nio.file.{Files, Paths}

import graft.Engine
import graft.operators.BatchPipeline

/** End-to-end demo of the bounded quarantine retry: a picky command
  * fails on empty files; a retry with the fixed command drains the
  * quarantine. `sbt "runMain graft.tools.RetryDemo"`.
  */
object RetryDemo {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session(appName = "graft-retry-demo")
    val in = Files.createTempDirectory("retry-in-")
    val out = Files.createTempDirectory("retry-out-").toString
    Files.write(in.resolve("good.txt"), "payload".getBytes)
    Files.write(in.resolve("empty.txt"), Array.empty[Byte])

    val picky = Seq("sh", "-c", """test -s "$1" && cp "$1" "$2"""", "sel")
    val r0 = BatchPipeline.run(spark, in.toString, out, picky)
    println(s"[demo] initial run: processed=${r0.processed} failed=${r0.failed}")
    println("[demo] quarantine after run:")
    spark.read.parquet(BatchPipeline.quarantineDir(out)).show(false)

    val r1 = BatchPipeline.retryQuarantine(spark, in.toString, out, Seq("cp"))
    println(s"[demo] retry with fixed command: processed=${r1.processed} failed=${r1.failed}")
    println("[demo] published: " +
      Paths.get(out).toFile.list().sorted.mkString(", "))
    println("[demo] quarantine rows remaining: " +
      spark.read.parquet(BatchPipeline.quarantineDir(out)).count())
    spark.stop()
  }
}
