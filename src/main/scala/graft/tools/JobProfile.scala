package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

import graft.{Engine, SparkEntry}

/** Per-job wall-clock attribution for one registered query:
  * `sbt "runMain graft.tools.JobProfile [-d <sfDir>] <query> [reps]"`.
  *
  * Registers a SparkListener, runs the query through the bench's noop
  * sink, and prints every Spark job's duration plus the driver-side
  * GAP since the previous job ended (planning, codegen, fs metadata,
  * driver-local derivation). The gap column is the part no stage
  * metric ever shows — at micro-batch scale it is routinely the
  * majority term, and it is exactly what guide §7.3 says to hunt with
  * thread dumps; this prints it per job instead.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val (dir, rest) = args.toList match {
      case "-d" :: d :: r => (d, r)
      case r => ("/root/testdata/sf0.1", r)
    }
    val name = rest.headOption.getOrElse(
      throw new IllegalArgumentException("usage: JobProfile <query>"))
    val reps = rest.lift(1).map(_.toInt).getOrElse(2)
    val spark = Engine.session(appName = s"graft-jobprofile-$name")
    val q = SparkEntry.queries(name)

    @volatile var lastEnd = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Long, String)]()
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val gap = if (lastEnd == 0) 0L else js.time - lastEnd
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (js.time, gap, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        lastEnd = je.time
        Option(starts.remove(je.jobId)).foreach { case (t0, gap, desc) =>
          lines.add(f"[job] ${je.jobId}%4d run=${(je.time - t0) / 1e3}%7.3f " +
            f"gap=${gap / 1e3}%7.3f  $desc%.80s")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      lines.clear()
      lastEnd = 0L
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Engine.releaseCheckpoints(spark)
      Thread.sleep(200) // let listener events drain
      import scala.jdk.CollectionConverters._
      val ls = lines.asScala.toSeq
      println(s"==== $name rep $i: wall=$wall s, jobs=${ls.size}")
      ls.foreach(println)
      val runSum = ls.map(_.split("run=")(1).trim.split(" ")(0).toDouble).sum
      val gapSum = ls.map(_.split("gap=")(1).trim.split(" ")(0).toDouble).sum
      println(f"==== sum(job run)=$runSum%.2f s  sum(gap)=$gapSum%.2f s  " +
        f"wall=$wall%.2f s")
    }
    spark.stop()
  }
}
