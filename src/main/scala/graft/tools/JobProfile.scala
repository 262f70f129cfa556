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

    // Per-job (start, end, desc) tuples; gaps derive from the SORTED
    // timeline after the run (r18 advice: the old single @volatile
    // lastEnd misassigned or went negative under concurrent jobs —
    // AQE stages, parallel writes — and the summary re-parsed this
    // tool's own formatted lines).
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        Option(starts.remove(je.jobId)).foreach { case (t0, desc) =>
          jobs.add((je.jobId, t0, je.time, desc))
        }
    }
    spark.sparkContext.addSparkListener(listener)
    (1 to reps).foreach { i =>
      jobs.clear()
      val t0 = System.nanoTime()
      q(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Engine.releaseCheckpoints(spark)
      Thread.sleep(200) // let listener events drain
      import scala.jdk.CollectionConverters._
      val ls = jobs.asScala.toSeq.sortBy(_._2)
      println(s"==== $name rep $i: wall=$wall s, jobs=${ls.size}")
      // driver gap per job = start minus the latest end among jobs
      // that started earlier (never negative under overlap); idle sum
      // = wall minus the union of job intervals, so concurrent jobs
      // are not double-counted as busy either
      var runningEnd = 0L
      val withGaps = ls.map { case (id, s, e, desc) =>
        val gap = if (runningEnd == 0L) 0.0
          else math.max(0L, s - runningEnd) / 1e3
        runningEnd = math.max(runningEnd, e)
        (id, s, e, desc, gap)
      }
      withGaps.foreach { case (id, s, e, desc, gap) =>
        println(f"[job] $id%4d run=${(e - s) / 1e3}%7.3f " +
          f"gap=$gap%7.3f  $desc%.80s")
      }
      val runSum = ls.map(t => (t._3 - t._2) / 1e3).sum
      val gapSum = withGaps.map(_._5).sum
      println(f"==== sum(job run)=$runSum%.2f s  sum(gap)=$gapSum%.2f s  " +
        f"wall=$wall%.2f s")
    }
    spark.stop()
  }
}
