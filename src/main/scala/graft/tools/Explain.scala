package graft.tools

import graft.{Engine, SparkEntry}

/** Print the executed plan of one or more registered queries —
  * `sbt "runMain graft.tools.Explain q03_join_broadcast d15_jaro_linkage"`
  * (optionally `-d <sfDir>` first; defaults to sf0.001 so plan shapes
  * print fast). The plan-review loop's CLI counterpart to
  * PlanShapeSpec's pinned assertions.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (dir, names) = args.toList match {
      case "-d" :: d :: rest => (d, rest)
      case rest => ("/root/testdata/sf0.001", rest)
    }
    val spark = Engine.session(appName = "graft-explain")
    names.foreach { n =>
      val q = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(
          s"unknown query $n — valid: ${SparkEntry.queries.keys.mkString(", ")}"))
      println(s"\n========== $n ==========")
      println(q(spark, dir).queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
