package graft.tools

import graft.{Engine, SparkEntry}

/** Write `.explain("formatted")` for registered queries to files —
  * the optimization-round evidence trail:
  * `sbt "runMain graft.tools.PlanDump <outDir> <suffix> <query>..."`
  * writes `<outDir>/<query>_<suffix>.txt` for each query (sfDir via
  * `-d`, default sf0.001 — plan SHAPE is scale-free; the driver's
  * data dir works too when a plan's literals matter).
  *
  * Queries that run SIDE EFFECTS before returning their frame (the
  * sync sinks, the ANN artifact queries) execute those effects here —
  * the dumped plan is the final read, which is exactly the part whose
  * shape the bench's noop sink times last; the per-batch write plans
  * are pinned by PlanShapeSpec instead.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val (dir, rest) = args.toList match {
      case "-d" :: d :: r => (d, r)
      case r => ("/root/testdata/sf0.001", r)
    }
    val outDir = rest.head
    val suffix = rest(1)
    val names = rest.drop(2)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val spark = Engine.session(appName = "graft-plandump")
    names.foreach { n =>
      val q = SparkEntry.queries.getOrElse(n,
        throw new IllegalArgumentException(s"unknown query $n"))
      val plan = q(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
      Engine.releaseCheckpoints(spark)
    }
    spark.stop()
  }
}
