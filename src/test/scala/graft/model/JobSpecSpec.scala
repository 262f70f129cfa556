package graft.model

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class JobSpecSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def envDf(envelopes: String*) =
    spark.createDataFrame(
      java.util.Arrays.asList(envelopes.map(Row(_)): _*),
      StructType(Seq(StructField("envelope", StringType))))

  test("envelope round-trip preserves all five fields") {
    import spark.implicits._
    val jobs = Seq(
      JobSpec("process", "b", "in/", "out/", "f1.txt"),
      JobSpec("process", "b", "in/", "out/", "weird name \"quoted\".bin"))
    val env = jobs.toDF().select(JobSpec.toEnvelope(
      col("action"), col("bucket"), col("inputPrefix"),
      col("outputPrefix"), col("fileName")).as("envelope"))
    val back = env.select(JobSpec.fromEnvelope(col("envelope")).as("j"))
      .select("j.*").as[JobSpec].collect().toSeq
    assert(back == jobs)
  }

  test("wire format is the reference's positional JSON array") {
    import spark.implicits._
    val env = Seq(JobSpec("process", "b", "i/", "o/", "f")).toDF()
      .select(JobSpec.toEnvelope(col("action"), col("bucket"),
        col("inputPrefix"), col("outputPrefix"), col("fileName")))
      .head().getString(0)
    assert(env == """["process","b","i/","o/","f"]""")
  }

  test("malformed / unknown-action envelopes are quarantined, not fatal") {
    val parsed = envDf(
      """["process","b","i/","o/","good"]""",
      """["reboot","b","i/","o/","badaction"]""",
      """not json at all""",
      """["process"]""")
      .select(JobSpec.fromEnvelope(col("envelope")).as("j")).select("j.*")
    val (ok, bad) = JobSpec.dispatch(parsed)
    assert(ok.collect().map(_.getString(4)).toSeq == Seq("good"))
    assert(bad.count() == 3)
  }
}
