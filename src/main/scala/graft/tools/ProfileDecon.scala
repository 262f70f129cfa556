package graft.tools

import org.apache.spark.sql.functions._

import graft.Engine
import graft.functions.TextFunctions

/** Dev profiling harness for the c05 decontamination stages. */
object ProfileDecon {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "profile-decon")
    val docs = Engine.Tables(spark, dir).documents

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    docs.count() // warm scan/listing

    time("explode shingles")(noop(
      docs.select(explode(TextFunctions.shingles(col("text"), 3)))))
    time("explode array_distinct shingles")(noop(
      docs.select(explode(
        array_distinct(TextFunctions.shingles(col("text"), 3))))))

    val d = docs.select(col("doc_id"),
      array_distinct(TextFunctions.shingles(col("text"), 3)).as("ng"))
    val evalNg = d.filter(col("doc_id") % 97 === 0)
      .select(explode(col("ng")).as("ngram")).distinct()
    time("evalNg distinct")(noop(evalNg))
    time("full c05")(noop(
      d.filter(col("doc_id") % 97 =!= 0)
        .select(col("doc_id"), explode(col("ng")).as("ngram"))
        .join(broadcast(evalNg), Seq("ngram"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))))
    spark.stop()
  }
}
