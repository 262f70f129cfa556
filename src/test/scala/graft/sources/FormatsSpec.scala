package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("every supported format round-trips the nation table") {
    val src = graft.Engine.Tables(spark, "/root/testdata/sf0.001").nation
    Formats.supported.foreach { fmt =>
      val dir = Files.createTempDirectory(s"graft-fmt-$fmt-").toString
      val out = s"$dir/t"
      // text format needs a single string column
      val df = if (fmt == "text")
        src.select(concat_ws("|", src.columns.map(col): _*).as("value"))
      else src
      Formats.write(df, fmt).save(out)
      val back = Formats.read(spark, fmt).load(out)
      assert(back.count() == src.count(), s"format=$fmt")
      if (fmt == "parquet" || fmt == "orc") {
        // columnar formats preserve schema exactly
        assert(back.schema == src.schema, s"format=$fmt schema")
      }
    }
  }
}
