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

  test("image datasource reads a PNG dir; dims agree with ImageDecoder") {
    val dir = Files.createTempDirectory("graft-imgsrc-")
    val img = new java.awt.image.BufferedImage(
      13, 7, java.awt.image.BufferedImage.TYPE_INT_RGB)
    javax.imageio.ImageIO.write(img, "png", dir.resolve("a.png").toFile)
    val rows = Formats.readOnlyReader(spark, "image").load(dir.toString)
      .select("image.width", "image.height", "image.nChannels").collect()
    assert(rows.length == 1)
    assert(rows.head.getInt(0) == 13 && rows.head.getInt(1) == 7)
    // and the binaryFile path through our own decoder agrees
    val viaDecoder = graft.operators.Multimodal.decodeImages(
      graft.sources.FileIngest.keyed(
        FileIngest.readDir(spark, dir.toString)).withColumnRenamed("content", "img"),
      "key", "img").collect().head
    assert(viaDecoder.getInt(1) == 13 && viaDecoder.getInt(2) == 7)
  }
}
