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
      Formats.save(df, fmt, out)
      val back = Formats.load(spark, fmt, out)
      assert(back.count() == src.count(), s"format=$fmt")
      if (fmt == "parquet" || fmt == "orc") {
        // columnar formats preserve schema exactly
        assert(back.schema == src.schema, s"format=$fmt schema")
      }
      if (fmt == "avro") {
        // avro preserves names/types; values must round-trip exactly
        assert(back.schema.map(f => (f.name, f.dataType)) ==
          src.schema.map(f => (f.name, f.dataType)), "avro schema")
        assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty,
          "avro values")
      }
    }
  }

  test("avro round-trips the full type surface incl. nulls and nesting") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro-types-").toString
    val df = Seq(
      (1L, Some(3.5), "a", Seq(1, 2, 3),
        java.sql.Date.valueOf("2026-08-12"),
        java.sql.Timestamp.valueOf("2026-08-12 10:20:30.123456"),
        Array[Byte](1, 2, 3), Some(("x", 7))),
      (2L, None, "b", Seq.empty[Int],
        java.sql.Date.valueOf("1969-12-31"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5"),
        Array.empty[Byte], None)
    ).toDF("id", "score", "name", "xs", "d", "ts", "bin", "nested")
    AvroFormat.write(df, s"$dir/t")
    val back = AvroFormat.read(spark, s"$dir/t")
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("avro honors an external writer's timestamp-millis logical type") {
    import org.apache.avro.{LogicalTypes, Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // simulate a foreign system (Kafka Connect / Hive style) writing
    // long + timestamp-millis — NOT the micros this engine writes
    val ts = Schema.create(Schema.Type.LONG)
    LogicalTypes.timestampMillis().addToSchema(ts)
    val schema = SchemaBuilder.record("ext").fields()
      .requiredLong("id")
      .name("t").`type`(ts).noDefault()
      .endRecord()
    val dir = Files.createTempDirectory("graft-avro-millis-")
    val f = dir.resolve("part-0.avro").toFile
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    val rec = new GenericData.Record(schema)
    rec.put("id", 1L)
    rec.put("t", 1765000000123L) // epoch MILLIS
    w.append(rec)
    w.close()
    val back = AvroFormat.read(spark, dir.toString).collect()
    assert(back.length == 1)
    val got = back.head.getTimestamp(1)
    assert(got.getTime == 1765000000123L,
      s"millis mis-scaled: ${got.getTime}")
  }

  test("avro read parallelizes across files (splittable input format)") {
    val src = graft.Engine.Tables(spark, "/root/testdata/sf0.001")
      .lineitem.repartition(4)
    val dir = Files.createTempDirectory("graft-avro-split-").toString
    AvroFormat.write(src, s"$dir/t")
    val back = AvroFormat.read(spark, s"$dir/t")
    // 4 part files -> at least 4 input partitions; counts and a
    // numeric aggregate must agree exactly
    assert(back.rdd.getNumPartitions >= 4)
    val a = back.agg(sum("l_quantity")).head.get(0)
    val b = src.agg(sum("l_quantity")).head.get(0)
    assert(a == b && back.count() == src.count())
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

  test("gzip-compressed text/json/csv read transparently by extension") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-gz-").toString
    val lines = (0 until 100).map(i => s"""{"id":$i,"v":"row $i"}""")
    val gz = new java.io.PrintWriter(new java.util.zip.GZIPOutputStream(
      new java.io.FileOutputStream(s"$dir/part-0.json.gz")))
    lines.foreach(gz.println)
    gz.close()
    // codec picked from the .gz extension: no options, no special path.
    // (At 100 TB the flip side matters too: gzip splits per FILE, not
    // per block — a single giant .gz is one task; land many medium
    // files or recompress. Layout.compact is the repair.)
    assert(spark.read.text(dir).count() == 100)
    val js = spark.read.json(dir)
    assert(js.count() == 100 &&
      js.agg(sum("id")).head.getLong(0) == 4950L)
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-evo-").toString
    // v1 files lack the column a later producer added
    Seq((1L, "a")).toDF("id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((2L, "b", "en")).toDF("id", "text", "lang")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "text", "lang", "batch"))
    // old rows surface the new column as null, not an error
    val v1 = merged.filter(col("id") === 1).select("lang").head
    assert(v1.isNullAt(0))
    assert(merged.count() == 2)
  }
}
