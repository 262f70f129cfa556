package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FileIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readDir sees all files including zero-length ones") {
    val dir = Files.createTempDirectory("graft-scan-")
    Files.write(dir.resolve("a.txt"), "abc".getBytes)
    Files.write(dir.resolve("empty.bin"), Array.empty[Byte])
    val got = FileIngest.keyed(FileIngest.readDir(spark, dir.toString))
      .collect().map(r => r.getString(0) ->
        Option(r.getAs[Array[Byte]](1)).map(_.length)).toMap
    assert(got.keySet == Set("a.txt", "empty.bin"))
    assert(got("a.txt").contains(3))
  }

  test("glob filter and manifest naming") {
    val dir = Files.createTempDirectory("graft-scan2-")
    Files.write(dir.resolve("x.txt"), "x".getBytes)
    Files.write(dir.resolve("y.dat"), "y".getBytes)
    val files = FileIngest.readDir(spark, dir.toString, glob = Some("*.txt"))
    val m = FileIngest.manifest(files, "bkt", "in/", "out/").collect()
    assert(m.map(_.getAs[String]("fileName")).toSeq == Seq("x.txt"))
    assert(m.head.getAs[String]("envelope") ==
      """["process","bkt","in/","out/","x.txt"]""")
  }
}
