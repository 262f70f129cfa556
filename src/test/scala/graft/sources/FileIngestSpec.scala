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

  test("recursive keyed keeps distinct keys for same-name nested files") {
    val dir = Files.createTempDirectory("graft-scan3-")
    Files.createDirectories(dir.resolve("a"))
    Files.createDirectories(dir.resolve("b"))
    Files.write(dir.resolve("a/data.txt"), "A".getBytes)
    Files.write(dir.resolve("b/data.txt"), "B".getBytes)
    val got = FileIngest.keyed(
      FileIngest.readDir(spark, dir.toString, recursive = true),
      baseDir = Some(dir.toString))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("a/data.txt", "b/data.txt"))
  }

  test("keyed strips only the leading base-dir prefix, not a repeated segment") {
    // base dir name repeats inside the relative path: a greedy
    // last-occurrence strip would collapse the key to bare "data.txt"
    val root = Files.createTempDirectory("graft-scan4-")
    val dir = root.resolve("data")
    Files.createDirectories(dir.resolve("data"))
    Files.write(dir.resolve("data/data.txt"), "x".getBytes)
    val got = FileIngest.keyed(
      FileIngest.readDir(spark, dir.toString, recursive = true),
      baseDir = Some(dir.toString))
      .collect().map(_.getString(0)).toSet
    assert(got == Set("data/data.txt"))
  }

  test("keyed fails loudly when a scan path is outside the base dir") {
    // The silent alternative — falling back to the bare basename —
    // would collapse every distinct key onto its basename and let the
    // named sink overwrite outputs. Misconfiguration must throw.
    val dir = Files.createTempDirectory("graft-scan5-")
    val other = Files.createTempDirectory("graft-scan6-")
    Files.write(dir.resolve("a.txt"), "A".getBytes)
    val ex = intercept[Exception] {
      FileIngest.keyed(
        FileIngest.readDir(spark, dir.toString),
        baseDir = Some(other.toString)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("outside base dir")),
      s"unexpected failure: $ex")
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
