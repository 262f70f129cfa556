package graft.sources

import java.io.ByteArrayOutputStream

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adversarial-input gate for the USTAR surfaces (round-17 order #2):
  * systematic hostile bytes against `unpack`/`scanEntries` (header
  * walk), `readMembersByName` (sidecar-driven seeks), `readIndex`
  * (sidecar text), and `writeShards` (data-derived file names). One
  * invariant everywhere: LOUD error or CORRECT parse — never a hang,
  * never silent truncation/misparse, never a filesystem path escape,
  * never an attacker-controlled multi-GiB allocation. This is the
  * reference's malformed-message semantics (GetJobs.py:27-34 dies on
  * them; SURVEY §1.3 commits us to loud quarantine) applied to the
  * engine's own binary container.
  *
  * Raw ScalaCheck generators with fixed seeds — the repo's offline
  * property-spec pattern (deterministic, replayable failures).
  */
class TarFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private def members: Seq[(String, Array[Byte])] = Seq(
    "a.txt" -> "alpha payload".getBytes("UTF-8"),
    "b.bin" -> Array.tabulate(700)(i => (i * 31).toByte),
    "c/d.json" -> """{"k":1}""".getBytes("UTF-8"))

  private def valid: Array[Byte] = TarShards.pack(members.iterator)

  /** Run unpack to exhaustion, classifying the outcome. */
  private def outcome(tar: Array[Byte])
      : Either[Throwable, Seq[(String, Array[Byte])]] =
    try Right(TarShards.unpack(tar).toList)
    catch { case t: Throwable => Left(t) }

  private def isLoud(t: Throwable): Boolean =
    t.isInstanceOf[IllegalArgumentException]

  test("random byte blobs: unpack terminates with members or a LOUD " +
    "IllegalArgumentException; returned payloads never exceed input") {
    val gen = for {
      n <- Gen.chooseNum(0, 4096)
      bytes <- Gen.containerOfN[Array, Byte](n, Gen.chooseNum(-128, 127)
        .map(_.toByte))
    } yield bytes
    (0 until 300).foreach { i =>
      val blob = sample(gen, 9000L + i)
      outcome(blob) match {
        case Left(t) =>
          assert(isLoud(t),
            s"blob#$i: non-loud failure ${t.getClass.getName}: " +
              s"${t.getMessage}")
        case Right(ms) =>
          val total = ms.map(_._2.length.toLong).sum
          assert(total <= blob.length,
            s"blob#$i: silent over-read — $total payload bytes out " +
              s"of a ${blob.length}-byte input")
      }
    }
  }

  test("single-byte mutations of a valid archive: loud failure, or a " +
    "parse whose member names and sizes match the original (payload " +
    "flips change content only)") {
    val base = valid
    val origShape = members.map { case (n, b) => (n, b.length) }
    // every header byte of member 1, a sample of payload/pad/trailer
    val offsets = (0 until 512) ++
      (512 until base.length by 97) ++ Seq(base.length - 1)
    offsets.foreach { off =>
      val mut = base.clone()
      mut(off) = (mut(off) ^ 0x5a).toByte
      outcome(mut) match {
        case Left(t) =>
          assert(isLoud(t), s"offset $off: ${t.getClass.getName}")
        case Right(ms) =>
          assert(ms.map { case (n, b) => (n, b.length) } == origShape,
            s"offset $off: silent shape change — " +
              s"${ms.map(_._1)} vs ${origShape.map(_._1)}")
      }
    }
  }

  // --- crafted checksum-valid hostile headers -------------------

  /** Rewrite the checksum of a 512-byte header block in place so the
    * hostile field under test is reached (a wrong checksum would mask
    * it with the checksum error).
    */
  private def reChecksum(h: Array[Byte]): Unit = {
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0
    var i = 0
    while (i < 512) { sum += h(i) & 0xff; i += 1 }
    val oct = f"$sum%06o".getBytes("UTF-8")
    System.arraycopy(oct, 0, h, 148, 6)
    h(154) = 0
    h(155) = ' '
  }

  private def withSizeField(sizeField: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    TarShards.writeMember(out, "hostile.bin", Array[Byte](1, 2, 3))
    TarShards.writeTrailer(out)
    val tar = out.toByteArray
    val f = sizeField.getBytes("UTF-8")
    java.util.Arrays.fill(tar, 124, 136, 0.toByte)
    System.arraycopy(f, 0, tar, 124, f.length)
    val h = java.util.Arrays.copyOfRange(tar, 0, 512)
    reChecksum(h)
    System.arraycopy(h, 0, tar, 0, 512)
    tar
  }

  test("a checksum-valid header whose size field lies (8.5 GB declared " +
    "over a 3-byte body) fails LOUDLY without an attacker-sized " +
    "allocation") {
    val e = intercept[IllegalArgumentException] {
      TarShards.unpack(withSizeField("77777777777")).toList
    }
    assert(e.getMessage.contains("2 GiB") ||
      e.getMessage.contains("truncated"), e.getMessage)
  }

  test("a checksum-valid header with a 100 MB lie over a tiny body " +
    "fails loudly as truncated (chunked read, not exact-alloc-then-EOF)") {
    val e = intercept[IllegalArgumentException] {
      TarShards.unpack(withSizeField("00600000000")).toList
    }
    assert(e.getMessage.contains("truncated"), e.getMessage)
  }

  test("non-octal garbage in a checksum-valid size field fails loudly " +
    "instead of silently misparsing the digits around it") {
    val e = intercept[IllegalArgumentException] {
      TarShards.unpack(withSizeField("12x4")).toList
    }
    assert(e.getMessage.contains("malformed size field"), e.getMessage)
  }

  test("scanEntries applies the same strict-size discipline") {
    val e = intercept[IllegalArgumentException] {
      TarShards.scanEntries(new java.io.ByteArrayInputStream(
        withSizeField("12x4"))).toList
    }
    assert(e.getMessage.contains("malformed size field"), e.getMessage)
  }

  test("leading-space-padded octal size (older tar writers right-" +
    "justify with spaces) is checksum-valid and unambiguous: it " +
    "parses, and digits AFTER a terminator still fail loudly") {
    val ms = TarShards.unpack(withSizeField("          3")).toList
    assert(ms.map(_._1) == List("hostile.bin"))
    assert(ms.head._2.toSeq == Seq[Byte](1, 2, 3))
    // a space BETWEEN digits terminates; more digits after it are
    // still the malformed class, not a second number
    val e = intercept[IllegalArgumentException] {
      TarShards.unpack(withSizeField("1 3")).toList
    }
    assert(e.getMessage.contains("malformed size field"), e.getMessage)
  }

  test("GNU base-256 size encoding (0x80-flagged first byte, >8 GiB " +
    "members) fails with its OWN loud message — a real encoding we " +
    "do not support, not generic corruption") {
    val tar = withSizeField("00000000003")
    tar(124) = 0x80.toByte // flag byte of a base-256 size
    val h = java.util.Arrays.copyOfRange(tar, 0, 512)
    reChecksum(h)
    System.arraycopy(h, 0, tar, 0, 512)
    val e = intercept[IllegalArgumentException] {
      TarShards.unpack(tar).toList
    }
    assert(e.getMessage.contains("base-256"), e.getMessage)
  }

  test("a member named ../../etc/passwd is DATA, not a path: unpack " +
    "returns it verbatim and nothing touches the filesystem") {
    val out = new ByteArrayOutputStream()
    TarShards.writeMember(out, "../../etc/passwd", "x".getBytes)
    TarShards.writeTrailer(out)
    val ms = TarShards.unpack(out.toByteArray).toList
    assert(ms.map(_._1) == List("../../etc/passwd"))
  }

  test("writeShards refuses a shard key containing a path separator " +
    "LOUDLY — a data-derived key must never escape outDir") {
    import spark.implicits._
    val outDir = java.nio.file.Files
      .createTempDirectory("tarfuzz-escape-").toString
    val df = Seq(("a.txt", "x".getBytes, "../escape"))
      .toDF("name", "bytes", "shard")
    val e = intercept[Exception] {
      TarShards.writeShards(df, "name", "bytes", "shard", outDir)
        .collect()
    }
    def hasLoud(t: Throwable): Boolean =
      t != null && ((t.getMessage != null &&
        t.getMessage.contains("not a safe file-name component")) ||
        hasLoud(t.getCause))
    assert(hasLoud(e), s"expected the loud shard-key refusal: $e")
    // nothing escaped: the parent of outDir gained no tar artifacts
    val parent = java.nio.file.Paths.get(outDir).getParent
    val escaped = java.nio.file.Files.list(parent).iterator()
    val bad = scala.jdk.CollectionConverters
      .IteratorHasAsScala(escaped).asScala
      .map(_.getFileName.toString)
      .filter(n => n.contains("escape") && n.contains(".tar")).toList
    assert(bad.isEmpty, s"escaped artifacts: $bad")
  }

  test("hostile index sidecar lines (garbage offsets, bad encoding, " +
    "missing fields) fail LOUDLY at read, never a silent skip") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("tarfuzz-idx-").toString
    val df = Seq(("a.txt", "x".getBytes, "s"))
      .toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", dir).collect()
    val hostileLines = Seq(
      "notanumber\t3\ta.txt",
      "0\t-9999999999999999999999\ta.txt",
      "0",
      "0\t3\t%zz")
    hostileLines.zipWithIndex.foreach { case (line, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "shard-s.tar.idx"),
        (line + "\n").getBytes("UTF-8"))
      val got =
        try { Left(TarShards.readIndex(spark, dir).collect().toSeq) }
        catch { case t: Throwable => Right(t) }
      got match {
        case Right(_) => () // loud — any throw is acceptable here
        case Left(rows) =>
          fail(s"hostile sidecar line #$i ('$line') parsed silently: " +
            s"$rows")
      }
    }
  }

  test("readMembersByName against a sidecar whose offset points into " +
    "payload bytes fails loudly (header checksum), never returns a " +
    "wrong member") {
    import spark.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("tarfuzz-seek-").toString
    val df = Seq(("a.txt", Array.fill(600)(7.toByte), "s"))
      .toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", dir).collect()
    // offset 512 = inside the payload, not a header boundary
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "shard-s.tar.idx"),
      "512\t600\ta.txt\n".getBytes("UTF-8"))
    val e = intercept[Exception] {
      TarShards.readMembersByName(spark, dir, Seq("a.txt")).collect()
    }
    def loud(t: Throwable): Boolean =
      t != null && ((t.getMessage != null &&
        (t.getMessage.contains("checksum") ||
          t.getMessage.contains("stale shard index") ||
          t.getMessage.contains("malformed size field"))) ||
        loud(t.getCause))
    assert(loud(e), s"expected a loud header/stale failure: $e")
  }
}
