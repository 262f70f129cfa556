package graft.operators

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adversarial-input gate for the multimodal binary walks (round-17
  * order #2): `parseWav` (RIFF chunk walk), `webpDims` (container
  * header peek), `ImageDecoder.decode` (GRFT stub + javax.imageio +
  * webp fallback). These run INSIDE map tasks over data-sourced
  * bytes, so the invariant is total-function behavior: terminate on
  * every input, NEVER throw (a poisoned blob must invalidate its own
  * row, not kill the stage — the reference dies on malformed input,
  * GetJobs.py:27-34; SURVEY §1.3 quarantines instead), and any
  * `valid=true` result must be internally consistent.
  */
class MultimodalFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  private def blobGen(maxLen: Int): Gen[Array[Byte]] = for {
    n <- Gen.chooseNum(0, maxLen)
    bytes <- Gen.containerOfN[Array, Byte](n,
      Gen.chooseNum(-128, 127).map(_.toByte))
  } yield bytes

  private def wavConsistent(r: org.apache.spark.sql.Row): Unit =
    if (r.getBoolean(5)) {
      val (ch, rate, frames, dur) =
        (r.getInt(0), r.getInt(1), r.getLong(3), r.getLong(4))
      assert(ch > 0 && rate > 0 && frames >= 0,
        s"valid row with degenerate fields: $r")
      assert(dur == frames * 1000000L / rate,
        s"duration drifted from integer arithmetic: $r")
    }

  test("parseWav is total over random blobs: never throws, valid rows " +
    "are consistent") {
    (0 until 400).foreach { i =>
      val blob = sample(blobGen(512), 5000L + i)
      wavConsistent(Multimodal.parseWav(blob))
    }
  }

  test("parseWav is total over RIFF/WAVE-prefixed random tails (the " +
    "chunk walk itself under hostile sizes/fourCCs)") {
    val prefix = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++
      "WAVE".getBytes
    (0 until 400).foreach { i =>
      val tail = sample(blobGen(256), 6000L + i)
      wavConsistent(Multimodal.parseWav(prefix ++ tail))
    }
  }

  test("parseWav survives every single-byte mutation and every " +
    "truncation of a real WAV without throwing") {
    val pcm = Array.tabulate(64)(i => (i * 5).toByte)
    val wav = Multimodal.encodeWav(2, 8000, 16, pcm,
      extraChunk = Some(Array[Byte](1, 2, 3)))
    wav.indices.foreach { off =>
      val mut = wav.clone()
      mut(off) = (mut(off) ^ 0x5a).toByte
      wavConsistent(Multimodal.parseWav(mut))
    }
    (0 to wav.length).foreach { len =>
      wavConsistent(Multimodal.parseWav(
        java.util.Arrays.copyOfRange(wav, 0, len)))
    }
  }

  test("a declared chunk size overrunning the buffer invalidates the " +
    "row (no partial read served as valid)") {
    val pcm = Array.tabulate(16)(_.toByte)
    val wav = Multimodal.encodeWav(1, 8000, 8, pcm)
    // find the data chunk and inflate its size field
    val at = (0 until wav.length - 4).find(i =>
      wav(i) == 'd' && wav(i + 1) == 'a' && wav(i + 2) == 't' &&
        wav(i + 3) == 'a').get
    val mut = wav.clone()
    mut(at + 4) = 0xff.toByte
    mut(at + 5) = 0xff.toByte
    mut(at + 6) = 0xff.toByte
    mut(at + 7) = 0x7f.toByte
    val r = Multimodal.parseWav(mut)
    assert(!r.getBoolean(5), s"overrun served as valid: $r")
  }

  test("webpDims is total over random blobs and RIFF/WEBP-prefixed " +
    "random tails") {
    val prefix = "RIFF".getBytes ++ Array[Byte](0, 1, 0, 0) ++
      "WEBP".getBytes
    (0 until 400).foreach { i =>
      val blob = sample(blobGen(64), 7000L + i)
      Multimodal.webpDims(blob) // must not throw
      Multimodal.webpDims(prefix ++ blob)
      ()
    }
  }

  test("ImageDecoder.decode is total: random blobs, GRFT-prefixed " +
    "hostile headers, and truncated real PNGs all yield rows, " +
    "never throws") {
    (0 until 200).foreach { i =>
      val blob = sample(blobGen(128), 8000L + i)
      Multimodal.ImageDecoder.decode(blob)
      Multimodal.ImageDecoder.decode(
        Multimodal.MagicBytes ++ blob) // hostile stub header
      ()
    }
    // a real PNG truncated at every length: imageio must be contained
    val png = {
      val img = new java.awt.image.BufferedImage(4, 3,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    (0 to png.length by 7).foreach { len =>
      Multimodal.ImageDecoder.decode(
        java.util.Arrays.copyOfRange(png, 0, len))
      ()
    }
  }

  test("the fuzz surfaces hold inside Spark tasks: a poisoned corpus " +
    "maps to invalid rows, the stage completes") {
    import spark.implicits._
    val rows = (0 until 64).map { i =>
      (i.toLong, sample(blobGen(96), 40000L + i))
    }
    val df = rows.toDF("id", "bytes")
    val wav = Multimodal.wavMeta(df, "id", "bytes").collect()
    assert(wav.length == 64)
    val img = Multimodal.decodeImages(df, "id", "bytes").collect()
    assert(img.length == 64)
    val rs = Multimodal.resizeImages(df, "id", "bytes", 2, 2).collect()
    assert(rs.length == 64)
  }
}
