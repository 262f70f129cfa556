package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def images = {
    val rows = Seq(
      (1L, Multimodal.encodeFakeImage(640, 480, "png",
        Array.fill[Byte](100)(7))),
      (2L, Multimodal.encodeFakeImage(32, 32, "webp",
        Array.empty[Byte])),
      (3L, "not an image at all".getBytes),
      (4L, null.asInstanceOf[Array[Byte]]))
    rows.toDF("id", "img")
  }

  test("batched decode: valid headers parsed, garbage/null flagged not thrown") {
    val got = Multimodal.decodeImages(images, "id", "img", batchSize = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getInt(1) == 640 && got(1L).getInt(2) == 480 &&
      got(1L).getString(3) == "png" && got(1L).getLong(4) == 100L &&
      got(1L).getBoolean(5))
    assert(got(2L).getString(3) == "webp" && got(2L).getLong(4) == 0L)
    assert(!got(3L).getBoolean(5) && got(3L).isNullAt(1))
    assert(!got(4L).getBoolean(5) && got(4L).getLong(4) == 0L)
  }

  test("resize rewrites header only; decode sees new dims, same payload") {
    val resized = Multimodal.resizeImages(images, "id", "img", 100, 50)
    val meta = Multimodal.decodeImages(resized, "id", "image")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(meta(1L).getInt(1) == 100 && meta(1L).getInt(2) == 50)
    assert(meta(1L).getLong(4) == 100L) // payload untouched
    assert(!meta(3L).getBoolean(5))     // garbage passes through
  }

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 7) & 0xffffff)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  test("real PNG bytes decode via JDK imageio: dims + format, no stub header") {
    val df = Seq((10L, realPng(17, 9)), (11L, realPng(3, 5)))
      .toDF("id", "img")
    val got = Multimodal.decodeImages(df, "id", "img")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(10L).getInt(1) == 17 && got(10L).getInt(2) == 9)
    assert(got(10L).getString(3) == "png" && got(10L).getBoolean(5))
    assert(got(11L).getInt(1) == 3 && got(11L).getInt(2) == 5)
  }

  // hand-built WebP container headers (RFC 9649 layout) — the JDK has
  // no webp codec, so these exercise the header-parse path
  private def webpBytes(variant: String, w: Int, h: Int): Array[Byte] = {
    val payload: Array[Byte] = variant match {
      case "VP8 " =>
        // 3-byte frame tag, sync code 9D 01 2A, LE u16 dims
        Array[Byte](0, 0, 0, 0x9d.toByte, 0x01, 0x2a,
          (w & 0xff).toByte, ((w >> 8) & 0x3f).toByte,
          (h & 0xff).toByte, ((h >> 8) & 0x3f).toByte)
      case "VP8L" =>
        val bits = (w - 1) | ((h - 1) << 14)
        Array[Byte](0x2f,
          (bits & 0xff).toByte, ((bits >> 8) & 0xff).toByte,
          ((bits >> 16) & 0xff).toByte, ((bits >> 24) & 0xff).toByte)
      case "VP8X" =>
        Array[Byte](0, 0, 0, 0,
          ((w - 1) & 0xff).toByte, (((w - 1) >> 8) & 0xff).toByte,
          (((w - 1) >> 16) & 0xff).toByte,
          ((h - 1) & 0xff).toByte, (((h - 1) >> 8) & 0xff).toByte,
          (((h - 1) >> 16) & 0xff).toByte)
    }
    val bb = java.nio.ByteBuffer.allocate(20 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII"))
    bb.putInt(12 + payload.length)
    bb.put("WEBP".getBytes("US-ASCII"))
    bb.put(variant.getBytes("US-ASCII"))
    bb.putInt(payload.length)
    bb.put(payload)
    bb.array()
  }

  test("webp dims parse from the RIFF header: lossy, lossless, extended") {
    val df = Seq(
      (30L, webpBytes("VP8 ", 320, 240)),
      (31L, webpBytes("VP8L", 1, 16383)),
      (32L, webpBytes("VP8X", 65536, 7))).toDF("id", "img")
    val got = Multimodal.decodeImages(df, "id", "img")
      .collect().map(r => r.getLong(0) -> r).toMap
    for ((id, w, h) <- Seq((30L, 320, 240), (31L, 1, 16383),
        (32L, 65536, 7))) {
      assert(got(id).getInt(1) == w && got(id).getInt(2) == h,
        s"id=$id got ${got(id)}")
      assert(got(id).getString(3) == "webp" && got(id).getBoolean(5))
    }
    // corrupt sync code -> invalid, not thrown
    val bad = webpBytes("VP8 ", 10, 10)
    bad(23) = 0
    val badRow = Multimodal.decodeImages(
      Seq((33L, bad)).toDF("id", "img"), "id", "img").collect().head
    assert(!badRow.getBoolean(5))
  }

  test("real PNG resize actually resamples and re-encodes") {
    val df = Seq((20L, realPng(16, 16))).toDF("id", "img")
    val resized = Multimodal.resizeImages(df, "id", "img", 8, 4)
    val meta = Multimodal.decodeImages(resized, "id", "image")
      .collect().head
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 4)
    assert(meta.getString(3) == "png" && meta.getBoolean(5))
  }

  test("image features: exact channel means on a two-color PNG") {
    // left half solid red, right half solid blue, 8x4
    val img = new java.awt.image.BufferedImage(
      8, 4, java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 8).foreach(x => (0 until 4).foreach(y =>
      img.setRGB(x, y, if (x < 4) 0xff0000 else 0x0000ff)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val df = Seq((1L, baos.toByteArray)).toDF("id", "img")
    val r = Multimodal.imageFeatures(df, "id", "img").collect().head
    assert(r.getInt(1) == 8 && r.getInt(2) == 4)
    assert(r.getDouble(3) == 127.5)  // mean_r: half 255, half 0
    assert(r.getDouble(4) == 0.0)    // no green anywhere
    assert(r.getDouble(5) == 127.5)  // mean_b
    assert(math.abs(r.getDouble(6) - (0.299 + 0.114) * 127.5) < 1e-9)
    assert(r.getBoolean(7))
  }

  test("image features: GRFT stub reports mean payload byte") {
    val payload = Array[Byte](0, 100, -56) // unsigned: 0, 100, 200
    val df = Seq((2L, Multimodal.encodeFakeImage(4, 2, "png", payload)))
      .toDF("id", "img")
    val r = Multimodal.imageFeatures(df, "id", "img").collect().head
    assert(r.getInt(1) == 4 && r.getInt(2) == 2)
    assert(r.getDouble(3) == 100.0)
    assert(r.getBoolean(7))
  }

  test("frame sampling emits every Nth fixed-size frame") {
    val v = Seq((9L, Multimodal.encodeFakeImage(1, 1, "png",
      Array.tabulate[Byte](100)(_.toByte)))).toDF("id", "vid")
    val frames = Multimodal.sampleFrames(v, "id", "vid",
      frameBytes = 10, everyN = 3).collect()
    // 10 frames, every 3rd: idx 0,3,6,9
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 3, 6, 9))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 10))
    val f3 = frames.find(_.getInt(1) == 3).get.getAs[Array[Byte]](2)
    assert(f3.head == 30.toByte) // payload offset preserved
  }

  test("frame diffs: exact L1 over unsigned bytes, every interior boundary") {
    // 3 frames of 4 bytes: [0,10,20,30], [10,10,20,30], [255,0,20,30]
    // boundary 1: |10-0| = 10; boundary 2: |255-10| + |0-10| = 255
    val payload = Array[Int](0, 10, 20, 30, 10, 10, 20, 30,
      255, 0, 20, 30).map(_.toByte)
    val v = Seq((7L, Multimodal.encodeFakeImage(1, 1, "png", payload)))
      .toDF("id", "vid")
    val got = Multimodal.frameDiffs(v, "id", "vid", frameBytes = 4)
      .collect().map(r => (r.getInt(1), r.getLong(2))).sortBy(_._1)
    // 255 is a NEGATIVE Java byte: the & 0xff decode must read it as
    // unsigned 255, giving |255-10|+|0-10| = 255, not a signed mess
    assert(got.toSeq == Seq((1, 10L), (2, 255L)), s"got ${got.toSeq}")
    // trailing partial frame is dropped, not diffed
    val odd = Seq((8L, Multimodal.encodeFakeImage(1, 1, "png",
      Array.tabulate[Byte](10)(_.toByte)))).toDF("id", "vid")
    assert(Multimodal.frameDiffs(odd, "id", "vid", frameBytes = 4)
      .collect().map(_.getInt(1)).toSeq == Seq(1))
  }

  test("audio stats: exact int16 PCM math") {
    // samples: 0, +1000, -1000, 32767 (LE int16)
    val pcm = Array[Int](0, 1000, -1000, 32767).flatMap { s =>
      Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }
    val df = Seq((1L, Multimodal.encodeFakeImage(1, 1, "png", pcm)),
      (2L, "garbage".getBytes)).toDF("id", "a")
    val got = Multimodal.audioStats(df, "id", "a", sampleRate = 1000)
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getLong(1) == 4L)
    assert(r1.getDouble(2) == 0.004)
    val expectedRms = math.sqrt((0.0 + 1000.0 * 1000 * 2 + 32767.0 * 32767) / 4)
    assert(math.abs(r1.getDouble(3) - expectedRms) < 1e-9)
    assert(r1.getInt(4) == 32767)
    assert(!got(2L).getBoolean(5))
  }

  test("wavMeta: chunk walk skips unknown + odd chunks, strict on " +
    "corruption (overrun / non-PCM / wrong magic)") {
    val good = Multimodal.encodeWav(2, 16000, 16,
      Array.fill[Byte](16000 * 2 * 2)(3)) // 1 s stereo
    // odd LIST chunk ahead of fmt: pad byte must be consumed
    val listed = Multimodal.encodeWav(1, 8000, 16,
      Array.fill[Byte](800 * 2)(5), Some(Array[Byte](1, 2, 3)))
    // declared data size overruns the buffer -> invalid, never partial
    val truncated = good.dropRight(100)
    // float PCM (fmt code 3) -> invalid under the strict-PCM contract
    val floatFmt = good.clone()
    locally { // fmt code lives 8 bytes into the fmt chunk payload
      val i = (12 until floatFmt.length - 8).find(j =>
        floatFmt.slice(j, j + 4).map(_.toChar).mkString == "fmt ").get
      floatFmt(i + 8) = 3
    }
    val df = Seq(
      (1L, good), (2L, listed), (3L, truncated), (4L, floatFmt),
      (5L, "RIFFxxxxAVI LIST".getBytes), (6L, "noise".getBytes))
      .toDF("id", "wav")
    val got = Multimodal.wavMeta(df, "id", "wav")
      .collect().map(r => r.getLong(0) -> r).toMap
    val g = got(1L)
    assert(g.getInt(1) == 2 && g.getInt(2) == 16000 && g.getInt(3) == 16)
    assert(g.getLong(4) == 16000L && g.getLong(5) == 1000000L)
    assert(g.getBoolean(6))
    val l = got(2L)
    assert(l.getInt(1) == 1 && l.getInt(2) == 8000 &&
      l.getLong(4) == 800L && l.getLong(5) == 100000L && l.getBoolean(6))
    assert(!got(3L).getBoolean(6), "overrun must invalidate")
    assert(!got(4L).getBoolean(6), "non-PCM must invalidate")
    assert(!got(5L).getBoolean(6), "non-WAVE RIFF must invalidate")
    assert(!got(6L).getBoolean(6))
  }

  test("audio window energies: exact sums, partial window dropped, top ranks") {
    import spark.implicits._
    // 5 samples with window=2: windows (3,4) and (5,12); sample 13
    // falls in the dropped partial window
    val pcm = Array[Int](3, 4, 5, 12, 13).flatMap { s =>
      Array((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
    }
    val df = Seq(
      (1L, Multimodal.encodeFakeImage(1, 1, "png", pcm)),
      (2L, "nomagic".getBytes),
      (3L, Multimodal.encodeFakeImage(1, 1, "png", Array[Byte](7, 0))))
      .toDF("id", "a")
    val got = Multimodal.audioWindowEnergies(df, "id", "a", window = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // doc 1: win 0 = 9+16 = 25, win 1 = 25+144 = 169; doc 2 invalid;
    // doc 3 has 1 sample < window -> no full window
    assert(got.toSet == Set((1L, 0, 25L), (1L, 1, 169L)), s"got ${got.toSeq}")
  }

  test("dHash: near-identical real PNGs pair, different image does not") {
    import javax.imageio.ImageIO
    def png(img: java.awt.image.BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // base: deterministic textured pattern (dense dHash bits); near:
    // same pattern with a tiny corner blemish; diff: different seed
    def textured(seed: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(
        72, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val rnd = new scala.util.Random(seed)
      for (y <- 0 until 48; x <- 0 until 72) {
        val v = rnd.nextInt(256)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val base = textured(7)
    val near = textured(7)
    for (y <- 0 until 3; x <- 0 until 3) near.setRGB(x, y, 0xffffff)
    val diff = textured(99)
    val df = Seq((1L, png(base)), (2L, png(near)), (3L, png(diff)))
      .toDF("id", "img")
    val hashes = Multimodal.imageDHash(df, "id", "img")
    val pairs = graft.operators.Dedup.hammingPairs64(
      hashes, "id", "dhash", maxHamming = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.contains((1L, 2L)), s"near-dup pair missed: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"structurally different image paired: $pairs")
  }

  test("dHash GRFT path is pure integer math and deterministic") {
    val payload = (0 until 400).map(i => ((i * 37 + 11) % 251).toByte).toArray
    val bytes = Multimodal.encodeFakeImage(10, 10, "png", payload)
    val df = Seq((1L, bytes), (2L, bytes)).toDF("id", "img")
    val hs = Multimodal.imageDHash(df, "id", "img")
      .collect().map(_.getLong(1)).toSet
    assert(hs.size == 1, "identical payloads must hash identically")
    assert(hs.head >= 0L, "GRFT dHash is 63-bit, never negative")
  }

  test("audio dHash: near-identical PCM pairs, different profile does not") {
    // base: deterministic pseudo-signal; near: same with a short
    // dropout; diff: energy ramp reversed (profile flipped)
    def pcm(f: Int => Int): Array[Byte] =
      (0 until 2000).flatMap { i =>
        val s = f(i)
        Seq((s & 0xff).toByte, ((s >> 8) & 0xff).toByte)
      }.toArray
    def base(i: Int) = ((i % 97) - 48) * (40 + (i * 7) % 300)
    val near = pcm(i => if (i >= 100 && i < 110) 0 else base(i))
    val diffSig = pcm(i => base(1999 - i) * (if (i < 1000) 3 else 1))
    val df = Seq(
      (1L, Multimodal.encodeFakeImage(1, 1, "png", pcm(base))),
      (2L, Multimodal.encodeFakeImage(1, 1, "png", near)),
      (3L, Multimodal.encodeFakeImage(1, 1, "png", diffSig)))
      .toDF("id", "audio")
    val hashes = Multimodal.audioDHash(df, "id", "audio")
    val byId = hashes.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(byId(1L), byId(2L)) <= 6,
      s"dropout changed hash too much: ${ham(byId(1L), byId(2L))}")
    assert(ham(byId(1L), byId(3L)) > 6,
      s"flipped profile too close: ${ham(byId(1L), byId(3L))}")
    // and through the shared pairing operator
    val pairs = graft.operators.Dedup.hammingPairs64(
      hashes, "id", "adhash", maxHamming = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("audio dHash enforces the exact-arithmetic envelope (null past it)") {
    val small = Multimodal.encodeFakeImage(1, 1, "png",
      new Array[Byte](1000))
    // > 2^20 samples => > 2^21 payload bytes: must be null, not a
    // silently overflowed hash
    val big = Multimodal.encodeFakeImage(1, 1, "png",
      new Array[Byte]((1 << 21) + 2))
    val rows = Multimodal.audioDHash(
      Seq((1L, small), (2L, big)).toDF("id", "a"), "id", "a")
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getLong(1)))).toMap
    assert(rows(1L).isDefined)
    assert(rows(2L).isEmpty, "oversized payload must hash to null")
  }

  test("m07 cross-modal pairing finds every planted near-dup, both modalities") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("m07_crossmodal_pairs")(spark, dir)
      .collect()
    val byMod = rows.groupBy(_.getString(0)).map { case (m, rs) =>
      m -> rs.map(r => (r.getLong(1), r.getLong(2)) -> r.getInt(3)).toMap
    }
    // every planted partner (doc_id % 20 == 0, payload long enough to
    // hash and perturb) must pair with its source within the planted
    // hamming budget, through BOTH perceptual hashes
    val planted = graft.Engine.Tables(spark, dir).documents
      .filter(col("doc_id") % 20 === 0 &&
        org.apache.spark.sql.functions.length(col("text")) >= 2)
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      assert(byMod("image").get((id, id + 1000000L)).exists(_ <= 4),
        s"image planted pair missing for $id")
      assert(byMod("audio").get((id, id + 1000000L)).exists(_ <= 4),
        s"audio planted pair missing for $id")
    }
  }

  test("dHash pairing: planted duplicate flood stars; unrelated stays out") {
    // 10 identical images + 1 unrelated: the flood must collapse
    // through the canonicalize-first star (keep = min id, hamming 0)
    // without any quadratic within-group pairing
    val payloadA = (0 until 600).map(i => ((i * 131 + 7) % 250).toByte).toArray
    val payloadB = (0 until 600).map(i => ((i * 17 + 201) % 250).toByte).toArray
    val rows = (1L to 10L).map(i =>
      (i, Multimodal.encodeFakeImage(8, 8, "png", payloadA))) :+
      ((99L, Multimodal.encodeFakeImage(8, 8, "png", payloadB)))
    val hashes = Multimodal.imageDHash(
      rows.toDF("id", "img"), "id", "img")
    val pairs = graft.operators.Dedup.hammingPairs64(
      hashes, "id", "dhash", maxHamming = 6, bands = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert((2L to 10L).forall(i => pairs.get((1L, i)).contains(0)),
      s"flood star incomplete: $pairs")
    assert(pairs.size == 9, s"expected exactly the 9 star pairs: $pairs")
  }
}
