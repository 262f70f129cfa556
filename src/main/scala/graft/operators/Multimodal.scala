package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column support: opaque `binary`
  * payloads + typed metadata structs, processed in BATCHES inside
  * `mapPartitions` — the Scala analog of `mapInPandas` (batch in,
  * batch out), which is the shape that matters at 100 TB: the decode
  * library amortizes per-batch setup, Spark only sees a narrow
  * iterator transform, no shuffle, full partition parallelism.
  *
  * Image decode/resize are REAL for every format the JDK ships
  * codecs for (png, jpeg, gif, bmp — via `javax.imageio`, zero new
  * deps), and webp METADATA is real too: dimensions parse straight
  * from the RIFF container header (`webpDims`, all three chunk
  * variants), no codec needed.
  *
  * PERMANENT EXCLUSION — webp PIXEL decode. A conformant decoder
  * means implementing the VP8 (lossy) and/or VP8L (lossless)
  * bitstreams: boolean arithmetic decoding, per-meta-block prefix
  * code machinery, the four reversible VP8L transforms and the color
  * cache — thousands of lines whose correctness could only be
  * "verified" here against an encoder written in the same repo,
  * which asserts nothing (this container ships no webp codec and no
  * public test vectors). The fixtures carry no real webp pixels
  * either: every webp-tagged payload is the deterministic GRFT stub.
  * So pixel decode for webp is OUT OF SCOPE permanently, not
  * pending. What ships instead: webp METADATA is fully real (RIFF
  * header dims, `webpDims`), and decode/resize route through
  * `javax.imageio`'s reader registry — dropping a codec jar (e.g. an
  * ImageIO webp plugin) into an environment that has one makes webp
  * pixels work with ZERO engine changes; the GRFT-stub branch covers
  * the codec-less container and is what the tests pin. `audioStats`
  * needs no stub at all: raw PCM math is exact.
  */
object Multimodal {

  /** javax.imageio defaults to DISK-backed stream caches: every
    * encode/decode via ImageIO.write / createImageInputStream spins
    * up (writes, then deletes) a temp FILE per call even when the
    * image already sits in a byte array — per-image filesystem
    * traffic that dominates small-image pipelines. Memory-backed
    * streams are strictly correct here (all call sites buffer whole
    * images in byte arrays anyway). JVM-global, applied when any
    * executor-side closure loads this object; decode output is
    * byte-identical either way.
    */
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded metadata appended per image row. */
  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("format", StringType),
    StructField("n_payload_bytes", LongType),
    StructField("valid", BooleanType)))

  val MagicBytes: Array[Byte] = "GRFT".getBytes("US-ASCII")
  val Formats: Seq[String] = Seq("png", "jpeg", "webp")

  /** Deterministic fake "image": 16-byte header (magic, width,
    * height, format tag) + payload. Stands in for real encoded bytes.
    */
  def encodeFakeImage(
      width: Int, height: Int, format: String,
      payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.put(MagicBytes)
    bb.putInt(width)
    bb.putInt(height)
    bb.putInt(Formats.indexOf(format))
    bb.put(payload)
    bb.array()
  }

  /** Image decoder. Two paths:
    *  - REAL: any format the JDK's `javax.imageio` ships readers for
    *    (png, jpeg, gif, bmp…) — header-only dimension read via
    *    `ImageReader.getWidth/getHeight(0)`, no full pixel decode, so
    *    metadata extraction over a 100 TB image column never
    *    decompresses pixels it doesn't need.
    *  - STUB: the deterministic GRFT 16-byte header used by fixtures
    *    (standing in for codecs the JVM lacks, e.g. webp) — replace
    *    only this branch to plug in libvips/JNI; the batching,
    *    schema, and error routing around it stay as-is.
    */
  object ImageDecoder {
    def decode(bytes: Array[Byte]): Row = {
      if (bytes == null) Row(null, null, null, 0L, false)
      else if (bytes.length >= 16 && hasMagic(bytes)) {
        val bb = java.nio.ByteBuffer.wrap(bytes)
        bb.position(4)
        val w = bb.getInt
        val h = bb.getInt
        val f = bb.getInt
        Row(w, h, Formats.lift(f).orNull, (bytes.length - 16).toLong, true)
      } else decodeReal(bytes)
    }

    private def decodeReal(bytes: Array[Byte]): Row = {
      val invalid = Row(null, null, null, bytes.length.toLong, false)
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) webpDims(bytes) match {
            case Some((w, h)) =>
              Row(w, h, "webp", bytes.length.toLong, true)
            case None => invalid
          }
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Row(r.getWidth(0), r.getHeight(0),
                r.getFormatName.toLowerCase(java.util.Locale.ROOT),
                bytes.length.toLong, true)
            } finally r.dispose()
          }
        } finally if (iis != null) iis.close()
      } catch { case scala.util.control.NonFatal(_) => invalid }
    }
  }

  /** Batched decode: (keyCol, binCol) -> (keyCol, meta struct fields).
    * `batchSize` mirrors mapInPandas' Arrow batch: the decoder is fed
    * fixed-size slices so a real codec can amortize setup/buffers.
    */
  def decodeImages(
      df: DataFrame, keyCol: String, binCol: String,
      batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(
      df.schema(keyCol) +: metaSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped: decode the whole slice, then emit — the
        // real-codec version would hand `batch` to the lib in one call
        batch.iterator.map { r =>
          val meta = ImageDecoder.decode(r.getAs[Array[Byte]](1))
          Row.fromSeq(r.get(0) +: meta.toSeq)
        }
      }
    }(enc)
  }

  /** Resize. GRFT stub payloads get their header dims rewritten
    * (payload untouched — stands in for the codec the JVM lacks);
    * real JDK-readable images (png/jpeg/gif/bmp) are ACTUALLY
    * resampled (bilinear) and re-encoded in their source format via
    * `javax.imageio`. Anything undecodable passes through unchanged.
    */
  def resizeImages(
      df: DataFrame, keyCol: String, binCol: String,
      newWidth: Int, newHeight: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(keyCol), StructField("image", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val out = if (bytes != null && bytes.length >= 16 &&
            hasMagic(bytes)) {
          val bb = java.nio.ByteBuffer.wrap(bytes.clone())
          bb.position(4)
          bb.putInt(newWidth)
          bb.putInt(newHeight)
          bb.array()
        } else if (bytes != null) {
          resizeReal(bytes, newWidth, newHeight).getOrElse(bytes)
        } else bytes
        Row(r.get(0), out)
      }
    }(enc)
  }

  private def resizeReal(
      bytes: Array[Byte], w: Int, h: Int): Option[Array[Byte]] =
    try {
      // format sniff first so we re-encode in the source format
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (readers.hasNext) {
            val rd = readers.next()
            try rd.getFormatName.toLowerCase(java.util.Locale.ROOT)
            finally rd.dispose()
          } else return None
        } finally if (iis != null) iis.close()
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (img == null) return None
      // jpeg has no alpha; use an opaque buffer there
      val imgType =
        if (fmt == "jpeg") java.awt.image.BufferedImage.TYPE_INT_RGB
        else java.awt.image.BufferedImage.TYPE_INT_ARGB
      val scaled = new java.awt.image.BufferedImage(w, h, imgType)
      val g = scaled.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
        ()
      } finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      if (!javax.imageio.ImageIO.write(scaled, fmt, baos)) None
      else Some(baos.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Feature schema appended per image row by `imageFeatures`. */
  val featureSchema: StructType = StructType(Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("luminance", DoubleType),
    StructField("valid", BooleanType)))

  /** Image feature extraction: per-channel pixel means + Rec.601
    * luminance. REAL for JDK-decodable formats (full pixel decode,
    * integer-exact channel sums); GRFT stub payloads report the mean
    * payload byte on all channels (deterministic stand-in). The
    * canonical mapInPandas-shaped feature pass: batch in, narrow
    * feature columns out, no shuffle.
    */
  def imageFeatures(
      df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(
      df.schema(keyCol) +: featureSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row.fromSeq(r.get(0) +: featuresOf(bytes).toSeq)
      }
    }(enc)
  }

  private def featuresOf(bytes: Array[Byte]): Row = {
    val invalid = Row(null, null, null, null, null, null, false)
    if (bytes == null) invalid
    else if (bytes.length >= 16 && hasMagic(bytes)) {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      bb.position(4)
      val w = bb.getInt
      val h = bb.getInt
      val n = bytes.length - 16
      val mean = if (n == 0) 0.0 else {
        var s = 0L
        var i = 16
        while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
        s.toDouble / n
      }
      Row(w, h, mean, mean, mean, mean, true)
    } else {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) invalid
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff
              sg += (p >> 8) & 0xff
              sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val (mr, mg, mb) = (sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
          Row(w, h, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb, true)
        }
      } catch { case scala.util.control.NonFatal(_) => invalid }
    }
  }

  /** Stub frame sampler for "video" payloads: treats the payload as
    * fixed-size frames and emits every `everyN`-th as its own row —
    * the explode-shaped generator a real frame extractor needs.
    */
  def sampleFrames(
      df: DataFrame, keyCol: String, binCol: String,
      frameBytes: Int, everyN: Int): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("frame_idx", IntegerType),
      StructField("frame", BinaryType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.length < 16 ||
            !hasMagic(bytes)) Iterator.empty
        else {
          val payload = bytes.drop(16)
          val nFrames = payload.length / frameBytes
          (0 until nFrames by everyN).iterator.map { i =>
            Row(r.get(0), i,
              payload.slice(i * frameBytes, (i + 1) * frameBytes))
          }
        }
      }
    }(enc)
  }

  /** Frame-to-frame L1 differences — the shot-boundary / scene-cut
    * primitive under video clip extraction: a boundary between frames
    * i and i+1 scores sum_j |f(i+1)[j] - f(i)[j]| over unsigned
    * bytes, and a cut is a boundary whose score clears the caller's
    * threshold. Integer-exact (sum of <= frameBytes * 255 fits Long
    * far beyond any real frame size), so thresholds are
    * engine-portable. One sequential pass per payload inside
    * mapPartitions — embarrassingly parallel, no shuffle; downstream
    * cut selection is a plain filter.
    *
    * Emits (key, boundary_idx, diff) for EVERY interior boundary
    * (boundary_idx = i+1 in 1..nFrames-1); thresholding stays in the
    * query so one pass serves cut detection, motion profiling, and
    * static-scene collapse alike.
    */
  def frameDiffs(
      df: DataFrame, keyCol: String, binCol: String,
      frameBytes: Int): DataFrame = {
    require(frameBytes >= 1, "frameBytes must be >= 1")
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("boundary_idx", IntegerType),
      StructField("diff", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.length < 16 ||
            !hasMagic(bytes)) Iterator.empty
        else {
          val payload = bytes.drop(16)
          val nFrames = payload.length / frameBytes
          (1 until nFrames).iterator.map { i =>
            var d = 0L
            var j = 0
            while (j < frameBytes) {
              d += math.abs((payload(i * frameBytes + j) & 0xff) -
                (payload((i - 1) * frameBytes + j) & 0xff))
              j += 1
            }
            Row(r.get(0), i, d)
          }
        }
      }
    }(enc)
  }

  /** Audio-stats metadata for a PCM payload: the payload after the
    * header is interpreted as little-endian int16 samples. Unlike the
    * image decode this needs NO codec — raw PCM math is exact — so
    * this operator is fully real: n_samples, duration, RMS, peak.
    */
  /** Audio fingerprint: dHash over the PCM energy profile — the
    * audio member of the perceptual-hash family (imageDHash's exact
    * integer discipline applied to sound). The int16 sample stream
    * is cut into 64 windows; each bit compares ADJACENT window
    * energies by integer cross-multiplication
    * `e(w)*c(w+1) > e(w+1)*c(w)` — no floating point, so DuckDB
    * recomputes the hash bit-for-bit from the raw bytes (the m06
    * oracle). 63 bits, never negative. Near-dup pairing =
    * Dedup.hammingPairs64 over this column, same as images.
    *
    * Overflow envelope: e <= 2^30 * samplesPerWindow and the
    * cross-product multiplies by another window count, so payloads
    * up to ~2^20 samples (2 MB PCM) stay inside Long exactly — the
    * guard is ENFORCED: longer payloads hash to null (chunk or
    * downsample first), like non-GRFT/empty payloads.
    */
  def audioDHash(
      df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(keyCol), StructField("adhash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.get(0), audioDHashOf(bytes))
      }
    }(enc)
  }

  private def audioDHashOf(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null || bytes.length < 16 || !hasMagic(bytes)) null
    else {
      val n = (bytes.length - 16) / 2
      // enforce the documented exact-arithmetic envelope instead of
      // silently wrapping Long: beyond ~2^20 samples the
      // cross-product e(w)*c(w+1) can exceed 2^63 at full amplitude
      // (e <= 2^30 * n/64, c ~ n/64). Long clips -> null, like any
      // other undecodable payload; chunk or downsample first.
      if (n == 0 || n > (1 << 20)) null
      else {
        val e = new Array[Long](64)
        val c = new Array[Long](64)
        var w = 0
        while (w < 64) {
          val from = w * n / 64
          val to = math.max(from + 1, (w + 1) * n / 64)
          var i = from
          while (i < to && i < n) {
            val lo = bytes(16 + 2 * i) & 0xff
            val hi = bytes(16 + 2 * i + 1)
            val s = (hi << 8) | lo // sign from hi byte
            e(w) += s.toLong * s
            i += 1
          }
          c(w) = math.max(1, math.min(to, n) - from)
          w += 1
        }
        var h = 0L
        w = 0
        while (w < 63) {
          if (e(w) * c(w + 1) > e(w + 1) * c(w)) h |= (1L << w)
          w += 1
        }
        java.lang.Long.valueOf(h)
      }
    }
  }

  def audioStats(
      df: DataFrame, keyCol: String, binCol: String,
      sampleRate: Int = 16000): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("n_samples", LongType),
      StructField("duration_s", DoubleType),
      StructField("rms", DoubleType),
      StructField("peak", IntegerType),
      StructField("valid", BooleanType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.length < 16 || !hasMagic(bytes)) {
          Row(r.get(0), 0L, 0.0, 0.0, 0, false)
        } else {
          val n = (bytes.length - 16) / 2
          var sumSq = 0.0
          var peak = 0
          var i = 0
          while (i < n) {
            val lo = bytes(16 + 2 * i) & 0xff
            val hi = bytes(16 + 2 * i + 1).toInt
            val s = (hi << 8) | lo
            sumSq += s.toDouble * s.toDouble
            val a = math.abs(s)
            if (a > peak) peak = a
            i += 1
          }
          val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
          Row(r.get(0), n.toLong, n.toDouble / sampleRate, rms, peak, true)
        }
      }
    }(enc)
  }

  /** Fixed-window PCM energy profile: one row per FULL `window`-
    * sample window, energy = sum of squared int16 samples as exact
    * BIGINT (max |s| = 32768 -> s^2 <= 2^30, so a window overflows
    * long only past 2^33 samples — unreachable). The trailing
    * partial window is dropped (its energy isn't comparable to full
    * windows). The localization primitive under silence trimming,
    * onset detection and loudest-segment sampling; downstream tops /
    * thresholds stay integer-exact and engine-portable.
    */
  def audioWindowEnergies(
      df: DataFrame, keyCol: String, binCol: String,
      window: Int = 256): DataFrame = {
    require(window >= 1, "window must be >= 1")
    val outSchema = StructType(Seq(
      df.schema(keyCol),
      StructField("win", IntegerType),
      StructField("energy", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.length < 16 || !hasMagic(bytes))
          Iterator.empty
        else {
          val n = (bytes.length - 16) / 2
          val nWin = n / window
          (0 until nWin).iterator.map { w =>
            var e = 0L
            var i = w * window
            val end = i + window
            while (i < end) {
              val lo = bytes(16 + 2 * i) & 0xff
              val hi = bytes(16 + 2 * i + 1).toInt
              val s = (hi << 8) | lo
              e += s.toLong * s.toLong
              i += 1
            }
            Row(r.get(0), w, e)
          }
        }
      }
    }(enc)
  }

  /** 8x8 average perceptual hash (aHash): decode to grayscale,
    * average into an 8x8 grid, bit k set when cell k exceeds the grid
    * mean. Near-identical images (recompress, small edit, resize)
    * land within a few bits of each other, so image dedup is
    * `Dedup.hammingPairs64` over this column — the multimodal twin of
    * SimHash-on-text.
    *
    * REAL for JDK-decodable formats (single pixel pass accumulating
    * block sums). GRFT stub payloads hash their payload bytes
    * resampled into 64 cells — deterministic, and equal payloads
    * (duplicate source docs) hash identically, which is what the
    * fixture dedup exercises. Returns (key, ahash BIGINT|null).
    */
  def imageAHash(
      df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(keyCol), StructField("ahash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.get(0), aHashOf(bytes))
      }
    }(enc)
  }

  /** Difference hash (dHash): like [[imageAHash]] but each bit
    * compares ADJACENT cells instead of cell-vs-global-mean. The
    * comparison `mean(k) > mean(k+1)` is evaluated as the integer
    * cross-multiplication `s(k)*c(k+1) > s(k+1)*c(k)` — no floating
    * point anywhere, so the GRFT-path hash is bit-exactly
    * recomputable by any engine (the m05 oracle recomputes it in
    * DuckDB SQL). GRFT payloads hash 64 1-D cells -> 63 bits (always
    * non-negative, so SQL BIGINT shifts never overflow); real JDK
    * images hash a 9x8 grayscale grid -> 64 bits, the classic dHash.
    */
  def imageDHash(
      df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      df.schema(keyCol), StructField("dhash", LongType)))
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.get(0), dHashOf(bytes))
      }
    }(enc)
  }

  private def dHashOf(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null) null
    else if (bytes.length >= 16 && hasMagic(bytes)) {
      val payload = bytes.drop(16)
      val n = payload.length
      if (n == 0) null
      else {
        // 64 1-D cells; integer sum + count per cell (same slicing
        // as aHashOf, kept in exact integer form)
        val s = new Array[Long](64)
        val c = new Array[Long](64)
        var k = 0
        while (k < 64) {
          val from = k * n / 64
          val to = math.max(from + 1, (k + 1) * n / 64)
          var i = from
          while (i < to && i < n) { s(k) += payload(i) & 0xff; i += 1 }
          c(k) = math.max(1, math.min(to, n) - from)
          k += 1
        }
        var h = 0L
        k = 0
        while (k < 63) {
          // mean(k) > mean(k+1), cross-multiplied: exact in Long
          if (s(k) * c(k + 1) > s(k + 1) * c(k)) h |= (1L << k)
          k += 1
        }
        java.lang.Long.valueOf(h)
      }
    } else {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) null
        else {
          // classic dHash: 9 columns x 8 rows of integer gray sums,
          // bit (row,colPair) set iff cell(row,col) > cell(row,col+1)
          val (w, h0) = (img.getWidth, img.getHeight)
          val sums = Array.ofDim[Long](8, 9)
          val counts = Array.ofDim[Long](8, 9)
          var y = 0
          while (y < h0) {
            val cy = math.min(7, y * 8 / h0)
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val gray = (((p >> 16) & 0xff) * 299 +
                ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
              val cx = math.min(8, x * 9 / w)
              sums(cy)(cx) += gray
              counts(cy)(cx) += 1
              x += 1
            }
            y += 1
          }
          var hsh = 0L
          var row = 0
          while (row < 8) {
            var cp = 0
            while (cp < 8) {
              val cl = math.max(1L, counts(row)(cp))
              val cr = math.max(1L, counts(row)(cp + 1))
              if (sums(row)(cp) * cr > sums(row)(cp + 1) * cl)
                hsh |= (1L << (row * 8 + cp))
              cp += 1
            }
            row += 1
          }
          java.lang.Long.valueOf(hsh)
        }
      } catch { case scala.util.control.NonFatal(_) => null }
    }
  }

  private def bitsFromCells(cells: Array[Double]): java.lang.Long = {
    val mean = cells.sum / 64.0
    var h = 0L
    var k = 0
    while (k < 64) {
      if (cells(k) > mean) h |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(h)
  }

  private def aHashOf(bytes: Array[Byte]): java.lang.Long = {
    if (bytes == null) null
    else if (bytes.length >= 16 && hasMagic(bytes)) {
      val payload = bytes.drop(16)
      val n = payload.length
      if (n == 0) null
      else {
        // resample payload bytes into 64 cells (1-D "pixels")
        val cells = new Array[Double](64)
        var k = 0
        while (k < 64) {
          val from = k * n / 64
          val to = math.max(from + 1, (k + 1) * n / 64)
          var s = 0L
          var i = from
          while (i < to && i < n) { s += payload(i) & 0xff; i += 1 }
          cells(k) = s.toDouble / math.max(1, math.min(to, n) - from)
          k += 1
        }
        bitsFromCells(cells)
      }
    } else {
      try {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        if (img == null) null
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val sums = new Array[Long](64)
          val counts = new Array[Long](64)
          var y = 0
          while (y < h) {
            val cy = math.min(7, y * 8 / h)
            var x = 0
            while (x < w) {
              val p = img.getRGB(x, y)
              val gray = (((p >> 16) & 0xff) * 299 +
                ((p >> 8) & 0xff) * 587 + (p & 0xff) * 114) / 1000
              val c = cy * 8 + math.min(7, x * 8 / w)
              sums(c) += gray
              counts(c) += 1
              x += 1
            }
            y += 1
          }
          val cells = new Array[Double](64)
          var k = 0
          while (k < 64) {
            cells(k) = if (counts(k) == 0) 0.0
              else sums(k).toDouble / counts(k)
            k += 1
          }
          bitsFromCells(cells)
        }
      } catch { case scala.util.control.NonFatal(_) => null }
    }
  }

  /** WebP dimensions from the container header alone (RFC 9649 — the
    * public RIFF/WebP bitstream layout). The JDK ships no webp
    * ImageReader, but the DIMENSIONS live in the first chunk header,
    * so metadata extraction (the `decodeImages` path) is fully real
    * for webp without a codec; only pixel decode (resize / features)
    * still needs one. Handles all three first-chunk variants:
    *  - "VP8 " (lossy): 14-bit width/height at frame-header bytes 6/8,
    *    after the 0x9D 0x01 0x2A sync code;
    *  - "VP8L" (lossless): 0x2F signature then two 14-bit dims-minus-1
    *    packed little-endian;
    *  - "VP8X" (extended): 24-bit little-endian canvas dims-minus-1 at
    *    payload bytes 4..9.
    */
  /** Metadata appended per WAV row by [[wavMeta]]. */
  val wavSchema: StructType = StructType(Seq(
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("bits_per_sample", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_us", LongType),
    StructField("valid", BooleanType)))

  /** Build a RIFF/WAVE byte stream (PCM fmt chunk + data chunk, with
    * an optional extra chunk ahead of fmt) — the fixture/spec encoder
    * for [[wavMeta]]. Odd-sized chunks get the RIFF pad byte, so a
    * parser that forgets word alignment misreads everything after.
    */
  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      pcm: Array[Byte], extraChunk: Option[Array[Byte]] = None): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { body.write(v & 0xff); body.write((v >> 8) & 0xff) }
    def u32(v: Int): Unit = { u16(v & 0xffff); u16((v >>> 16) & 0xffff) }
    def chunk(cc: String, payload: Array[Byte]): Unit = {
      body.write(cc.getBytes("US-ASCII")); u32(payload.length)
      body.write(payload)
      if ((payload.length & 1) == 1) body.write(0) // RIFF pad byte
    }
    val blockAlign = channels * bitsPerSample / 8
    val fmt = new java.io.ByteArrayOutputStream()
    locally {
      def f16(v: Int): Unit = { fmt.write(v & 0xff); fmt.write((v >> 8) & 0xff) }
      def f32(v: Int): Unit = { f16(v & 0xffff); f16((v >>> 16) & 0xffff) }
      f16(1) // PCM
      f16(channels)
      f32(sampleRate)
      f32(sampleRate * blockAlign) // byte rate
      f16(blockAlign)
      f16(bitsPerSample)
    }
    body.write("WAVE".getBytes("US-ASCII"))
    extraChunk.foreach(chunk("LIST", _))
    chunk("fmt ", fmt.toByteArray)
    chunk("data", pcm)
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(Array[Byte]((payload.length & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      ((payload.length >> 16) & 0xff).toByte,
      ((payload.length >> 24) & 0xff).toByte))
    out.write(payload)
    out.toByteArray
  }

  /** Parse RIFF/WAVE container metadata — a REAL chunk walk (fourCC +
    * little-endian u32 size, word-aligned), not a fixed-offset peek:
    * unknown chunks (LIST, fact, cue) are skipped by declared size,
    * odd chunks consume their pad byte, and a declared size that
    * overruns the buffer invalidates the row (fail-loud, never a
    * silent partial read). `valid` requires a PCM fmt chunk AND a
    * data chunk; `duration_us = n_frames * 1_000_000 / sample_rate`
    * in integer arithmetic both engines replay exactly. Map-only,
    * batched like the image decoders.
    */
  def wavMeta(
      df: DataFrame, keyCol: String, binCol: String): DataFrame = {
    val outSchema = StructType(
      df.schema(keyCol) +: wavSchema.fields.toSeq)
    val enc = RowEncoder.encoderFor(outSchema)
    df.select(col(keyCol), col(binCol)).mapPartitions { it =>
      it.map { r =>
        Row.fromSeq(r.get(0) +: parseWav(r.getAs[Array[Byte]](1)).toSeq)
      }
    }(enc)
  }

  private[operators] def parseWav(a: Array[Byte]): Row = {
    val invalid = Row(null, null, null, null, null, false)
    if (a == null || a.length < 12) return invalid
    def u8(i: Int) = a(i) & 0xff
    def fourCC(i: Int, s: String) =
      a.length >= i + 4 && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    def u16le(i: Int) = u8(i) | (u8(i + 1) << 8)
    def u32le(i: Int) = u8(i).toLong | (u8(i + 1).toLong << 8) |
      (u8(i + 2).toLong << 16) | (u8(i + 3).toLong << 24)
    if (!fourCC(0, "RIFF") || !fourCC(8, "WAVE")) return invalid
    var pos = 12
    var fmtCode, channels, rate, bits, blockAlign = -1
    var dataBytes = -1L
    while (pos + 8 <= a.length && (fmtCode < 0 || dataBytes < 0)) {
      val size = u32le(pos + 4)
      val start = pos + 8
      if (start + size > a.length) return invalid // overrun: fail loud
      if (fourCC(pos, "fmt ")) {
        if (size < 16) return invalid
        fmtCode = u16le(start)
        channels = u16le(start + 2)
        rate = u32le(start + 4).toInt
        blockAlign = u16le(start + 12)
        bits = u16le(start + 14)
      } else if (fourCC(pos, "data")) {
        dataBytes = size
      }
      pos = start + size.toInt + (size.toInt & 1) // word-aligned
    }
    if (fmtCode != 1 || dataBytes < 0 || channels <= 0 || rate <= 0 ||
      blockAlign <= 0) invalid
    else {
      val nFrames = dataBytes / blockAlign
      Row(channels, rate, bits, nFrames, nFrames * 1000000L / rate, true)
    }
  }

  private[operators] def webpDims(a: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = a(i) & 0xff
    def fourCC(i: Int, s: String) =
      a.length >= i + 4 && (0 until 4).forall(j => u8(i + j) == s.charAt(j))
    if (a.length < 25 || !fourCC(0, "RIFF") || !fourCC(8, "WEBP")) None
    else if (fourCC(12, "VP8 ") && a.length >= 30) {
      // payload at 20: 3-byte frame tag, sync code, then dims (lossy
      // dims are the low 14 bits of the two LE u16s that follow)
      if (u8(23) != 0x9d || u8(24) != 0x01 || u8(25) != 0x2a) None
      else Some((
        (u8(26) | (u8(27) << 8)) & 0x3fff,
        (u8(28) | (u8(29) << 8)) & 0x3fff))
    } else if (fourCC(12, "VP8L")) {
      if (u8(20) != 0x2f) None
      else {
        val bits = u8(21) | (u8(22) << 8) | (u8(23) << 16) | (u8(24) << 24)
        Some(((bits & 0x3fff) + 1, ((bits >> 14) & 0x3fff) + 1))
      }
    } else if (fourCC(12, "VP8X") && a.length >= 30) {
      Some((
        (u8(24) | (u8(25) << 8) | (u8(26) << 16)) + 1,
        (u8(27) | (u8(28) << 8) | (u8(29) << 16)) + 1))
    } else None
  }

  private def hasMagic(a: Array[Byte]): Boolean =
    a.length >= MagicBytes.length && {
      var i = 0
      while (i < MagicBytes.length && a(i) == MagicBytes(i)) i += 1
      i == MagicBytes.length
    }
}
