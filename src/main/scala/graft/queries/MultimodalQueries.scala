package graft.queries

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Engine, QueryDef}
import graft.operators.Multimodal

/** Multimodal-column surface: binary image payloads built
  * deterministically from the documents fixture, run through the
  * batched decode / resize / frame-sample plumbing. The decode is a
  * stub (no codec libs in the container) but every derived value is
  * deterministic, so DuckDB can recompute the expected metadata.
  */
object MultimodalQueries {

  /** documents -> (doc_id, image binary): fake-encoded with
    * dimensions/format derived from doc_id and payload = text bytes.
    */
  def fakeImages(s: SparkSession, dir: String): DataFrame = {
    val docs = Engine.Tables(s, dir).documents
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("image", BinaryType)))
    docs.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        Row(id, Multimodal.encodeFakeImage(
          (64 + id % 512).toInt, (48 + id % 256).toInt,
          Multimodal.Formats((id % 3).toInt),
          r.getAs[Array[Byte]](1)))
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** One REAL (javax.imageio) PNG per document row, constant-color
    * with dims and RGB all derived from doc_id — the m14 fixture.
    * Distributed map like [[fakeImages]]; tiny images (<= 21x13) so
    * the encode cost is negligible next to the scan.
    */
  def realPngs(s: SparkSession, dir: String): DataFrame = {
    val ids = Engine.Tables(s, dir).documents.select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("image", BinaryType)))
    ids.mapPartitions { it =>
      // memory-backed ImageIO streams (no per-image temp file); this
      // closure calls ImageIO directly, so it cannot rely on the
      // Multimodal object initializer having run in this executor
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val id = r.getLong(0)
        val w = (8 + id % 16).toInt
        val h = (6 + id % 8).toInt
        val rgb = (((id % 256) << 16) | (((id * 7) % 256) << 8) |
          ((id * 13) % 256)).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", baos)
        Row(id, baos.toByteArray)
      }
    }(RowEncoder.encoderFor(schema))
  }

  /** One REAL RIFF/WAVE file per document row (the m15 fixture):
    * PCM parameters derived from doc_id, deterministic payload bytes,
    * and every 5th file carries an odd-length LIST chunk ahead of
    * fmt to keep the parser's chunk walk honest.
    */
  def realWavs(s: SparkSession, dir: String): DataFrame = {
    val ids = Engine.Tables(s, dir).documents.select(col("doc_id"))
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("wav", BinaryType)))
    ids.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val channels = (1 + id % 2).toInt
        val rate = (8000 + (id % 3) * 4000).toInt
        val nFrames = (100 + id % 50).toInt
        val pcm = Array.tabulate(nFrames * channels * 2)(i =>
          ((id * 31 + i * 7) & 0xff).toByte)
        val extra = if (id % 5 == 0)
          Some(Array[Byte](73, 78, 70, 79, 3)) // "INFO" + odd tail
        else None
        Row(id, Multimodal.encodeWav(channels, rate, 16, pcm, extra))
      }
    }(RowEncoder.encoderFor(schema))
  }

  val defs: ListMap[String, QueryDef] = ListMap(
    // ------------------------------------------------------------------
    "m01_image_meta" -> QueryDef(
      fn = { (s, dir) =>
        Multimodal.decodeImages(fakeImages(s, dir), "doc_id", "image")
          .select(col("doc_id"), col("width"), col("height"),
            col("format"), col("n_payload_bytes"), col("valid"))
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(64 + doc_id % 512 AS INT) AS width,
               CAST(48 + doc_id % 256 AS INT) AS height,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                               ELSE 'webp' END AS format,
               octet_length(encode(text)) AS n_payload_bytes,
               true AS valid
        FROM documents"""),
      doc = "Binary image column + batched stub decode to typed meta."),

    // ------------------------------------------------------------------
    "m02_frame_sample" -> QueryDef(
      fn = { (s, dir) =>
        // every 4th 32-byte "frame" of each payload; count per doc
        Multimodal.sampleFrames(fakeImages(s, dir), "doc_id", "image",
          frameBytes = 32, everyN = 4)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_frames"),
            sum(length(col("frame")).cast("long")).as("frame_bytes"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id,
                 octet_length(encode(text)) // 32 AS n_total
          FROM documents)
        SELECT doc_id,
               (n_total + 3) // 4 AS n_frames,
               32 * ((n_total + 3) // 4) AS frame_bytes
        FROM f WHERE n_total > 0"""),
      doc = "Stub frame sampling: explode-shaped generator over binary."),

    // ------------------------------------------------------------------
    "m04_image_features" -> QueryDef(
      fn = { (s, dir) =>
        // Feature extraction over the deterministic fixture images:
        // GRFT payload mean byte is exact integer math, so the result
        // is deterministic (rows-only check; the REAL pixel path is
        // pinned by MultimodalSpec on generated PNGs). Means emitted
        // as integer micro-units to keep the dump hash-stable.
        Multimodal.imageFeatures(fakeImages(s, dir), "doc_id", "image")
          .select(col("doc_id"), col("width"), col("height"),
            expr("cast(mean_r * 1000000 as bigint)").as("mean_byte_micros"),
            col("valid"))
      },
      // GRFT payload = UTF-8 text bytes and the corpus is ASCII, so
      // the mean payload byte is recomputable from the text; floor
      // before CAST because DuckDB's double->bigint cast rounds where
      // Spark's truncates.
      oracle = Some("""
        SELECT doc_id,
               CAST(64 + doc_id % 512 AS INT) AS width,
               CAST(48 + doc_id % 256 AS INT) AS height,
               CAST(floor(
                 CAST(list_sum(list_transform(range(1, length(text) + 1),
                   i -> ascii(substring(text, i, 1)))) AS DOUBLE)
                 / length(text) * 1000000) AS BIGINT) AS mean_byte_micros,
               true AS valid
        FROM documents"""),
      doc = "Image feature extraction (channel means / luminance; " +
        "real pixel path for JDK formats)."),

    // ------------------------------------------------------------------
    "m03_audio_stats" -> QueryDef(
      fn = { (s, dir) =>
        // Payload bytes as little-endian int16 PCM; exact math, no
        // codec. n_samples is oracle-checkable from the byte length;
        // rms/peak are pinned by MultimodalSpec.
        // duration emitted as exact integer micros (n*1e6 div rate):
        // rounding the per-row double quotient hits exact .5 ties for
        // every odd n (float-discipline violation)
        graft.operators.Multimodal
          .audioStats(fakeImages(s, dir), "doc_id", "image")
          .select(col("doc_id"), col("n_samples"),
            expr("n_samples * 1000000 div 16000").as("duration_us"))
      },
      oracle = Some("""
        SELECT doc_id,
               octet_length(encode(text)) // 2 AS n_samples,
               ((octet_length(encode(text)) // 2) * 1000000) // 16000
                 AS duration_us
        FROM documents"""),
      doc = "PCM audio stats over binary payloads (exact, codec-free)."),

    // ------------------------------------------------------------------
    "m05_image_dhash" -> QueryDef(
      fn = { (s, dir) =>
        // Perceptual dHash per image — the extraction half of image
        // near-dup detection. Pure integer math (cross-multiplied
        // cell-mean comparisons, no floating point), so DuckDB
        // recomputes the GRFT-path hash bit-for-bit: a fully
        // hash-checked perceptual hash. The pairing half is
        // Dedup.hammingPairs64 over this column (banded; EXACT at
        // maxHamming < bands by pigeonhole) — pinned by
        // MultimodalSpec on real PNGs and a planted duplicate flood,
        // because this fixture has no image-level dups (its text
        // near-dups sit at hamming >= 13: byte-boundary avalanche).
        // null hashes (empty payloads) are dropped to mirror the
        // oracle's length(text) > 0 guard; the byte-vs-codepoint
        // equivalence in the oracle assumes the ASCII fixture (the
        // same assumption t05's rolling hash documents)
        graft.operators.Multimodal.imageDHash(
          fakeImages(s, dir), "doc_id", "image")
          .filter(col("dhash").isNotNull)
      },
      oracle = Some("""
        WITH la AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bs,
                 length(text) AS n
          FROM documents WHERE length(text) > 0),
        sc AS (
          SELECT doc_id, n,
                 list_transform(range(0, 64), k -> struct_pack(
                   s := coalesce(list_sum(
                     bs[(k*n)//64 + 1 :
                        least(greatest((k*n)//64 + 1, ((k+1)*n)//64), n)]),
                     0),
                   c := greatest(1,
                     least(greatest((k*n)//64 + 1, ((k+1)*n)//64), n)
                       - (k*n)//64))) AS cells
          FROM la)
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 63), k ->
                 CASE WHEN cells[k+1].s * cells[k+2].c
                         > cells[k+2].s * cells[k+1].c
                      THEN 1::BIGINT << k ELSE 0::BIGINT END))
                 AS BIGINT) AS dhash
        FROM sc"""),
      doc = "Integer-exact perceptual dHash per image (bit-for-bit " +
        "oracle-checked; pairing via hammingPairs64 pinned in spec)."),

    // ------------------------------------------------------------------
    "m06_audio_dhash" -> QueryDef(
      fn = { (s, dir) =>
        // Audio fingerprint: dHash over the int16 PCM energy profile —
        // integer cross-multiplied window comparisons like m05, so
        // DuckDB rebuilds every hash from the raw bytes. With m05 and
        // the text family, near-dup detection now spans all three
        // modalities through ONE pairing operator (hammingPairs64).
        // The oracle decodes signed little-endian int16 exactly like
        // the engine (hi >= 0x80 -> s - 65536), so agreement doesn't
        // hinge on the fixture being ASCII-only.
        graft.operators.Multimodal.audioDHash(
          fakeImages(s, dir), "doc_id", "image")
          .filter(col("adhash").isNotNull)
      },
      oracle = Some("""
        WITH la AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bs,
                 length(text) // 2 AS n
          FROM documents
          WHERE length(text) >= 2 AND length(text) // 2 <= 1048576),
        sm AS (
          -- signed little-endian int16, mirroring the engine's decode:
          -- a high byte >= 0x80 is a negative sample (s - 65536), not
          -- an unsigned reconstruction that happens to agree on the
          -- ASCII fixture
          SELECT doc_id, n,
                 list_transform(range(0, n),
                   i -> CASE WHEN bs[2*i + 2] >= 128
                        THEN bs[2*i + 2] * 256 + bs[2*i + 1] - 65536
                        ELSE bs[2*i + 2] * 256 + bs[2*i + 1] END) AS s
          FROM la),
        sc AS (
          SELECT doc_id, n,
                 list_transform(range(0, 64), w -> struct_pack(
                   e := coalesce(list_sum(list_transform(
                     s[(w*n)//64 + 1 :
                       least(greatest((w*n)//64 + 1, ((w+1)*n)//64), n)],
                     x -> x * x)), 0),
                   c := greatest(1,
                     least(greatest((w*n)//64 + 1, ((w+1)*n)//64), n)
                       - (w*n)//64))) AS cells
          FROM sm)
        SELECT doc_id,
               CAST(list_sum(list_transform(range(0, 63), w ->
                 CASE WHEN cells[w+1].e * cells[w+2].c
                         > cells[w+2].e * cells[w+1].c
                      THEN 1::BIGINT << w ELSE 0::BIGINT END))
                 AS BIGINT) AS adhash
        FROM sc"""),
      doc = "Integer-exact audio fingerprint over PCM window energies " +
        "(bit-for-bit oracle-checked; pairs via hammingPairs64)."),

    // ------------------------------------------------------------------
    "m07_crossmodal_pairs" -> QueryDef(
      fn = { (s, dir) =>
        // The PAIRING half of multimodal near-dup detection (m05/m06
        // are the extraction halves): the fixture has no image-level
        // near-dups (its text near-dups sit at byte-cell hamming >=
        // 13), so near-dup partners are PLANTED deterministically —
        // every 20th doc gets a copy with one payload bit flipped,
        // which moves one dHash cell sum / one PCM window energy by
        // at most 1 and leaves the planted pair within hamming <= 2
        // on both hashes. Both modalities then pair through the ONE
        // banded hammingPairs64 operator (EXACT at maxHamming <
        // bands by pigeonhole; identical-hash floods collapse via
        // the canonicalize-first star). Hash-checked (round 8): both
        // hashes are pure integer arithmetic over payload bytes, the
        // banded join is EXACT below maxHamming, and the star/expand
        // output shape is deterministic -- so DuckDB rebuilds the
        // whole thing (hashes, planted copies, star-within /
        // bipartite-across pairing) from the documents table. ASCII
        // envelope structural on both sides (the m09 lesson); planted
        // pairs additionally asserted one-by-one in MultimodalSpec.
        val asciiIds = Engine.Tables(s, dir).documents
          .filter(length(col("text")) === octet_length(col("text")))
          .select(col("doc_id"))
        val base = fakeImages(s, dir)
          .join(asciiIds, Seq("doc_id"), "left_semi")
        val schema = StructType(Seq(
          StructField("doc_id", LongType),
          StructField("image", BinaryType)))
        val planted = base.filter(col("doc_id") % 20 === 0)
          .mapPartitions { it =>
            it.map { r =>
              val img = r.getAs[Array[Byte]](1).clone()
              if (img.length > 17) {
                val pos = 16 + (img.length - 16) / 2
                img(pos) = (img(pos) ^ 1).toByte
              }
              Row(r.getLong(0) + 1000000L, img)
            }
          }(RowEncoder.encoderFor(schema))
        val all = base.unionByName(planted)
        val img = graft.operators.Dedup.hammingPairs64(
          graft.operators.Multimodal.imageDHash(all, "doc_id", "image"),
          "doc_id", "dhash", maxHamming = 4)
          .select(lit("image").as("modality"),
            col("id_a"), col("id_b"), col("hamming"))
        val aud = graft.operators.Dedup.hammingPairs64(
          graft.operators.Multimodal.audioDHash(all, "doc_id", "image"),
          "doc_id", "adhash", maxHamming = 4)
          .select(lit("audio").as("modality"),
            col("id_a"), col("id_b"), col("hamming"))
        img.unionByName(aud)
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bs
          FROM documents
          WHERE length(text) = octet_length(encode(text))),
        pl AS (
          SELECT doc_id + 1000000 AS doc_id,
                 CASE WHEN len(bs) >= 2
                      THEN list_concat(list_concat(
                             bs[1 : len(bs) // 2],
                             [CAST(xor(bs[len(bs) // 2 + 1], 1) AS BIGINT)]),
                             bs[len(bs) // 2 + 2 : len(bs)])
                      ELSE bs END AS bs
          FROM d WHERE doc_id % 20 = 0),
        allp AS (SELECT * FROM d UNION ALL SELECT * FROM pl),
        icell AS (
          SELECT doc_id,
                 list_transform(range(0, 64), k -> struct_pack(
                   s := coalesce(list_sum(
                     bs[(k * len(bs)) // 64 + 1 :
                        least(greatest((k * len(bs)) // 64 + 1,
                                       ((k + 1) * len(bs)) // 64), len(bs))]),
                     0),
                   c := greatest(1,
                     least(greatest((k * len(bs)) // 64 + 1,
                                    ((k + 1) * len(bs)) // 64), len(bs))
                       - (k * len(bs)) // 64))) AS cl
          FROM allp WHERE len(bs) >= 1),
        ih AS (
          SELECT doc_id, CAST(list_sum(list_transform(range(0, 63),
                   k -> CASE WHEN cl[k + 1].s * cl[k + 2].c >
                                  cl[k + 2].s * cl[k + 1].c
                        THEN (1::BIGINT << k) ELSE 0::BIGINT END))
                 AS BIGINT) AS h
          FROM icell),
        sm AS (
          SELECT doc_id, len(bs) // 2 AS n2,
                 list_transform(range(0, len(bs) // 2),
                   i -> CASE WHEN bs[2 * i + 2] >= 128
                        THEN bs[2 * i + 2] * 256 + bs[2 * i + 1] - 65536
                        ELSE bs[2 * i + 2] * 256 + bs[2 * i + 1] END) AS sp
          FROM allp WHERE len(bs) // 2 >= 1),
        acell AS (
          SELECT doc_id,
                 list_transform(range(0, 64), w -> struct_pack(
                   s := coalesce(list_sum(list_transform(
                     sp[(w * n2) // 64 + 1 :
                        least(greatest((w * n2) // 64 + 1,
                                       ((w + 1) * n2) // 64), n2)],
                     x -> x * x)), 0),
                   c := greatest(1,
                     least(greatest((w * n2) // 64 + 1,
                                    ((w + 1) * n2) // 64), n2)
                       - (w * n2) // 64))) AS cl
          FROM sm),
        ah AS (
          SELECT doc_id, CAST(list_sum(list_transform(range(0, 63),
                   k -> CASE WHEN cl[k + 1].s * cl[k + 2].c >
                                  cl[k + 2].s * cl[k + 1].c
                        THEN (1::BIGINT << k) ELSE 0::BIGINT END))
                 AS BIGINT) AS h
          FROM acell),
        ig AS (SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS keep
               FROM ih),
        iex AS (SELECT keep AS id_a, doc_id AS id_b, 0 AS hamming
                FROM ig WHERE doc_id != keep),
        irep AS (SELECT doc_id AS id, h FROM ig WHERE doc_id = keep),
        irp AS (SELECT a.id AS ra, b.id AS rb,
                       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
                FROM irep a, irep b
                WHERE a.id < b.id AND bit_count(xor(a.h, b.h)) <= 4),
        iexp AS (SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                        greatest(ma.doc_id, mb.doc_id) AS id_b, rp.hamming
                 FROM irp rp JOIN ig ma ON ma.keep = rp.ra
                             JOIN ig mb ON mb.keep = rp.rb),
        ipairs AS (
          SELECT 'image' AS modality, id_a, id_b, min(hamming) AS hamming
          FROM (SELECT * FROM iex UNION ALL SELECT * FROM iexp)
          GROUP BY id_a, id_b),
        ag AS (SELECT doc_id, h, min(doc_id) OVER (PARTITION BY h) AS keep
               FROM ah),
        aex AS (SELECT keep AS id_a, doc_id AS id_b, 0 AS hamming
                FROM ag WHERE doc_id != keep),
        arep AS (SELECT doc_id AS id, h FROM ag WHERE doc_id = keep),
        arp AS (SELECT a.id AS ra, b.id AS rb,
                       CAST(bit_count(xor(a.h, b.h)) AS INT) AS hamming
                FROM arep a, arep b
                WHERE a.id < b.id AND bit_count(xor(a.h, b.h)) <= 4),
        aexp AS (SELECT least(ma.doc_id, mb.doc_id) AS id_a,
                        greatest(ma.doc_id, mb.doc_id) AS id_b, rp.hamming
                 FROM arp rp JOIN ag ma ON ma.keep = rp.ra
                             JOIN ag mb ON mb.keep = rp.rb),
        apairs AS (
          SELECT 'audio' AS modality, id_a, id_b, min(hamming) AS hamming
          FROM (SELECT * FROM aex UNION ALL SELECT * FROM aexp)
          GROUP BY id_a, id_b)
        SELECT modality, id_a, id_b, CAST(hamming AS INT) AS hamming
        FROM (SELECT * FROM ipairs UNION ALL SELECT * FROM apairs)"""),
      doc = "Cross-modal near-dup pairing: planted image/audio " +
        "near-dups found via the shared banded hammingPairs64 " +
        "(exact at maxHamming < bands); hash-checked end-to-end."),

    // ------------------------------------------------------------------
    "m08_loudest_windows" -> QueryDef(
      fn = { (s, dir) =>
        // Energy localization: the 3 loudest 256-sample PCM windows
        // per doc — the primitive under silence trimming / onset
        // detection / loudest-segment sampling. Window energies are
        // exact BIGINT sums of squared int16 samples, so DuckDB
        // rebuilds every energy bit-for-bit from the raw bytes; the
        // top-3 cut ranks on (energy desc, win) for a total order.
        val en = graft.operators.Multimodal.audioWindowEnergies(
          fakeImages(s, dir), "doc_id", "image", window = 256)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("energy").desc, col("win"))
        en.withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 3)
      },
      oracle = Some("""
        WITH la AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bs,
                 length(text) // 2 AS n
          FROM documents
          WHERE length(text) >= 2),
        sm AS (
          -- signed little-endian int16, mirroring the engine's decode:
          -- a high byte >= 0x80 is a negative sample (s - 65536), not
          -- an unsigned reconstruction that happens to agree on the
          -- ASCII fixture
          SELECT doc_id, n,
                 list_transform(range(0, n),
                   i -> CASE WHEN bs[2*i + 2] >= 128
                        THEN bs[2*i + 2] * 256 + bs[2*i + 1] - 65536
                        ELSE bs[2*i + 2] * 256 + bs[2*i + 1] END) AS s
          FROM la),
        wins AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, n // 256),
                   w -> struct_pack(
                     win := CAST(w AS INTEGER),
                     energy := CAST(list_sum(list_transform(
                       s[w*256 + 1 : (w+1)*256],
                       x -> x * x)) AS BIGINT)))) AS u
          FROM sm WHERE n >= 256),
        ranked AS (
          SELECT doc_id, u.win AS win, u.energy AS energy,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY u.energy DESC, u.win) AS rank
          FROM wins)
        SELECT doc_id, win, energy, CAST(rank AS INTEGER) AS rank
        FROM ranked WHERE rank <= 3"""),
      doc = "Top-3 loudest PCM windows per doc (exact integer window " +
        "energies; localization primitive for trimming/sampling)."),

    // ------------------------------------------------------------------
    "m09_scene_cuts" -> QueryDef(
      fn = { (s, dir) =>
        // Shot-boundary detection over the frame stream — the
        // primitive under video clip extraction for multimodal
        // training: a cut is a frame boundary whose L1 byte diff
        // clears the threshold (1050 ~ p85 of the fixture's boundary
        // diffs, so cuts are selective, not everything/nothing).
        // Integer-exact -> engine-portable threshold. Both sides
        // scope to single-byte (ASCII) docs EXPLICITLY — the oracle
        // indexes text by CHAR while the engine walks payload BYTES,
        // so the envelope is a predicate both engines apply, not a
        // fixture assumption (the m06/m08 lesson, made structural).
        val asciiIds = Engine.Tables(s, dir).documents
          .filter(length(col("text")) === octet_length(col("text")))
          .select(col("doc_id"))
        // The restriction semi-joins the FRAME SOURCE, below the
        // byte-diff pass: frameDiffs is an operator boundary Catalyst
        // cannot push a predicate through, so filtering after it
        // would run the expensive scan on rows the join discards
        // (PlanShapeSpec pins the join below the MapPartitions).
        graft.operators.Multimodal.frameDiffs(
          fakeImages(s, dir).join(asciiIds, Seq("doc_id"), "left_semi"),
          "doc_id", "image", frameBytes = 32)
          .filter(col("diff") >= 1050)
      },
      oracle = Some("""
        WITH la AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bs,
                 octet_length(encode(text)) // 32 AS nf
          FROM documents
          WHERE length(text) = octet_length(encode(text))
            AND octet_length(encode(text)) >= 64),
        d AS (
          SELECT doc_id, unnest(list_transform(range(1, nf),
            i -> struct_pack(b := CAST(i AS INTEGER),
              diff := CAST(list_sum(list_transform(range(0, 32),
                j -> abs(bs[i*32 + j + 1] - bs[(i-1)*32 + j + 1])))
                AS BIGINT)))) AS u
          FROM la)
        SELECT doc_id, u.b AS boundary_idx, u.diff AS diff
        FROM d WHERE u.diff >= 1050"""),
      doc = "Scene-cut detection: L1 frame-to-frame byte diffs over " +
        "the thresholded boundary stream (integer-exact, map-only)."),

    // ------------------------------------------------------------------
    "m10_caption_align" -> QueryDef(
      fn = { (s, dir) =>
        // Cross-modal temporal alignment — the join that builds
        // (frame, caption) training pairs for VLM data: each caption
        // is matched to the LAST video frame at-or-before its
        // timestamp (as-of semantics). The frame track comes off the
        // binary column via the real sampleFrames plumbing (25 fps ->
        // 40 ms cadence); the caption track is a deterministic
        // 97 ms grid so the two tracks interleave irregularly.
        // Shape: q26's single-shuffle union+sort as-of (no join
        // operator at all) — both tracks union into one stream,
        // one window pass per doc carries the latest frame_idx
        // forward; at 100 TB that is one partition-by-doc shuffle,
        // vs. a per-caption range probe. Frames order BEFORE
        // captions on (impossible-here) ts ties so the match is
        // at-or-before, mirroring ASOF JOIN's >=.
        val frames = graft.operators.Multimodal.sampleFrames(
            fakeImages(s, dir), "doc_id", "image",
            frameBytes = 32, everyN = 1)
          .select(col("doc_id"), col("frame_idx"),
            (col("frame_idx").cast("long") * 40000L).as("ts_us"))
        val captions = Engine.Tables(s, dir).documents
          .filter(octet_length(col("text")) > 0)
          .select(col("doc_id"),
            explode(sequence(lit(0),
              expr("(octet_length(text) + 99) div 100 - 1")
                .cast("int"))).as("cap_idx"))
          .select(col("doc_id"), col("cap_idx"),
            (col("cap_idx").cast("long") * 97000L + 13L).as("ts_us"))
        val tagged = frames
          .select(col("doc_id"), col("ts_us"), col("frame_idx"),
            lit(null).cast("int").as("cap_idx"))
          .unionByName(captions
            .select(col("doc_id"), col("ts_us"),
              lit(null).cast("int").as("frame_idx"), col("cap_idx")))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("ts_us"), col("frame_idx").isNull.cast("int"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        tagged
          .withColumn("f", last(col("frame_idx"), ignoreNulls = true).over(w))
          .filter(col("cap_idx").isNotNull && col("f").isNotNull)
          .select(col("doc_id"), col("cap_idx"),
            col("ts_us").as("cap_ts_us"), col("f").as("frame_idx"),
            (col("f").cast("long") * 40000L).as("frame_ts_us"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT doc_id, CAST(i AS INT) AS frame_idx,
                 CAST(i * 40000 AS BIGINT) AS f_ts
          FROM (SELECT doc_id,
                       unnest(range(0, octet_length(encode(text)) // 32)) AS i
                FROM documents)),
        c AS (
          SELECT doc_id, CAST(k AS INT) AS cap_idx,
                 CAST(k * 97000 + 13 AS BIGINT) AS c_ts
          FROM (SELECT doc_id,
                       unnest(range(0,
                         (octet_length(encode(text)) + 99) // 100)) AS k
                FROM documents WHERE octet_length(encode(text)) > 0))
        SELECT c.doc_id, c.cap_idx, c.c_ts AS cap_ts_us,
               f.frame_idx, f.f_ts AS frame_ts_us
        FROM c ASOF JOIN f
          ON c.doc_id = f.doc_id AND c.c_ts >= f.f_ts"""),
      doc = "Cross-modal caption-to-frame as-of alignment (25 fps " +
        "frame track off the binary column vs a 97 ms caption grid; " +
        "single-shuffle union+sort as-of, oracled by ASOF JOIN)."),

    // ------------------------------------------------------------------
    "m11_vad_segments" -> QueryDef(
      fn = { (s, dir) =>
        // Voice-activity segments — the primitive under silence
        // trimming and speech-clip extraction for audio training
        // data: an ACTIVE window clears the energy threshold (~p55 of
        // the fixture's 16-sample window energies, so activity is
        // selective), and a SEGMENT is a maximal run of consecutive
        // active windows (gaps-and-islands: win - row_number is
        // constant exactly within a run). Energies are exact BIGINT
        // sums of squared signed int16 samples (m08's decode), so
        // every segment boundary is engine-portable. ASCII envelope
        // applied structurally on both sides, below the decode
        // (the m09 pattern). Scale: decode is map-only; the one
        // shuffle partitions by doc_id for the run numbering, then
        // the segment agg reuses the same partitioning — no second
        // exchange.
        val asciiIds = Engine.Tables(s, dir).documents
          .filter(length(col("text")) === octet_length(col("text")))
          .select(col("doc_id"))
        val en = graft.operators.Multimodal.audioWindowEnergies(
          fakeImages(s, dir).join(asciiIds, Seq("doc_id"), "left_semi"),
          "doc_id", "image", window = 16)
        val active = en.filter(col("energy") >= 10500000000L)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("win"))
        active
          .withColumn("g", col("win") - row_number().over(w))
          .groupBy(col("doc_id"), col("g"))
          .agg(min(col("win")).as("seg_start"),
            max(col("win")).as("seg_end"),
            count(lit(1)).cast("int").as("n_windows"),
            sum(col("energy")).as("seg_energy"))
          .select(col("doc_id"), col("seg_start"), col("seg_end"),
            col("n_windows"), col("seg_energy"))
      },
      oracle = Some("""
        WITH la AS (
          SELECT doc_id,
                 list_transform(range(1, length(text) + 1),
                   i -> CAST(ascii(substring(text, i, 1)) AS BIGINT)) AS bs,
                 length(text) // 2 AS n
          FROM documents
          WHERE length(text) = octet_length(encode(text))
            AND length(text) >= 32),
        sm AS (
          SELECT doc_id, n,
                 list_transform(range(0, n),
                   i -> CASE WHEN bs[2*i + 2] >= 128
                        THEN bs[2*i + 2] * 256 + bs[2*i + 1] - 65536
                        ELSE bs[2*i + 2] * 256 + bs[2*i + 1] END) AS s
          FROM la),
        wins AS (
          SELECT doc_id,
                 unnest(list_transform(range(0, n // 16),
                   w -> struct_pack(
                     win := CAST(w AS INTEGER),
                     energy := CAST(list_sum(list_transform(
                       s[w*16 + 1 : (w+1)*16],
                       x -> x * x)) AS BIGINT)))) AS u
          FROM sm WHERE n >= 16),
        act AS (
          SELECT doc_id, u.win AS win, u.energy AS energy
          FROM wins WHERE u.energy >= 10500000000),
        grp AS (
          SELECT doc_id, win, energy,
                 win - row_number() OVER (PARTITION BY doc_id
                   ORDER BY win) AS g
          FROM act)
        SELECT doc_id, CAST(min(win) AS INT) AS seg_start,
               CAST(max(win) AS INT) AS seg_end,
               CAST(count(*) AS INT) AS n_windows,
               CAST(sum(energy) AS BIGINT) AS seg_energy
        FROM grp GROUP BY doc_id, g"""),
      doc = "Voice-activity segments: maximal runs of " +
        "above-threshold PCM windows (gaps-and-islands over exact " +
        "integer energies; silence-trim primitive)."),

    // ------------------------------------------------------------------
    "m12_wds_samples" -> QueryDef(
      fn = { (s, dir) =>
        // WebDataset SAMPLE pairing, round-tripped through the tar
        // container: each doc ships as two members ("doc_<id>.txt"
        // text + "doc_<id>.json" metadata), packs into shards, reads
        // back, and TarShards.groupSamples re-pairs them by basename
        // — the multimodal access pattern (image+caption+meta as one
        // sample) with text standing in for the codec-less payloads.
        // Hash-checked INCLUDING content: the lang field is parsed
        // back OUT of the tar'd json member, so a green hash proves
        // the members paired correctly and survived byte-exact.
        // Scale: one shuffle to shard on write, one groupBy on the
        // sample key back out; no shuffle carries payloads twice.
        val tmp = m12TmpDir(dir)
        val docs = Engine.Tables(s, dir).documents
        val shardOf = pmod(col("doc_id"), lit(8)).cast("string")
        val txt = docs.select(
          concat(lit("doc_"), col("doc_id"), lit(".txt")).as("name"),
          encode(col("text"), "UTF-8").as("bytes"), shardOf.as("shard"))
        val meta = docs.select(
          concat(lit("doc_"), col("doc_id"), lit(".json")).as("name"),
          encode(to_json(struct(col("doc_id"), col("lang"))), "UTF-8")
            .as("bytes"),
          shardOf.as("shard"))
        graft.sources.TarShards.writeShards(
          txt.unionByName(meta), "name", "bytes", "shard", tmp).count()
        graft.sources.TarShards
          .groupSamples(graft.sources.TarShards.readShards(s, tmp))
          .select(
            regexp_extract(col("sample_key"), "doc_(\\d+)", 1)
              .cast("long").as("doc_id"),
            col("n_parts"),
            octet_length(element_at(col("parts"), "txt"))
              .as("txt_bytes"),
            get_json_object(
              decode(element_at(col("parts"), "json"), "UTF-8"),
              "$.lang").as("lang"),
            col("total_bytes"))
      },
      oracle = Some("""
        SELECT doc_id, CAST(2 AS INT) AS n_parts,
               CAST(octet_length(encode(text)) AS INT) AS txt_bytes,
               lang,
               CAST(octet_length(encode(text)) +
                    octet_length(encode('{"doc_id":'
                      || CAST(doc_id AS VARCHAR)
                      || ',"lang":"' || lang || '"}')) AS BIGINT)
                 AS total_bytes
        FROM documents"""),
      doc = "WebDataset sample pairing through the tar container: " +
        "members re-group by basename into (modality -> bytes) " +
        "samples; lang parsed back out of the tar'd json member " +
        "proves byte-exact pairing."),

    // ------------------------------------------------------------------
    "m13_resize" -> QueryDef(
      fn = { (s, dir) =>
        // The resize leg of the decode/feature/resize/frame-sample
        // plumbing: batch-resize every image to 100x50 and re-decode
        // both generations. GRFT stubs get their header dims
        // rewritten with the payload untouched (n_payload_bytes
        // proves it); the REAL bilinear resample for JDK-decodable
        // formats is pinned by MultimodalSpec on generated PNGs —
        // the Spark-side plumbing (mapPartitions batch shape, binary
        // schema) is identical for both.
        val imgs = fakeImages(s, dir)
        val orig = Multimodal.decodeImages(imgs, "doc_id", "image")
          .select(col("doc_id"),
            col("width").as("old_w"), col("height").as("old_h"))
        val rez = Multimodal.decodeImages(
          Multimodal.resizeImages(imgs, "doc_id", "image", 100, 50),
          "doc_id", "image")
          .select(col("doc_id"),
            col("width").as("new_w"), col("height").as("new_h"),
            col("format"), col("n_payload_bytes"))
        orig.join(rez, Seq("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(64 + doc_id % 512 AS INT) AS old_w,
               CAST(48 + doc_id % 256 AS INT) AS old_h,
               CAST(100 AS INT) AS new_w,
               CAST(50 AS INT) AS new_h,
               CASE doc_id % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                               ELSE 'webp' END AS format,
               octet_length(encode(text)) AS n_payload_bytes
        FROM documents"""),
      doc = "Batch image resize: header dims rewritten, payload " +
        "byte-identical (stub path; real bilinear resample " +
        "spec-pinned on PNGs and driver-gated via m14)."),

    // ------------------------------------------------------------------
    "m14_resize_png" -> QueryDef(
      fn = { (s, dir) =>
        // m13's REAL-decoder leg under the driver gate: one synthetic
        // CONSTANT-COLOR PNG per document row (javax.imageio encode,
        // distributed map), bilinear-resized through the same
        // resizeImages path as m13 and then FULLY re-decoded — dims
        // from the re-encoded PNG header, channel means from the
        // resampled pixels. Constant color is the oracle trick: a
        // bilinear resample of a constant image is that constant at
        // ANY scale (every interpolation weight set sums to 1), so
        // the decoded means are exact integers DuckDB derives from
        // doc_id alone — the decode -> resample -> re-encode ->
        // decode pipeline is content-proven end-to-end, not just
        // header-proven. Scale shape: both passes are map-only
        // mapPartitions (no shuffle but the final join's, which m13
        // shares); pixel work is bounded by the fixture dims.
        // materialize both image frames once: pngs feeds orig + the
        // resize, rez feeds dims + features — without the checkpoints
        // the PNG encode runs three times and the resample twice
        val pngs = realPngs(s, dir).localCheckpoint()
        val orig = Multimodal.decodeImages(pngs, "doc_id", "image")
          .select(col("doc_id"),
            col("width").as("old_w"), col("height").as("old_h"))
        val rez = Multimodal.resizeImages(pngs, "doc_id", "image", 10, 7)
          .localCheckpoint()
        val dims = Multimodal.decodeImages(rez, "doc_id", "image")
          .select(col("doc_id"),
            col("width").as("new_w"), col("height").as("new_h"),
            col("format"))
        val feats = Multimodal.imageFeatures(rez, "doc_id", "image")
          .select(col("doc_id"), col("mean_r"), col("mean_g"),
            col("mean_b"), col("valid"))
        orig.join(dims, Seq("doc_id")).join(feats, Seq("doc_id"))
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(8 + doc_id % 16 AS INT) AS old_w,
               CAST(6 + doc_id % 8 AS INT) AS old_h,
               CAST(10 AS INT) AS new_w,
               CAST(7 AS INT) AS new_h,
               'png' AS format,
               CAST(doc_id % 256 AS DOUBLE) AS mean_r,
               CAST((doc_id * 7) % 256 AS DOUBLE) AS mean_g,
               CAST((doc_id * 13) % 256 AS DOUBLE) AS mean_b,
               true AS valid
        FROM documents"""),
      doc = "Real-decoder image resize: JDK PNG decode -> bilinear " +
        "resample -> PNG re-encode -> decode, content-proven by " +
        "constant-color channel means (hash-checked)."),

    // ------------------------------------------------------------------
    "m15_wav_meta" -> QueryDef(
      fn = { (s, dir) =>
        // REAL audio container metadata: one RIFF/WAVE file per doc
        // (channels/rate/frame-count all doc_id-derived), parsed by a
        // genuine chunk WALK — every 5th file carries an odd-length
        // LIST chunk ahead of fmt, so a parser that reads fixed
        // offsets or forgets the RIFF pad byte misparses 20% of the
        // corpus. duration_us is exact integer arithmetic
        // (n_frames * 1e6 / rate, floor division in both engines).
        // The m08 PCM stats family reads payloads; this reads the
        // CONTAINER — together they cover how audio actually arrives
        // in a crawl. Map-only both passes.
        val wavs = realWavs(s, dir)
        Multimodal.wavMeta(wavs, "doc_id", "wav")
      },
      oracle = Some("""
        SELECT doc_id,
               CAST(1 + doc_id % 2 AS INT) AS channels,
               CAST(8000 + (doc_id % 3) * 4000 AS INT) AS sample_rate,
               CAST(16 AS INT) AS bits_per_sample,
               CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
               CAST((100 + doc_id % 50) * 1000000
                 // (8000 + (doc_id % 3) * 4000) AS BIGINT) AS duration_us,
               true AS valid
        FROM documents"""),
      doc = "RIFF/WAVE container metadata via a real chunk walk " +
        "(unknown chunks skipped by size, pad bytes honored, " +
        "overruns fail loud) — exact integer duration (hash-checked)."))

  /** One temp shard dir per sfDir for m12, cleaned at JVM exit
    * (p05TmpDir's pattern; separate dir — m12's member set differs).
    */
  private val m12Dirs =
    scala.collection.concurrent.TrieMap.empty[String, String]
  private def m12TmpDir(dir: String): String =
    m12Dirs.getOrElseUpdate(dir, {
      val f = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft-tar-m12-${Integer.toHexString(dir.hashCode)}")
      f.mkdirs()
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(_.delete())
        f.delete()
        ()
      }))
      f.toString
    })
}
