package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** WebDataset-style tar shards — the de-facto container for
  * image/text/audio training samples (a shard is a plain USTAR
  * archive whose members are the samples; readers stream members in
  * file order). Both directions are pure JVM (USTAR is 512-byte
  * headers + padded payloads, no codec), executor-side, and
  * shard-parallel: a shard never crosses a task boundary in either
  * direction, so a 100 TB corpus moves as independent multi-GB tars
  * with zero shuffle beyond the one partitioning by shard key.
  *
  * Reference scope: the reference ships whole files through S3
  * PUT/GET one job per file (SendJobs.py:31, GetJobs.py:51); tar
  * shards are the same blob-in/blob-out contract batched to
  * archive granularity, which is what an object store needs at
  * training scale (millions of tiny samples -> thousands of tars).
  */
object TarShards {

  private val BlockSize = 512

  /** Serialize (name, bytes) entries into one deterministic USTAR
    * archive: mode 0644, uid/gid 0, mtime 0, no prefix (names must
    * fit 100 bytes), two zero blocks at the end — byte-identical for
    * identical input order.
    */
  def pack(entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    entries.foreach { case (name, bytes) =>
      val nameB = name.getBytes("UTF-8")
      require(nameB.length <= 100,
        s"tar member name exceeds ustar's 100 bytes: $name")
      val h = new Array[Byte](BlockSize)
      def put(off: Int, s: String): Unit = {
        val b = s.getBytes("UTF-8")
        System.arraycopy(b, 0, h, off, b.length)
      }
      System.arraycopy(nameB, 0, h, 0, nameB.length)
      put(100, "0000644")            // mode
      put(108, "0000000")            // uid
      put(116, "0000000")            // gid
      put(124, f"${bytes.length}%011o") // size, octal
      put(136, "00000000000")        // mtime
      h(156) = '0'                   // typeflag: regular file
      put(257, "ustar")              // magic (NUL-terminated by zero fill)
      put(263, "00")                 // version
      // checksum: header summed with the checksum field as spaces
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      var sum = 0
      var i = 0
      while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
      put(148, f"$sum%06o")
      h(154) = 0
      h(155) = ' '
      out.write(h)
      out.write(bytes)
      val pad = (BlockSize - bytes.length % BlockSize) % BlockSize
      if (pad > 0) out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](2 * BlockSize)) // end-of-archive
    out.toByteArray
  }

  /** Stream (name, bytes) members out of a USTAR archive. Tolerates a
    * truncated trailer (some writers skip the zero blocks) but fails
    * loudly on a corrupt header checksum — a half-written shard must
    * not silently yield half a training set.
    */
  def unpack(tar: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var off = 0
      private def headerAt(o: Int): Boolean =
        o + BlockSize <= tar.length && tar(o) != 0
      override def hasNext: Boolean = headerAt(off)
      override def next(): (String, Array[Byte]) = {
        val h = java.util.Arrays.copyOfRange(tar, off, off + BlockSize)
        var stored = 0
        var i = 148
        while (i < 156) {
          val c = h(i) & 0xff
          if (c >= '0' && c <= '7') stored = stored * 8 + (c - '0')
          i += 1
        }
        java.util.Arrays.fill(h, 148, 156, ' '.toByte)
        var sum = 0
        i = 0
        while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
        require(sum == stored,
          s"tar header checksum mismatch at offset $off ($sum != $stored)")
        val nameEnd = {
          var e = 0
          while (e < 100 && h(e) != 0) e += 1
          e
        }
        val name = new String(h, 0, nameEnd, "UTF-8")
        var size = 0L
        i = 124
        while (i < 136) {
          val c = h(i) & 0xff
          if (c >= '0' && c <= '7') size = size * 8 + (c - '0')
          i += 1
        }
        val dataOff = off + BlockSize
        require(dataOff + size <= tar.length,
          s"tar member $name truncated (need $size bytes)")
        val bytes = java.util.Arrays.copyOfRange(
          tar, dataOff, dataOff + size.toInt)
        off = dataOff + size.toInt +
          ((BlockSize - size.toInt % BlockSize) % BlockSize)
        (name, bytes)
      }
    }

  /** Write one tar per distinct `shardCol` value under `outDir`
    * (shard-<value>.tar), members sorted by name for deterministic
    * bytes. Executor-side IO through the Hadoop FS API — no driver
    * collect; one task per shard. A shard must fit a task's memory:
    * callers size shards the same way they size TableSync buckets
    * (thousands of shards of a few GB at 100 TB).
    *
    * Returns the shard manifest (shard, n_members, n_bytes).
    */
  def writeShards(df: DataFrame, nameCol: String, binCol: String,
      shardCol: String, outDir: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("n_members", IntegerType),
      StructField("n_bytes", LongType)))
    df.select(col(shardCol).cast("string").as("shard"),
        col(nameCol).cast("string").as("name"), col(binCol).as("bytes"))
      .as[(String, String, Array[Byte])]
      .groupByKey(_._1)
      .mapGroups { (shard, it) =>
        val members = it.map(r => (r._2, r._3)).toArray.sortBy(_._1)
        val tar = pack(members.iterator)
        val p = new Path(outDir, s"shard-$shard.tar")
        val fs = p.getFileSystem(conf.value)
        val o = fs.create(p, true)
        try o.write(tar) finally o.close()
        Row(shard, members.length, tar.length.toLong)
      }(RowEncoder.encoderFor(schema))
      .toDF()
  }

  /** Streaming shard sink: each micro-batch packs into its own tar
    * generation (`shard-<value>.b<batchId>.tar`), so a batch is
    * re-written idempotently under foreachBatch replay (same batchId
    * -> same file names -> overwrite, never duplicate members) and
    * the reader unions generations by glob. This is the WebDataset
    * INGEST path for streams: samples accumulate as append-only tar
    * generations, and a later `Layout.compact`-style pass can merge
    * small generations offline without touching the stream.
    */
  def shardSink(events: org.apache.spark.sql.DataFrame, nameCol: String,
      binCol: String, shardCol: String, outDir: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeShards(
          batch.withColumn(shardCol,
            concat(col(shardCol).cast("string"), lit(s".b$batchId"))),
          nameCol, binCol, shardCol, outDir)
          .collect() // force the per-shard writes; manifest is tiny
        ()
      }
      .start()

  /** Read every `*.tar` under `dir` back into (shard, name, content):
    * one input partition per shard file (binaryFiles), members
    * streamed in archive order — the WebDataset access pattern.
    */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("name", StringType),
      StructField("content", BinaryType)))
    val rows = spark.sparkContext
      .binaryFiles(s"$dir/*.tar")
      .flatMap { case (path, stream) =>
        val shard = {
          val f = path.substring(path.lastIndexOf('/') + 1)
          f.stripPrefix("shard-").stripSuffix(".tar")
        }
        unpack(stream.toArray()).map { case (n, b) => Row(shard, n, b) }
      }
    spark.createDataFrame(rows, schema)
  }
}
