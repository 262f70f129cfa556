package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, EOFException, InputStream, OutputStream}

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
  * Memory contract (round 9): both directions STREAM — `pack` writes
  * member-at-a-time to an OutputStream and `unpack` reads
  * header-by-header from an InputStream, so per-task heap is ONE
  * member, not the shard (the multi-GB-shard design the scaladoc
  * promises is now real, not aspirational). `writeShards` feeds pack
  * from a (shard, name)-sorted iterator — no group materialization —
  * and enforces a configurable `maxShardBytes` cap that fails loudly
  * naming the shard instead of dying as an executor OOM downstream.
  *
  * Reference scope: the reference ships whole files through S3
  * PUT/GET one job per file (SendJobs.py:31, GetJobs.py:51); tar
  * shards are the same blob-in/blob-out contract batched to
  * archive granularity, which is what an object store needs at
  * training scale (millions of tiny samples -> thousands of tars).
  */
object TarShards {

  private val BlockSize = 512

  /** Write one USTAR member (header + payload + padding) to `out`:
    * mode 0644, uid/gid 0, mtime 0, no prefix (names must fit 100
    * bytes), deterministic bytes for identical input. Returns the
    * bytes written (BlockSize + padded payload).
    */
  def writeMember(out: OutputStream, name: String, bytes: Array[Byte]): Long = {
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
    BlockSize.toLong + bytes.length + pad
  }

  /** End-of-archive marker (two zero blocks). Returns bytes written. */
  def writeTrailer(out: OutputStream): Long = {
    out.write(new Array[Byte](2 * BlockSize))
    2L * BlockSize
  }

  /** Stream (name, bytes) entries into `out` as one deterministic
    * USTAR archive, member-at-a-time — per-call heap is ONE member
    * regardless of archive size. Returns total bytes written.
    */
  def pack(entries: Iterator[(String, Array[Byte])], out: OutputStream): Long = {
    var total = 0L
    entries.foreach { case (name, bytes) =>
      total += writeMember(out, name, bytes)
    }
    total + writeTrailer(out)
  }

  /** Convenience form materializing the archive (tests, tiny shards). */
  def pack(entries: Iterator[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    pack(entries, out)
    out.toByteArray
  }

  /** Parsed USTAR header: prefix-joined name, payload size, typeflag.
    * Verifies the checksum, failing loudly with the caller-supplied
    * offset for the message.
    */
  private def parseHeader(
      h: Array[Byte], headerOff: Long): (String, Long, Byte) = {
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
      s"tar header checksum mismatch at offset $headerOff " +
        s"($sum != $stored)")
    def field(off: Int, max: Int): String = {
      var e = 0
      while (e < max && h(off + e) != 0) e += 1
      new String(h, off, e, "UTF-8")
    }
    val rawName = field(0, 100)
    val prefix = field(345, 155)
    val name = if (prefix.isEmpty) rawName else s"$prefix/$rawName"
    // STRICT size parse: optional leading spaces, octal digits, then
    // only NUL/space terminators to the end of the field. The lenient
    // form (skip non-octal bytes anywhere) silently misparsed a
    // crafted checksum-valid header — "12x4" read as 124 — handing
    // downstream a wrong payload length: exactly the silent-truncation
    // class the adversarial-input gate (round-17 order #2) forbids.
    // Hostile size bytes still fail loudly; two checksum-valid,
    // unambiguous foreign-writer variants are handled specially:
    // leading-space padding (older tar writers right-justify with
    // spaces) parses, and GNU base-256 (first byte 0x80-flagged, used
    // for >8 GiB members) fails with its OWN message rather than a
    // generic malformed-field error — it is a real encoding we choose
    // not to support (shards cap at 8 GiB), not corruption.
    if ((h(124) & 0x80) != 0) throw new IllegalArgumentException(
      s"tar header at offset $headerOff uses GNU base-256 size " +
        s"encoding (member $name): >8 GiB members are unsupported")
    var size = 0L
    var seenDigit = false
    var terminated = false
    i = 124
    while (i < 136) {
      val c = h(i) & 0xff
      if (!terminated && c >= '0' && c <= '7') {
        size = size * 8 + (c - '0'); seenDigit = true
      } else if (c == ' ' && !seenDigit && !terminated) {
        () // leading pad space before the first digit
      } else if (c == 0 || c == ' ') terminated = true
      else throw new IllegalArgumentException(
        s"tar header at offset $headerOff has a malformed size field " +
          s"(non-octal byte 0x${c.toHexString} for member $name)")
      i += 1
    }
    (name, size, h(156))
  }

  /** Read exactly `size` payload bytes, allocation-bounded: sizes up
    * to one chunk allocate exactly (the hot path — training samples);
    * larger declared sizes stream in chunks so a LYING header (a
    * crafted ~2 GiB size over a 1 KB stream) fails loudly after
    * allocating only what the stream actually held, never a
    * multi-GiB up-front allocation an attacker controls.
    */
  private def readPayload(din: DataInputStream, size: Long,
      name: String): Array[Byte] = {
    // header-parsed sizes are non-negative by construction; a hostile
    // SIDECAR line can say anything — refuse with the loud class
    require(size >= 0,
      s"tar member $name declares a negative size ($size)")
    require(size <= Int.MaxValue,
      s"tar member $name exceeds 2 GiB (single-member limit)")
    val chunk = 1 << 20
    def truncated() = throw new IllegalArgumentException(
      s"tar member $name truncated (need $size bytes)")
    if (size <= chunk) {
      val bytes = new Array[Byte](size.toInt)
      try din.readFully(bytes)
      catch { case _: EOFException => truncated() }
      bytes
    } else {
      val out = new ByteArrayOutputStream(chunk)
      val buf = new Array[Byte](chunk)
      var left = size
      while (left > 0) {
        val want = math.min(left, chunk.toLong).toInt
        val n = din.read(buf, 0, want)
        if (n < 0) truncated()
        out.write(buf, 0, n)
        left -= n
      }
      out.toByteArray
    }
  }

  /** Stream (name, bytes) members out of a USTAR archive,
    * header-by-header — per-step heap is ONE member. Tolerates a
    * truncated trailer (some writers skip the zero blocks) but fails
    * loudly on a corrupt header checksum or a truncated member — a
    * half-written shard must not silently yield half a training set.
    *
    * Foreign-archive compatibility (system/ustar tar writers):
    *  - the ustar `prefix` field (offset 345) is honored — long paths
    *    split as prefix/name come back joined;
    *  - only regular-file entries (typeflag '0' or NUL) are emitted;
    *    directories, links, and PAX/GNU metadata entries are skipped
    *    (their payloads are consumed and discarded).
    */
  def unpack(in: InputStream): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private val din = new DataInputStream(in)
      private var offset = 0L
      private var ready: (String, Array[Byte]) = null
      private var done = false

      private def readBlock(h: Array[Byte]): Boolean = {
        var read = 0
        while (read < BlockSize) {
          val n = din.read(h, read, BlockSize - read)
          if (n < 0) return false // EOF: tolerated at a header boundary
          read += n
        }
        true
      }

      private def skipFully(n: Long, what: String): Unit = {
        var left = n
        while (left > 0) {
          val s = din.skip(left)
          if (s <= 0) {
            if (din.read() < 0)
              throw new IllegalArgumentException(
                s"tar member $what truncated (need $left more bytes)")
            left -= 1
          } else left -= s
        }
      }

      private def advance(): Unit = {
        while (ready == null && !done) {
          val h = new Array[Byte](BlockSize)
          if (!readBlock(h) || h(0) == 0) { done = true; return }
          val headerOff = offset
          offset += BlockSize
          val (name, size, typeflag) = parseHeader(h, headerOff)
          val padded = size + (BlockSize - size % BlockSize) % BlockSize
          if (typeflag == '0'.toByte || typeflag == 0.toByte) {
            val bytes = readPayload(din, size, name)
            skipFully(padded - size, name)
            offset += padded
            ready = (name, bytes)
          } else {
            // non-file entry (dir/link/PAX metadata): consume, skip
            skipFully(padded, name)
            offset += padded
          }
        }
      }

      override def hasNext: Boolean = { advance(); ready != null }
      override def next(): (String, Array[Byte]) = {
        advance()
        if (ready == null) throw new NoSuchElementException("tar exhausted")
        val r = ready
        ready = null
        r
      }
    }

  /** Convenience form over in-memory bytes (tests, small archives). */
  def unpack(tar: Array[Byte]): Iterator[(String, Array[Byte])] =
    unpack(new ByteArrayInputStream(tar))

  /** Index scan: (name, header offset, payload size) per regular-file
    * member, payloads SKIPPED rather than materialized — one pass of
    * header reads + seeks, so indexing a multi-GB shard allocates
    * nothing but 512-byte header blocks. Same header validation and
    * foreign-archive rules as [[unpack]].
    */
  def scanEntries(in: InputStream): Iterator[(String, Long, Long)] =
    new Iterator[(String, Long, Long)] {
      private val din = new DataInputStream(in)
      private var offset = 0L
      private var ready: (String, Long, Long) = null
      private var done = false

      private def readBlock(h: Array[Byte]): Boolean = {
        var read = 0
        while (read < BlockSize) {
          val n = din.read(h, read, BlockSize - read)
          if (n < 0) return false
          read += n
        }
        true
      }

      private def skipFully(n: Long, what: String): Unit = {
        var left = n
        while (left > 0) {
          val s = din.skip(left)
          if (s <= 0) {
            if (din.read() < 0)
              throw new IllegalArgumentException(
                s"tar member $what truncated (need $left more bytes)")
            left -= 1
          } else left -= s
        }
      }

      private def advance(): Unit = {
        while (ready == null && !done) {
          val h = new Array[Byte](BlockSize)
          if (!readBlock(h) || h(0) == 0) { done = true; return }
          val headerOff = offset
          offset += BlockSize
          val (name, size, typeflag) = parseHeader(h, headerOff)
          val padded = size + (BlockSize - size % BlockSize) % BlockSize
          skipFully(padded, name)
          offset += padded
          if (typeflag == '0'.toByte || typeflag == 0.toByte)
            ready = (name, headerOff, size)
        }
      }

      override def hasNext: Boolean = { advance(); ready != null }
      override def next(): (String, Long, Long) = {
        advance()
        if (ready == null) throw new NoSuchElementException("tar exhausted")
        val r = ready
        ready = null
        r
      }
    }

  /** Write one tar per distinct `shardCol` value under `outDir`
    * (shard-<value>.tar), members sorted by name for deterministic
    * bytes. Executor-side IO through the Hadoop FS API — no driver
    * collect; one shard per task, STREAMED: rows arrive
    * (shard, name)-sorted from the exchange and flow member-at-a-time
    * into the FS output, so per-task heap is one member even for
    * multi-GB shards. `maxShardBytes` fails loudly (naming the shard)
    * instead of letting a mis-keyed flood OOM an executor or produce
    * an unreadably large archive.
    *
    * Strand-death knobs for the call-time sweep (see the comment at
    * the sweep): `markerStaleMs` bounds how long a writer may stop
    * BEATING its `_live-` marker before it is presumed dead and its
    * strands collected — widen it when writers may legitimately pause
    * longer (long GC, suspended JVMs, store partitions); `staleTmpMs`
    * is the mtime age gate for MARKERLESS strands only (pre-liveness
    * layouts, or an owner that finished between listings).
    *
    * Returns the shard manifest (shard, n_members, n_bytes).
    */
  def writeShards(df: DataFrame, nameCol: String, binCol: String,
      shardCol: String, outDir: String,
      maxShardBytes: Long = 8L << 30,
      staleTmpMs: Long = 3600000L,
      markerStaleMs: Long = graft.Liveness.StaleAfterMs): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("n_members", IntegerType),
      StructField("n_bytes", LongType)))
    // hygiene: sweep stranded attempt tmps from PRIOR crashed jobs
    // over this outDir (a failed attempt's tmps are never published,
    // but nothing else ever deletes them — they would accumulate
    // forever); runs at call time, before this job's tasks create
    // their own. An unconditional sweep deleted the in-flight tmps of
    // a CONCURRENTLY running writeShards over the same outDir — the
    // dueling-zombie overlap the byte-determinism tiebreaker exists
    // to make safe — turning the elder attempt's publish rename into
    // a loud job failure. Liveness is therefore decided by the
    // writers' `_live-<task>` HEARTBEAT markers (graft.Liveness):
    // each writing task re-creates its marker every 30 s and strand
    // names embed the owning task's id, so a fresh marker keeps its
    // strands no matter how old their own mtimes are — an mtime age
    // gate alone is LOCAL-FS-ONLY reasoning (HDFS/object stores stamp
    // mtime at create/close, so a >threshold single-shard stream
    // looked dead while alive) — while a stale marker collects a
    // crash in ~`markerStaleMs` (default 10 min; callers widen it to
    // tolerate longer legitimate writer pauses). Markerless strands
    // (legacy layout, or a finished owner that removed its marker
    // before its failed attempts were listed) keep the old
    // `staleTmpMs` age gate as the fallback bound.
    val fsOut = new Path(outDir).getFileSystem(
      spark.sessionState.newHadoopConf())
    val now = System.currentTimeMillis()
    if (fsOut.exists(new Path(outDir))) {
      val entries = fsOut.listStatus(new Path(outDir))
        .filterNot(_.isDirectory)
      val markerMtime: Map[String, Long] = entries.collect {
        case st if st.getPath.getName.startsWith("_live-") =>
          st.getPath.getName.stripPrefix("_live-") ->
            st.getModificationTime
      }.toMap
      // tmp name ...<taskId>-<attemptId>.tmp (two 36-char uuids);
      // 36-char tokens are pre-liveness strands -> age-gate fallback
      def ownerOf(n0: String): Option[String] = {
        val core =
          if (n0.startsWith(".") && n0.endsWith(".crc"))
            n0.drop(1).dropRight(4)
          else n0
        val base = core.stripSuffix(".tmp")
        val tok = base.substring(base.lastIndexOf('.') + 1)
        if (tok.length == 73 && tok.charAt(36) == '-')
          Some(tok.substring(0, 36))
        else None
      }
      entries
        .filter { st =>
          val n = st.getPath.getName
          (n.startsWith("shard-") && n.endsWith(".tmp")) ||
            // checksum sidecars of stranded tmps (local FS)
            (n.startsWith(".shard-") && n.endsWith(".tmp.crc"))
        }
        .foreach { st =>
          val dead =
            ownerOf(st.getPath.getName).flatMap(markerMtime.get) match {
              case Some(mt) => now - mt > markerStaleMs
              case None =>
                now - st.getModificationTime > staleTmpMs
            }
          if (dead) fsOut.delete(st.getPath, false)
        }
      // markers whose owner stopped beating are themselves strands
      markerMtime.foreach { case (id, mt) =>
        if (now - mt > markerStaleMs)
          fsOut.delete(graft.Liveness.marker(new Path(outDir), id), false)
      }
    }
    df.select(col(shardCol).cast("string").as("shard"),
        col(nameCol).cast("string").as("name"), col(binCol).as("bytes"))
      .repartition(col("shard"))
      // payload as the final sort key: the last-rename-wins safety
      // argument below needs BYTE-determinism, and (shard, name)
      // alone leaves tie order among duplicate member names
      // attempt-dependent — two finished attempts could then publish
      // one attempt's .tar with the other's .idx at mismatched
      // offsets. With the payload tiebreaker the row order (hence
      // the archive bytes) is a pure function of the data.
      .sortWithinPartitions(col("shard"), col("name"), col("bytes"))
      .as[(String, String, Array[Byte])]
      .mapPartitions { rows =>
        new Iterator[Row] {
          private var pending: (String, String, Array[Byte]) =
            if (rows.hasNext) rows.next() else null
          // liveness heartbeat for this task's in-flight tmps (see
          // the call-time sweep): marker created BEFORE the first tmp
          // so no sweep can see an owned strand without its marker,
          // stopped+removed by the task completion listener (runs on
          // success AND task failure — only an executor kill skips
          // it, which is exactly the stale-marker sweep case). A
          // missing TaskContext fails FAST: the only alternative hook
          // (close on clean iterator exhaustion) silently leaks the
          // beat thread on a mid-partition throw, keeping the marker
          // fresh for the JVM's life and the failed attempt's tmps
          // unsweepable — worse than a loud refusal for a state Spark
          // never produces (mapPartitions closures always run in a
          // task).
          private val taskToken = java.util.UUID.randomUUID().toString
          if (pending != null) {
            val b = graft.Liveness.start(
              new Path(outDir).getFileSystem(conf.value),
              new Path(outDir), taskToken)
            val ctx = org.apache.spark.TaskContext.get()
            if (ctx == null) {
              b.close()
              throw new IllegalStateException(
                "writeShards partition function invoked outside a " +
                  "Spark task (no TaskContext): the liveness beat " +
                  "has no completion hook to close it")
            }
            ctx.addTaskCompletionListener[Unit](_ => b.close())
          }
          override def hasNext: Boolean = pending != null
          override def next(): Row = {
            val shard = pending._1
            // the shard key comes from DATA and becomes a file name:
            // a hostile key containing a separator ("../x", "a/b")
            // would write OUTSIDE outDir — the path-escape class the
            // adversarial-input gate forbids. Refuse loudly (the
            // NamedSink key sink percent-encodes instead, but shard
            // keys round-trip through file names via parseShardName,
            // so encoding would corrupt read-back keys).
            require(shard != null && shard.nonEmpty &&
              !shard.contains('/') && !shard.contains('\\'),
              s"shard key ${if (shard == null) "<null>" else s"'$shard'"} " +
                "is not a safe file-name component (empty, or contains " +
                "a path separator) — re-key the shard column")
            val p = new Path(outDir, s"shard-$shard.tar")
            val ixP = new Path(outDir, s"shard-$shard.tar.idx")
            val fs = p.getFileSystem(conf.value)
            // stage under ATTEMPT-UNIQUE tmp names, publish by rename
            // after a clean close: a direct final-name write let a
            // retried (or zombie) task attempt interleave two writers
            // on one file, and a crashed job left torn archives that
            // readers would trust. Bytes are deterministic (mtime 0,
            // members sorted), so last-rename-wins keeps .tar and
            // .idx mutually consistent even if two attempts finish;
            // a failed attempt's tmps are never published (the glob
            // readers match *.tar only).
            // <taskToken>-<attempt>: the task id keys the liveness
            // marker, the per-shard uuid keeps duels attempt-unique
            val attempt = s"$taskToken-${java.util.UUID.randomUUID()}"
            val tmpP = new Path(outDir, s"shard-$shard.tar.$attempt.tmp")
            val tmpIx = new Path(outDir,
              s"shard-$shard.tar.idx.$attempt.tmp")
            val o = fs.create(tmpP, true)
            // index sidecar, streamed alongside the archive: one line
            // per member "<offset>\t<size>\t<urlencoded name>" — what
            // readMembersByName seeks by (the WebDataset .idx idea)
            val ix = fs.create(tmpIx, true)
            var members = 0
            var bytes = 0L
            try {
              var more = true
              while (more) {
                val (_, name, payload) = pending
                ix.write((s"$bytes\t${payload.length}\t" +
                  java.net.URLEncoder.encode(name, "UTF-8") + "\n")
                  .getBytes("UTF-8"))
                bytes += writeMember(o, name, payload)
                require(bytes <= maxShardBytes,
                  s"shard $shard exceeds maxShardBytes=$maxShardBytes " +
                    s"at member $name — re-key to smaller shards or " +
                    "raise the cap")
                members += 1
                // kill -9 point: archive AND sidecar streams OPEN
                // mid-shard with buffered tails — KillMinus9Spec
                // parks a child JVM here and SIGKILLs it; the
                // truncated attempt tmps must never publish and the
                // replay must converge
                graft.FaultPoints.pulse("TarShards.midstream")
                pending = if (rows.hasNext) rows.next() else null
                more = pending != null && pending._1 == shard
              }
              bytes += writeTrailer(o)
            } finally { o.close(); ix.close() }
            // scheme-aware atomic overwrite (graft.AtomicFiles): on
            // the local FS Hadoop's OVERWRITE rename decomposes into
            // delete+rename — a dueling finished attempt would throw
            // from the window and readers could glimpse a missing
            // archive
            graft.AtomicFiles.renameOverwrite(fs, conf.value, tmpP, p)
            // archive published, index sidecar still staged — a
            // re-run republishes both (deterministic bytes)
            graft.FaultPoints.reach("TarShards.tar")
            graft.AtomicFiles.renameOverwrite(fs, conf.value, tmpIx, ixP)
            graft.FaultPoints.reach("TarShards.idx")
            Row(shard, members, bytes)
          }
        }
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

  /** Read every `*.tar` under `dir` back into (shard, batch_id, name,
    * content): one input partition per shard file (binaryFiles),
    * members STREAMED in archive order off the open file — the
    * WebDataset access pattern; per-task heap is one member.
    * `shardSink` generations (`shard-<v>.b<id>.tar`) come back with
    * the generation parsed into `batch_id` (null for plain
    * `writeShards` output), so `shard` is always the caller's
    * original key — a shard key whose own text ends in `.b<digits>`
    * is indistinguishable from a generation and would be split.
    */
  def readShards(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("batch_id", LongType, nullable = true),
      StructField("name", StringType),
      StructField("content", BinaryType)))
    val rows = spark.sparkContext
      .binaryFiles(s"$dir/*.tar")
      .flatMap { case (path, stream) =>
        val base = {
          val f = path.substring(path.lastIndexOf('/') + 1)
          f.stripPrefix("shard-").stripSuffix(".tar")
        }
        val genAt = base.lastIndexOf(".b")
        val (shard, batchId) =
          if (genAt >= 0 && genAt + 2 < base.length &&
              base.substring(genAt + 2).forall(_.isDigit))
            (base.substring(0, genAt),
              java.lang.Long.valueOf(base.substring(genAt + 2)))
          else (base, null)
        val in = stream.open()
        val it = unpack(in)
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = it.hasNext
            if (!h) in.close()
            h
          }
          override def next(): Row = {
            val (n, b) = it.next()
            Row(shard, batchId, n, b)
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** WebDataset sample grouping — the convention's third leg after
    * the container and the index: an archive's members pair into
    * SAMPLES by basename before the FIRST dot ("000123.jpg" +
    * "000123.txt" + "000123.json" are one sample's modalities; the
    * full remainder names the modality, so "a.seg.png" groups under
    * sample "a" as modality "seg.png"). Input is [[readShards]]'
    * shape; output is one row per (shard, batch_id, sample_key) with
    * the modality->bytes map (entries ext-sorted for deterministic
    * map order), part count, and total payload bytes. One shuffle on
    * the sample key; WebDataset writers colocate a sample's members
    * in one shard, so the grouping never crosses shard files.
    */
  def groupSamples(members: DataFrame): DataFrame =
    members
      .withColumn("sample_key",
        regexp_extract(col("name"), "^([^.]*)", 1))
      .withColumn("ext",
        when(col("name").contains("."),
          expr("substring(name, instr(name, '.') + 1)"))
          .otherwise(lit("")))
      .groupBy(col("shard"), col("batch_id"), col("sample_key"))
      .agg(
        map_from_entries(array_sort(collect_list(
          struct(col("ext"), col("content"))))).as("parts"),
        count(lit(1)).cast("int").as("n_parts"),
        sum(octet_length(col("content"))).cast("long").as("total_bytes"))

  /** Parse a shard file name ("shard-<key>[.b<id>].tar") into the
    * caller's shard key and the optional sink generation.
    */
  private def parseShardName(fileName: String): (String, java.lang.Long) = {
    val base = fileName.stripPrefix("shard-").stripSuffix(".tar")
    val genAt = base.lastIndexOf(".b")
    if (genAt >= 0 && genAt + 2 < base.length &&
        base.substring(genAt + 2).forall(_.isDigit))
      (base.substring(0, genAt),
        java.lang.Long.valueOf(base.substring(genAt + 2)))
    else (base, null)
  }

  /** The shard index as a DataFrame — (path, shard, batch_id, name,
    * offset, size) from every `*.tar.idx` sidecar under `dir` — the
    * corpus manifest queryable WITHOUT opening a single archive
    * (member counts, size histograms, name filters). `writeShards`
    * emits sidecars; for foreign archives build them once with
    * [[indexShards]]. Fails loudly if no sidecar exists — a silent
    * empty manifest would read as an empty corpus.
    */
  def readIndex(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("path", StringType),
      StructField("shard", StringType),
      StructField("batch_id", LongType, nullable = true),
      StructField("name", StringType),
      StructField("offset", LongType),
      StructField("size", LongType)))
    val rows = spark.sparkContext
      .wholeTextFiles(s"$dir/*.tar.idx")
      .flatMap { case (idxPath, text) =>
        val tarPath = idxPath.stripSuffix(".idx")
        val fileName = tarPath.substring(tarPath.lastIndexOf('/') + 1)
        val (shard, batchId) = parseShardName(fileName)
        text.split("\n").iterator.filter(_.nonEmpty).map { line =>
          val Array(off, size, enc) = line.split("\t", 3)
          Row(tarPath, shard, batchId,
            java.net.URLDecoder.decode(enc, "UTF-8"),
            off.toLong, size.toLong)
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Selective member read through the index sidecars: seeks straight
    * to each requested member's header and reads exactly header +
    * payload — IO proportional to the SELECTION, never the corpus
    * (readShards streams whole archives; at 100 TB a "give me these
    * 10k samples" access must not). Each task forward-seeks one
    * archive in offset order. Every read re-validates the header
    * checksum AND that the member at the offset carries the expected
    * name — a stale sidecar fails loudly instead of returning the
    * wrong sample. Output matches readShards' columns
    * (shard, batch_id, name, content).
    */
  def readMembersByName(spark: SparkSession, dir: String,
      names: Seq[String]): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("batch_id", LongType, nullable = true),
      StructField("name", StringType),
      StructField("content", BinaryType)))
    val wanted = names.toSet
    val rows = readIndex(spark, dir)
      .filter(col("name").isInCollection(wanted))
      .repartition(col("path"))
      .sortWithinPartitions(col("path"), col("offset"))
      .rdd
      .mapPartitions { it =>
        var curPath: String = null
        var in: org.apache.hadoop.fs.FSDataInputStream = null
        def open(p: String) = {
          if (in != null) in.close()
          val hp = new Path(p)
          in = hp.getFileSystem(conf.value).open(hp)
          curPath = p
        }
        val out = it.map { r =>
          val (p, shard, name) =
            (r.getString(0), r.getString(1), r.getString(3))
          val batchId = if (r.isNullAt(2)) null
            else java.lang.Long.valueOf(r.getLong(2))
          val (offset, size) = (r.getLong(4), r.getLong(5))
          if (p != curPath) open(p)
          in.seek(offset)
          val h = new Array[Byte](BlockSize)
          in.readFully(h)
          val (gotName, gotSize, _) = parseHeader(h, offset)
          require(gotName == name && gotSize == size,
            s"stale shard index for $p: expected $name ($size B) at " +
              s"offset $offset, found $gotName ($gotSize B) — " +
              "rebuild with indexShards")
          // size is now HEADER-validated (== gotSize), but the header
          // itself is input: allocation-bounded read, like unpack
          // (FSDataInputStream IS a DataInputStream)
          val bytes = readPayload(in, size, name)
          Row(shard, batchId, name, bytes)
        }
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = out.hasNext
            if (!h && in != null) { in.close(); in = null }
            h
          }
          override def next(): Row = out.next()
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Build (or rebuild) index sidecars for every `*.tar` under `dir` —
    * the on-ramp for FOREIGN archives (system tar, any ustar writer) and
    * the recovery path for stale sidecars. One streaming header scan
    * per archive ([[scanEntries]] — payloads skipped, not read),
    * shard-parallel, idempotent. Returns (shard, n_members) per
    * archive indexed.
    */
  def indexShards(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val schema = StructType(Seq(
      StructField("shard", StringType),
      StructField("n_members", IntegerType)))
    val rows = spark.sparkContext
      .binaryFiles(s"$dir/*.tar")
      .map { case (path, stream) =>
        val fileName = path.substring(path.lastIndexOf('/') + 1)
        val (shard, _) = parseShardName(fileName)
        val in = stream.open()
        val ixPath = new Path(path + ".idx")
        val fs = ixPath.getFileSystem(conf.value)
        // staged like writeShards: a torn sidecar from a crashed or
        // doubly-running attempt must never be published
        val tmpIx = new Path(
          path + s".idx.${java.util.UUID.randomUUID()}.tmp")
        val o = fs.create(tmpIx, true)
        var n = 0
        try {
          scanEntries(in).foreach { case (name, off, size) =>
            o.write((s"$off\t$size\t" +
              java.net.URLEncoder.encode(name, "UTF-8") + "\n")
              .getBytes("UTF-8"))
            n += 1
          }
        } finally { in.close(); o.close() }
        org.apache.hadoop.fs.FileContext
          .getFileContext(fs.getUri, conf.value)
          .rename(fs.makeQualified(tmpIx), fs.makeQualified(ixPath),
            org.apache.hadoop.fs.Options.Rename.OVERWRITE)
        Row(shard, n)
      }
    spark.createDataFrame(rows, schema)
  }
}
