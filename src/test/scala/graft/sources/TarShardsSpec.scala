package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the USTAR container: byte-level pack/unpack round-trip
  * (binary payloads, empty members, 512-block padding edges),
  * corruption detection, determinism, system-tar interop, and the
  * distributed write/read path.
  */
class TarShardsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val entries = Seq(
    "empty.bin" -> Array.empty[Byte],
    "exact.bin" -> Array.fill[Byte](512)(7), // exact block, no padding
    "tiny.txt" -> "hello".getBytes("UTF-8"),
    "bytes.bin" -> Array.tabulate[Byte](1000)(i => (i % 251).toByte))

  test("pack/unpack round-trips binary members exactly") {
    val tar = TarShards.pack(entries.iterator)
    assert(tar.length % 512 == 0)
    val back = TarShards.unpack(tar).toSeq
    assert(back.map(_._1) == entries.map(_._1))
    back.zip(entries).foreach { case ((_, b), (_, e)) =>
      assert(java.util.Arrays.equals(b, e))
    }
  }

  test("pack is deterministic; a flipped header byte fails loudly") {
    val t1 = TarShards.pack(entries.iterator)
    val t2 = TarShards.pack(entries.iterator)
    assert(java.util.Arrays.equals(t1, t2))
    val corrupt = t1.clone()
    corrupt(0) = 'X'.toByte // name byte inside the checksummed header
    val e = intercept[IllegalArgumentException] {
      TarShards.unpack(corrupt).toSeq
    }
    assert(e.getMessage.contains("checksum"))
  }

  test("a member name beyond ustar's 100 bytes fails loudly") {
    val e = intercept[IllegalArgumentException] {
      TarShards.pack(Iterator(("x" * 101) -> Array.empty[Byte]))
    }
    assert(e.getMessage.contains("100 bytes"))
  }

  test("system tar lists and extracts our archives (interop)") {
    val which = new ProcessBuilder("sh", "-c", "command -v tar")
      .start()
    assume(which.waitFor() == 0, "no system tar on PATH")
    val dir = Files.createTempDirectory("tarspec-")
    val f = dir.resolve("t.tar")
    Files.write(f, TarShards.pack(entries.iterator))
    val p = new ProcessBuilder("tar", "-tf", f.toString)
      .redirectErrorStream(true).start()
    val listed = scala.io.Source.fromInputStream(p.getInputStream)
      .getLines().toSeq
    assert(p.waitFor() == 0, s"tar -tf failed: $listed")
    assert(listed == entries.map(_._1), s"tar listed: $listed")
    val x = new ProcessBuilder("tar", "-xf", f.toString,
      "-C", dir.toString).start()
    assert(x.waitFor() == 0)
    entries.foreach { case (n, b) =>
      assert(java.util.Arrays.equals(
        Files.readAllBytes(dir.resolve(n)), b), s"member $n differs")
    }
  }

  test("shardSink: micro-batches land as idempotent tar generations " +
    "and read back equal to the input") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("tarsink-").toString
    val ckpt = Files.createTempDirectory("tarsink-c").toString
    val mem = MemoryStream[(String, Array[Byte], String)]
    val events = mem.toDF().toDF("name", "bytes", "shard")
    val q = TarShards.shardSink(events, "name", "bytes", "shard", out, ckpt)
    try {
      mem.addData(("a.txt", "alpha".getBytes, "0"),
        ("b.txt", "beta".getBytes, "1"))
      q.processAllAvailable()
      mem.addData(("c.txt", "gamma".getBytes, "0"))
      q.processAllAvailable()
      val files = new java.io.File(out).list().filter(_.endsWith(".tar"))
        .sorted.toSeq
      // one generation per (shard, batch) touched
      assert(files == Seq("shard-0.b0.tar", "shard-0.b1.tar",
        "shard-1.b0.tar"), s"unexpected generations: $files")
      val back = TarShards.readShards(spark, out)
        .select(col("name"), col("content").cast("string"))
        .as[(String, String)].collect().toMap
      assert(back == Map("a.txt" -> "alpha", "b.txt" -> "beta",
        "c.txt" -> "gamma"))
      // generation suffix parses into its own column: shard is the
      // caller's original key, batch_id the foreachBatch generation
      val meta = TarShards.readShards(spark, out)
        .select(col("name"), col("shard"), col("batch_id"))
        .as[(String, String, Long)].collect()
        .map { case (n, s, b) => n -> ((s, b)) }.toMap
      assert(meta == Map("a.txt" -> ("0", 0L), "b.txt" -> ("1", 0L),
        "c.txt" -> ("0", 1L)), s"parsed generations: $meta")
    } finally q.stop()
  }

  test("pack streams member-at-a-time (no whole-archive buffering)") {
    // Proof by interleaving: the sink must have received member i's
    // bytes BEFORE the iterator yields member i+1 — impossible if
    // pack buffered members or the archive. Memory-independent, so
    // it pins the multi-GB-shard contract without heap games.
    var written = 0L
    val sink = new java.io.OutputStream {
      override def write(b: Int): Unit = written += 1
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        written += len
    }
    val sizes = Seq(700, 512, 10)
    var yielded = 0
    val lazyEntries = sizes.iterator.zipWithIndex.map { case (n, i) =>
      if (i > 0) {
        val expect = sizes.take(i).map(s => 512L + s + (512 - s % 512) % 512).sum
        assert(written >= expect,
          s"member $i yielded before member ${i - 1} hit the sink " +
            s"($written < $expect)")
      }
      yielded += 1
      s"m$i.bin" -> Array.fill[Byte](n)(i.toByte)
    }
    val total = TarShards.pack(lazyEntries, sink)
    assert(yielded == sizes.length)
    assert(total == written)
  }

  test("unpack streams lazily off the input (reads only what's taken)") {
    val tar = TarShards.pack(Seq(
      "a.bin" -> Array.fill[Byte](2048)(1),
      "b.bin" -> Array.fill[Byte](2048)(2)).iterator)
    var consumed = 0
    val counting = new java.io.InputStream {
      private val in = new java.io.ByteArrayInputStream(tar)
      override def read(): Int = { val r = in.read(); if (r >= 0) consumed += 1; r }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = in.read(b, off, len); if (r > 0) consumed += r; r
      }
    }
    val it = TarShards.unpack(counting)
    val first = it.next()
    assert(first._1 == "a.bin")
    // after one member: its header+payload (+ maybe the lookahead
    // header) — far less than the whole archive
    assert(consumed <= 512 + 2048 + 512,
      s"unpack read $consumed bytes for one member of a ${tar.length}-byte archive")
  }

  test("writeShards enforces maxShardBytes loudly, naming the shard") {
    import spark.implicits._
    val df = Seq(
      ("a.bin", Array.fill[Byte](4096)(1), "big"),
      ("b.bin", Array.fill[Byte](4096)(2), "big"))
      .toDF("name", "bytes", "shard")
    val out = Files.createTempDirectory("tarcap-").toString
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.writeShards(df, "name", "bytes", "shard", out,
        maxShardBytes = 5000).collect()
    }
    val msg = e.getCause match {
      case null => e.getMessage
      case c    => c.getMessage + e.getMessage
    }
    assert(msg.contains("big") && msg.contains("maxShardBytes"),
      s"expected a loud shard-named cap failure, got: $msg")
  }

  test("unpack honors the ustar prefix field and skips non-file " +
    "entries (system-tar interop, read direction)") {
    val which = new ProcessBuilder("sh", "-c", "command -v tar").start()
    assume(which.waitFor() == 0, "no system tar on PATH")
    val dir = Files.createTempDirectory("tarpre-")
    // a path long enough that --format=ustar must split it into
    // prefix + name (full path > 100 bytes, components < 100)
    val deep = dir.resolve("d" * 60).resolve("e" * 60)
    Files.createDirectories(deep)
    val payload = "prefixed".getBytes("UTF-8")
    Files.write(deep.resolve("f.txt"), payload)
    val f = dir.resolve("t.tar")
    val p = new ProcessBuilder("tar", "--format=ustar", "-cf",
      f.toString, "-C", dir.toString,
      s"${"d" * 60}/${"e" * 60}/f.txt").redirectErrorStream(true).start()
    assert(p.waitFor() == 0)
    val members = TarShards.unpack(Files.readAllBytes(f)).toSeq
    // GNU tar may or may not emit directory entries; only the regular
    // file must come back, with prefix+name joined
    assert(members.map(_._1) == Seq(s"${"d" * 60}/${"e" * 60}/f.txt"),
      s"members: ${members.map(_._1)}")
    assert(java.util.Arrays.equals(members.head._2, payload))
  }

  test("writeShards overwrites its own output (replay-idempotent)") {
    import spark.implicits._
    val out = Files.createTempDirectory("tarrw-").toString
    val df = Seq(("a.txt", "x".getBytes, "7")).toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    val files = new java.io.File(out).list().filter(_.endsWith(".tar"))
    assert(files.toSeq == Seq("shard-7.tar"))
    assert(TarShards.readShards(spark, out).count() == 1)
  }

  test("tmp hygiene is age-gated: a live concurrent invocation's " +
    "fresh tmp survives the sweep; an hour-stale strand is collected") {
    import spark.implicits._
    val out = Files.createTempDirectory("tarsweep-").toString
    val df = Seq(("a.txt", "x".getBytes, "7")).toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    // a CONCURRENT invocation's in-flight tmp (fresh mtime): the old
    // unconditional sweep deleted it, failing the elder attempt's
    // publish rename — a supported overlap turned job failure
    val live = java.nio.file.Paths.get(out,
      s"shard-7.tar.${java.util.UUID.randomUUID()}.tmp")
    Files.write(live, "inflight".getBytes("UTF-8"))
    // a strand from a long-dead writer (mtime frozen at its crash)
    val dead = java.nio.file.Paths.get(out,
      s"shard-7.tar.${java.util.UUID.randomUUID()}.tmp")
    Files.write(dead, "stranded".getBytes("UTF-8"))
    Files.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 2L * 3600000L))
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    val tmps = new java.io.File(out).list().filter(_.endsWith(".tmp"))
    assert(tmps.toSeq == Seq(live.getFileName.toString),
      s"sweep should keep the fresh tmp and collect the stale one; " +
        s"left: ${tmps.toSeq}")
    assert(TarShards.readShards(spark, out).count() == 1)
  }

  test("liveness heartbeat overrides tmp age: a >threshold-old tmp " +
    "whose owner still beats survives the sweep; a stale-marker " +
    "owner's tmp AND marker are collected") {
    import spark.implicits._
    val out = Files.createTempDirectory("tarbeat-").toString
    val df = Seq(("a.txt", "x".getBytes, "7")).toDF("name", "bytes", "shard")
    val twoHoursAgo = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 2L * 3600000L)
    def strand(owner: String): java.nio.file.Path = {
      val p = java.nio.file.Paths.get(out,
        s"shard-7.tar.$owner-${java.util.UUID.randomUUID()}.tmp")
      Files.write(p, "inflight".getBytes("UTF-8"))
      // the HDFS shape: mtime stamped at create, frozen while the
      // writer streams — a 2h-old tmp can still have a LIVE owner
      Files.setLastModifiedTime(p, twoHoursAgo)
      p
    }
    // live owner: marker fresh (beaten 30s ago by its writer)
    val liveOwner = java.util.UUID.randomUUID().toString
    val liveTmp = strand(liveOwner)
    Files.write(java.nio.file.Paths.get(out, s"_live-$liveOwner"),
      Array.empty[Byte])
    // dead owner: marker exists but its beats stopped 2h ago (crash)
    val deadOwner = java.util.UUID.randomUUID().toString
    val deadTmp = strand(deadOwner)
    val deadMarker = java.nio.file.Paths.get(out, s"_live-$deadOwner")
    Files.write(deadMarker, Array.empty[Byte])
    Files.setLastModifiedTime(deadMarker, twoHoursAgo)
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    val left = new java.io.File(out).list().toSet
    assert(left.contains(liveTmp.getFileName.toString),
      s"a live (beating) owner's old tmp must survive the sweep; left: $left")
    assert(!left.contains(deadTmp.getFileName.toString),
      s"a stale-marker owner's tmp must be collected; left: $left")
    assert(!left.contains(deadMarker.getFileName.toString),
      s"the stale marker itself must be collected; left: $left")
    assert(left.contains(s"_live-$liveOwner"),
      s"the fresh marker must survive; left: $left")
    // a completed invocation leaves no marker of its own behind
    assert(left.count(_.startsWith("_live-")) == 1,
      s"finished writeShards must remove its own markers; left: $left")
    assert(TarShards.readShards(spark, out).count() == 1)
  }

  test("markerStaleMs is the caller's paused-writer grace knob: a " +
    "marker stale by the default bound KEEPS its strands when the " +
    "caller widens the bound") {
    import spark.implicits._
    val out = Files.createTempDirectory("tarbeatwide-").toString
    val df = Seq(("a.txt", "x".getBytes, "7")).toDF("name", "bytes", "shard")
    // a writer paused ~30 min (long GC / suspended JVM / partition
    // from the store): beats stopped, marker mtime frozen — dead by
    // the 10-min default, alive by the caller's widened bound
    val halfHourAgo = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 30L * 60000L)
    val owner = java.util.UUID.randomUUID().toString
    val tmp = java.nio.file.Paths.get(out,
      s"shard-7.tar.$owner-${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, "inflight".getBytes("UTF-8"))
    Files.setLastModifiedTime(tmp, halfHourAgo)
    val marker = java.nio.file.Paths.get(out, s"_live-$owner")
    Files.write(marker, Array.empty[Byte])
    Files.setLastModifiedTime(marker, halfHourAgo)
    TarShards.writeShards(df, "name", "bytes", "shard", out,
      markerStaleMs = 3600000L).collect()
    val left = new java.io.File(out).list().toSet
    assert(left.contains(tmp.getFileName.toString),
      s"a paused writer inside the widened bound must keep its " +
        s"strands; left: $left")
    assert(left.contains(s"_live-$owner"),
      s"its marker must survive too; left: $left")
    // same state, default bound: the pause exceeded 10 min -> dead
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    val after = new java.io.File(out).list().toSet
    assert(!after.contains(tmp.getFileName.toString) &&
      !after.contains(s"_live-$owner"),
      s"under the default bound the same owner is dead; left: $after")
  }

  test("writeShards/readShards round-trip the fixture corpus with " +
    "correct shard routing") {
    val dir = "/root/testdata/sf0.001"
    val out = Files.createTempDirectory("tarshards-").toString
    val src = graft.Engine.Tables(spark, dir).documents
      .select(concat(lit("doc_"), col("doc_id"), lit(".txt")).as("name"),
        encode(col("text"), "UTF-8").as("bytes"),
        pmod(col("doc_id"), lit(4)).cast("string").as("shard"))
    val manifest = TarShards.writeShards(src, "name", "bytes", "shard", out)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(manifest.keySet == Set("0", "1", "2", "3"))
    val back = TarShards.readShards(spark, out)
    assert(back.count() == src.count())
    // every member's bytes survive, and each landed in its shard
    val joined = back
      .withColumn("doc_id",
        regexp_extract(col("name"), "doc_(\\d+)\\.txt", 1).cast("long"))
      .join(graft.Engine.Tables(spark, dir).documents, Seq("doc_id"))
    assert(joined.filter(
      col("content") =!= encode(col("text"), "UTF-8")).count() == 0)
    assert(joined.filter(
      col("shard") =!= pmod(col("doc_id"), lit(4)).cast("string"))
      .count() == 0)
  }

  test("index sidecars: readIndex matches scanEntries; " +
    "readMembersByName returns byte-identical selected members") {
    import spark.implicits._
    val out = Files.createTempDirectory("taridx-").toString
    val df = (0 until 40).map(i =>
      (f"m$i%02d.bin", Array.fill(i * 7 + 1)(i.toByte), (i % 3).toString))
      .toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    // sidecar agrees with a from-scratch archive scan
    val idx = TarShards.readIndex(spark, out)
      .select(col("shard"), col("name"), col("offset"), col("size"))
      .as[(String, String, Long, Long)].collect().toSet
    val scanned = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith(".tar")).flatMap { f =>
        val shard = f.getName.stripPrefix("shard-").stripSuffix(".tar")
        val in = new java.io.FileInputStream(f)
        try TarShards.scanEntries(in).map { case (n, o, s) =>
          (shard, n, o, s) }.toVector
        finally in.close()
      }.toSet
    assert(idx == scanned && idx.size == 40)
    // staged publish: a clean write leaves only renamed finals —
    // no attempt-unique .tmp survives (the staging that keeps a
    // retried/zombie attempt from interleaving writers on one file)
    assert(new java.io.File(out).listFiles()
      .forall(!_.getName.endsWith(".tmp")),
      "stranded staging tmp after writeShards")
    // selective read: exactly the requested members, bytes intact
    val want = Seq("m03.bin", "m17.bin", "m38.bin")
    val got = TarShards.readMembersByName(spark, out, want)
      .select(col("name"), col("content"))
      .as[(String, Array[Byte])].collect()
      .map { case (n, b) => n -> b.toSeq }.toMap
    assert(got.keySet == want.toSet)
    assert(got("m17.bin") == Array.fill(17 * 7 + 1)(17.toByte).toSeq)
    assert(got("m03.bin") == Array.fill(3 * 7 + 1)(3.toByte).toSeq)
  }

  test("readMembersByName touches only the selected members' bytes " +
    "(corrupt unrelated header is never read); stale index fails loudly") {
    import spark.implicits._
    val out = Files.createTempDirectory("taridx2-").toString
    val df = Seq(
      ("aa.bin", "alpha".getBytes, "0"),
      ("bb.bin", "bravo".getBytes, "0"),
      ("cc.bin", "charlie".getBytes, "0"))
      .toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    val tar = new java.io.File(out, "shard-0.tar")
    val idx = TarShards.readIndex(spark, out)
      .select(col("name"), col("offset"))
      .as[(String, Long)].collect().toMap
    // corrupt bb's HEADER on disk: a full readShards scan must fail,
    // but a selective read of aa/cc must never touch that region
    val raf = new java.io.RandomAccessFile(tar, "rw")
    raf.seek(idx("bb.bin") + 148) // checksum field
    raf.write("9999999".getBytes)
    raf.close()
    // the edit bypassed Hadoop's LocalFileSystem, whose own .crc
    // sidecar would now fail ANY buffered read near the corruption —
    // drop it so the test exercises OUR header validation, not
    // Hadoop's chunk checksums
    new java.io.File(out, ".shard-0.tar.crc").delete()
    intercept[org.apache.spark.SparkException] {
      TarShards.readShards(spark, out).count()
    }
    val ok = TarShards.readMembersByName(spark, out,
      Seq("aa.bin", "cc.bin"))
      .select(col("name"), col("content"))
      .as[(String, Array[Byte])].collect()
      .map { case (n, b) => n -> new String(b) }.toMap
    assert(ok == Map("aa.bin" -> "alpha", "cc.bin" -> "charlie"))
    // ...and the now-stale entry fails loudly by NAME, not wrong bytes
    val e = intercept[org.apache.spark.SparkException] {
      TarShards.readMembersByName(spark, out, Seq("bb.bin")).count()
    }
    assert(e.getMessage.contains("checksum") ||
      e.getCause.getMessage.contains("checksum"))
  }

  test("groupSamples pairs members by basename before the FIRST dot; " +
    "missing modalities and multi-dot extensions behave") {
    import spark.implicits._
    val out = Files.createTempDirectory("tarwds-").toString
    val df = Seq(
      ("s1.txt", "t1".getBytes, "0"),
      ("s1.json", "meta1".getBytes, "0"),
      ("s2.txt", "t2".getBytes, "0"), // no json part
      ("a.txt", "t".getBytes, "1"),
      ("a.seg.png", "p".getBytes, "1")) // modality keeps the full ext
      .toDF("name", "bytes", "shard")
    TarShards.writeShards(df, "name", "bytes", "shard", out).collect()
    val got = TarShards
      .groupSamples(TarShards.readShards(spark, out))
      .select(col("sample_key"), col("n_parts"), col("total_bytes"),
        map_keys(col("parts")).as("exts"))
      .as[(String, Int, Long, Seq[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4.toSet))).toMap
    assert(got == Map(
      "s1" -> ((2, 7L, Set("txt", "json"))),
      "s2" -> ((1, 2L, Set("txt"))),
      "a" -> ((2, 2L, Set("txt", "seg.png")))), s"got $got")
  }

  test("indexShards builds sidecars for a system-tar archive; " +
    "selective reads work against it") {
    import scala.sys.process._
    import spark.implicits._
    val work = Files.createTempDirectory("tarforeign-").toFile
    val sub = new java.io.File(work, "payload"); sub.mkdirs()
    Seq("one" -> "first member", "two" -> "second member").foreach {
      case (n, c) =>
        val w = new java.io.FileWriter(new java.io.File(sub, s"$n.txt"))
        w.write(c); w.close()
    }
    val rc = Process(Seq("tar", "--format=ustar", "-cf",
      new java.io.File(work, "shard-sys.tar").getAbsolutePath,
      "-C", sub.getAbsolutePath, "one.txt", "two.txt")).!
    assert(rc == 0, "system tar failed")
    val manifest = TarShards.indexShards(spark, work.getAbsolutePath)
      .as[(String, Int)].collect().toMap
    assert(manifest == Map("sys" -> 2))
    val got = TarShards
      .readMembersByName(spark, work.getAbsolutePath, Seq("two.txt"))
      .select(col("shard"), col("name"), col("content"))
      .as[(String, String, Array[Byte])].collect()
    assert(got.toSeq.map(r => (r._1, r._2, new String(r._3))) ==
      Seq(("sys", "two.txt", "second member")))
  }
}
