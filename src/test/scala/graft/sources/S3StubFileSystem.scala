package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileNotFoundException, IOException, InputStream}
import java.net.URI

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** In-JVM OBJECT-STORE stand-in registered under `s3stub://` — lets
  * the suite exercise the engine's claimed object-store support
  * (NamedSink "outDir may be s3a://", TableSync on non-atomic-rename
  * stores, FileIngest over a flat key space) as TESTED SEMANTICS
  * rather than a comment. The real S3A client cannot load here (no
  * hadoop-aws/aws-sdk jars in the image), so this implements the
  * Hadoop FileSystem contract with the SEMANTICS that distinguish an
  * object store from a local/HDFS filesystem:
  *
  *  - flat key space: directories are implicit (a "dir" exists iff
  *    some object has it as a prefix, or an mkdirs marker was put);
  *  - visibility-on-close: an object appears only when its output
  *    stream closes (S3 PUT semantics) — never a half-written file;
  *  - NON-ATOMIC rename: copy-then-delete per object, so a directory
  *    rename can be observed partially complete (exactly the S3A
  *    property DedupSync.compactPairs and TableSync's docs scope
  *    their atomicity claims around);
  *  - create-exclusive is check-then-put, not atomic (the documented
  *    best-effort degradation of TableSync's commit lock).
  *
  * Backed by a static per-bucket map, so Spark's local-mode executor
  * threads (same JVM) all see one store. Test-scope only — a
  * multi-JVM cluster would need a real object store.
  */
class S3StubFileSystem extends FileSystem {
  import S3StubFileSystem._

  private var myUri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    myUri = URI.create(s"s3stub://${name.getAuthority}")
    workDir = new Path(s"s3stub://${name.getAuthority}/")
  }

  override def getScheme: String = "s3stub"
  override def getUri: URI = myUri

  private def bucket: Bucket = bucketStore(myUri.getAuthority)

  /** Object key of a path: no leading/trailing slash; "" = root. */
  private def keyOf(p: Path): String = {
    val abs = makeQualified(p).toUri.getPath
    abs.stripPrefix("/").stripSuffix("/")
  }

  private def qualify(k: String): Path =
    new Path(s"s3stub://${myUri.getAuthority}/$k")

  private def fileStatus(k: String, o: Obj): FileStatus =
    new FileStatus(o.bytes.length.toLong, false, 1, DefaultBlock,
      o.mtime, qualify(k))

  private def dirStatus(k: String): FileStatus =
    new FileStatus(0, true, 1, DefaultBlock, 0L,
      if (k.isEmpty) new Path(s"s3stub://${myUri.getAuthority}/")
      else qualify(k))

  private def isImplicitDir(k: String): Boolean =
    k.isEmpty || bucket.markers.contains(k) ||
      bucket.objects.keysIterator.exists(_.startsWith(k + "/")) ||
      // a NESTED marker alone also makes the prefix a directory — a
      // real LIST surfaces the marker object, so `delete(dir, true)`
      // must see (and sweep) it even when no data objects remain;
      // without this, a committer's `_temporary/0` marker strands
      // after job cleanup and later listings show a phantom child
      // that getFileStatus can't resolve
      bucket.markers.keysIterator.exists(_.startsWith(k + "/"))

  override def getFileStatus(p: Path): FileStatus = {
    val k = keyOf(p)
    bucket.objects.get(k) match {
      case Some(o) => fileStatus(k, o)
      case None if isImplicitDir(k) => dirStatus(k)
      case None => throw new FileNotFoundException(s"s3stub: no $k")
    }
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val k = keyOf(p)
    bucket.objects.get(k) match {
      case Some(o) => Array(fileStatus(k, o))
      case None =>
        if (!isImplicitDir(k)) throw new FileNotFoundException(s"s3stub: no $k")
        val prefix = if (k.isEmpty) "" else k + "/"
        val children = scala.collection.mutable.SortedSet[String]()
        bucket.objects.keysIterator.filter(_.startsWith(prefix)).foreach {
          ok =>
            val rest = ok.stripPrefix(prefix)
            val name = rest.takeWhile(_ != '/')
            if (name.nonEmpty) children += prefix + name
        }
        bucket.markers.keysIterator
          .filter(m => m.startsWith(prefix) && m != k).foreach { m =>
            val name = m.stripPrefix(prefix).takeWhile(_ != '/')
            if (name.nonEmpty) children += prefix + name
          }
        children.toArray.map { ck =>
          bucket.objects.get(ck) match {
            case Some(o) => fileStatus(ck, o)
            case None    => dirStatus(ck)
          }
        }
    }
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val k = keyOf(p)
    val o = bucket.objects.getOrElse(k,
      throw new FileNotFoundException(s"s3stub: no $k"))
    new FSDataInputStream(new SeekableBytes(o.bytes))
  }

  override def create(p: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable): FSDataOutputStream = {
    val k = keyOf(p)
    // check-then-put, NOT atomic — the object-store degradation the
    // commit-lock docs describe
    if (!overwrite && bucket.objects.contains(k))
      throw new FileAlreadyExistsException(s"s3stub: $k exists")
    if (isImplicitDir(k) && !k.isEmpty && bucket.markers.contains(k))
      bucket.markers.remove(k) // file replaces a bare marker
    val buf = new ByteArrayOutputStream()
    val out = new java.io.FilterOutputStream(buf) {
      override def close(): Unit = {
        super.close()
        // visibility-on-close: the PUT happens here, all at once
        bucket.objects.put(k,
          Obj(buf.toByteArray, System.currentTimeMillis()))
        ()
      }
    }
    new FSDataOutputStream(out, null)
  }

  override def append(p: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3stub: no append")

  /** Copy-then-delete per object — deliberately NON-atomic: another
    * reader (or a crash) can observe a partially-renamed directory,
    * exactly the S3A behavior the engine's crash-safety stories must
    * tolerate.
    */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = keyOf(src)
    val dk0 = keyOf(dst)
    if (bucket.objects.contains(sk)) {
      // renaming INTO an existing directory targets dir/srcName
      val dk =
        if (isImplicitDir(dk0) && !bucket.objects.contains(dk0))
          (if (dk0.isEmpty) "" else dk0 + "/") + src.getName
        else dk0
      if (bucket.objects.contains(dk)) return false
      val o = bucket.objects(sk)
      bucket.objects.put(dk, Obj(o.bytes, System.currentTimeMillis()))
      bucket.objects.remove(sk)
      true
    } else if (isImplicitDir(sk) && sk.nonEmpty) {
      val dk =
        if (isImplicitDir(dk0) && !bucket.objects.contains(dk0) &&
          bucket.markers.contains(dk0))
          dk0 + "/" + src.getName
        else dk0
      if (bucket.objects.contains(dk)) return false
      val prefix = sk + "/"
      val keys = bucket.objects.keysIterator
        .filter(_.startsWith(prefix)).toSeq.sorted
      keys.foreach { ok =>
        val nk = dk + "/" + ok.stripPrefix(prefix)
        val o = bucket.objects(ok)
        bucket.objects.put(nk, Obj(o.bytes, System.currentTimeMillis()))
        bucket.objects.remove(ok) // per-object copy+delete
      }
      val ms = bucket.markers.keysIterator
        .filter(m => m == sk || m.startsWith(prefix)).toSeq
      ms.foreach { m =>
        val nm = if (m == sk) dk else dk + "/" + m.stripPrefix(prefix)
        bucket.markers.put(nm, ())
        bucket.markers.remove(m)
      }
      if (keys.isEmpty && ms.isEmpty) bucket.markers.put(dk, ())
      true
    } else false
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    val k = keyOf(p)
    if (bucket.objects.contains(k)) { bucket.objects.remove(k); true }
    else if (isImplicitDir(k) && k.nonEmpty) {
      val prefix = k + "/"
      val keys = bucket.objects.keysIterator
        .filter(_.startsWith(prefix)).toSeq
      val ms = bucket.markers.keysIterator
        .filter(m => m == k || m.startsWith(prefix)).toSeq
      if (!recursive && keys.nonEmpty)
        throw new IOException(s"s3stub: $k not empty")
      keys.foreach(bucket.objects.remove)
      ms.foreach(bucket.markers.remove)
      true
    } else false
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    val k = keyOf(p)
    if (bucket.objects.contains(k))
      throw new FileAlreadyExistsException(s"s3stub: $k is a file")
    if (k.nonEmpty) bucket.markers.put(k, ())
    true
  }

  override def setWorkingDirectory(d: Path): Unit = { workDir = d }
  override def getWorkingDirectory: Path = workDir
}

object S3StubFileSystem {
  private val DefaultBlock = 32L * 1024 * 1024

  private[sources] case class Obj(bytes: Array[Byte], mtime: Long)
  private[sources] class Bucket {
    val objects = TrieMap.empty[String, Obj]
    val markers = TrieMap.empty[String, Unit]
  }
  private val store = TrieMap.empty[String, Bucket]
  private[sources] def bucketStore(name: String): Bucket =
    store.getOrElseUpdate(name, new Bucket)

  /** Wipe a bucket between tests. */
  def reset(name: String): Unit = { store.remove(name); () }

  /** Raw object keys of a bucket (diagnostics/assertions). */
  def keys(name: String): Seq[String] =
    bucketStore(name).objects.keysIterator.toSeq.sorted

  /** Seekable, positioned-readable byte-array stream (parquet footer
    * reads need both).
    */
  private class SeekableBytes(bytes: Array[Byte]) extends InputStream
      with Seekable with PositionedReadable {
    private var pos = 0L
    override def read(): Int =
      if (pos >= bytes.length) -1
      else { val b = bytes(pos.toInt) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos.toInt)
      System.arraycopy(bytes, pos.toInt, b, off, n)
      pos += n
      n
    }
    override def seek(newPos: Long): Unit = {
      if (newPos < 0 || newPos > bytes.length)
        throw new IOException(s"seek $newPos out of [0, ${bytes.length}]")
      pos = newPos
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte],
        offset: Int, length: Int): Unit = {
      if (position + length > bytes.length)
        throw new java.io.EOFException(s"readFully past end")
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}

/** FileContext binding (TableSync's pointer swap goes through
  * `FileContext.rename(..., OVERWRITE)`): the standard
  * DelegateToFileSystem bridge, registered via
  * `fs.AbstractFileSystem.s3stub.impl`.
  */
class S3StubAbstractFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new S3StubFileSystem, conf,
      "s3stub", false)
