package graft.log

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException, OutputStream}
import java.net.{HttpURLConnection, URI, URL, URLEncoder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Hadoop FileSystem client for [[MiniObjectStore]] — scheme `s3x://`.
  *
  * This is the adapter a real cloud connector is (reference:
  * server/azure/blob_provider.go:24 maps the same verbs onto Azure blob
  * REST): every Hadoop FS call becomes HTTP against a flat keyspace.
  * The semantics the store's recovery protocols must survive are real
  * here, not simulated:
  *   - NO rename verb: rename = per-object server-side copy + delete,
  *     object by object. Mid-rename both names exist; a directory
  *     rename is not atomic even per-object-pair.
  *   - Directories are fictions: a "dir" exists iff some key has it as
  *     a prefix, or an explicit zero-byte `key/` marker was mkdirs'ed.
  *   - Reads are ranged GETs (parquet footer-first access stays ranged,
  *     asserted by spec via the store's rangedGets counter).
  *   - Writes buffer locally and PUT on close — visibility is
  *     all-or-nothing per object, like a completed multipart upload.
  *
  * Paths: `s3x://127.0.0.1:PORT/bucket/key...` — the authority is the
  * store endpoint, the path is the object key.
  */
final class S3xFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var base: String = _ // http://host:port
  private var wd: Path = _

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    fsUri = URI.create(s"s3x://${uri.getAuthority}")
    base = s"http://${uri.getAuthority}"
    wd = new Path(fsUri.toString + "/")
  }

  override def getScheme: String = "s3x"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = wd
  override def setWorkingDirectory(dir: Path): Unit = { wd = dir }

  // ---- wire helpers -----------------------------------------------------

  private def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  private def conn(
      method: String, path: String,
      headers: Seq[(String, String)] = Nil): HttpURLConnection = {
    val c = new URL(base + path).openConnection()
      .asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    c
  }

  private def drain(c: HttpURLConnection): Array[Byte] = {
    val in =
      if (c.getResponseCode >= 400) c.getErrorStream else c.getInputStream
    if (in == null) return Array.emptyByteArray
    val buf = new ByteArrayOutputStream()
    val tmp = new Array[Byte](64 * 1024)
    var n = in.read(tmp)
    while (n >= 0) { buf.write(tmp, 0, n); n = in.read(tmp) }
    in.close()
    buf.toByteArray
  }

  /** (length, mtime) of an object, or None. */
  private def head(key: String): Option[(Long, Long)] = {
    val c = conn("HEAD", s"/obj?key=${enc(key)}")
    try {
      if (c.getResponseCode == 200)
        Some((c.getHeaderField("x-olen").toLong,
              c.getHeaderField("x-mtime").toLong))
      else None
    } finally c.disconnect()
  }

  private def getRange(key: String, start: Long, len: Int): Array[Byte] = {
    val c = conn("GET", s"/obj?key=${enc(key)}",
      Seq("Range" -> s"bytes=$start-${start + len - 1}"))
    try {
      if (c.getResponseCode == 404)
        throw new FileNotFoundException(key)
      drain(c)
    } finally c.disconnect()
  }

  private def putBytes(key: String, bytes: Array[Byte]): Unit = {
    val c = conn("PUT", s"/obj?key=${enc(key)}")
    c.setDoOutput(true)
    try {
      val out = c.getOutputStream
      out.write(bytes); out.close()
      if (c.getResponseCode != 200)
        throw new IOException(s"PUT $key: HTTP ${c.getResponseCode}")
    } finally c.disconnect()
  }

  private def serverCopy(src: String, dst: String): Unit = {
    val c = conn("PUT", s"/obj?key=${enc(dst)}", Seq("x-copy-from" -> src))
    c.setDoOutput(true)
    try {
      c.getOutputStream.close()
      if (c.getResponseCode != 200)
        throw new IOException(s"COPY $src -> $dst: HTTP ${c.getResponseCode}")
    } finally c.disconnect()
  }

  private def deleteKey(key: String): Unit = {
    val c = conn("DELETE", s"/obj?key=${enc(key)}")
    try { c.getResponseCode; () } finally c.disconnect()
  }

  /** Listing entries: Left(commonPrefix) | Right((key, len, mtime)). */
  private def list(
      prefix: String,
      delimited: Boolean): Seq[Either[String, (String, Long, Long)]] = {
    val c = conn("GET",
      s"/list?prefix=${enc(prefix)}&delim=${if (delimited) 1 else 0}")
    try {
      val body = new String(drain(c), "UTF-8")
      body.split('\n').filter(_.nonEmpty).toSeq.map { line =>
        if (line.startsWith("P ")) Left(line.drop(2))
        else {
          val Array(_, len, mtime, key) = line.split(" ", 4)
          Right((key, len.toLong, mtime.toLong))
        }
      }
    } finally c.disconnect()
  }

  // ---- path <-> key -----------------------------------------------------

  private def key(f: Path): String =
    makeQualified(f).toUri.getPath.stripPrefix("/")

  private def qual(k: String): Path =
    new Path(fsUri.toString + "/" + k)

  private def fileStatus(k: String, len: Long, mtime: Long): FileStatus =
    new FileStatus(len, false, 1, 32 * 1024 * 1024, mtime, mtime,
      FsPermission.getFileDefault, "", "", qual(k))

  private def dirStatus(k: String, mtime: Long): FileStatus =
    new FileStatus(0, true, 1, 0, mtime, mtime,
      FsPermission.getDirDefault, "", "",
      if (k.isEmpty) new Path(fsUri.toString + "/") else qual(k))

  // ---- FileSystem surface ----------------------------------------------

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (k.isEmpty) return dirStatus("", 0L)
    head(k) match {
      case Some((len, mtime)) => fileStatus(k, len, mtime)
      case None =>
        head(k + "/") match {
          case Some((_, mtime)) => dirStatus(k, mtime)
          case None =>
            if (list(k + "/", delimited = true).nonEmpty) dirStatus(k, 0L)
            else throw new FileNotFoundException(f.toString)
        }
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (k.nonEmpty) head(k) match {
      case Some((len, mtime)) => return Array(fileStatus(k, len, mtime))
      case None               => ()
    }
    val prefix = if (k.isEmpty) "" else k + "/"
    val entries = list(prefix, delimited = true)
    if (k.nonEmpty && entries.isEmpty && head(prefix).isEmpty)
      throw new FileNotFoundException(f.toString)
    entries.flatMap {
      case Left(p) =>
        Some(dirStatus(p.stripSuffix("/"), 0L))
      case Right((objKey, len, mtime)) =>
        if (objKey == prefix) None // the dir's own marker
        else Some(fileStatus(objKey, len, mtime))
    }.toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val k = key(f)
    if (k.isEmpty) return true
    if (head(k).isDefined)
      throw new ParentNotDirectoryException(s"file exists at $f")
    putBytes(k + "/", Array.emptyByteArray)
    true
  }

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (!overwrite && head(k).isDefined)
      throw new FileAlreadyExistsException(f.toString)
    val buf = new ByteArrayOutputStream(64 * 1024)
    val sink: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = putBytes(k, buf.toByteArray)
    }
    new FSDataOutputStream(sink, statistics)
  }

  override def append(
      f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException(
      "object stores do not append; write a new object")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val k = key(f)
    val (len, _) = head(k).getOrElse(throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new S3xInputStream(k, len))
  }

  /** Seekable ranged-GET reader. Small reads go through a 64 KiB
    * readahead buffer; large reads fetch exactly what was asked. */
  private final class S3xInputStream(k: String, len: Long)
      extends FSInputStream {
    private var pos = 0L
    private var bufStart = 0L
    private var buf: Array[Byte] = Array.emptyByteArray
    private val Readahead = 64 * 1024

    override def getPos: Long = pos
    override def seek(p: Long): Unit = {
      if (p < 0 || p > len) throw new java.io.EOFException(s"seek $p len $len")
      pos = p
    }
    override def seekToNewSource(targetPos: Long): Boolean = false

    override def read(): Int = {
      if (pos >= len) return -1
      if (pos < bufStart || pos >= bufStart + buf.length) {
        val want = math.min(Readahead.toLong, len - pos).toInt
        buf = getRange(k, pos, want)
        bufStart = pos
      }
      val b = buf((pos - bufStart).toInt) & 0xff
      pos += 1
      b
    }

    override def read(b: Array[Byte], off: Int, reqLen: Int): Int = {
      if (reqLen == 0) return 0
      if (pos >= len) return -1
      val want = math.min(reqLen.toLong, len - pos).toInt
      // serve from readahead when it covers the request start
      if (pos >= bufStart && pos < bufStart + buf.length) {
        val avail = (bufStart + buf.length - pos).toInt
        val n = math.min(avail, want)
        System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
        pos += n
        return n
      }
      if (want < Readahead) {
        val fetch = math.min(Readahead.toLong, len - pos).toInt
        buf = getRange(k, pos, fetch)
        bufStart = pos
        val n = math.min(buf.length, want)
        System.arraycopy(buf, 0, b, off, n)
        pos += n
        n
      } else {
        val data = getRange(k, pos, want)
        System.arraycopy(data, 0, b, off, data.length)
        pos += data.length
        data.length
      }
    }

    override def close(): Unit = { buf = Array.emptyByteArray }
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    val srcStatus =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    var dk = key(dst)
    try {
      val ds = getFileStatus(dst)
      if (ds.isDirectory) dk = dk + "/" + src.getName
      else return false // dst exists as a file
      if (head(dk).isDefined) return false
    } catch { case _: FileNotFoundException => () }
    if (srcStatus.isFile) {
      serverCopy(sk, dk)
      deleteKey(sk)
    } else {
      // directory: copy every object under the prefix, then delete —
      // the whole point: a crash mid-loop leaves BOTH trees partially
      // populated, and the log's recovery protocols must tolerate it
      val children = list(sk + "/", delimited = false)
      children.foreach {
        case Right((ck, _, _)) =>
          serverCopy(ck, dk + "/" + ck.stripPrefix(sk + "/"))
        case Left(_) => ()
      }
      children.foreach {
        case Right((ck, _, _)) => deleteKey(ck)
        case Left(_)           => ()
      }
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    val st =
      try getFileStatus(f)
      catch { case _: FileNotFoundException => return false }
    if (st.isFile) { deleteKey(k); return true }
    val children = list(if (k.isEmpty) "" else k + "/", delimited = false)
      .collect { case Right((ck, _, _)) => ck }
    val real = children.filterNot(_ == k + "/")
    if (real.nonEmpty && !recursive)
      throw new IOException(s"directory not empty: $f")
    children.foreach(deleteKey)
    if (k.nonEmpty) deleteKey(k + "/")
    true
  }
}
