package graft.io.s3

import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.{HttpURLConnection, URI, URL}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Minimal S3-protocol Hadoop FileSystem (`s3lite://bucket/key`) —
  * the from-scratch object-store connector that lets the engine's
  * object-store surface EXECUTE in this sandbox (no hadoop-aws jar
  * ships with the image, so the s3a wiring in
  * [[graft.io.Sources.configureObjectStore]] can never run here;
  * against a real deployment s3a remains the production connector and
  * this class is the protocol-fidelity testbed).
  *
  * Speaks the S3 REST dialect of [[S3LiteServer]] — plain HTTP
  * GET/PUT/DELETE/HEAD + ListObjectsV2 — with the standard
  * object-store-as-filesystem mapping the reference's MinIO layout
  * implies (dags/dag_etl_minio_to_postgres.py:32-68):
  *
  *   - reads are RANGED GETs (`Range: bytes=a-b`) per positioned read,
  *     the split-capable pattern a 100 TB scan needs — never
  *     whole-object driver materialization;
  *   - writes buffer locally and PUT once on close (single-part; a
  *     production connector adds multipart above ~100 MB);
  *   - directories are implicit prefixes plus zero-byte `key/` markers
  *     (the s3a convention), so empty dirs created by the parquet
  *     commit protocol survive;
  *   - rename = server-side copy (`x-amz-copy-source`) + delete,
  *     recursing over prefixes — which is exactly why real pipelines
  *     commit by rename-free protocols; the FileOutputCommitter path
  *     still works, it just pays the copy (documented, asserted in
  *     S3LiteSpec).
  *
  * Cache note: instances are endpoint-bound; tests set
  * `fs.s3lite.impl.disable.cache=true` so a fresh ephemeral-port
  * server never sees a stale cached client. */
final class S3LiteFileSystem extends FileSystem {

  private var fsUri: URI = _
  private var bucket: String = _
  private var endpoint: String = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    bucket = name.getAuthority
    fsUri = URI.create(s"s3lite://$bucket")
    endpoint = conf.get("fs.s3lite.endpoint")
    if (endpoint == null)
      throw new IOException("fs.s3lite.endpoint not configured")
    workDir = new Path(s"s3lite://$bucket/")
  }

  override def getScheme: String = "s3lite"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Object key of a path ("" = bucket root). */
  private def keyOf(p: Path): String = {
    val raw = p.toUri.getPath
    val k = if (raw.startsWith("/")) raw.drop(1) else raw
    k.stripSuffix("/")
  }

  private def qualify(key: String): Path =
    new Path(s"s3lite://$bucket/$key")

  private def connect(method: String, key: String, query: String = null,
      headers: Map[String, String] = Map.empty,
      body: Array[Byte] = null): HttpURLConnection = {
    val uri = new URI("http", null,
      URI.create(endpoint).getHost, URI.create(endpoint).getPort,
      s"/$bucket/$key", query, null)
    val c = uri.toURL.openConnection().asInstanceOf[HttpURLConnection]
    c.setRequestMethod(method)
    headers.foreach { case (k, v) => c.setRequestProperty(k, v) }
    if (body != null) {
      c.setDoOutput(true)
      val o = c.getOutputStream
      o.write(body); o.close()
    }
    c
  }

  private def drain(c: HttpURLConnection): Array[Byte] = {
    val is = if (c.getResponseCode >= 400) c.getErrorStream else c.getInputStream
    val bytes = if (is == null) Array.empty[Byte] else is.readAllBytes()
    c.disconnect()
    bytes
  }

  /** HEAD → Some(length) | None. */
  private def headObject(key: String): Option[Long] = {
    val c = connect("HEAD", key)
    val code = c.getResponseCode
    val len = Option(c.getHeaderField("x-s3lite-content-length"))
      .orElse(Option(c.getHeaderField("Content-Length")))
      .map(_.toLong).getOrElse(0L)
    c.disconnect()
    if (code == 200) Some(len) else None
  }

  /** ListObjectsV2 under `prefix`; delimited listing returns
    * (files with sizes, common sub-prefixes). */
  private def listPrefix(prefix: String, delimited: Boolean)
      : (Seq[(String, Long)], Seq[String]) = {
    val q = new StringBuilder("list-type=2")
    if (prefix.nonEmpty)
      q.append("&prefix=").append(java.net.URLEncoder.encode(prefix, "UTF-8"))
    if (delimited) q.append("&delimiter=%2F")
    val c = connect("GET", "", q.toString)
    if (c.getResponseCode != 200)
      throw new IOException(s"list $prefix → HTTP ${c.getResponseCode}")
    val xml = new String(drain(c), java.nio.charset.StandardCharsets.UTF_8)
    def unescape(s: String) =
      s.replace("&lt;", "<").replace("&gt;", ">").replace("&amp;", "&")
    val files = "<Contents><Key>(.*?)</Key><Size>(\\d+)</Size></Contents>".r
      .findAllMatchIn(xml)
      .map(m => (unescape(m.group(1)), m.group(2).toLong)).toSeq
    val prefixes = "<CommonPrefixes><Prefix>(.*?)</Prefix></CommonPrefixes>".r
      .findAllMatchIn(xml).map(m => unescape(m.group(1))).toSeq
    (files, prefixes)
  }

  override def getFileStatus(f: Path): FileStatus = {
    val key = keyOf(f)
    if (key.isEmpty)
      return new FileStatus(0, true, 1, blockSize, 0, qualify(""))
    headObject(key) match {
      case Some(len) =>
        new FileStatus(len, false, 1, blockSize, 0, qualify(key))
      case None =>
        // dir marker, or implicit dir (any key under the prefix)
        if (headObject(key + "/").isDefined ||
            listPrefix(key + "/", delimited = true) != ((Nil, Nil)))
          new FileStatus(0, true, 1, blockSize, 0, qualify(key))
        else throw new FileNotFoundException(f.toString)
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val st = getFileStatus(f) // FileNotFoundException if absent
    if (!st.isDirectory) return Array(st)
    val key = keyOf(f)
    val prefix = if (key.isEmpty) "" else key + "/"
    val (files, prefixes) = listPrefix(prefix, delimited = true)
    val fileSt = files.collect {
      // skip the dir's own marker and sub-markers (surfaced as dirs)
      case (k, len) if k != prefix && !k.endsWith("/") =>
        new FileStatus(len, false, 1, blockSize, 0, qualify(k))
    }
    val dirSt = prefixes.map(p =>
      new FileStatus(0, true, 1, blockSize, 0, qualify(p.stripSuffix("/"))))
    (fileSt ++ dirSt).toArray
  }

  private def blockSize: Long = 32L * 1024 * 1024

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val key = keyOf(f)
    val len = headObject(key).getOrElse(
      throw new FileNotFoundException(f.toString))
    new FSDataInputStream(new S3LiteInputStream(key, len))
  }

  /** Seekable ranged-GET stream: every read fetches exactly the
    * requested byte range — the positioned-read pattern parquet
    * footers and column chunks need, with no whole-object buffering. */
  private final class S3LiteInputStream(key: String, len: Long)
      extends FSInputStream {
    private var pos = 0L
    override def seek(p: Long): Unit = {
      if (p < 0 || p > len) throw new java.io.EOFException(s"seek $p of $len")
      pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(): Int = {
      val b = new Array[Byte](1)
      val n = read(b, 0, 1)
      if (n <= 0) -1 else b(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, n: Int): Int = {
      if (n == 0) return 0
      if (pos >= len) return -1
      val last = math.min(pos + n, len) - 1
      val c = connect("GET", key,
        headers = Map("Range" -> s"bytes=$pos-$last"))
      val code = c.getResponseCode
      val bytes = drain(c)
      if (code != 206 && code != 200)
        throw new IOException(s"GET $key range $pos-$last → HTTP $code")
      System.arraycopy(bytes, 0, b, off, bytes.length)
      pos += bytes.length
      bytes.length
    }
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, bs: Long,
      progress: Progressable): FSDataOutputStream = {
    val key = keyOf(f)
    if (!overwrite && headObject(key).isDefined)
      throw new FileAlreadyExistsException(f.toString)
    val buf = new ByteArrayOutputStream()
    val out = new java.io.OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, n: Int): Unit =
        buf.write(b, off, n)
      override def close(): Unit = {
        val c = connect("PUT", key, body = buf.toByteArray)
        val code = c.getResponseCode
        drain(c)
        if (code != 200) throw new IOException(s"PUT $key → HTTP $code")
      }
    }
    new FSDataOutputStream(out, statistics)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3lite: append not supported")

  private def copyObject(from: String, to: String): Unit = {
    val c = connect("PUT", to,
      headers = Map("x-amz-copy-source" -> s"/$bucket/$from"))
    val code = c.getResponseCode
    drain(c)
    if (code != 200) throw new IOException(s"copy $from → $to: HTTP $code")
  }

  private def deleteObject(key: String): Unit = {
    val c = connect("DELETE", key)
    c.getResponseCode
    drain(c)
  }

  override def rename(src: Path, dstIn: Path): Boolean = {
    val srcKey = keyOf(src)
    val srcSt =
      try getFileStatus(src)
      catch { case _: FileNotFoundException => return false }
    // Hadoop contract: existing dir destination → move INTO it
    val dst = try {
      val d = getFileStatus(dstIn)
      if (d.isDirectory) new Path(dstIn, src.getName) else dstIn
    } catch { case _: FileNotFoundException => dstIn }
    val dstKey = keyOf(dst)
    if (srcSt.isDirectory) {
      val (files, _) = listPrefix(srcKey + "/", delimited = false)
      files.foreach { case (k, _) =>
        copyObject(k, dstKey + k.drop(srcKey.length))
        deleteObject(k)
      }
      if (headObject(srcKey + "/").isDefined) deleteObject(srcKey + "/")
      mkdirs(dst)
    } else {
      copyObject(srcKey, dstKey)
      deleteObject(srcKey)
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val key = keyOf(f)
    val st =
      try getFileStatus(f)
      catch { case _: FileNotFoundException => return false }
    if (st.isDirectory) {
      val (files, _) = listPrefix(key + "/", delimited = false)
      val real = files.filterNot(_._1.endsWith("/"))
      if (real.nonEmpty && !recursive)
        throw new IOException(s"non-empty dir without recursive: $f")
      files.foreach { case (k, _) => deleteObject(k) }
      if (headObject(key + "/").isDefined) deleteObject(key + "/")
    } else deleteObject(key)
    true
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val key = keyOf(f)
    if (key.isEmpty) return true
    if (headObject(key).isDefined)
      throw new FileAlreadyExistsException(s"file exists: $f")
    // zero-byte marker per level so empty dirs are visible
    val c = connect("PUT", key + "/", body = Array.empty)
    c.getResponseCode
    drain(c)
    Option(f.getParent).foreach(p => if (keyOf(p).nonEmpty) mkdirs(p))
    true
  }
}
