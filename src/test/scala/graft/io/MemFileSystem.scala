package graft.io

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import java.io.{ByteArrayOutputStream, FileNotFoundException, IOException}
import java.net.URI

/** A minimal in-memory Hadoop FileSystem registered as `mem://` —
  * test-scope stand-in for an object store. The repo's IO stack talks to
  * storage exclusively through the `hadoop.fs.FileSystem` contract
  * (positioned reads, create/rename-on-commit, listStatus), so running
  * the format codecs against a NON-`file://` scheme proves none of them
  * leak a local-filesystem assumption (`java.io.File`, OS paths, checksum
  * sidecars) — the closest this sandbox can get to the reference's moto
  * S3 tests (`tests/io/conftest.py:29-87`) with zero egress and no
  * hadoop-aws jars.
  *
  * Semantics intentionally object-store-like: whole-object byte arrays,
  * flat map keyed by absolute path, directories implicit (mkdirs records
  * a marker so empty dirs list), rename is copy+delete.
  */
class MemFileSystem extends FileSystem {
  import MemFileSystem._

  private var uri: URI = URI.create("mem://bucket")
  private var cwd: Path = new Path("mem://bucket/")
  private var authority: String = "bucket"

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    authority = Option(name.getAuthority).getOrElse("bucket")
    uri = URI.create(name.getScheme + "://" + authority)
    cwd = new Path(uri.toString + "/")
    setConf(conf)
  }

  override def getScheme: String = "mem"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = cwd
  override def setWorkingDirectory(dir: Path): Unit = cwd = dir

  private def key(f: Path): String = {
    val p = if (f.isAbsolute) f else new Path(cwd, f)
    val s = p.toUri.getPath
    if (s.length > 1 && s.endsWith("/")) s.dropRight(1) else s
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = store.synchronized {
      store.getOrElse(key(f), throw new FileNotFoundException(key(f)))
    }
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    store.synchronized {
      if (!overwrite && store.contains(k)) throw new IOException(s"exists: $k")
    }
    val buf = new ByteArrayOutputStream()
    new FSDataOutputStream(new java.io.FilterOutputStream(buf) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit = buf.write(b, off, len)
      override def close(): Unit = {
        super.close()
        store.synchronized { store(k) = buf.toByteArray; dirs -= k }
      }
    }, null)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("mem: append")

  override def rename(src: Path, dst: Path): Boolean = store.synchronized {
    val ks = key(src); val kd = key(dst)
    store.get(ks) match {
      case Some(b) => store(kd) = b; store -= ks; true
      case None =>
        // directory rename: move every key under the prefix
        val pre = ks + "/"
        val hits = store.keys.filter(_.startsWith(pre)).toSeq
        if (hits.isEmpty && !dirs.contains(ks)) false
        else {
          hits.foreach { k => store(kd + k.stripPrefix(ks)) = store(k); store -= k }
          if (dirs.remove(ks)) dirs += kd
          true
        }
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = store.synchronized {
    val k = key(f)
    if (store.remove(k).isDefined) true
    else {
      val pre = k + "/"
      val hits = store.keys.filter(_.startsWith(pre)).toSeq
      if (hits.nonEmpty && !recursive) throw new IOException(s"dir not empty: $k")
      hits.foreach(store -= _)
      val sub = dirs.filter(d => d == k || d.startsWith(pre)).toSeq
      sub.foreach(dirs -= _)
      hits.nonEmpty || sub.nonEmpty
    }
  }

  override def listStatus(f: Path): Array[FileStatus] = store.synchronized {
    val k = key(f)
    store.get(k) match {
      case Some(b) => Array(fileStatus(k, b.length))
      case None =>
        val pre = if (k == "/") "/" else k + "/"
        val children = scala.collection.mutable.LinkedHashMap.empty[String, Option[Int]]
        store.foreach { case (p, b) =>
          if (p.startsWith(pre)) {
            val rest = p.stripPrefix(pre)
            val head = rest.takeWhile(_ != '/')
            children.getOrElseUpdate(pre + head,
              if (rest.contains('/')) None else Some(b.length))
          }
        }
        dirs.foreach { d =>
          if (d.startsWith(pre)) {
            val head = d.stripPrefix(pre).takeWhile(_ != '/')
            if (head.nonEmpty) children.getOrElseUpdate(pre + head, None)
          }
        }
        if (children.isEmpty && !dirs.contains(k) && k != "/")
          throw new FileNotFoundException(k)
        children.map {
          case (p, Some(len)) => fileStatus(p, len)
          case (p, None) => dirStatus(p)
        }.toArray
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = store.synchronized {
    dirs += key(f); true
  }

  override def getFileStatus(f: Path): FileStatus = store.synchronized {
    val k = key(f)
    store.get(k).map(b => fileStatus(k, b.length)).getOrElse {
      val pre = k + "/"
      if (k == "/" || dirs.contains(k) || store.keys.exists(_.startsWith(pre)) ||
          dirs.exists(_.startsWith(pre))) dirStatus(k)
      else throw new FileNotFoundException(k)
    }
  }

  private def fileStatus(k: String, len: Long): FileStatus =
    new FileStatus(len, false, 1, 1L << 25, 0L, new Path("mem://" + authority + k))
  private def dirStatus(k: String): FileStatus =
    new FileStatus(0, true, 1, 1L << 25, 0L, new Path("mem://" + authority + k))
}

object MemFileSystem {
  // one shared store per JVM: local[*] tasks and the driver see one "bucket"
  val store: scala.collection.mutable.LinkedHashMap[String, Array[Byte]] =
    scala.collection.mutable.LinkedHashMap.empty
  val dirs: scala.collection.mutable.LinkedHashSet[String] =
    scala.collection.mutable.LinkedHashSet.empty
  def clear(): Unit = store.synchronized { store.clear(); dirs.clear() }

  /** Seekable + PositionedReadable view over one byte array — what the
    * format codecs' positioned reads (`readFully(pos, buf)`) require.
    */
  private final class SeekableBytes(bytes: Array[Byte])
      extends java.io.InputStream with Seekable with PositionedReadable {
    private var pos = 0
    override def read(): Int =
      if (pos >= bytes.length) -1 else { val b = bytes(pos) & 0xff; pos += 1; b }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (pos >= bytes.length) return -1
      val n = math.min(len, bytes.length - pos)
      System.arraycopy(bytes, pos, b, off, n); pos += n; n
    }
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new IOException(s"bad seek $p")
      pos = p.toInt
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n); n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      if (position + length > bytes.length)
        throw new java.io.EOFException(s"readFully past end: $position+$length > ${bytes.length}")
      System.arraycopy(bytes, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
