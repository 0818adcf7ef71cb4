package graft

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local-disk Hadoop FileSystem registered under a NON-`file:` scheme —
  * every call translates `graftfs:///p` to a local path, delegates to
  * RawLocalFileSystem, and re-qualifies returned paths as `graftfs://`.
  * Exercises the whole table lifecycle through foreign-scheme URIs so
  * scheme-dependent string munging (e.g. `toUri.getPath` stripping)
  * surfaces in tests instead of on a real object store (the reference
  * treats S3 IO as first-class: src/io/s3_io.c). */
class GraftFsFileSystem extends FileSystem {
  private val local = new RawLocalFileSystem

  private def toLocal(p: Path): Path = new Path(p.toUri.getPath)
  private def fromLocal(p: Path): Path =
    new Path(getScheme, null, p.toUri.getPath)
  private def swizzle(st: FileStatus): FileStatus = {
    val s2 = new FileStatus(st)
    s2.setPath(fromLocal(st.getPath))
    s2
  }

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
  }

  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create(s"$getScheme:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(
      f: Path, permission: FsPermission, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long, progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(swizzle)

  override def setWorkingDirectory(dir: Path): Unit =
    local.setWorkingDirectory(toLocal(dir))
  override def getWorkingDirectory: Path = fromLocal(local.getWorkingDirectory)

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    swizzle(local.getFileStatus(toLocal(f)))

  override def setTimes(f: Path, mtime: Long, atime: Long): Unit =
    local.setTimes(toLocal(f), mtime, atime)
}

/** S3-semantics variant: `rename` SILENTLY REPLACES an existing
  * destination (S3 "rename" is copy+delete with no atomic
  * fail-if-exists), so rename can never arbitrate racing committers —
  * the posture that voids HadoopTableOperations-style commit protocols
  * on object stores and the reason catalog-arbitrated commits exist
  * ([[graft.lake.CommitArbiter]]). */
class S3LikeFileSystem extends GraftFsFileSystem {
  override def getScheme: String = "grafts3"
  override def rename(src: Path, dst: Path): Boolean = {
    if (exists(dst) && getFileStatus(dst).isFile) delete(dst, false)
    super.rename(src, dst)
  }
}
