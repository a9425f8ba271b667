package graft.io

import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{FSDataOutputStream, FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

import java.net.URI

/** Test FileSystem enforcing + recording object-store (S3-like) semantics
  * over local disk, scheme `graftos://`:
  *
  *   - `append` THROWS — S3 has no append; any engine code path that needs
  *     it is broken on object stores by construction;
  *   - `rename` and `delete` are recorded with a global sequence number, so
  *     specs can assert the state-layout discipline (live state is never
  *     renamed; deletes of superseded state happen only after the new
  *     generation is committed).
  *
  * Rename still succeeds (S3A implements it as copy+delete) — the point is
  * to PROVE which paths the engine renames, not to forbid the operation.
  */
class ObjectStoreFs extends RawLocalFileSystem {
  override def getScheme: String = "graftos"
  override def getUri: URI = URI.create("graftos:///")

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream = {
    ObjectStoreFs.record("append", f.toString, "")
    throw new UnsupportedOperationException(
      s"append($f): object stores do not support append")
  }

  override def rename(src: Path, dst: Path): Boolean = {
    ObjectStoreFs.record("rename", src.toString, dst.toString)
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    ObjectStoreFs.record("delete", p.toString, "")
    super.delete(p, recursive)
  }

  // RawLocalFileStatus loads permissions lazily via `new File(uri)`, which
  // rejects non-file schemes; hand back eager plain statuses instead (an
  // object store has no POSIX permissions anyway).
  private def plain(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, FsPermission.getFileDefault,
      "graft", "graft", s.getPath)

  override def getFileStatus(f: Path): FileStatus = plain(super.getFileStatus(f))
  override def listStatus(f: Path): Array[FileStatus] = super.listStatus(f).map(plain)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    ObjectStoreFs.record("create", f.toString, "")
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  // RawLocalFileSystem implements this overload directly (it does NOT
  // funnel through the FsPermission one) — record it too
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
                      replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    ObjectStoreFs.record("create", f.toString, "")
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object ObjectStoreFs {
  final case class Op(seq: Int, op: String, path: String, dst: String)
  private val log = new java.util.concurrent.CopyOnWriteArrayList[Op]
  private val seq = new java.util.concurrent.atomic.AtomicInteger(0)

  def record(op: String, path: String, dst: String): Unit =
    log.add(Op(seq.incrementAndGet(), op, path, dst))

  def reset(): Unit = log.clear()

  def ops: Seq[Op] = {
    import scala.jdk.CollectionConverters._
    log.iterator().asScala.toSeq
  }
}
