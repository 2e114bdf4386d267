package graft

import java.io.IOException
import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local filesystem with a poison switch, mounted as `faultfs:///abs/path`
  * — the crash injector for [[LakeCommitSpec]]'s crash matrix. Every
  * operation delegates to the real local FS except calls whose path
  * matches the active poison predicate, which throw `IOException` AT the
  * real call site — so "kill the process between the staged write and
  * the marker publish" is exercised as the genuine partial state
  * LakeCommit's own code path leaves behind, not a hand-built layout.
  */
class FaultFs extends RawLocalFileSystem {
  override def getScheme: String = "faultfs"
  override def getUri: URI = URI.create("faultfs:///")

  private def arm(op: String, f: Path): Unit =
    if (FaultFs.poison(op, f.toUri.getPath))
      throw new IOException(s"faultfs: injected crash at $op ${f.toUri.getPath}")

  // RawLocalFileSystem exposes several create entry points that do NOT
  // funnel through one another — poison every door.
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    arm("create", f)
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    arm("create", f)
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }

  override def createNonRecursive(f: Path, permission: FsPermission,
      flags: java.util.EnumSet[org.apache.hadoop.fs.CreateFlag], bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    arm("create", f)
    super.createNonRecursive(f, permission, flags, bufferSize, replication, blockSize, progress)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    arm("delete", f)
    super.delete(f, recursive)
  }
}

object FaultFs {
  /** (operation, absolute local path) => inject? Reset to `never` after
    * each armed window. @volatile: Spark tasks hit this from executors
    * (local mode threads). */
  @volatile var poison: (String, String) => Boolean = never
  def never: (String, String) => Boolean = (_, _) => false
  def disarm(): Unit = poison = never
}
